package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables, SparkEntry}
import graft.operators.{Dedup, Similarity}

/** One-off sub-plan timing probe for the slow embedding queries. */
object Probe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32", "graft-probe")
    val e = Tables.spread(spark, Tables.embeddings(spark, sfDir))
    time("warm: embeddings count")(e.count())

    // ---- q51 pieces ----
    val v = Similarity.asDouble(col("embedding"))
    val banded = e.select(col("vec_id"),
      posexplode(Similarity.bandBuckets(v, 64, 8, 6)).as(Seq("band_id", "bucket")))
    time("q51 banded rows")(println("  rows=" + banded.count()))
    time("q51 bucket skew")(
      banded.groupBy("band_id", "bucket").count()
        .orderBy(col("count").desc).show(10, false))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"))
    time("q51 candidate pairs (pre-distinct)")(println("  rows=" + cand.count()))
    time("q51 candidate pairs (distinct)")(println("  rows=" + cand.distinct().count()))
    time("q51 full")(println("  rows=" + SparkEntry.queries("q51_embedding_neardup")(spark, sfDir).count()))

    // ---- q45 pieces ----
    time("q45 corpus count")(e.count())
    time("q45 kmeans fit") {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val train = e.select(array_to_vector(v).as("features"))
      new KMeans().setK(8).setSeed(42L).setMaxIter(10).fit(train)
    }
    time("q45 full")(println("  rows=" + SparkEntry.queries("q45_ivf_knn")(spark, sfDir).count()))
    spark.stop()
  }
}
