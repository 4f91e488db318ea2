package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Similarity, TextOps}

/** Round-10 decade probe for q509 (round-9 verdict item 6): stage split +
  * band-collision candidate counts at any customer-table scale, so the
  * adaptive geometry's prediction (candidates/doc ~ constant; banding
  * work ~ N·log²N from the OR-amplification law nBands ∝ 1/p^rpb with
  * rpb ∝ log N) is validated by measurement where the FIXED round-8
  * shape would be ~100× quadratic. Mirrors SparkEntry q509 exactly. */
object Probe509 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32", "graft-probe509")
    val grp = expr("c_custkey div 4")
    val mem = expr("c_custkey % 4")
    val variantPos = Map(10 -> 0, 35 -> 1, 60 -> 2, 85 -> 3)
    val words = (0 until 120).map { i =>
      val base = concat(lit("w"),
        substring(md5(concat(grp.cast("string"), lit("_" + i))), 1, 8))
      variantPos.get(i) match {
        case Some(m) =>
          when(mem === m, concat(lit("v"),
            substring(md5(concat(grp.cast("string"), lit("_sw_" + m))), 1, 8)))
            .otherwise(base)
        case None => base
      }
    }
    val docs = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("doc_id"), concat_ws(" ", words: _*).as("text"))
    val feats = Tables.spread(spark, docs)
      .select(col("doc_id"),
        TextOps.hashedNgramVector(TextOps.tokens(col("text")), 512, 2).as("vec"))
      .localCheckpoint(eager = false)
    val n = Probe.time("fixture + vectorize (pin write)")(feats.count())
    val (nb, rpb) = Dedup.adaptiveBandShape(n, withinCos = 0.9386,
      minBands = 48, minRows = 12)
    println(s"        docs = $n  shape = ($nb, $rpb)  planes/doc = ${nb * rpb}")
    // compact per-doc pin + re-explode per consumer — mirrors the round-10
    // embeddingNearDups fix (pinning the exploded N·nBands table cost
    // 2830 CPU-s at 495k docs from cached-object GC pressure)
    val bandTable = feats.select(col("doc_id"),
        Similarity.bandBucketsPacked(Similarity.asDouble(col("vec")), 512, nb, rpb)
          .as("__bkts"))
      .localCheckpoint(eager = false)
    Probe.time("banding (compact pin write)")(bandTable.count())
    val banded = bandTable.select(col("doc_id"),
      posexplode(col("__bkts")).as(Seq("band_id", "bucket")))
    val cand = Probe.time("band candidates (pre-distinct count)")(
      banded.as("a").join(banded.as("b"),
          col("a.band_id") === col("b.band_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id")).count())
    println(f"        candidate pairs = $cand (${cand.toDouble / n}%.1f per doc)")
    val pairs = Probe.time("full embeddingNearDups")(
      Dedup.embeddingNearDups(feats, "doc_id", "vec", dim = 512,
        threshold = 0.8, nBands = nb, rowsPerBand = rpb).count())
    println(s"        verified pairs = $pairs (planted = ${n / 4 * 6})")
    spark.stop()
  }
}
