package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.12 (EXT) — similarity search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k against a *small broadcast query set*
  * (never an unbounded cross join). Scale path: LSH bucketing — random
  * hyperplane signs (cosine LSH) computed as per-row expressions, so the
  * candidate join shuffles on the bucket key only.
  */
object Similarity {

  /** Dot product of two double arrays, summed left-to-right (deterministic,
    * reproducible by external oracles). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cast an `array<float>` column to `array<double>` so arithmetic matches
    * a double-based oracle exactly. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Brute-force k-NN: for each query vector (small set, broadcast), the
    * top-k most cosine-similar rows. The fact side streams once — the plan is
    * scan → broadcast nested loop (|queries| multiplier) → per-query top-k
    * via window. At 1000 executors this is a single pass over the corpus. */
  def bruteKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
               vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), asDouble(col(vecCol)).as("qvec")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("nvec"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qvec"), col("nvec")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Cosine-LSH bucket signature: sign bits against `nPlanes` deterministic
    * pseudo-random hyperplanes (md5-seeded, so fully reproducible). A vector's
    * bucket = concatenated sign bits of its first `nPlanes` projections. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int): Column = {
    val planes: Seq[Seq[Double]] = (0 until nPlanes).map { p =>
      (0 until dim).map { i =>
        // deterministic pseudo-random weights in [-1, 1)
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"plane:$p:$i".getBytes("UTF-8"))
        (((h(0) & 0xffL) << 8 | (h(1) & 0xffL)).toDouble / 32768.0) - 1.0
      }
    }
    val bits = planes.map { w =>
      // unrolled dot product: element_at terms compile into straight-line
      // whole-stage-codegen Java; the higher-order zip_with/aggregate form
      // evaluates interpreted lambdas per element (measurably slower at
      // corpus scale).
      val proj = w.zipWithIndex.map { case (c, i) =>
        element_at(vec, i + 1) * lit(c)
      }.reduce(_ + _)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Hamming-1 probe set of a sign-bit bucket string: the bucket itself plus
    * every single-bit flip. Multi-probe recovers most neighbors lost across a
    * single hyperplane boundary at the cost of (nPlanes+1)× candidate lookups
    * on the (small, broadcast) query side only. */
  private def probeBuckets(bucket: Column, nPlanes: Int): Column = {
    val flips = (1 to nPlanes).map { i =>
      concat(
        substring(bucket, 1, i - 1),
        when(substring(bucket, i, 1) === "1", "0").otherwise("1"),
        substring(bucket, i + 1, nPlanes - i))
    }
    array((bucket +: flips): _*)
  }

  /** IVF-style ANN: coarse-quantize the corpus with KMeans centroids, then
    * search only the `nprobe` nearest inverted lists per query. The classic
    * scale path when the corpus outgrows brute force: the corpus is bucketed
    * once (centroid id = shuffle key), queries fan out to nprobe buckets.
    * Deterministic via fixed seed. */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, nCentroids: Int = 16,
             nprobe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val train = corpus.select(array_to_vector(asDouble(col(vecCol))).as("features"))
    val model = new KMeans().setK(nCentroids).setSeed(42L).setMaxIter(10)
      .fit(train)
    val centroids = model.clusterCenters.map(_.toArray).zipWithIndex
    val centroidLit = array(centroids.map { case (c, i) =>
      struct(lit(i).as("cid"), array(c.map(lit): _*).as("cvec"))
    }: _*)
    // nearest-centroid ids as a per-row expression over the literal table
    def nearestCids(vec: Column, n: Int): Column = {
      val scored = transform(centroidLit, c =>
        struct(dot(vec, c.getField("cvec")).as("score"), c.getField("cid").as("cid")))
      // top-n centroid ids by inner product (centroids near-unit for cosine)
      slice(reverse(array_sort(scored)), 1, n).getField("cid")
    }
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("nvec"))
      .withColumn("cell", element_at(nearestCids(col("nvec"), 1), 1))
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qvec"))
        .withColumn("cell", explode(nearestCids(col("qvec"), nprobe))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.join(q, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("nvec")).as("sim"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** LSH-bucketed ANN: join query probes and corpus on bucket, rank within
    * the probed candidate set. The corpus is bucketed once (per-row
    * expression); only the broadcast query side fans out to its multi-probe
    * buckets, so the join stays |corpus| × small. */
  def lshKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, dim: Int, nPlanes: Int, k: Int,
             multiProbe: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("nvec"),
      lshBucket(asDouble(col(vecCol)), dim, nPlanes).as("bucket"))
    val qBase = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qvec"),
      lshBucket(asDouble(col(vecCol)), dim, nPlanes).as("qbucket"))
    val q = broadcast(
      if (multiProbe)
        qBase.select(col("query_id"), col("qvec"),
          explode(probeBuckets(col("qbucket"), nPlanes)).as("bucket"))
      else qBase.withColumnRenamed("qbucket", "bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.join(q, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("nvec")).as("sim"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }
}
