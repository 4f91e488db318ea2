package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantics checks for wave 15 (q443–q446): SemDeDup pruning, signed-delta
  * view maintenance, deterministic-Laplace DP noise, DoReMi reweighting. */
class Wave15Spec extends SparkSuite {

  test("semDedup drops exact duplicates, keeps the min id, spares singletons") {
    import spark.implicits._
    // 3 planted groups in 64-d: an exact-duplicate triple (ids 1,2,3), a
    // near-orthogonal pair (ids 10,11), and a singleton (id 20). k=1 puts
    // everything in one cluster so only the cosine cut decides.
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => (((seed * 31 + i * 17) % 7) - 3).toFloat)
    val rows = Seq(
      (1L, vec(5)), (2L, vec(5)), (3L, vec(5)),
      (10L, vec(9)), (11L, vec(13)), (20L, vec(24)))
    val df = rows.toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.semDedup(
        df, "vec_id", "embedding", k = 1, dim = 64, threshold = 0.99)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_vecs") == 6)
    // ids 2 and 3 have the smaller near-identical id 1 → dropped; nothing
    // else is ≥ 0.99-cosine to a smaller id
    assert(r.getAs[Long]("n_dropped") == 2)
    def x56(ids: Seq[Long]): Long = ids.map { id =>
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)
          .substring(0, 14), 16)
    }.foldLeft(0L)(_ ^ _)
    assert(r.getAs[Long]("kept_xor") == x56(Seq(1L, 10L, 11L, 20L)))
    assert(r.getAs[Long]("dropped_xor") == x56(Seq(2L, 3L)))
  }

  test("mergeAggDelta: adjust, create, and retire groups; untouched pass through") {
    import spark.implicits._
    val view = Seq(("a", 2L, BigDecimal("10.00")), ("b", 1L, BigDecimal("5.00")),
        ("c", 3L, BigDecimal("9.00")))
      .toDF("k", "n", "rev")
      .select(col("k"), col("n"), col("rev").cast("decimal(18,2)").as("rev"))
    val delta = Seq(
      ("a", BigDecimal("4.00"), 1),   // a: 2→3 rows, 10→14
      ("b", BigDecimal("5.00"), -1),  // b: count reaches 0 → retired
      ("d", BigDecimal("7.50"), 1))   // d: new group
      .toDF("k", "rev", "sign")
      .select(col("k"), col("rev").cast("decimal(18,2)").as("rev"), col("sign"))
    val out = graft.operators.Incremental.mergeAggDelta(
        view, delta, Seq("k"), "n", Seq("rev"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getDecimal(2).doubleValue())).toMap
    assert(out == Map("a" -> (3L, 14.0), "c" -> (3L, 9.0), "d" -> (1L, 7.5)))
  }

  test("merged view equals from-scratch recompute on real data (IVM theorem)") {
    val merged = SparkEntry.queries("q444_incremental_view")(spark, sf)
    val direct = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 10 === 0 || col("o_orderkey") % 7 =!= 0)
      .groupBy(col("o_orderpriority"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n"),
        (round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
          + lit(0.0d)).as("revenue"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("dp histogram: noise is Laplace-shaped, deterministic, and bounded by the key") {
    val out = SparkEntry.queries("q445_dp_histogram")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, noisy, err) = (r.getAs[Long]("n"),
        r.getAs[Double]("noisy_n"), r.getAs[Double]("abs_err"))
      // reconstruct: |noisy − n| == abs_err (6-dp) and err matches the
      // closed-form inverse CDF from the md5 uniform
      assert(math.abs(math.abs(noisy - n) - err) < 1e-6)
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils
          .md5Hex("dp:" + r.getString(0)).substring(0, 8), 16)
      val u = (h + 0.5) / 4294967296.0
      val expect = BigDecimal(-2.0 * math.signum(u - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).abs.toDouble
      assert(math.abs(err - expect) < 1e-9)
    }
    // same input twice → identical release (determinism of the skeleton)
    val again = SparkEntry.queries("q445_dp_histogram")(spark, sf).collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("COUNT(*) pushes to the shard count scan; grouped aggs stay on the row path") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_geojson_pd").toString
    (1 to 97).map(i =>
        s"""{"type":"Feature","id":"f$i","geometry":{"type":"Polygon",""" +
          s""""coordinates":[[[0,0],[1,0],[1,1],[0,0]]]},"properties":{}}""")
      .toDF("value").repartition(3).write.mode("overwrite").text(root)
    val df = spark.read.format("graft-geojson").load(root)
    df.createOrReplaceTempView("__pd")
    val pushed = spark.sql("SELECT count(*) AS n FROM __pd")
    assert(pushed.queryExecution.executedPlan.toString
      .contains("GeoJsonCountScan"))
    assert(pushed.collect().head.getLong(0) == 97L)
    // a grouped count needs the parse — it must NOT take the count scan,
    // and must still be correct through the row path
    val grouped = spark.sql(
      "SELECT gtype, count(*) AS n FROM __pd GROUP BY gtype")
    assert(!grouped.queryExecution.executedPlan.toString
      .contains("GeoJsonCountScan"))
    assert(grouped.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq == Seq(("Polygon", 97L)))
  }

  test("v2 writer: commit renames temps, overwrite truncates, rows round-trip") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_geojson_wr").toString
    def features(n: Int) = (1 to n).map(i => (s"w$i", "Polygon",
        Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(1.0, 1.0), Seq(0.0, 0.0)),
        Map("v" -> i.toString)))
      .toDF("id", "gtype", "ring", "props")
    features(10).repartition(2)
      .write.format("graft-geojson").mode("append").save(root)
    val names = new java.io.File(root).listFiles().map(_.getName).sorted
    assert(names.forall(n => n.startsWith("shard-") && n.endsWith(".jsonl")),
      s"uncommitted temp files visible: ${names.mkString(",")}")
    val back = spark.read.format("graft-geojson").load(root)
    assert(back.count() == 10)
    assert(back.select("id").collect().map(_.getString(0)).sorted
      .sameElements((1 to 10).map(i => s"w$i").sorted))
    // map content and ring coordinates survive the round-trip
    val r5 = back.filter(col("id") === "w5").collect().head
    assert(r5.getAs[Map[String, String]]("props") == Map("v" -> "5"))
    assert(r5.getSeq[scala.collection.Seq[Double]](r5.fieldIndex("ring"))
      .head.toSeq == Seq(0.0, 0.0))
    // overwrite truncates the previous commit's shards
    features(4).write.format("graft-geojson").mode("overwrite").save(root)
    assert(spark.read.format("graft-geojson").load(root).count() == 4)
  }

  test("domainReweight: weights normalize, monotone in loss, mean preserved") {
    val out = SparkEntry.queries("q446_domain_reweight")(spark, sf)
      .collect().map(r => (r.getString(0), r.getAs[Double]("mean_surprisal"),
        r.getAs[Double]("weight")))
    assert(out.length > 1)
    // weights sum to 1 within the two 1e-6 floors' tolerance
    assert(math.abs(out.map(_._3).sum - 1.0) < 2e-6 * out.length)
    // multiplicative-weights monotonicity: harder domain ⇒ ≥ weight
    out.sortBy(_._2).sliding(2).foreach {
      case Array((_, l1, w1), (_, l2, w2)) =>
        assert(l1 < l2 + 1e-12); assert(w1 <= w2 + 1e-9)
      case _ =>
    }
  }
}
