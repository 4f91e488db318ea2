package graft

import org.apache.spark.sql.functions._

/** Invariant + brute cross-checks for the wave-10 engine gates
  * (q418–q421): schema evolution, dictionary encoding, the data-driven
  * rule engine, and split-conformal calibration. */
class Wave10Spec extends SparkSuite {

  test("q418 merged read accounts for every order; LEGACY bucket == v1 rows") {
    val orders = Tables.orders(spark, sf)
    val total = orders.count()
    val v1 = orders.filter(col("o_orderdate") < lit("1998-01-01")).count()
    val out = SparkEntry.queries("q418_schema_evolution")(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == total)
    val legacy = out.find(_.getString(0) == "LEGACY").get
    assert(legacy.getLong(1) == v1)
    // every non-LEGACY bucket is a real v2 priority value
    val prios = orders.filter(col("o_orderdate") >= lit("1998-01-01"))
      .select("o_orderpriority").distinct().collect()
      .map(_.getString(0)).toSet
    assert(out.map(_.getString(0)).filterNot(_ == "LEGACY").toSet == prios)
  }

  test("q419 decode round trip is lossless and codes are dense") {
    val direct = Tables.part(spark, sf).groupBy("p_type")
      .agg(count(lit(1)).as("n"), sum("p_partkey").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val out = SparkEntry.queries("q419_dict_encoding")(spark, sf).collect()
    // parity: aggregating through encode->decode equals direct aggregation
    out.foreach { r =>
      val (n, s) = direct(r.getString(0))
      assert(r.getLong(2) == n && r.getLong(3) == s)
    }
    // codes are exactly 0..nd-1 (dense), assigned in value order
    val byCode = out.sortBy(_.getInt(1))
    assert(byCode.map(_.getInt(1)).toSeq == (0 until out.length))
    assert(byCode.map(_.getString(0)).toSeq == out.map(_.getString(0)).sorted.toSeq)
    // bits_per_value is the narrowest width holding the max code
    val bits = out.head.getInt(4)
    val maxCode = out.length - 1
    assert((1L << bits) > maxCode)
    assert(bits == 1 || (1L << (bits - 1)) <= maxCode)
  }

  test("q420 rule engine matches per-rule brute recounts (null = violation)") {
    val o = Tables.orders(spark, sf)
    val expect = Map(
      "r01_status_domain" ->
        o.filter(!coalesce(col("o_orderstatus").isin("O", "F", "P"),
          lit(false))).count(),
      "r02_price_positive" ->
        o.filter(!coalesce(col("o_totalprice") > 0.0, lit(false))).count(),
      "r03_priority_format" ->
        o.filter(!coalesce(col("o_orderpriority")
          .rlike("^[1-5]-[A-Z ]+$"), lit(false))).count(),
      "r05_custkey_notnull" -> o.filter(col("o_custkey").isNull).count(),
      "r06_key_positive" ->
        o.filter(!coalesce(col("o_orderkey") > 0.0, lit(false))).count())
    val total = o.count()
    val out = SparkEntry.queries("q420_dq_rule_engine")(spark, sf).collect()
    assert(out.length == 6)
    out.foreach { r =>
      assert(r.getLong(2) == total)
      expect.get(r.getString(0)).foreach(v => assert(r.getLong(3) == v))
    }
  }

  test("q421 qhat is the brute k-th smallest calibration residual; coverage near 0.9") {
    val o = Tables.orders(spark, sf).select(
      col("o_orderpriority").as("p"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        .as("cents"),
      col("o_orderdate").as("d"))
    val train = o.filter(col("d") < lit("1998-01-01")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val yhat = train.groupBy(_._1).map { case (p, g) =>
      p -> g.map(_._2).sum / g.length }  // integer floor division
    val cal = o.filter(col("d") >= lit("1998-01-01") &&
        col("d") < lit("1999-01-01")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val out = SparkEntry.queries("q421_split_conformal")(spark, sf).collect()
    out.foreach { r =>
      val p = r.getString(0)
      val resid = cal.filter(_._1 == p)
        .map { case (_, c) => math.abs(c - yhat(p)) }.sorted
      val n = resid.length
      assert(r.getLong(3) == n)
      val k = (9 * (n + 1) + 9) / 10
      assert(r.getLong(4) == resid(k - 1))
      // finite-sample guarantee: coverage ~ 0.9 (slack for the small sf)
      assert(r.getDouble(6) > 0.75 && r.getDouble(6) <= 1.0)
    }
  }
}
