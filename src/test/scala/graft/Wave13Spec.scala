package graft

import org.apache.spark.sql.functions._

/** Brute cross-checks for wave 13 (q437–q438): point-in-time feature
  * assembly and delta/varint encoding. */
class Wave13Spec extends SparkSuite {

  test("q437 features are point-in-time correct (no leakage)") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(date_trunc("second", col("ts"))),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val out = SparkEntry.queries("q437_feature_matrix")(spark, sf)
      .collect()
    val byId = evs.map(e => e._3 -> e).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (user, ets) = (r.getLong(1), byId(r.getLong(0))._2)
      // activity feature == count of the user's events with ts <= label ts
      // (the inclusive as-of convention) — computed from raw data, so a
      // single future-leaked version would break equality
      val expectCum = evs.count(e => e._1 == user && e._2 <= ets).toLong
      assert(!r.isNullAt(4) && r.getLong(4) == expectCum)
      // rate feature: null exactly when the label predates every version
      val firstEff = java.time.Instant.parse("2024-01-01T00:00:00Z")
        .toEpochMilli * 1000L
      assert(r.isNullAt(3) == (ets < firstEff))
    }
  }

  test("q438 matches the brute global gap scan") {
    val keys = Tables.orders(spark, sf).select("o_orderkey")
      .distinct().collect().map(_.getLong(0)).sorted
    val gaps = keys.sliding(2).collect { case Array(a, b) => b - a }.toSeq
    def vb(g: Long): Long = 1L + (if (g >= 128) 1 else 0) +
      (if (g >= 16384) 1 else 0) + (if (g >= 2097152) 1 else 0) +
      (if (g >= 268435456L) 1 else 0)
    val r = SparkEntry.queries("q438_delta_encoding")(spark, sf)
      .collect()(0)
    assert(r.getLong(0) == keys.length)
    assert(r.getLong(1) == gaps.max)
    assert(r.getLong(2) == gaps.map(vb).sum + 8)
    assert(r.getLong(3) == keys.length * 8L)
    assert(r.getDouble(4) > 1.0) // dense keys must compress
  }
}
