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

  test("q439 batches account for every image; drops are sub-batch remainders") {
    val total = Tables.documents(spark, sf).count()
    val out = SparkEntry.queries("q439_microbatch_manifest")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(out.map(_._2).sum == total)
    out.foreach { case (_, n, nb, dropped, _) =>
      assert(nb == n / 32)
      assert(dropped == n - nb * 32 && dropped < 32)
    }
  }

  test("q440 shard checksums match a brute xor fold") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val expect = docs.groupBy { case (id, _) =>
      java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 16
    }.map { case (shard, g) =>
      shard -> (g.length.toLong,
        g.map(d => java.lang.Long.parseLong(md5hex(d._2).take(14), 16))
          .reduce(_ ^ _))
    }
    val got = SparkEntry.queries("q440_shard_manifest")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3)))
      .toMap
    expect.foreach { case (shard, (n, x)) =>
      assert(got(shard) == ((n, x)))
    }
    assert(got.values.map(_._1).sum == docs.length)
  }
}
