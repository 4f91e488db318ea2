package graft

import org.apache.spark.sql.functions._

/** Brute cross-checks for wave 11 (q430–q432): interval sweep, closed-form
  * path aggregation, dataset card. */
class Wave11Spec extends SparkSuite {

  test("q430 peaks match a brute global sweep over session boundaries") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("long"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute sessionize: gap > 1800 s per user, (ts, event_id) order
    val bounds = evs.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._2, e._3)).map(_._2)
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var st = s.head; var en = s.head
      s.tail.foreach { t =>
        if (t - en > 1800) { sessions += ((st, en)); st = t }
        en = t
      }
      sessions += ((st, en))
      sessions
    }.toSeq
    val deltas = bounds.flatMap { case (st, en) =>
      Seq((st, 1L), (en + 1, -1L)) }
    val byT = deltas.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    var cur = 0L
    val curve = byT.map { case (t, d) => cur += d; (t, cur) }
    val peaks = curve.groupBy(_._1 / 86400).view
      .mapValues(_.map(_._2).max).toMap
    val got = SparkEntry.queries("q430_concurrency_curve")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (day, peak, open) =>
      assert(peak == peaks(day))
      // open-at-midnight = last cumulative value at or before day end
      val lastAtOrBefore = curve.takeWhile(_._1 < (day + 1) * 86400)
      assert(open == lastAtOrBefore.last._2)
    }
    assert(got.map(_._1).toSet == peaks.keySet)
  }

  test("q431 path costs match a brute ancestor walk") {
    val dur = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderkey") >= 1)
      .groupBy(col("o_orderkey"))
      .agg(max(datediff(col("l_shipdate").cast("date"),
        col("o_orderdate").cast("date"))).as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDepth = dur.keys.toSeq.map { node =>
      var k = node; var cost = 0L
      while (k >= 1) { cost += dur.getOrElse(k, 0); k >>= 1 }
      (64 - java.lang.Long.numberOfLeadingZeros(node) - 1, cost)
    }.groupBy(_._1)
    val got = SparkEntry.queries("q431_path_aggregation")(spark, sf)
      .collect()
    got.foreach { r =>
      val g = byDepth(r.getInt(0)).map(_._2)
      assert(r.getLong(1) == g.length)
      assert(r.getLong(2) == g.sum)
      assert(r.getLong(3) == g.max)
    }
    assert(got.map(_.getInt(0)).toSet == byDepth.keySet)
  }

  test("q432 dataset card fields match brute recomputation") {
    val docs = Tables.documents(spark, sf)
      .select("text", "source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val nDocs = docs.length.toLong
    val nTok = docs.map(_._1.split(" ", -1).length.toLong).sum
    def fp(t: String): String = {
      val joined = t.split(" ", -1).distinct.sorted.mkString(" ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(joined.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    }
    val nfp = docs.map(d => fp(d._1)).distinct.length.toLong
    val r = SparkEntry.queries("q432_dataset_card")(spark, sf).collect()(0)
    assert(r.getLong(0) == nDocs)
    assert(r.getLong(1) == docs.map(_._2).distinct.length.toLong)
    assert(r.getLong(2) == docs.map(_._3).distinct.length.toLong)
    assert(r.getLong(3) == nTok)
    assert(math.abs(r.getDouble(4) - (1.0 - nfp.toDouble / nDocs)) < 1e-5)
    assert(r.getLong(5) == nTok / nDocs)
    // entropy: positive, bounded by ln(n_langs)
    assert(r.getDouble(6) > 0.0 &&
      r.getDouble(6) <= math.log(r.getLong(2).toDouble) + 1e-4)
  }
}
