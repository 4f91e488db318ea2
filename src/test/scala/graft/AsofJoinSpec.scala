package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

/** As-of join semantics on crafted data: latest-version pick, the inclusive
  * boundary, unmatched lefts, and multi-column payload integrity. */
class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at or before each left ts") {
    val rates = Seq(
      ("a", t("2024-01-01 00:00:00"), 1.0, 101L),
      ("a", t("2024-01-10 00:00:00"), 2.0, 102L),
      ("a", t("2024-01-20 00:00:00"), 3.0, 103L),
      ("b", t("2024-01-05 00:00:00"), 9.0, 901L)
    ).toDF("k", "eff", "rate", "version")
    val events = Seq(
      (1L, "a", t("2024-01-09 23:59:59")), // version 1
      (2L, "a", t("2024-01-10 00:00:00")), // boundary: inclusive → version 2
      (3L, "a", t("2024-02-01 00:00:00")), // version 3
      (4L, "b", t("2024-01-04 00:00:00")), // before first b rate → null
      (5L, "c", t("2024-01-15 00:00:00"))  // key with no rates → null
    ).toDF("event_id", "k", "ets")
    val out = Joins.asofJoin(events, rates, "k", "ets", "eff",
      rightCols = Seq("rate", "version"))
      .select("event_id", "asof_rate", "asof_version")
      .as[(Long, Option[Double], Option[Long])].collect()
      .map { case (id, r, v) => id -> ((r, v)) }.toMap
    assert(out(1L) == ((Some(1.0), Some(101L))))
    assert(out(2L) == ((Some(2.0), Some(102L))))
    assert(out(3L) == ((Some(3.0), Some(103L))))
    assert(out(4L) == ((None, None)))
    assert(out(5L) == ((None, None)))
  }

  test("asofJoin equals a per-row reference model on random-ish data") {
    val rights = (0 until 200).map(i =>
      ((i % 7).toLong, t(f"2024-01-${i % 28 + 1}%02d 0${i % 9}:00:00"), i.toDouble))
    val lefts = (0 until 300).map(i =>
      (i.toLong, (i % 9).toLong, t(f"2024-01-${(i * 3) % 28 + 1}%02d 0${(i * 5) % 9}:30:00")))
    val rdf = rights.toDF("k", "eff", "rate")
      // dedup ties on (k, eff) to the max rate — the operator's documented
      // greatest-payload rule, applied up front so the model is simple
      .groupBy("k", "eff").agg(max("rate").as("rate"))
    val ldf = lefts.toDF("event_id", "k", "ets")
    val got = Joins.asofJoin(ldf, rdf, "k", "ets", "eff", rightCols = Seq("rate"))
      .select("event_id", "asof_rate")
      .as[(Long, Option[Double])].collect().toMap
    val rightsDeduped = rights.groupBy(r => (r._1, r._2))
      .map { case (_, vs) => vs.maxBy(_._3) }.toSeq
    lefts.foreach { case (id, k, ts) =>
      val want = rightsDeduped
        .filter(r => r._1 == k && !r._2.after(ts))
        .sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
      assert(got(id) == want, s"event $id key $k ts $ts")
    }
  }

  test("rangeJoin equals the naive theta join; handles multi-bucket and inverted intervals") {
    val events = (0L until 500L).map(i => (i, i * 13 % 1000)).toDF("event_id", "es")
    val intervals = Seq(
      (1L, 0L, 50L),     // within one bucket (width 60)
      (2L, 55L, 65L),    // straddles a bucket boundary
      (3L, 100L, 400L),  // spans many buckets
      (4L, 500L, 500L),  // empty (start == end)
      (5L, 700L, 600L),  // inverted -> matches nothing
      (6L, 990L, 2000L)  // extends past the data
    ).toDF("interval_id", "start_s", "end_s")
    val got = Joins.rangeJoin(events, "es", intervals, "start_s", "end_s",
        bucketSeconds = 60L)
      .select("event_id", "interval_id").as[(Long, Long)].collect().toSet
    val naive = events.join(intervals,
        col("es") >= col("start_s") && col("es") < col("end_s"))
      .select("event_id", "interval_id").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(!got.exists(p => p._2 == 4L || p._2 == 5L)) // degenerate intervals
    assert(got.exists(_._2 == 3L) && got.exists(_._2 == 6L))
    // no duplicate pairs from the bucket explode
    val withDupes = Joins.rangeJoin(events, "es", intervals, "start_s", "end_s", 60L)
      .groupBy("event_id", "interval_id").count().filter(col("count") > 1)
    assert(withDupes.isEmpty)
  }
}
