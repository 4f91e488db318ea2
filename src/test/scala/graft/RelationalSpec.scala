package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational => R}

/** SURVEY §5.3/§5.4 — per-operator units + the pagination/validation
  * invariants the reference encodes (shared/utils/__init__.py:161-172,
  * init.sql CHECK constraints). */
class RelationalSpec extends SparkSuite {
  import spark.implicits._

  lazy val users = Seq(
    ("u1", "a@x.com", "alice", "admin", true, ts("2024-01-01 00:00:00")),
    ("u2", "b@x.com", "bob", "viewer", true, ts("2024-01-02 00:00:00")),
    ("u3", "c@x.com", "carol", "analyst", false, ts("2024-01-03 00:00:00")),
    ("u4", "not-an-email", "dave", "viewer", true, ts("2024-01-04 00:00:00"))
  ).toDF("id", "email", "username", "role", "is_active", "created_at")

  test("P1 point lookup returns exactly the keyed row") {
    assert(R.pointLookup(users, "id", "u2").select("username").as[String].collect().toSeq == Seq("bob"))
  }

  test("P3 OR-lookup matches either column with the same input") {
    assert(R.orLookup(users, "alice", "username", "email").count() == 1)
    assert(R.orLookup(users, "b@x.com", "username", "email").count() == 1)
    assert(R.orLookup(users, "nobody", "username", "email").count() == 0)
  }

  test("P4 optional filter is identity on None") {
    assert(R.optionalFilter(users, "is_active", None).count() == 4)
    assert(R.optionalFilter(users, "is_active", Some(true)).count() == 3)
  }

  test("P9 email regex accepts valid, rejects invalid") {
    val ok = users.filter(col("email").rlike(R.EmailRe)).select("id").as[String].collect().toSet
    assert(ok == Set("u1", "u2", "u3"))
  }

  test("P13 quarantine splits rows exactly, nulls routed to quarantine") {
    val df = Seq(Some(5), Some(15), None).toDF("priority")
    val (valid, bad) = R.quarantine(df, col("priority").between(1, 10))
    assert(valid.count() == 1 && bad.count() == 2)
  }

  test("L1/L2 pagination partitions the ordered set exactly (no dup, no gap)") {
    val df = (1 to 57).map(i => (i.toLong, s"row$i")).toDF("k", "v")
    val size = 10
    val pages = (1 to 6).flatMap(p =>
      R.page(df, p, size, col("k").asc).select("k").as[Long].collect())
    assert(pages == (1L to 57L))
    // page past the end is empty
    assert(R.page(df, 7, size, col("k").asc).count() == 0)
    // meta: ceil-division page count (reference utils:163)
    val meta = R.paginationMeta(df, size).as[(Long, Long)].collect().head
    assert(meta == ((57L, 6L)))
  }

  test("keyset pagination equals offset pagination on a unique key") {
    val df = (1 to 30).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val page2Offset = R.page(df, 2, 10, col("k").asc).select("k").as[Long].collect().toSeq
    val page2Keyset = R.keysetPage(df, "k", Some(10L), 10).select("k").as[Long].collect().toSeq
    assert(page2Offset == page2Keyset)
  }

  test("L4 topK returns k rows in order with deterministic tie-break") {
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 1.0)).toDF("id", "priority")
    val top = R.topK(df, 2, col("priority").desc, col("id").asc).select("id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L))
  }

  test("W1 latestPerKey picks the maximal (ts, id) row per key") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "pending"),
      (2L, ts("2024-01-01 11:00:00"), 7L, "completed"),
      (3L, ts("2024-01-01 11:00:00"), 8L, "failed")
    ).toDF("event_id", "ts", "task_id", "status")
    val latest = R.latestPerKey(ev, "task_id", col("ts"), col("event_id"))
      .select("task_id", "status").as[(Long, String)].collect().toMap
    assert(latest == Map(7L -> "completed", 8L -> "failed"))
  }

  test("A3 bbox contains every input point (per group)") {
    val pts = Seq(("a", -10.0, 5.0), ("a", 20.0, -3.0), ("b", 0.0, 0.0))
      .toDF("g", "lon", "lat")
    val bb = R.bboxAgg(pts, Seq("g"), col("lon"), col("lat"))
    val joined = pts.join(bb, "g").filter(
      col("lon") < col("min_lon") || col("lon") > col("max_lon") ||
      col("lat") < col("min_lat") || col("lat") > col("max_lat"))
    assert(joined.count() == 0)
  }

  test("uniqueness audit finds duplicate keys only") {
    val df = Seq(("a@x", 1), ("a@x", 2), ("b@x", 3)).toDF("email", "n")
    val dups = R.duplicateKeys(df, "email").select("email").as[String].collect().toSeq
    assert(dups == Seq("a@x"))
  }

  test("sessionize: gap threshold splits sessions per key, 1-based and monotone") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L), // u7 s1
      (2L, ts("2024-01-01 10:20:00"), 7L), // +20m  -> s1
      (3L, ts("2024-01-01 11:00:00"), 7L), // +40m  -> s2
      (4L, ts("2024-01-01 11:30:00"), 7L), // +30m exactly = gap, NOT > gap -> s2
      (5L, ts("2024-01-01 13:00:00"), 7L), // +90m  -> s3
      (6L, ts("2024-01-01 10:00:00"), 8L)  // other user -> own s1
    ).toDF("event_id", "ts", "user_id")
    val got = R.sessionize(ev, "user_id", "ts", gapSeconds = 1800, tieBreak = col("event_id"))
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L, 6L -> 1L))
  }

  test("resampleFfill: per-key grid, last-in-bucket wins, gaps carry forward") {
    // user 1: obs in buckets 0 (two values - later es wins), 3; buckets 1-2
    // must carry 20.0 forward. user 2: single bucket.
    val ev = Seq(
      (1L, 5L, 1L, 10.0), (2L, 50L, 1L, 20.0),  // bucket 0: es=50 wins
      (3L, 310L, 1L, 40.0),                     // bucket 3
      (4L, 120L, 2L, 7.0)                       // user 2, bucket 1
    ).toDF("event_id", "es", "user_id", "value")
    val out = R.resampleFfill(ev, "user_id", col("es"), col("value"),
        col("event_id"), stepSeconds = 100L)
      .select("user_id", "bucket_start", "value_ffill", "observed")
      .as[(Long, Long, Double, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 0L, 20.0, true), (1L, 100L, 20.0, false), (1L, 200L, 20.0, false),
      (1L, 300L, 40.0, true), (2L, 100L, 7.0, true)))
  }

  test("scd2: value runs collapse to validity intervals; re-emissions stay one row") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val events = Seq(
      (1L, 10L, ts(0), "pending"),
      (1L, 11L, ts(1), "pending"),  // re-emission: same run
      (1L, 12L, ts(2), "running"),
      (1L, 13L, ts(3), "pending"),  // value RETURNS: new run, not merged
      (2L, 20L, ts(5), "done")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = operators.Relational.scd2(events, "user_id", "ts", "event_type",
        tieBreak = col("event_id"))
      .orderBy("user_id", "valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "pending", ts(0), Some(ts(2)), false),
      (1L, "running", ts(2), Some(ts(3)), false),
      (1L, "pending", ts(3), None, true),
      (2L, "done", ts(5), None, true)), s"got $got")
  }

  test("funnel: order-sensitive depth counts (purchase before view must not count)") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val events = Seq(
      // u1 completes the funnel in order
      (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(9)),
      // u2 purchases BEFORE viewing: depth stops at click
      (2L, "purchase", ts(0)), (2L, "view", ts(1)), (2L, "click", ts(2)),
      // u3 only views; u4 clicks without ever viewing (depth 0)
      (3L, "view", ts(3)), (4L, "click", ts(4)),
      // u5: click exactly AT the view instant is not strictly after
      (5L, "view", ts(7)), (5L, "click", ts(7))
    ).toDF("user_id", "event_type", "ts")
    val got = operators.Relational.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(1 -> 4L, 2 -> 2L, 3 -> 1L), s"got $got") // views: u1,u2,u3,u5
  }

  test("timeWeightedAvg: duration weights, last event dropped, degenerate keys excluded") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(1700000000000L + sec * 1000)
    val events = Seq(
      // u1: 10s @ 10.0, then 30s @ 20.0 -> twap (100+600)/40 = 17.5
      (1L, 1L, t(0), 10.0), (2L, 1L, t(10), 20.0), (3L, 1L, t(40), 30.0),
      // u2: two co-timestamped events -> span 0 -> excluded
      (4L, 2L, t(0), 1.0), (5L, 2L, t(0), 2.0),
      // u3: single event -> no interval -> excluded
      (6L, 3L, t(0), 9.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = operators.Relational.timeWeightedAvg(events, "user_id", "ts", "value",
        tieBreak = col("event_id"))
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 40000000L, 17.5)), s"got ${got.toSeq}")
  }

  test("cohortRetention: epoch-week cohorts and offsets, distinct users") {
    import java.sql.Timestamp
    val week = 604800L * 1000
    val base = 1700006400000L // some instant; absolute cohort ids don't matter
    def ts(w: Int, off: Long = 0L) = new Timestamp(base + w * week + off)
    val events = Seq(
      (1L, ts(0)), (1L, ts(0, 1000)), (1L, ts(2)), // u1: cohort w0, active w0+w2
      (2L, ts(0)), (2L, ts(1)),                    // u2: cohort w0, active w0+w1
      (3L, ts(1))                                  // u3: cohort w1 only
    ).toDF("user_id", "ts")
    val byOffset = operators.Relational.cohortRetention(events, "user_id", "ts")
      .as[(Long, Long, Long)].collect()
    val c0 = byOffset.map(_._1).min
    val norm = byOffset.map { case (c, o, n) => ((c - c0, o), n) }.toMap
    assert(norm == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L, (1L, 0L) -> 1L),
      s"got $norm")
  }

  test("rollingActiveUsers: window-end contribution, observed days only") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00")), // u1 active day 1
      (2L, ts("2024-01-03 09:00:00")), // u2 active day 3
      (1L, ts("2024-01-03 18:00:00")), // u1 again day 3
      (3L, ts("2024-01-20 00:00:00"))  // far-away singleton
    ).toDF("user_id", "ts")
    val got = operators.Relational.rollingActiveUsers(events, "user_id", "ts", windowDays = 3)
      .as[(java.sql.Date, Long)].collect().map(r => r._1.toString -> r._2).toMap
    // day 1 window {d-2..d1}: u1; day 3 window {d1..d3}: u1(d1,d3)+u2 = 2;
    // day 20: u3 only; days 2,4.. not observed -> absent
    assert(got == Map("2024-01-01" -> 1L, "2024-01-03" -> 2L, "2024-01-20" -> 1L),
      s"got $got")
  }

  test("activityStreaks: islands split on gaps, multiple events per day collapse") {
    val events = Seq(
      // u1: days 1,2,3 (streak 3), gap, 5,6 (streak 2); duplicate events on day 2
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-02 17:00:00")), (1L, ts("2024-01-03 09:00:00")),
      (1L, ts("2024-01-05 09:00:00")), (1L, ts("2024-01-06 09:00:00")),
      // u2: one isolated day
      (2L, ts("2024-02-01 00:00:00"))
    ).toDF("user_id", "ts")
    val got = R.activityStreaks(events, "user_id", "ts")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(1L -> ((3L, 2L, 5L)), 2L -> ((1L, 1L, 1L))), s"got $got")
  }

  test("touchAttribution: first/last in horizon, boundary included, none -> null") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L, "click"),
      (2L, ts("2024-01-03 09:00:00"), 5L, "click"),
      (3L, ts("2024-01-03 12:00:00"), 5L, "purchase"), // both touches in 7d
      (4L, ts("2024-02-20 12:00:00"), 5L, "purchase"), // no touch in window
      (5L, ts("2024-01-01 08:00:00"), 6L, "click"),
      (6L, ts("2024-01-08 08:00:00"), 6L, "purchase")  // exactly 7d: included
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = R.touchAttribution(ev, "user_id", "ts", "event_type", "event_id",
        "purchase", "click", 7L * 24 * 3600)
      .select("conv_id", "first_touch_id", "last_touch_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((3L, 1L, 2L), (4L, -1L, -1L), (6L, 5L, 5L)), s"got $got")
  }
}
