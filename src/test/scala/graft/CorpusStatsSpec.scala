package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Analyses, TextOps}

/** Corpus-composition statistics + per-key anomaly ops (q126-q130 family):
  * hand-computed fixtures so the arithmetic contracts (exact-decimal sums,
  * mirrored double trees, distribution-table percent_rank) are pinned
  * independently of the DuckDB oracle.
  */
class CorpusStatsSpec extends SparkSuite {
  import spark.implicits._

  test("sourceKlDivergence: identical distributions give KL 0; skew is signed-sum exact") {
    // A: tokens x x y (p = 2/3, 1/3); B: x y y (p = 1/3, 2/3); q = (1/2, 1/2)
    val docs = Seq(("A", "x x y"), ("B", "x y y")).toDF("source", "text")
    val out = TextOps.sourceKlDivergence(docs, "source", "text")
      .orderBy("source").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B"))
    assert(out.forall(_.getLong(1) == 3L))
    // KL = 2/3 ln(4/3) + 1/3 ln(2/3), per-term 6-dp rounded: 0.191788 - 0.135155
    assert(out.forall(r => math.abs(r.getDouble(2) - 0.056633) < 1e-9))

    val same = Seq(("A", "x y"), ("B", "x y")).toDF("source", "text")
    val klSame = TextOps.sourceKlDivergence(same, "source", "text").collect()
    assert(klSame.forall(_.getDouble(2) == 0.0))
  }

  test("contingencyChi2: 2x2 with uniform margins has expected 1.5 everywhere") {
    val df = (Seq.fill(2)(("a", "x")) ++ Seq(("a", "y"), ("b", "x")) ++
      Seq.fill(2)(("b", "y"))).toDF("lang", "source")
    val out = Analyses.contingencyChi2(df, "lang", "source").collect()
    assert(out.length == 4)
    assert(out.forall(_.getDouble(3) == 1.5))
    // (2-1.5)^2/1.5 == (1-1.5)^2/1.5 == 1/6
    assert(out.forall(_.getDouble(4) == 0.166667))
  }

  test("rateAnomalies: z from exact integer moments; var-0 and single-day keys excluded") {
    def day(d: Int) = ts(f"2024-01-$d%02d 00:00:00")
    // user 1: five 1-event days + one 13-event day -> mean 3, var 24, z = 10/sqrt(24)
    val spike = (1 to 5).map(d => (1L, day(d))) ++ Seq.fill(13)((1L, day(6)))
    // user 2: constant rate -> var 0 -> excluded; user 3: one day -> excluded
    val flat = (1 to 4).map(d => (2L, day(d)))
    val single = Seq.fill(7)((3L, day(1)))
    val ev = (spike ++ flat ++ single).toDF("user_id", "ts")
    val out = Analyses.rateAnomalies(ev, "user_id", "ts", zThresh = 2.0).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(2) == 13L)
    assert(r.getDouble(3) == math.rint(10.0 / math.sqrt(24.0) * 1e6) / 1e6)
  }

  test("trendSlope: exact-moment OLS on a hand line; degenerate keys excluded") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(1700000000000L + sec * 1000)
    val events = Seq(
      (1L, t(0), 1.0), (1L, t(10), 2.0), (1L, t(20), 3.0), // y = 1 + 0.1x
      (2L, t(5), 7.0), (2L, t(5), 9.0)                     // co-timestamped -> det 0
    ).toDF("user_id", "ts", "value")
    val got = Analyses.trendSlope(events, "user_id", "ts", "value")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 0.1, 1.0)), s"got $got")
  }

  test("markovTransitions: successor counts and row-normalized probabilities") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(1700000000000L + sec * 1000)
    val events = Seq(
      (1L, 1L, t(0), "A"), (2L, 1L, t(1), "B"), (3L, 1L, t(2), "A"), (4L, 1L, t(3), "B"),
      (5L, 2L, t(0), "A"), (6L, 2L, t(1), "C")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.operators.Relational.markovTransitions(
        events, "user_id", "ts", "event_type", tieBreak = col("event_id"))
      .as[(String, String, Long, Double)].collect().toSet
    // from A: B twice, C once (p 2/3, 1/3); from B: A once (p 1)
    assert(got == Set(("A", "B", 2L, 0.666667), ("A", "C", 1L, 0.333333),
      ("B", "A", 1L, 1.0)), s"got $got")
  }

  test("percentRankNormalize: distribution-table rewrite == percent_rank window, ties included") {
    val df = Seq(
      (1L, "en", 10L), (2L, "en", 10L), (3L, "en", 20L), (4L, "en", 30L),
      (5L, "fr", 5L), (6L, "fr", 5L), (7L, "fr", 5L),
      (8L, "de", 42L) // single-row group -> pr 0
    ).toDF("doc_id", "lang", "n_chars")
    val got = Analyses.percentRankNormalize(df, "lang", "n_chars")
      .select("doc_id", "pr").as[(Long, Double)].collect().toMap
    val want = df.select(col("doc_id"), round(
        percent_rank().over(Window.partitionBy($"lang").orderBy($"n_chars")), 6).as("pr"))
      .as[(Long, Double)].collect().toMap
    assert(got == want)
    assert(got(8L) == 0.0 && got(1L) == got(2L))
  }

  test("coPurchasePairs: within-basket counts, symmetric, top-k total order") {
    // baskets: {1,2,3}, {1,2}, {1,2}, {2,4}; duplicate line for (b1,1) must
    // not inflate counts (distinct at the (basket, item) grain)
    val baskets = Seq(
      (10L, 1L), (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L),
      (13L, 2L), (13L, 4L)
    ).toDF("ok", "item")
    val got = Analyses.coPurchasePairs(baskets, "ok", "item", k = 2)
      .select("item", "other", "n_co", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSet
    // co-counts: (1,2)=3, (1,3)=1, (2,3)=1, (2,4)=1
    val want = Set(
      (1L, 2L, 3L, 1L), (1L, 3L, 1L, 2L),
      (2L, 1L, 3L, 1L), (2L, 3L, 1L, 2L), // k=2 cuts (2,4): ties break other asc
      (3L, 1L, 1L, 1L), (3L, 2L, 1L, 2L),
      (4L, 2L, 1L, 1L))
    assert(got == want)
  }

  test("exactCorr: perfectly linear +1/-1, hand-computed mid value, degenerate excluded") {
    val df = Seq(
      ("up", 1.0, 2.0), ("up", 2.0, 4.0), ("up", 3.0, 6.0),     // y = 2x -> r 1
      ("dn", 1.0, 6.0), ("dn", 2.0, 4.0), ("dn", 3.0, 2.0),     // y = -2x -> r -1
      ("mid", 1.0, 1.0), ("mid", 2.0, 3.0), ("mid", 3.0, 2.0),  // r = 0.5
      ("flat", 1.0, 7.0), ("flat", 2.0, 7.0)                    // var(y)=0 -> excluded
    ).toDF("g", "x", "y")
    val got = Analyses.exactCorr(df, "g", "x", "y")
      .select("g", "n", "corr").as[(String, Long, Double)].collect()
      .map { case (g, n, r) => g -> (n, r) }.toMap
    assert(got == Map("up" -> (3L, 1.0), "dn" -> (3L, -1.0), "mid" -> (3L, 0.5)))
    assert(!got.contains("flat"))
  }

  test("skyline2D: dominance pruning, equal-pair survival, multiplicity") {
    // minimize x, maximize y. (1,5) and (3,9) are the frontier; (2,5) is
    // dominated by (1,5) (x strict), (4,9) by (3,9), (5,1) by everything.
    // The duplicate (1,5) row collapses into n=2.
    val df = Seq((1.0, 5), (1.0, 5), (2.0, 5), (3.0, 9), (4.0, 9), (5.0, 1))
      .toDF("x", "y")
    val got = Analyses.skyline2D(df, "x", "y")
      .as[(Double, Int, Long)].collect().toSet
    assert(got == Set((1.0, 5, 2L), (3.0, 9, 1L)))
  }

  test("weightedMedian: cumulative-weight cut, zero weights dropped") {
    val df = Seq(
      ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 8.0),  // total 10, cut at 3
      ("b", 1.0, 5.0), ("b", 9.0, 5.0),                   // tie: 2*5 >= 10 -> 1
      ("c", 7.0, 0.0), ("c", 4.0, 2.0)                    // zero-w row ignored
    ).toDF("g", "v", "w")
    val got = Analyses.weightedMedian(df, "g", "v", "w")
      .as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 3.0, "b" -> 1.0, "c" -> 4.0))
  }

  test("profileColumns: counts skip nulls, distinct exact, min/max per kind") {
    val df = Seq(
      (Some(1.0), Some("x")), (Some(2.0), None), (None, Some("a")),
      (Some(2.0), Some("x"))
    ).toDF("num", "str")
    val rows = Analyses.profileColumns(df, Seq("num"), Seq("str"))
      .collect().map(r => r.getString(0) -> r).toMap
    val n = rows("num"); val s = rows("str")
    assert(n.getLong(1) == 3 && n.getLong(2) == 2 &&
      n.getDouble(3) == 1.0 && n.getDouble(4) == 2.0 && n.isNullAt(5))
    assert(s.getLong(1) == 3 && s.getLong(2) == 2 &&
      s.isNullAt(3) && s.getString(5) == "a" && s.getString(6) == "x")
  }

  test("equiDepthHistogram: even split, heavy tie stays whole in its start bucket") {
    val even = (1 to 8).map(v => ("a", v.toDouble)).toDF("g", "v")
    val g1 = Analyses.equiDepthHistogram(even, "g", "v", buckets = 4)
      .select("bucket", "n_rows", "v_min", "v_max")
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(g1 == Set((0L, 2L, 1.0, 2.0), (1L, 2L, 3.0, 4.0),
      (2L, 2L, 5.0, 6.0), (3L, 2L, 7.0, 8.0)))
    // 10 copies of 1.0 + 2 copies of 2.0, B=2: the tie overfills bucket 0
    val skew = (Seq.fill(10)(1.0) ++ Seq.fill(2)(2.0)).map(("a", _)).toDF("g", "v")
    val g2 = Analyses.equiDepthHistogram(skew, "g", "v", buckets = 2)
      .select("bucket", "n_rows").as[(Long, Long)].collect().toSet
    assert(g2 == Set((0L, 10L), (1L, 2L)))
  }

  test("rollingCorr: perfect linear window = 1, single-row window = null, frame trails") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val df = Seq(
      ("k", ts(1), 1.0, 2.0), ("k", ts(2), 2.0, 4.0), ("k", ts(3), 3.0, 6.0),
      ("iso", ts(1), 5.0, 5.0) // single row -> n=1, vx=0 -> null
    ).toDF("key", "t", "x", "y")
    val got = Analyses.rollingCorr(df, "key", "t", "x", "y", windowDays = 30)
      .select("key", "t", "n_win", "r")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString.take(10),
        r.getLong(2), Option(r.get(3)))).toSet
    assert(got == Set(
      ("k", "2024-01-01", 1L, None),
      ("k", "2024-01-02", 2L, Some(1.0)),
      ("k", "2024-01-03", 3L, Some(1.0)),
      ("iso", "2024-01-01", 1L, None)))
  }

  test("associationRules: hand-computed support/confidence/lift, minCo prunes") {
    // baskets: {1,2} x3, {1,3} x1, {2,3} x1 -> N=5; co(1,2)=3, co(1,3)=1,
    // co(2,3)=1; minCo=2 keeps only the 1-2 rule pair
    val b = Seq((10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 2),
      (13, 1), (13, 3), (14, 2), (14, 3)).toDF("ok", "item")
    val got = Analyses.associationRules(b, "ok", "item", minCo = 2)
      .select("item", "other", "n_co", "support", "confidence", "lift")
      .as[(Int, Int, Long, Double, Double, Double)].collect().toSet
    // n_1 = 4, n_2 = 4: conf(1->2) = 3/4, lift = 3*5/(4*4) = 0.9375
    assert(got == Set(
      (1, 2, 3L, 0.6, 0.75, 0.9375),
      (2, 1, 3L, 0.6, 0.75, 0.9375)))
  }

  test("ohlcBars: open/close follow the (ts, tie) total order, day buckets split") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("k", ts("2024-01-01 09:00:00"), 5.0, 1L),
      ("k", ts("2024-01-01 09:00:00"), 3.0, 0L), // same ts: tie-break opens
      ("k", ts("2024-01-01 17:00:00"), 9.0, 2L),
      ("k", ts("2024-01-02 10:00:00"), 7.0, 3L)  // next day -> own bar
    ).toDF("key", "t", "v", "id")
    val got = Analyses.ohlcBars(df, "key", "t", "v", col("id"))
      .select("key", "day", "open", "high", "low", "close", "n_events")
      .collect().map(r => (r.getDate(1).toString, r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
    assert(got == Set(
      ("2024-01-01", 3.0, 9.0, 3.0, 9.0, 3L),
      ("2024-01-02", 7.0, 7.0, 7.0, 7.0, 1L)))
  }

  test("maxConcurrent: sweep peak, half-open touching intervals don't stack") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // k: [9,11) [10,12) [10,13) overlap 3 at 10:00..11:00; m: [9,10) [10,11)
    // touch exactly -> peak 1 (half-open)
    val df = Seq(
      ("k", ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00")),
      ("k", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      ("k", ts("2024-01-01 10:00:00"), ts("2024-01-01 13:00:00")),
      ("m", ts("2024-01-01 09:00:00"), ts("2024-01-01 10:00:00")),
      ("m", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("key", "s", "e")
    val got = Analyses.maxConcurrent(df, "key", col("s"), col("e"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("k" -> 3L, "m" -> 1L), s"got $got")
  }

  test("paretoClass: 80/95 cuts on cumulative share, desc-value order") {
    // values 80, 10, 6, 4 (total 100): cum 80(A), 90(B), 96(C), 100(C)
    val df = Seq((1, 80.0), (2, 10.0), (3, 6.0), (4, 4.0)).toDF("k", "v")
    val got = Analyses.paretoClass(df, "k", "v", nGroups = 3)
      .as[(Int, Double, String)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(1 -> "A", 2 -> "B", 3 -> "C", 4 -> "C"), s"got $got")
  }

  test("giniByGroup: equal values = 0, extreme concentration near (n-1)/n") {
    val df = Seq(("u", 5.0, 1L), ("u", 5.0, 2L), ("u", 5.0, 3L), ("u", 5.0, 4L),
      ("w", 0.01, 1L), ("w", 0.01, 2L), ("w", 0.01, 3L), ("w", 99.97, 4L))
      .toDF("g", "v", "id")
    val got = Analyses.giniByGroup(df, "g", "v", col("id"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got("u") == 0.0)
    // w: sorted .01,.01,.01,99.97; S1=.01+.02+.03+4*99.97=399.94
    // G=(2*399.94-5*100)/(4*100)=299.88/400=.7497
    assert(math.abs(got("w") - 0.7497) < 1e-12, s"got $got")
  }

  test("winsorizedMean: clip at exact percentiles, outlier pulled in") {
    // group g: 1..9 plus outlier 1000; interpolated p10 = 1.9 and
    // p90 = 9 + 0.1·(1000−9) = 108.1 (the hi cut interpolates TOWARD the
    // outlier — winsorizing tames it, it doesn't erase it)
    val df = ((1 to 9).map(i => ("g", i.toDouble)) :+ ("g", 1000.0)).toDF("k", "v")
    val got = Analyses.winsorizedMean(df, "k", "v", 0.1, 0.9)
      .select("n", "p_lo", "p_hi", "winsorized_mean").as[(Long, Double, Double, Double)]
      .collect().head
    // clipped: 1.9, 2..9, 108.1 -> sum = 1.9 + 44 + 108.1 = 154 -> mean 15.4
    assert(got == ((10L, 1.9, 108.1, 15.4)), s"got $got")
  }

  test("kaplanMeier: textbook curve with censoring, final d=r hits zero") {
    // durations: 1(event), 2(censored), 3(event), 3(event)
    // t=1: d=1 r=4 -> S=0.75; t=2: d=0 r=3 -> S=0.75; t=3: d=2 r=2 -> S=0
    val df = Seq(("a", 1L, 1), ("a", 2L, 0), ("a", 3L, 1), ("a", 3L, 1))
      .toDF("g", "dur", "ev")
    val got = Analyses.kaplanMeier(df, "g", "dur", "ev")
      .select("t", "d", "r", "survival").as[(Long, Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 4L, 0.75), (2L, 0L, 3L, 0.75),
      (3L, 2L, 2L, 0.0)), s"got $got")
  }

  test("naiveBayesScore: separable two-class corpus self-classifies") {
    val docs = Seq((1L, "x x x", "A"), (2L, "x x y", "A"),
      (3L, "z z z", "B"), (4L, "z z y", "B")).toDF("doc_id", "text", "lang")
    val got = TextOps.naiveBayesScore(docs, "doc_id", "text", "lang")
      .select("doc_id", "pred_class").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "B"), s"got $got")
  }

  test("groupEntropy: uniform k-way = ln k, single-category = 0") {
    val df = Seq(("u", "a"), ("u", "b"), ("u", "c"), ("u", "d"),
      ("v", "a"), ("v", "a")).toDF("g", "cat")
    val got = Analyses.groupEntropy(df, "g", "cat")
      .select("g", "n_events", "n_cats", "entropy")
      .as[(String, Long, Long, Double)].collect().toSet
    // uniform over 4: 4 * round(0.25*ln 4, 6) = 4*0.346574 = 1.386296
    assert(got == Set(("u", 4L, 4L, 1.386296), ("v", 2L, 1L, 0.0)))
  }

  test("dsirSelect: weights equal the independent LM recomputation; " +
       "short docs drop; ties break by id; rank is 1..k") {
    val dim = 16
    val target = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the log"),
      (3L, "en", "cat and dog sat"))
    val pool = Seq(
      (10L, "zz", "the cat sat on the mat today"),
      (11L, "zz", "quantum flux capacitor array"),
      (12L, "zz", "the dog sat"),
      (13L, "zz", "the dog sat"), // identical text → tie with 12, id order
      (14L, "zz", "single"))      // <2 tokens → no bigram, never selected
    val docs = (target ++ pool).toDF("doc_id", "lang", "text")
    val got = TextOps.dsirSelect(docs, "doc_id", "text",
        isTarget = col("lang") === "en", dim = dim, k = 3)
      .select("doc_id", "weight", "rank")
      .as[(Long, Double, Long)].collect().toSeq

    // independent recomputation of the whole formula (the oracle's tree)
    def bucket(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % dim
    }
    def grams(t: String): Seq[String] = {
      val w = t.split(" ", -1).toSeq
      if (w.length < 2) Seq.empty else w.sliding(2).map(_.mkString(" ")).toSeq
    }
    val tCnt = target.flatMap(d => grams(d._3)).groupBy(bucket)
      .map { case (b, gs) => b -> gs.size.toLong }
    val pCnt = pool.flatMap(d => grams(d._3)).groupBy(bucket)
      .map { case (b, gs) => b -> gs.size.toLong }
    val (tt, pt) = (tCnt.values.sum, pCnt.values.sum)
    def lr(b: Long): Double = math.log(
      ((tCnt.getOrElse(b, 0L) + 1).toDouble * (pt + dim).toDouble) /
      ((pCnt.getOrElse(b, 0L) + 1).toDouble * (tt + dim).toDouble))
    def weight(t: String): Double =
      grams(t).groupBy(bucket).map { case (b, gs) =>
        java.math.BigDecimal.valueOf(gs.size.toDouble * lr(b))
          .setScale(6, java.math.RoundingMode.HALF_UP)
      }.reduce(_ add _).doubleValue
    val expected = pool.filter(d => grams(d._3).nonEmpty)
      .map(d => (d._1, weight(d._3)))
      .sortBy { case (id, w) => (-w, id) }.take(3)
      .zipWithIndex.map { case ((id, w), i) => (id, w, (i + 1).toLong) }
    assert(got == expected, s"got $got, expected $expected")
    // the tie pair got identical weights and the lower id ranks first
    val w12 = weight("the dog sat")
    assert(expected.count(_._2 == w12) >= 1)
    assert(!got.exists(_._1 == 14L))
  }

  test("dsirSelect edges: empty pool → empty output; empty target → uniform-smoothed LM still ranks") {
    val docs = Seq((1L, "en", "a b c"), (2L, "en", "d e f"))
      .toDF("doc_id", "lang", "text")
    // everything is target → nothing to select from
    assert(TextOps.dsirSelect(docs, "doc_id", "text",
      isTarget = col("lang") === "en", dim = 16, k = 5).count() == 0)
    // nothing is target → the target LM is the pure add-1 uniform; the
    // selection must still be well-defined (no nulls, ranks 1..n)
    val got = TextOps.dsirSelect(docs, "doc_id", "text",
        isTarget = col("lang") === "xx", dim = 16, k = 5)
      .select("doc_id", "weight", "rank")
      .as[(Long, Double, Long)].collect().sortBy(_._3)
    assert(got.length == 2 && got.map(_._3).toSeq == Seq(1L, 2L))
    assert(got.forall(r => !r._2.isNaN && !r._2.isInfinite))
  }
}
