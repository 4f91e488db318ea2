package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analyses, Graph, Sketches, TextOps}

/** Unit goldens for the round-6 operators (their end-to-end gates are
  * q286–q297): time-series ACF/MASE, rank statistics, effect size,
  * log-domain means, RFM bucketing, the count-min / KMV sketch audits,
  * k-core peeling and the Zipf fit. Each golden is hand-computed. */
class Round6OpsSpec extends SparkSuite {
  import spark.implicits._

  private def day(s: String): java.sql.Date = java.sql.Date.valueOf(s)

  test("acfByLag: period-2 series gives acf(1)=-7/8, acf(2)=3/4") {
    // 8 consecutive days alternating 1,3: mean 2, Σ(v−m)² = 8;
    // lag1: 7 pairs each (±1)(∓1) = −1 → −7/8; lag2: 6 pairs each +1 → 6/8
    val vals = Seq(1.0, 3.0, 1.0, 3.0, 1.0, 3.0, 1.0, 3.0)
    val daily = vals.zipWithIndex
      .map { case (v, i) => (day(f"2024-01-${i + 1}%02d"), v) }
      .toDF("day", "v")
    val out = Analyses.acfByLag(daily, "day", "v", maxLag = 2)
      .orderBy("lag").as[(Int, Long, Double)].collect()
    assert(out.toSeq == Seq((1, 7L, -0.875), (2, 6L, 0.75)))
  }

  test("maseSeasonalNaive: exact weekly periodicity → mase = 0") {
    // 21 days, value = dow index (period 7): seasonal error 0, naive error > 0
    val daily = (0 until 21)
      .map(i => ("k", day(f"2024-03-${i + 1}%02d"), (i % 7 + 1).toDouble))
      .toDF("k", "day", "v")
    val out = Analyses.maseSeasonalNaive(daily, "k", "day", "v", season = 7)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.length == 1)
    val (_, n7, maeS, mae1, mase) = out.head
    assert(n7 == 14L && maeS == 0.0 && mae1 > 0 && mase == 0.0)
  }

  test("spearmanRho: invariant under monotone transforms, sign under reversal") {
    val df = Seq.tabulate(10)(i => ("g", i.toDouble, math.pow(i + 1, 3)))
      .toDF("g", "x", "y")
    val up = Analyses.spearmanRho(df, "g", col("x"), col("y"))
      .select("rho").as[Double].head()
    assert(up == 1.0)
    val down = Analyses.spearmanRho(
      df.withColumn("y", -col("y")), "g", col("x"), col("y"))
      .select("rho").as[Double].head()
    assert(down == -1.0)
  }

  test("mannWhitneyU: textbook 2-vs-2 separation golden") {
    // A = {1,2} (arm 0), B = {3,4} (arm 1): U_B = (3+4) − 3 = 4;
    // z = (4 − 2)/sqrt(4/12·5) = 2/1.290994 = 1.549193
    val df = Seq(("g", 0L, 1.0), ("g", 0L, 2.0), ("g", 1L, 3.0), ("g", 1L, 4.0))
      .toDF("g", "u", "v")
    val out = Analyses.mannWhitneyU(df, "g", col("u") % 2 === 1, col("v"))
      .as[(String, Long, Long, Double, Double)].head()
    assert(out == (("g", 2L, 2L, 4.0, 1.549193)))
  }

  test("cramersV: 1.0 on perfect association, 0.0 on independence") {
    val perfect = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("b", "y")))
      .toDF("r", "c")
    assert(Analyses.cramersV(perfect, "r", "c")
      .select("cramers_v").as[Double].head() == 1.0)
    val indep = (for { r <- Seq("a", "b"); c <- Seq("x", "y") }
      yield Seq.fill(3)((r, c))).flatten.toDF("r", "c")
    assert(Analyses.cramersV(indep, "r", "c")
      .select("cramers_v").as[Double].head() == 0.0)
  }

  test("logMeans: geo/harmonic goldens; non-positive values excluded") {
    val df = Seq(("g", 2.0), ("g", 8.0), ("g", -1.0), ("g", 0.0)).toDF("g", "v")
    val (n, geo, harm) = Analyses.logMeans(df, "g", col("v"))
      .select("n", "geo_mean", "harmonic_mean")
      .as[(Long, Double, Double)].head()
    assert(n == 2L)
    assert(math.abs(geo - 4.0) < 1e-5)   // exp((ln2+ln8)/2) = 4
    assert(harm == 3.2)                  // 2/(1/2 + 1/8)
  }

  test("rfmSegments: distinct 1..10 metrics land 2 per quintile (ties low)") {
    // 10 customers, frequency 1..10 (one order per day streak): quantile
    // cuts 2.8/4.6/6.4/8.2 → strict > puts {1,2},{3,4},{5,6},{7,8},{9,10}
    val orders = (1 to 10).flatMap { c =>
      (0 until c).map(i => (c.toLong, s"2024-02-${10 + i} 00:00:00", 100.0 * c))
    }.toDF("cust", "d", "amt")
      .withColumn("d", to_timestamp(col("d")))
    val out = Analyses.rfmSegments(orders, "cust", "d", "amt")
    val fq = out.groupBy("f_q").count().orderBy("f_q")
      .as[(Int, Long)].collect()
    assert(fq.toSeq == Seq((1, 2L), (2, 2L), (3, 2L), (4, 2L), (5, 2L)))
    // monetary is total spend = 100·c·c, strictly increasing in c → same split
    val mq = out.groupBy("m_q").count().orderBy("m_q")
      .as[(Int, Long)].collect()
    assert(mq.toSeq == Seq((1, 2L), (2, 2L), (3, 2L), (4, 2L), (5, 2L)))
  }

  test("countMinAudit: estimate >= exact always; exact when width is ample") {
    val df = (Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c"))
      .toDF("k")
    val wide = Sketches.countMinAudit(df, col("k"), depth = 2, width = 4096,
      topN = 10).as[(String, Long, Long, Long)].collect()
    assert(wide.forall { case (_, exact, est, over) =>
      est >= exact && over == est - exact })
    assert(wide.forall { case (_, exact, est, _) => est == exact })
    val narrow = Sketches.countMinAudit(df, col("k"), depth = 2, width = 2,
      topN = 10).as[(String, Long, Long, Long)].collect()
    assert(narrow.forall { case (_, exact, est, _) => est >= exact })
  }

  test("kmvIntersectAudit: under-full sketches are exact by construction") {
    val df = (Seq.tabulate(20)(i => ("A", i)) ++
      Seq.tabulate(20)(i => ("B", i + 15))).toDF("s", "m")
    val out = Sketches.kmvIntersectAudit(df, col("s"), col("m"), k = 128)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.length == 1)
    val (_, _, na, nb, exact, est) = out.head
    assert(na == 20L && nb == 20L && exact == 5L && est == 5.0)
  }

  test("kCorePeel: triangle survives 2-core, pendant and path peel away") {
    val und = Seq(("a", "b"), ("b", "c"), ("c", "a"), // triangle
      ("c", "d"), ("d", "e")) // pendant path
    val edges = und.toDF("src", "dst")
      .unionByName(und.map(_.swap).toDF("src", "dst"))
    val out = Graph.kCorePeel(edges, k = 2, rounds = 4)
      .orderBy("node").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("a", 2L), ("b", 2L), ("c", 2L)))
    val path = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val sym = path.unionByName(path.select(col("dst").as("src"), col("src").as("dst")))
    assert(Graph.kCorePeel(sym, k = 2, rounds = 3).count() == 0L)
  }

  test("jaroWinkler: textbook goldens and edge cases") {
    import graft.functions.JaroWinkler
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(jw("", "") == 1.0 && jw("a", "") == 0.0 && jw("", "a") == 0.0)
    assert(jw("same", "same") == 1.0)
    // boost only above 0.7: a low-jaro pair with a shared prefix stays raw
    assert(jw("abcdefgh", "abzzzzzz") < 0.75)
  }

  test("fuzzyBlockMatch: dropped-char probes resolve to their source name") {
    import graft.operators.Dedup
    val clean = Seq("small ring", "red widget", "blue bolt", "hot gear")
      .toDF("name")
    val dirty = Seq((1L, "smal ring"), (2L, "red wdget"), (3L, "blue blt"))
      .toDF("id", "dname")
    val out = Dedup.fuzzyBlockMatch(dirty, "id", "dname", clean, "name",
      minSim = 0.85).orderBy("id")
      .select("id", "matched_name").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "small ring"), (2L, "red widget"),
      (3L, "blue bolt")))
  }

  test("damerauLevenshtein: unrestricted variant (CA→ABC = 2, not OSA's 3)") {
    import graft.functions.DamerauLevenshtein
    import org.apache.spark.unsafe.types.UTF8String
    def dl(a: String, b: String): Long =
      DamerauLevenshtein.compute(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(dl("CA", "ABC") == 2L)         // the OSA restriction would say 3
    assert(dl("MARTHA", "MARHTA") == 1L)  // one transposition
    assert(dl("kitten", "sitting") == 3L)
    assert(dl("", "abc") == 3L && dl("abc", "") == 3L && dl("", "") == 0L)
    assert(dl("ab", "ba") == 1L && dl("same", "same") == 0L)
  }

  test("interarrivalStats: metronome gaps give burstiness -1") {
    val rows = (0 until 5).map(i =>
      (i.toLong, ts(f"2024-01-01 10:0$i:00"), 7L, "tick", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analyses.interarrivalStats(rows, "event_type", "user_id", "ts",
      col("event_id")).as[(String, Long, Double, Double, Double)].head()
    assert(out == (("tick", 4L, 60.0, 0.0, -1.0)))
  }

  test("gumbelBlockMaxima: two equal maxima give sd 0, mu = mean") {
    val daily = Seq(
      (day("2024-01-05"), 10.0), (day("2024-01-20"), 50.0),
      (day("2024-02-10"), 50.0), (day("2024-02-11"), 30.0))
      .toDF("day", "v")
    val (n, mean, sd, beta, mu) = Analyses.gumbelBlockMaxima(daily, "day", "v")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(n == 2L && mean == 50.0 && sd == 0.0 && beta == 0.0 && mu == 50.0)
  }

  test("compactionPlan: start-offset bins pack to the target") {
    import graft.sources.Sources
    val files = Seq(("p", 1, 300L), ("p", 2, 300L), ("p", 3, 300L),
      ("p", 4, 1200L), ("p", 5, 100L)).toDF("part", "ord", "bytes")
    val out = Sources.compactionPlan(files, Seq("part"), col("ord"),
      col("bytes"), targetBytes = 500L)
      .orderBy("ord").select("bin").as[Long].collect()
    // cum-before: 0,300,600,900,2100 → bins 0,0,1,1,4
    assert(out.toSeq == Seq(0L, 0L, 1L, 1L, 4L))
  }

  test("giniStump: perfect separator found with gini 0") {
    val df = (1 to 10).map(i => (i.toDouble, if (i > 5) 1 else 0))
      .toDF("x", "y")
    val out = Analyses.giniStump(df, Seq("x" -> col("x")), col("y"))
      .select("feature", "threshold", "gini", "n_left", "n_right")
      .as[(String, Double, Double, Long, Long)].head()
    assert(out == (("x", 5.0, 0.0, 5L, 5L)))
  }

  test("lDiversityAudit: uniform sensitive value fails, balanced passes") {
    val df = (Seq.fill(6)(("g1", "s")) ++
      Seq.tabulate(6)(i => ("g2", if (i % 2 == 0) "a" else "b")))
      .toDF("qi", "sens")
    val out = Analyses.lDiversityAudit(df, Seq("qi"), col("sens"), minL = 2)
      .orderBy("qi")
      .select("qi", "n", "l_distinct", "entropy_l", "diverse")
      .as[(String, Long, Long, Double, Int)].collect()
    // 2.000002, not 2.0: per-term rounding (q162 discipline) rounds
    // −0.5·ln(0.5) = 0.3465736 up to 0.346574 before the exp
    assert(out.toSeq == Seq(("g1", 6L, 1L, 1.0, 0), ("g2", 6L, 2L, 2.000002, 1)))
  }

  test("busDayIndex: Mon–Fri counting skips weekends") {
    import graft.functions.Scalars
    val df = Seq(
      ("2024-01-01", "2024-01-08"), // Mon → next Mon: 5 business days
      ("2024-01-05", "2024-01-08"), // Fri → Mon: 1
      ("2024-01-06", "2024-01-07")  // Sat → Sun: 0
    ).toDF("a", "b")
      .select(
        (Scalars.busDayIndex(to_date(col("b"))) -
          Scalars.busDayIndex(to_date(col("a")))).as("bd"))
    assert(df.as[Long].collect().toSeq == Seq(5L, 1L, 0L))
  }

  test("logisticIrls: separable feature gets a positive weight, beats chance") {
    // x2 must VARY: a constant feature is collinear with the intercept and
    // the Newton solve correctly refuses the singular Hessian
    val df = (1 to 200).map { i =>
      val x1 = (i % 10).toDouble / 10.0
      val x2 = ((i * 7) % 10).toDouble / 10.0
      (x1, x2, if (x1 > 0.5) 1 else 0)
    }.toDF("x1", "x2", "y")
    val (n, b1, ll) = Analyses.logisticIrls(df, col("x1"), col("x2"),
      col("y") === 1, iters = 3)
      .select("n", "b1", "log_likelihood").as[(Long, Double, Double)].head()
    assert(n == 200L)
    assert(b1 > 1.0) // strongly positive slope on the separating feature
    assert(ll > 200.0 * math.log(0.5)) // better than coin-flip likelihood
  }

  test("DHash64: BMP round-trip matches the pixel formula; junk rejected") {
    import graft.functions.DHash64
    for (seed <- Seq(0L, 1L, 7L, 255L, 256L, 123456789L)) {
      val got = DHash64.compute(DHash64.buildBmp(seed))
      var want = 0L
      for (r <- 0 until 8; c <- 0 until 8) {
        def g(cc: Int) = (seed * 31 + r * 17 + cc * 13) % 256
        if (g(c) > g(c + 1)) want |= 1L << (r * 8 + c)
      }
      assert(got == want, s"seed $seed")
    }
    // seeds 256 apart produce identical pixels → identical hashes
    assert(DHash64.compute(DHash64.buildBmp(3L)) ==
      DHash64.compute(DHash64.buildBmp(3L + 256L * 31)))
    // hostile-bytes contract (round-8): junk is NULL, never a task-killing
    // throw — and a lying dataOff in a valid header must not read OOB
    assert(DHash64.compute(Array.fill[Byte](60)(0x42)) == null)
    val lyingOff = DHash64.buildBmp(3L)
    lyingOff(10) = 0x7f.toByte; lyingOff(11) = 0x7f.toByte
    assert(DHash64.compute(lyingOff) == null)
  }

  test("clampedBalance: closed form equals the sequential clamp recurrence") {
    // deltas +5, −10, +3: sequential max(0, ·) gives 5 → 0 → 3; the
    // closed form: net −2, min prefix −5 → balance −2 − (−5) = 3
    val rows = Seq((1L, ts("2024-01-01 10:00:00"), 9L, 5L),
      (2L, ts("2024-01-01 11:00:00"), 9L, -10L),
      (3L, ts("2024-01-01 12:00:00"), 9L, 3L))
      .toDF("event_id", "ts", "k", "d")
    val out = Analyses.clampedBalance(rows, "k", "ts", col("d"), col("event_id"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out == ((9L, 3L, -2L, 3L, 5L)))
    // property: brute-force sequential clamp on md5-ish pseudo-random deltas
    val deltas = (1 to 40).map(i => ((i * 2654435761L) % 21L) - 10L)
    val df = deltas.zipWithIndex.map { case (d, i) =>
      (i.toLong, ts(f"2024-01-01 ${10 + i / 60}%02d:${i % 60}%02d:00"), 1L, d)
    }.toDF("event_id", "ts", "k", "d")
    val got = Analyses.clampedBalance(df, "k", "ts", col("d"), col("event_id"))
      .select("balance").as[Long].head()
    val want = deltas.foldLeft(0L)((s, d) => math.max(0L, s + d))
    assert(got == want)
  }

  test("greedyCover: ties to lower id, stops when nothing new is coverable") {
    // doc1 "a b c d" → {a b c, b c d}; doc3 "x y z w" → {x y z, y z w};
    // doc2 "a b c" ⊂ doc1. Round 1 ties doc1/doc3 at gain 2 → doc1 wins;
    // round 2 picks doc3; round 3 has no doc with uncovered shingles → stop
    val docs = Seq((1L, "a b c d"), (2L, "a b c"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val out = TextOps.greedyCover(docs, "doc_id", "text", shingleN = 3,
      rounds = 5).orderBy("round")
      .as[(Int, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1, 1L, 2L, 2L), (2, 3L, 2L, 4L)))
  }

  test("luhnValid: classic check-digit goldens") {
    import graft.functions.Scalars
    val df = Seq("79927398713", "79927398710", "79927398711", "7992739871")
      .toDF("num")
      .select(Scalars.luhnValid(col("num"), 11).as("ok"))
    // 79927398713 is the canonical valid Luhn example; 0/1 endings are
    // invalid; a short string fails the width check outright
    assert(df.as[Boolean].collect().toSeq == Seq(true, false, false, false))
  }

  test("CdcBounds: boundary contract and the insertion-shift property") {
    import graft.functions.CdcBounds
    import org.apache.spark.unsafe.types.UTF8String
    def bounds(t: String): Seq[Int] =
      CdcBounds.compute(UTF8String.fromString(t)).toIntArray().toSeq
    def chunks(t: String): Seq[String] = {
      val b = bounds(t)
      (0 +: b.dropRight(1)).zip(b).map { case (s, e) => t.substring(s, e) }
    }
    assert(bounds("") == Seq.empty)
    val text = (1 to 300).map(i => ('a' + (i * 2654435761L % 26).toInt).toChar)
      .mkString
    val b = bounds(text)
    assert(b.last == text.length && b == b.sorted && b.distinct == b)
    assert(chunks(text).mkString == text) // chunks partition the text
    // content-defined = an insertion near the front perturbs only the
    // chunks up to the first shared boundary; the tail chunks are IDENTICAL
    val edited = "INSERTED " + text
    val shared = chunks(text).toSet intersect chunks(edited).toSet
    assert(shared.size >= chunks(text).size - 2,
      s"expected tail chunks to survive the edit, shared=${shared.size} of ${chunks(text).size}")
  }

  test("zipfSlope: two-rank fit through (ln1,ln4),(ln2,ln2) has slope -1") {
    val docs = Seq((1L, "a a a a b b", "x")).toDF("doc_id", "text", "lang")
    val (n, slope) = TextOps.zipfSlope(docs, "lang", "text", topRanks = 2)
      .select("n_ranks", "zipf_slope").as[(Long, Double)].head()
    assert(n == 2L && slope == -1.0)
  }
}
