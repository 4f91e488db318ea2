package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  test("splitAssign: fractions approximately honored, assignment exhaustive") {
    val df = spark.range(10000).toDF("id")
      .withColumn("split", Sampling.splitAssign(col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val counts = df.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 10000L)
    assert(math.abs(counts("train") - 8000L) < 300, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 1000L) < 150, s"val=${counts("val")}")
  }

  test("split assignment is key-stable: same key -> same split across reruns and appends") {
    val a = spark.range(500).toDF("id")
      .withColumn("split", Sampling.splitAssign(col("id"), Seq("train" -> 0.5, "heldout" -> 0.5)))
      .as[(Long, String)].collect().toMap
    // a different frame (appended rows, different partitioning) must agree on
    // the overlapping keys
    val b = spark.range(1000).toDF("id").repartition(7)
      .withColumn("split", Sampling.splitAssign(col("id"), Seq("train" -> 0.5, "heldout" -> 0.5)))
      .as[(Long, String)].collect().toMap
    assert(a.forall { case (k, v) => b(k) == v })
  }

  test("deterministicSample keeps a stable subset of the requested size") {
    val df = spark.range(2000).toDF("id")
    val s1 = Sampling.deterministicSample(df, col("id"), 0.25).as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(df, col("id"), 0.25).as[Long].collect().toSet
    assert(s1 == s2)
    assert(math.abs(s1.size - 500) < 120, s"got ${s1.size}")
    // monotone: a larger fraction strictly contains the smaller sample
    val s3 = Sampling.deterministicSample(df, col("id"), 0.5).as[Long].collect().toSet
    assert(s1.subsetOf(s3))
  }

  test("sketch aggregates track their exact counterparts (the 100 TB path)") {
    val docs = Tables.documents(spark, sf)
    val exactDistinct = docs.select(countDistinct(col("text"))).as[Long].collect().head
    val approxDistinct = docs.select(approx_count_distinct(col("text"), 0.02))
      .as[Long].collect().head
    assert(math.abs(approxDistinct - exactDistinct).toDouble / exactDistinct < 0.05,
      s"HLL off: $approxDistinct vs $exactDistinct")
    val lens = docs.select(length(col("text")).cast("double").as("len"))
    val exactP = lens.select(expr("percentile(len, 0.9)")).as[Double].collect().head
    val approxP = lens.select(expr("approx_percentile(len, 0.9, 1000)"))
      .as[Double].collect().head
    assert(math.abs(approxP - exactP) / math.max(exactP, 1.0) < 0.05,
      s"approx_percentile off: $approxP vs $exactP")
  }

  test("splitAssign validates inputs") {
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(col("x"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(col("x"), Seq("a" -> 0.9, "b" -> 0.3))
    }
  }

  test("stratifiedSample: per-stratum rates honored, key-stable, default applied") {
    val df = (1L to 3000L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "de"))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedSample(df, col("lang"), col("id"),
      Map("en" -> 0.2, "fr" -> 0.9), defaultFraction = 0.5)
    val counts = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    // each stratum has 1000 rows; hash-uniformity tolerance ±8%
    assert(math.abs(counts("en") - 200) < 80, s"en=${counts("en")}")
    assert(math.abs(counts("fr") - 900) < 80, s"fr=${counts("fr")}")
    assert(math.abs(counts("de") - 500) < 80, s"de=${counts("de")}")
    // key-stability: the en-sample is exactly the global 0.2-sample
    // restricted to en (same hash, same cut) — and re-runs are identical
    val enA = kept.filter(col("lang") === "en").select("id").as[Long].collect().toSet
    val enB = Sampling.deterministicSample(df.filter(col("lang") === "en"),
      col("id"), 0.2).select("id").as[Long].collect().toSet
    assert(enA == enB)
  }

  test("stratifiedTake: exact per-stratum cap, deterministic choice, small strata intact") {
    val df = ((1L to 100L).map(i => (i, "big")) ++ (101L to 105L).map(i => (i, "small")))
      .toDF("id", "lang")
    val t = Sampling.stratifiedTake(df, col("lang"), col("id"), n = 10)
    val counts = t.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("big" -> 10L, "small" -> 5L))
    // deterministic: same rows on re-run
    val a = t.select("id").as[Long].collect().toSet
    val b = Sampling.stratifiedTake(df, col("lang"), col("id"), n = 10)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("tokenBudgetSample: greedy hash-order prefix per stratum, <=1 doc overshoot") {
    val df = ((1L to 50L).map(i => (i, "a", 10L)) ++ (51L to 53L).map(i => (i, "b", 4L)))
      .toDF("id", "src", "n_tok")
    val kept = Sampling.tokenBudgetSample(df, col("src"), col("id"),
      col("n_tok"), budget = 95L)
    val byS = kept.groupBy("src").agg(sum("n_tok").cast("long").as("t"), count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // stratum a: docs of 10 tokens; exclusive prefix < 95 keeps exactly 10
    // docs (before-values 0..90) -> 100 tokens, one-doc overshoot
    assert(byS("a") == (100L, 10L))
    // stratum b is under budget entirely
    assert(byS("b") == (12L, 3L))
    // the kept prefix follows hash order: every kept doc's bucket <= every
    // dropped doc's bucket within the stratum
    val hb = (i: Long) => { // mirror of Sampling.hashBucket
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(8), 16) % 10000
    }
    val keptA = kept.filter(col("src") === "a").select("id").as[Long].collect().toSet
    val dropA = (1L to 50L).toSet -- keptA
    assert(keptA.map(hb).max <= dropA.map(hb).min)
  }

  test("tokenBudgetSample: one corpus-sized stratum never hits a stratum-only window") {
    // every row in ONE stratum — the "N billion tokens for this domain" shape
    // that used to serialize the whole corpus onto a single window task
    val df = (1L to 5000L).map(i => (i, "web", 3L)).toDF("id", "src", "n_tok")
    val kept = Sampling.tokenBudgetSample(df, col("src"), col("id"),
      col("n_tok"), budget = 600L)
    // two-level prefix equals the single-window greedy contract exactly
    assert(kept.count() == 200L)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = kept.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    // every window over row-sized input partitions by (stratum, group); a
    // stratum-only partition spec is allowed ONLY over the dimension-sized
    // per-group totals (an Aggregate child)
    wins.foreach { w =>
      val overAggregate = w.child.collectFirst { case a: Aggregate => a }.isDefined
      assert(w.partitionSpec.length >= 2 || overAggregate,
        s"corpus-sized window partitioned only by ${w.partitionSpec}")
    }
  }

  test("epochMix: floor copies + key-stable fractional copy, 0-epoch drop") {
    val df = ((1L to 400L).map(i => (i, "up")) ++ (401L to 800L).map(i => (i, "down")) ++
      (801L to 820L).map(i => (i, "rest"))).toDF("id", "src")
    val out = Sampling.epochMix(df, col("src"), col("id"),
      Map("up" -> 2.25, "down" -> 0.5), defaultEpochs = 1.0)
    val counts = out.groupBy("src").count().as[(String, Long)].collect().toMap
    // up: 400 docs x (2 + key-stable 25%) ~ 900; down ~ 200; rest exactly 20
    assert(math.abs(counts("up") - 900) < 60, s"up=${counts("up")}")
    assert(math.abs(counts("down") - 200) < 60, s"down=${counts("down")}")
    assert(counts("rest") == 20L)
    // epoch indices are 0-based and dense per doc
    val eps = out.filter(col("src") === "up").groupBy("id")
      .agg(sort_array(collect_list("epoch")).as("e"))
      .as[(Long, Seq[Long])].collect()
    assert(eps.forall(r => r._2 == (0L until r._2.length)))
    assert(eps.map(_._2.length).toSet == Set(2, 3))
    // determinism across reruns
    val again = Sampling.epochMix(df, col("src"), col("id"),
      Map("up" -> 2.25, "down" -> 0.5), defaultEpochs = 1.0)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts == again)
  }

  test("scoreBandSample: corpus-relative bands, per-band rates, determinism") {
    // scores 1..1000 -> quartile cuts at 250.75, 500.5, 750.25
    val df = (1L to 1000L).map(i => (i, i.toDouble)).toDF("id", "score")
    val out = Sampling.scoreBandSample(df, col("id"), "score",
      cuts = Seq(0.25, 0.5, 0.75), rates = Seq(0.0, 1.0, 0.5, 1.0))
    val byBand = out.groupBy("band").count().as[(Long, Long)].collect().toMap
    // band 0 dropped entirely; bands 1 and 3 kept whole (250 each)
    assert(!byBand.contains(0L))
    assert(byBand(1L) == 250L && byBand(3L) == 250L)
    // band 2 thinned to ~half, key-stable
    assert(byBand(2L) > 75L && byBand(2L) < 175L, s"band2=${byBand(2L)}")
    // band assignment: scores <= p25 are band 0 -> absent; spot boundaries
    val bands = out.select("id", "band").as[(Long, Long)].collect().toMap
    assert(bands.get(250L).isEmpty || bands(250L) == 0L) // p25 = 250.75
    assert(bands.get(251L).forall(_ == 1L))
    assert(bands.get(1000L).forall(_ == 3L))
    // rerun identical (no RNG)
    val again = Sampling.scoreBandSample(df, col("id"), "score",
      cuts = Seq(0.25, 0.5, 0.75), rates = Seq(0.0, 1.0, 0.5, 1.0))
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("weightedSample: inclusion tracks weight, exact n, deterministic") {
    // 950 light rows (w=1) + 50 heavy rows (w=1000): a 50-sample should be
    // dominated by heavy rows (their priorities u^(1/1000) cluster near 1)
    val df = ((1L to 950L).map(i => (i, 1.0)) ++
      (951L to 1000L).map(i => (i, 1000.0))).toDF("id", "w")
    val got = Sampling.weightedSample(df, col("id"), col("w"), n = 50)
      .select("id").as[Long].collect().toSet
    assert(got.size == 50)
    val heavy = got.count(_ > 950L)
    assert(heavy >= 40, s"only $heavy/50 heavy rows sampled")
    // key-stable rerun
    val again = Sampling.weightedSample(df, col("id"), col("w"), n = 50)
      .select("id").as[Long].collect().toSet
    assert(got == again)
  }

  test("hashNegatives: k non-self negatives per row, key-stable, bucket-linked") {
    val df = (1L to 1000L).map(Tuple1(_)).toDF("id")
    val out = Sampling.hashNegatives(df, col("id"), k = 3, nBuckets = 8)
      .select("id", "neg_id", "neg_rank").as[(Long, Long, Long)].collect()
    val byId = out.groupBy(_._1)
    // every row gets exactly k negatives (all 8 buckets populated at n=1000)
    assert(byId.size == 1000 && byId.values.forall(_.length == 3))
    // never self, ranks are 1..k
    assert(out.forall(r => r._1 != r._2))
    assert(byId.values.forall(_.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L)))
    // rows in the same bucket share the same negative set; the corpus uses
    // more than one distinct negative set overall
    val negSets = byId.values.map(_.map(_._2).toSet).toSet
    assert(negSets.size == 8)
    // deterministic rerun
    val again = Sampling.hashNegatives(df, col("id"), k = 3, nBuckets = 8)
      .select("id", "neg_id", "neg_rank").as[(Long, Long, Long)].collect()
    assert(out.toSet == again.toSet)
  }
}
