package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Incremental, Similarity}

/** Round-10 additions: the PERSISTED dedup index (bucketed probe joins,
  * O(batch) append, rebuild policy), persisted partition-pruned IVF
  * serving, streamed IVM associativity, and the bench calibration probe.
  */
class Round10OpsSpec extends SparkSuite {
  import spark.implicits._

  private def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    Seq(p) ++ (p.children ++ p.subqueries).flatMap(walk) ++ (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case _ => Seq.empty
    })

  // ---- persisted dedup index ----

  private def tinyDocs(n: Int, offset: Long = 0L): DataFrame =
    (0 until n).map { i =>
      val id = offset + i
      (id, s"document number $id talks about topic ${id % 7} " +
        s"with words a$id b$id c$id d$id e$id f$id g$id", "en")
    }.toDF("doc_id", "text", "lang")

  test("persisted index round-trips and equals the session-pinned index") {
    val corpus = tinyDocs(30)
    val batch = tinyDocs(10, offset = 100)
      .unionByName(corpus.limit(3)) // 3 exact dups of corpus docs
    Dedup.writeIndex(corpus, "doc_id", "text", prefix = "graft_r10rt")
    try {
      val fromDisk = Dedup.dedupAgainstIndex(
        Dedup.readIndex(spark, "graft_r10rt"), batch, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet
      val pinned = Dedup.dedupAgainstIndex(
        Dedup.corpusIndex(corpus, "doc_id", "text"), batch, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet
      assert(fromDisk == pinned, s"disk $fromDisk != pinned $pinned")
      assert(fromDisk == (100L until 110L).toSet,
        "exact dups of corpus docs must drop, fresh docs survive")
    } finally {
      Seq("_fp", "_bands", "_sets", "_meta").foreach(sfx =>
        spark.sql(s"DROP TABLE IF EXISTS graft_r10rt$sfx"))
    }
  }

  test("probe join against the persisted bands table has no index-side exchange") {
    val corpus = tinyDocs(40)
    Dedup.writeIndex(corpus, "doc_id", "text", prefix = "graft_r10pj")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a sort-merge join so the assertion is about the BUCKETED
      // layout, not a broadcast that would also skip the exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val batchBands = Dedup.minhashBandTable(tinyDocs(5, offset = 200),
        "doc_id", "text")
      val idx = Dedup.readIndex(spark, "graft_r10pj")
      val joined = batchBands.as("a").join(idx.bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash"))
      joined.count(): Unit
      val nodes = walk(joined.queryExecution.executedPlan)
      def scansBandsTable(p: org.apache.spark.sql.execution.SparkPlan) =
        walk(p).exists {
          case f: FileSourceScanExec =>
            f.relation.location.rootPaths.exists(_.toString.contains("graft_r10pj_bands"))
          case _ => false
        }
      // the index side must be consumed through its bucketing: no shuffle
      // may sit anywhere above the bands-table scan
      val shuffledIndexSide = nodes.exists {
        case s: ShuffleExchangeExec => scansBandsTable(s)
        case _ => false
      }
      assert(nodes.exists {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains("graft_r10pj_bands"))
        case _ => false
      }, "plan must scan the persisted bands table")
      assert(!shuffledIndexSide,
        s"index side must join through its buckets, not a shuffle:\n${joined.queryExecution.executedPlan}")
      // ...while the (unbucketed) batch side does shuffle into the bucket
      // layout (its subtree also owns the signature-aggregation shuffle —
      // both exchanges carry batch-sized data only)
      assert(nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
        "the batch side shuffles to meet the index's bucketing")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      Seq("_fp", "_bands", "_sets", "_meta").foreach(sfx =>
        spark.sql(s"DROP TABLE IF EXISTS graft_r10pj$sfx"))
    }
  }

  test("appendIndex is visible to a reload and rebuildDue fires at 3x growth") {
    val corpus = tinyDocs(10)
    Dedup.writeIndex(corpus, "doc_id", "text", prefix = "graft_r10ap")
    try {
      assert(!Dedup.rebuildDue(spark, "graft_r10ap"), "fresh index must not rebuild")
      // append a batch SMALLER than 2x build: still no rebuild
      Dedup.appendIndex(tinyDocs(15, offset = 300), "doc_id", "text",
        prefix = "graft_r10ap")
      assert(!Dedup.rebuildDue(spark, "graft_r10ap"))
      // an appended near-dup of an APPENDED doc must now drop on reload —
      // the append is live for subsequent batches
      val probe = tinyDocs(1, offset = 300) // exact dup of appended doc 300
        .unionByName(tinyDocs(1, offset = 900))
      val surv = Dedup.dedupAgainstIndex(Dedup.readIndex(spark, "graft_r10ap"),
        probe, "doc_id", "text").select("doc_id").as[Long].collect().toSet
      assert(surv == Set(900L), s"got $surv")
      // grow past 3x build size: rebuild due
      Dedup.appendIndex(tinyDocs(20, offset = 400), "doc_id", "text",
        prefix = "graft_r10ap")
      assert(Dedup.rebuildDue(spark, "graft_r10ap"),
        "10 built + 35 appended = 4.5x must trigger the 3x policy")
    } finally {
      Seq("_fp", "_bands", "_sets", "_meta").foreach(sfx =>
        spark.sql(s"DROP TABLE IF EXISTS graft_r10ap$sfx"))
    }
  }

  // ---- persisted partition-pruned IVF serving ----

  test("serveIvfFromLists equals ivfKnnSeeded and prunes cell partitions") {
    val e = Tables.embeddings(spark, sf)
    val cents = Similarity.seededCentroids(8, 64)
    val dir = java.nio.file.Files.createTempDirectory(
      LocalSession.fixtureTmpRoot(), "graft_fix_r10ivf").toString
    try {
      Similarity.writeIvfLists(e, "vec_id", "embedding", cents, dir)
      val queries = e.filter(col("vec_id") < 10).select("vec_id", "embedding")
      val served = Similarity.serveIvfFromLists(spark, dir, queries, "vec_id",
          "embedding", k = 5, cents, nprobe = 2, dim = 64)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      val batch = Similarity.ivfKnnSeeded(e, queries, "vec_id", "embedding",
          k = 5, nCentroids = 8, nprobe = 2, dim = 64)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(served == batch, "persisted serving must equal the batch pipeline")
      // single-query serve: 2 probed cells of 8 — the scan must prune
      val one = Similarity.serveIvfFromLists(spark, dir,
        e.filter(col("vec_id") === 0).select("vec_id", "embedding"),
        "vec_id", "embedding", k = 5, cents, nprobe = 2, dim = 64)
      one.count(): Unit
      val scans = walk(one.queryExecution.executedPlan).collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("graft_fix_r10ivf")) => f
      }
      assert(scans.nonEmpty, "serve plan must scan the lists lake")
      val selected = scans.map(_.selectedPartitions.partitionCount).max
      assert(selected <= 2,
        s"nprobe=2 must read at most 2 of 8 cell partitions, read $selected")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("appendIvfLists: build + append serves the one-shot full-corpus answer") {
    val e = Tables.embeddings(spark, sf)
    val cents = Similarity.seededCentroids(8, 64)
    val dir = java.nio.file.Files.createTempDirectory(
      LocalSession.fixtureTmpRoot(), "graft_fix_r10ivfapp").toString
    try {
      Similarity.writeIvfLists(e.filter(col("vec_id") % 3 =!= 0),
        "vec_id", "embedding", cents, dir)
      Similarity.appendIvfLists(e.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", cents, dir)
      val queries = e.filter(col("vec_id") < 10).select("vec_id", "embedding")
      val served = Similarity.serveIvfFromLists(spark, dir, queries, "vec_id",
          "embedding", k = 5, cents, nprobe = 2, dim = 64)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      val oneShot = Similarity.ivfKnnSeeded(e, queries, "vec_id", "embedding",
          k = 5, nCentroids = 8, nprobe = 2, dim = 64)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(served == oneShot,
        "the maintained lake must serve the full-corpus answer")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  // ---- streamed IVM: per-chunk merge associativity ----

  test("chunked signed-delta merges equal the one-shot merge, incl. group resurrection") {
    val D = "decimal(18,2)"
    val base = Seq(("A", 1L, "10.00"), ("A", 2L, "20.00"), ("B", 3L, "5.00"))
      .toDF("k", "id", "v").withColumn("v", col("v").cast(D))
    val view0 = base.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("v"))
    // chunk 1 deletes ALL of A (count hits 0 -> group vanishes), chunk 2
    // re-inserts a fresh A row (group resurrects from the delta alone)
    val c1 = base.filter(col("k") === "A").withColumn("sign", lit(-1))
    val c2 = Seq(("A", 9L, "7.00")).toDF("k", "id", "v")
      .withColumn("v", col("v").cast(D)).withColumn("sign", lit(1))
    val stepwise = Incremental.mergeAggDelta(
      Incremental.mergeAggDelta(view0, c1, Seq("k"), "n", Seq("v")),
      c2, Seq("k"), "n", Seq("v"))
    val oneShot = Incremental.mergeAggDelta(view0, c1.unionByName(c2),
      Seq("k"), "n", Seq("v"))
    def m(df: DataFrame) = df.select(col("k"), col("n"),
      col("v").cast("double")).as[(String, Long, Double)].collect().toSet
    assert(m(stepwise) == m(oneShot))
    assert(m(stepwise) == Set(("A", 1L, 7.0), ("B", 1L, 5.0)))
  }

  // ---- round-10 edges ----

  test("serveIvfFromLists: an empty query batch serves an empty result") {
    val e = Tables.embeddings(spark, sf)
    val cents = Similarity.seededCentroids(8, 64)
    val dir = java.nio.file.Files.createTempDirectory(
      LocalSession.fixtureTmpRoot(), "graft_fix_r10empty").toString
    try {
      Similarity.writeIvfLists(e.limit(100), "vec_id", "embedding", cents, dir)
      val none = e.filter(col("vec_id") < 0).select("vec_id", "embedding")
      assert(Similarity.serveIvfFromLists(spark, dir, none, "vec_id",
        "embedding", k = 5, cents, nprobe = 2, dim = 64).count() == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("dedupAgainstIndex: empty batch survives (empty), empty-ish degenerate index passes all") {
    Dedup.writeIndex(tinyDocs(10), "doc_id", "text", prefix = "graft_r10ed")
    try {
      val idx = Dedup.readIndex(spark, "graft_r10ed")
      val empty = tinyDocs(0)
      assert(Dedup.dedupAgainstIndex(idx, empty, "doc_id", "text").count() == 0)
      // an index built over docs too short to shingle (no bands, no sets
      // beyond empties) must pass a fresh batch through intact
      Dedup.writeIndex(
        Seq((1L, "tiny", "en")).toDF("doc_id", "text", "lang"),
        "doc_id", "text", prefix = "graft_r10dg")
      val fresh = tinyDocs(5, offset = 700)
      assert(Dedup.dedupAgainstIndex(Dedup.readIndex(spark, "graft_r10dg"),
        fresh, "doc_id", "text").count() == 5)
    } finally {
      Seq("graft_r10ed", "graft_r10dg").foreach(p =>
        Seq("_fp", "_bands", "_sets", "_meta").foreach(sfx =>
          spark.sql(s"DROP TABLE IF EXISTS $p$sfx")))
    }
  }

  test("bandBucketsPacked is the bit-packed bijection of bandBuckets") {
    val vecs = (1 to 50).map(i =>
      Tuple1(Array.tabulate(16)(j => math.sin(i * 37.0 + j)))).toDF("v")
    val both = vecs.select(
        Similarity.bandBuckets(col("v"), 16, 4, 9).as("s"),
        Similarity.bandBucketsPacked(col("v"), 16, 4, 9).as("p"))
      .as[(Seq[String], Seq[Long])].collect()
    assert(both.nonEmpty)
    both.foreach { case (s, p) =>
      assert(s.length == 4 && p.length == 4)
      s.zip(p).foreach { case (str, packed) =>
        val expect = str.zipWithIndex
          .map { case (c, r) => if (c == '1') 1L << r else 0L }.sum
        assert(packed == expect, s"string $str vs packed $packed")
      }
    }
  }

  // ---- calibration probe ----

  test("calibration probe: fixed work, sane quiet ratio") {
    Calibration.warm()
    val ms = Calibration.probeMs()
    assert(ms > 0, "probe must measure")
    // liberal bound: even a CI box 8x slower than the commissioning host
    // passes; the assertion guards against a broken loop (instant return)
    val r = Calibration.ratio()
    assert(r > 0.05 && r < 10.0, s"ratio $r out of any plausible range")
    assert(Calibration.TripRatio > 1.0 && Calibration.RefMs > 0)
  }
}
