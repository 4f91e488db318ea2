package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Round-11 additions: the dedup-index REBUILD policy positive path
  * (rebuildDue firing same-session after an append — the advisor's stale-
  * catalog fix), IVF lake compaction (answer-preserving file folding) and
  * the rebalanceDue drift check.
  */
class Round11OpsSpec extends SparkSuite {
  import spark.implicits._

  private def tinyDocs(n: Int, offset: Long = 0L): DataFrame =
    (0 until n).map { i =>
      val id = offset + i
      (id, s"document number $id talks about topic ${id % 7} " +
        s"with words a$id b$id c$id d$id e$id f$id g$id", "en")
    }.toDF("doc_id", "text", "lang")

  test("rebuildDue sees a SAME-SESSION append (stale-catalog fix) and resets after rebuild") {
    val corpus = tinyDocs(10)
    Dedup.writeIndex(corpus, "doc_id", "text", prefix = "graft_r11rb")
    try {
      assert(!Dedup.rebuildDue(spark, "graft_r11rb"))
      // read the fp table once so the catalog caches its file listing —
      // the exact state in which an unrefreshed count undercounts
      assert(spark.table("graft_r11rb_fp").count() === 10)
      val batch = tinyDocs(40, offset = 1000)
      Dedup.appendIndex(batch, "doc_id", "text", prefix = "graft_r11rb")
      // 50 rows vs build 10: the 3x policy must fire in THIS session,
      // with no intervening readIndex
      assert(Dedup.rebuildDue(spark, "graft_r11rb"))
      Dedup.writeIndex(corpus.unionByName(batch), "doc_id", "text",
        prefix = "graft_r11rb")
      assert(!Dedup.rebuildDue(spark, "graft_r11rb"))
    } finally {
      Seq("_fp", "_bands", "_sets", "_meta").foreach(sfx =>
        graft.sources.Sources.dropTableAndLocation(spark, s"graft_r11rb$sfx"))
    }
  }

  test("compactIndex folds append files, keeps the bucket spec exchange-free, " +
       "and preserves dedup answers") {
    val corpus = tinyDocs(30)
    Dedup.writeIndex(corpus, "doc_id", "text", prefix = "graft_r11ci")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      (1 to 3).foreach(i =>
        Dedup.appendIndex(tinyDocs(10, offset = 100L * i), "doc_id", "text",
          prefix = "graft_r11ci"))
      val tables = Seq("graft_r11ci_fp", "graft_r11ci_bands", "graft_r11ci_sets")
      val before = tables.map(graft.sources.Sources.tableDataFileCount(spark, _))
      assert(before.exists(_ > 32), s"appends should stack files, got $before")
      // 105/106 are exact dups of APPEND-batch docs — they only drop if
      // the appended artifacts are really in the index on both reads
      val batch = tinyDocs(8, offset = 500)
        .unionByName(tinyDocs(2, offset = 105))
      val preCompact = Dedup.dedupAgainstIndex(
        Dedup.readIndex(spark, "graft_r11ci"), batch, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet
      Dedup.compactIndex(spark, "graft_r11ci")
      val after = tables.map(graft.sources.Sources.tableDataFileCount(spark, _))
      assert(after.forall(_ <= 32) && after.sum < before.sum,
        s"expected <=1 file per bucket after compaction, got $after")
      val postCompact = Dedup.dedupAgainstIndex(
        Dedup.readIndex(spark, "graft_r11ci"), batch, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet
      assert(postCompact === preCompact)
      assert(postCompact === (500L until 508L).toSet)
      // the swapped-in table must still carry the bucket spec: a forced
      // SMJ against it may not shuffle the index side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val batchBands = Dedup.minhashBandTable(tinyDocs(5, offset = 700),
        "doc_id", "text")
      val idx = Dedup.readIndex(spark, "graft_r11ci")
      val joined = batchBands.as("a").join(idx.bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash"))
      joined.count(): Unit
      def walk(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] =
        Seq(p) ++ (p.children ++ p.subqueries).flatMap(walk) ++ (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case _ => Seq.empty
        })
      val shuffledIndexSide = walk(joined.queryExecution.executedPlan).exists {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          walk(s).exists {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.relation.location.rootPaths.exists(
                _.toString.contains("graft_r11ci_bands"))
            case _ => false
          }
        case _ => false
      }
      assert(!shuffledIndexSide,
        "compacted bands table must still join through its bucketing")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      Seq("_fp", "_bands", "_sets", "_meta").foreach(sfx =>
        graft.sources.Sources.dropTableAndLocation(spark, s"graft_r11ci$sfx"))
    }
  }

  // ---- IVF lake compaction + rebalance ----

  private def lakeVecs(n: Int, offset: Long = 0L): DataFrame =
    (0 until n).map { i =>
      val id = offset + i
      // splitmix-ish spread so cells are populated unevenly but stably
      (id, Array.tabulate(8)(d =>
        (((id * 2654435761L + d * 40503L) % 1000L) / 500.0 - 1.0).toFloat))
    }.toDF("vec_id", "embedding")

  private val cents: Array[Array[Double]] =
    Array.tabulate(4, 8)((c, d) =>
      math.sin(c * 8 + d + 1).abs * (if ((c + d) % 2 == 0) 1 else -1))

  test("compactIvfLists folds cells to one file and preserves the row set") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r11lake").toFile
    val path = dir.getAbsolutePath + "/lake"
    try {
      Similarity.writeIvfLists(lakeVecs(40), "vec_id", "embedding", cents, path)
      (1 to 3).foreach(i =>
        Similarity.appendIvfLists(lakeVecs(40, offset = 100L * i),
          "vec_id", "embedding", cents, path))
      val cells = Similarity.ivfCells(spark, path)
      assert(cells.nonEmpty)
      val before = cells.map(Similarity.cellFileCount(spark, path, _))
      assert(before.exists(_ > 1), s"appends should stack files, got $before")
      val rowsBefore = spark.read.parquet(path)
        .select("neighbor_id", "cell").as[(Long, Int)].collect().toSet
      Similarity.compactIvfLists(spark, path, cells)
      val after = cells.map(Similarity.cellFileCount(spark, path, _))
      assert(after.forall(_ == 1), s"expected one file per cell, got $after")
      val rowsAfter = spark.read.parquet(path)
        .select("neighbor_id", "cell").as[(Long, Int)].collect().toSet
      assert(rowsAfter === rowsBefore)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(dir): Unit
    }
  }

  test("persisted embedding index: planted near-dups drop, appends visible on reload") {
    // splitmix64 the (id, dim) pair — an affine envelope would correlate
    // every vector at cosine ~1 (the q501 fixture lesson)
    def mix(id: Long, d: Int): Float = {
      var z = id * 0x9E3779B97F4A7C15L + d * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (java.lang.Math.floorMod(z, 1000L) / 500.0 - 1.0).toFloat
    }
    def vecs(ids: Seq[Long]): DataFrame =
      ids.map(id => (id, Array.tabulate(16)(mix(id, _))))
        .toDF("vec_id", "embedding").withColumn("label", lit("t"))
    val corpus = vecs(0L until 20L)
    Dedup.writeEmbIndex(corpus, "vec_id", "embedding", dim = 16,
      prefix = "graft_r11ei", nBands = 4, rowsPerBand = 4)
    try {
      // batch: 5 fresh vectors + 2 exact copies of corpus vectors (new ids)
      val batch = vecs(100L until 105L)
        .unionByName(vecs(Seq(3L, 7L)).withColumn("vec_id", col("vec_id") + 900))
      val idx = Dedup.readEmbIndex(spark, "graft_r11ei")
      val s1 = Dedup.dedupEmbAgainstIndex(idx, batch, "vec_id", "embedding",
          dim = 16, threshold = 0.99, nBands = 4, rowsPerBand = 4)
        .select("vec_id").as[Long].collect().toSet
      assert(s1 === (100L until 105L).toSet,
        "exact copies of corpus vectors must drop, fresh vectors survive")
      // append the survivors; an exact copy of an appended vector must
      // now drop in the SAME session (readEmbIndex refresh discipline)
      Dedup.appendEmbIndex(vecs(100L until 105L), "vec_id", "embedding",
        dim = 16, prefix = "graft_r11ei", nBands = 4, rowsPerBand = 4)
      val batch2 = vecs(Seq(102L)).withColumn("vec_id", col("vec_id") + 900)
        .unionByName(vecs(Seq(200L)))
      val s2 = Dedup.dedupEmbAgainstIndex(Dedup.readEmbIndex(spark, "graft_r11ei"),
          batch2, "vec_id", "embedding",
          dim = 16, threshold = 0.99, nBands = 4, rowsPerBand = 4)
        .select("vec_id").as[Long].collect().toSet
      assert(s2 === Set(200L),
        "a copy of an APPENDED vector must drop after reload")
      // the structural claim the text index carries (Round10OpsSpec)
      // holds for the embedding index too: under a forced SMJ the
      // candidate equi-join consumes the bands table through its
      // bucketing — no exchange anywhere above the index-side scan
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val idx2 = Dedup.readEmbIndex(spark, "graft_r11ei")
        val probe = vecs(Seq(300L, 301L))
          .select(col("vec_id"),
            graft.operators.Similarity.bandBucketsPacked(
              graft.operators.Similarity.asDouble(col("embedding")), 16, 4, 4)
              .as("__bkts"))
          .select(col("vec_id"), posexplode(col("__bkts")).as(Seq("band_id", "bucket")))
        val joined = probe.as("a").join(idx2.bands.as("b"),
          col("a.band_id") === col("b.band_id") &&
          col("a.bucket") === col("b.bucket"))
        joined.count(): Unit
        def walk(p: org.apache.spark.sql.execution.SparkPlan):
            Seq[org.apache.spark.sql.execution.SparkPlan] =
          Seq(p) ++ (p.children ++ p.subqueries).flatMap(walk) ++ (p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              walk(a.executedPlan)
            case _ => Seq.empty
          })
        val shuffledIndexSide = walk(joined.queryExecution.executedPlan).exists {
          case sx: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            walk(sx).exists {
              case f: org.apache.spark.sql.execution.FileSourceScanExec =>
                f.relation.location.rootPaths.exists(
                  _.toString.contains("graft_r11ei_bands"))
              case _ => false
            }
          case _ => false
        }
        assert(!shuffledIndexSide,
          "the embedding bands table must join through its bucketing")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    } finally {
      Seq("_bands", "_vecs", "_meta").foreach(sfx =>
        graft.sources.Sources.dropTableAndLocation(spark, s"graft_r11ei$sfx"))
    }
  }

  test("lloydStep: centroid moves to its cell's quantized mean; empty cells keep the old centroid") {
    // 2 centroids in 2-D pointing at +x and -x; vectors cluster around
    // each, so assignment is unambiguous and the means are hand-checkable
    val cents = Array(Array(1.0, 0.0), Array(-1.0, 0.0))
    val vecs = Seq(
      (1L, Array(0.8f, 0.2f)), (2L, Array(0.6f, -0.2f)),   // cell 0
      (3L, Array(-0.5f, 0.4f)), (4L, Array(-0.9f, -0.4f))) // cell 1
      .toDF("vec_id", "embedding")
    val out = Similarity.lloydStep(vecs, "embedding", cents)
    def qmean(xs: Seq[Double]) = {
      val q = 1048576.0
      xs.map(x => if (x >= 0) math.floor(x * q + 0.5) else -math.floor(-x * q + 0.5))
        .sum / (xs.size * q)
    }
    val f = (x: Float) => x.toDouble
    assert(out(0)(0) === qmean(Seq(f(0.8f), f(0.6f))))
    assert(out(0)(1) === qmean(Seq(f(0.2f), f(-0.2f))))
    assert(out(1)(0) === qmean(Seq(f(-0.5f), f(-0.9f))))
    // a third centroid no vector chooses must survive untouched
    val cents3 = cents :+ Array(0.0, -1.0)
    val out3 = Similarity.lloydStep(vecs, "embedding", cents3)
    assert(out3(2).toSeq === Seq(0.0, -1.0))
    // inputs must never be mutated in place
    assert(cents(0).toSeq === Seq(1.0, 0.0))
  }

  test("rebalanceDue: quiet on fresh build, fires on 3x growth") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r11bal").toFile
    val path = dir.getAbsolutePath + "/lake"
    try {
      Similarity.writeIvfLists(lakeVecs(30), "vec_id", "embedding", cents, path)
      assert(!Similarity.rebalanceDue(spark, path))
      (1 to 4).foreach(i =>
        Similarity.appendIvfLists(lakeVecs(30, offset = 100L * i),
          "vec_id", "embedding", cents, path))
      assert(Similarity.rebalanceDue(spark, path))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(dir): Unit
    }
  }
}
