package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Round-12 additions: the IVF retrain POLICY RESET (q528 — drift fires,
  * lloydStep retrains, the lake rewrite refreshes `_build_hist`, the
  * policy goes quiet), compactEmbIndex (the embedding index's layout
  * fold, answer-preserving with no staging/aside residue — the
  * crash-narrowed swap), and the fixture-root heartbeat surviving
  * register-before-mkdir (the advisor's replay-dir race).
  */
class Round12OpsSpec extends SparkSuite {
  import spark.implicits._

  // splitmix64 the (id, dim) pair — an affine envelope would correlate
  // every vector at cosine ~1 (the q501 fixture lesson)
  private def mix(id: Long, d: Int): Float = {
    var z = id * 0x9E3779B97F4A7C15L + d * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (java.lang.Math.floorMod(z, 1000L) / 500.0 - 1.0).toFloat
  }
  private def vecs(ids: Seq[Long]): DataFrame =
    ids.map(id => (id, Array.tabulate(16)(mix(id, _))))
      .toDF("vec_id", "embedding").withColumn("label", lit("t"))

  test("retrain rewrite resets rebalanceDue with a fresh _build_hist (q528 pin)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r12rt").toFile
    val path = dir.getAbsolutePath + "/lake"
    val cents0 = Similarity.seededCentroids(4, 16)
    try {
      val build = vecs(0L until 20L)
      Similarity.writeIvfLists(build, "vec_id", "embedding", cents0, path)
      assert(!Similarity.rebalanceDue(spark, path))
      (1 to 4).foreach(i =>
        Similarity.appendIvfLists(vecs(100L * i until 100L * i + 20L),
          "vec_id", "embedding", cents0, path))
      assert(Similarity.rebalanceDue(spark, path),
        "a 5x-of-build lake must signal rebalance")
      // the action rebalanceDue signals: retrain on the FULL corpus and
      // rewrite the lake under the new quantizer
      val all = vecs((0L until 20L) ++
        (1 to 4).flatMap(i => 100L * i until 100L * i + 20L))
      val newCents = Similarity.lloydStep(all, "embedding", cents0)
      Similarity.writeIvfLists(all, "vec_id", "embedding", newCents, path)
      // the reset: a policy still firing after its action ran would
      // retrain forever — the rewrite must refresh _build_hist to the
      // current histogram exactly
      assert(!Similarity.rebalanceDue(spark, path),
        "the retrain rewrite must reset the policy to quiet")
      val hist = spark.read.parquet(s"$path/_build_hist")
        .select("cell", "n_built").as[(Int, Long)].collect().toSet
      val now = spark.read.parquet(path).groupBy("cell")
        .agg(count(lit(1)).as("n")).select("cell", "n")
        .as[(Int, Long)].collect().toSet
      assert(hist === now, "_build_hist must equal the post-rewrite histogram")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(dir): Unit
    }
  }

  test("compactEmbIndex folds append files, preserves dedup answers, leaves no swap residue") {
    val corpus = vecs(0L until 20L)
    Dedup.writeEmbIndex(corpus, "vec_id", "embedding", dim = 16,
      prefix = "graft_r12ce", nBands = 4, rowsPerBand = 4)
    try {
      (1 to 3).foreach(i =>
        Dedup.appendEmbIndex(vecs(100L * i until 100L * i + 8L),
          "vec_id", "embedding", dim = 16, prefix = "graft_r12ce",
          nBands = 4, rowsPerBand = 4))
      val tables = Seq("graft_r12ce_bands", "graft_r12ce_vecs")
      val before = tables.map(graft.sources.Sources.tableDataFileCount(spark, _))
      assert(before.exists(_ > 32), s"appends should stack files, got $before")
      // 302/303: exact copies of APPEND-batch vectors (new ids) — they
      // only drop if the appended rows survive the fold on both tables
      val batch = vecs(500L until 505L)
        .unionByName(vecs(Seq(302L, 303L))
          .withColumn("vec_id", col("vec_id") + 900))
      val preCompact = Dedup.dedupEmbAgainstIndex(
          Dedup.readEmbIndex(spark, "graft_r12ce"), batch,
          "vec_id", "embedding", dim = 16, threshold = 0.99,
          nBands = 4, rowsPerBand = 4)
        .select("vec_id").as[Long].collect().toSet
      assert(preCompact === (500L until 505L).toSet)
      Dedup.compactEmbIndex(spark, "graft_r12ce")
      val after = tables.map(graft.sources.Sources.tableDataFileCount(spark, _))
      assert(after.forall(_ <= 32) && after.sum < before.sum,
        s"expected <=1 file per bucket after compaction, got $after")
      val postCompact = Dedup.dedupEmbAgainstIndex(
          Dedup.readEmbIndex(spark, "graft_r12ce"), batch,
          "vec_id", "embedding", dim = 16, threshold = 0.99,
          nBands = 4, rowsPerBand = 4)
        .select("vec_id").as[Long].collect().toSet
      assert(postCompact === preCompact)
      // the crash-narrowed swap (rename aside -> rename in -> drop old)
      // must leave neither the staging nor the aside table behind
      tables.foreach { t =>
        assert(!spark.catalog.tableExists(s"${t}__compact"),
          s"staging table ${t}__compact must not survive the swap")
        assert(!spark.catalog.tableExists(s"${t}__old"),
          s"aside table ${t}__old must not survive the swap")
      }
    } finally {
      Seq("_bands", "_vecs", "_meta").foreach(sfx =>
        graft.sources.Sources.dropTableAndLocation(spark, s"graft_r12ce$sfx"))
    }
  }

  test("embedding index persists its band geometry and the rebuild policy fires on growth") {
    // the 200 k decade-probe lesson: geometry is part of the index's
    // on-disk identity — an adaptive build's probes and appends must
    // band identically WITHOUT the caller restating the shape
    val corpus = vecs(0L until 40L)
    val (nb, rpb) = Dedup.adaptiveBandShape(40L, withinCos = 0.99,
      minBands = 4, minRows = 4)
    Dedup.writeEmbIndex(corpus, "vec_id", "embedding", dim = 16,
      prefix = "graft_r12ag", nBands = nb, rowsPerBand = rpb)
    try {
      val idx = Dedup.readEmbIndex(spark, "graft_r12ag")
      assert(idx.nBands === nb && idx.rowsPerBand === rpb,
        "reload must carry the build geometry from _meta")
      // default-geometry probe: exact copies of corpus vectors must drop
      // (bands only collide if the batch banded with the STORED shape)
      val batch = vecs(500L until 504L)
        .unionByName(vecs(Seq(3L, 7L)).withColumn("vec_id", col("vec_id") + 900))
      val s1 = Dedup.dedupEmbAgainstIndex(idx, batch, "vec_id", "embedding",
          dim = 16, threshold = 0.99)
        .select("vec_id").as[Long].collect().toSet
      assert(s1 === (500L until 504L).toSet)
      // default-geometry append: a copy of an appended vector must drop
      // on reload — proof the appended rows banded with the stored shape
      Dedup.appendEmbIndex(vecs(500L until 504L), "vec_id", "embedding",
        dim = 16, prefix = "graft_r12ag")
      val s2 = Dedup.dedupEmbAgainstIndex(Dedup.readEmbIndex(spark, "graft_r12ag"),
          vecs(Seq(502L)).withColumn("vec_id", col("vec_id") + 900),
          "vec_id", "embedding", dim = 16, threshold = 0.99)
        .select("vec_id").as[Long].collect().toSet
      assert(s2 === Set.empty[Long])
      assert(!Dedup.embRebuildDue(spark, "graft_r12ag"),
        "44 rows vs build 40 stays under the 3x bar")
      Dedup.appendEmbIndex(vecs(600L until 700L), "vec_id", "embedding",
        dim = 16, prefix = "graft_r12ag")
      assert(Dedup.embRebuildDue(spark, "graft_r12ag"),
        "144 rows vs build 40 must fire the rebuild policy same-session")
    } finally {
      Seq("_bands", "_vecs", "_meta").foreach(sfx =>
        graft.sources.Sources.dropTableAndLocation(spark, s"graft_r12ag$sfx"))
    }
  }

  test("a fixture root registered before its directory exists keeps heartbeat protection") {
    // the advisor's replay-dir race: freshReplayDir rm()'d the dir and
    // registered the not-yet-recreated path; touchHeartbeats used to
    // DROP such paths from the live set, silently unprotecting the
    // replay dir from a sibling JVM's 30-min stale sweep
    val root = new java.io.File(LocalSession.fixtureTmpRoot().toFile,
      s"graft_r12hb_${System.nanoTime()}")
    val other = new java.io.File(LocalSession.fixtureTmpRoot().toFile,
      s"graft_r12hb2_${System.nanoTime()}")
    try {
      LocalSession.registerFixtureRoot(root.getAbsolutePath) // dir absent
      assert(root.mkdirs())
      // any later registration re-touches ALL live roots: the
      // registered-before-mkdir root must still be in the set and now
      // receive its heartbeat file
      assert(other.mkdirs())
      LocalSession.registerFixtureRoot(other.getAbsolutePath)
      assert(new java.io.File(root, ".graft_heartbeat").isFile,
        "a root registered before mkdirs must get a heartbeat once it exists")
      assert(new java.io.File(other, ".graft_heartbeat").isFile)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(root): Unit
      org.apache.commons.io.FileUtils.deleteQuietly(other): Unit
    }
  }

  // deterministic toy corpus: 3-word docs with planted exact + near dups
  private def toyDocs(ids: Seq[Long]): DataFrame =
    ids.map { id =>
      val g = id / 3
      (id, s"w${g}a w${g}b w${g}c w${id}x w${g}d")
    }.toDF("doc_id", "text").withColumn("lang", lit("en"))

  test("optimized writeIndex builds byte-identical artifacts (derive-bands-from-sets + overlapped writes)") {
    // round-12 optimization pin: writeIndex now tokenizes ONCE (bands
    // derive from the written _sets table) and overlaps the independent
    // writes — the three artifact tables must equal the one-pass-per-
    // artifact formulation row for row, and each must still land at
    // ≤ buckets files (the bucketed-scan repartition gotcha guard)
    import graft.operators.TextOps
    val docs = toyDocs(0L until 90L)
    val pre = "graft_r12wi"
    try {
      Dedup.writeIndex(docs, "doc_id", "text", prefix = pre, buckets = 8)
      val expFp = docs.select(TextOps.fingerprint(col("text")).as("__fp"))
        .collect().map(_.getString(0)).sorted
      val gotFp = spark.table(s"${pre}_fp")
        .collect().map(_.getString(0)).sorted
      assert(gotFp === expFp, "fingerprint table must match the direct pass")
      val expBands = Dedup.minhashBandTable(docs, "doc_id", "text", 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
      val gotBands = spark.table(s"${pre}_bands")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
      assert(gotBands === expBands,
        "band table derived from the written sets must equal the direct band pass")
      val expSets = docs.select(col("doc_id"),
          TextOps.distinctShingles(TextOps.tokens(col("text")), 3).as("__sh"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).mkString("|")))
        .sorted
      val gotSets = spark.table(s"${pre}_sets")
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).mkString("|")))
        .sorted
      assert(gotSets === expSets)
      assert(spark.table(s"${pre}_meta").head().getLong(0) === 90L)
      Seq("_fp", "_bands", "_sets").foreach { sfx =>
        val n = graft.sources.Sources.tableDataFileCount(spark, s"$pre$sfx")
        assert(n <= 8, s"$pre$sfx landed $n files for 8 buckets")
      }
      // the overlapped append must extend all three tables consistently
      val batch = toyDocs(200L until 212L)
      Dedup.appendIndex(batch, "doc_id", "text", prefix = pre, buckets = 8)
      val fpAfter = spark.table(s"${pre}_fp").count()
      val setsAfter = spark.table(s"${pre}_sets").count()
      assert(fpAfter === 90L + 12L)
      assert(setsAfter === 90L + 12L)
      val expBatchBands = Dedup.minhashBandTable(batch, "doc_id", "text", 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val gotBatchBands = spark.table(s"${pre}_bands")
        .filter(col("doc_id") >= 200L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(gotBatchBands === expBatchBands)
    } finally {
      Seq("_fp", "_bands", "_sets", "_meta").foreach(sfx =>
        graft.sources.Sources.dropTableAndLocation(spark, s"$pre$sfx"))
    }
  }
}
