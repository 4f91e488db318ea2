package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** One-off sub-plan timing probe — round 10: the q511 sf1 decomposition
  * (round-9 verdict item 3). Splits the gate's wall into (a) the
  * decode+crop+featurize kernel CPU, (b) the localCheckpoint pin write,
  * (c) the pin re-read, (d) the banded candidate+verify stage — so the
  * 14.6× sf0.1→sf1 wall ratio is attributed by measurement, not
  * hypothesis. Process-CPU seconds bracket every stage (all-thread,
  * incl. GC/JIT) to separate CPU work from IO/scheduling wall. */
object Probe {
  private def procCpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  def time[A](label: String)(f: => A): A = {
    val c0 = procCpuSec()
    val t0 = System.nanoTime()
    val r = f
    val wall = (System.nanoTime() - t0) / 1e9
    val cpu = procCpuSec() - c0
    println(f"[probe] $label%-44s wall $wall%8.2f s  cpu $cpu%8.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32", "graft-probe")
    val bridge = org.apache.spark.sql.GraftColumnBridge
    def bx(c: org.apache.spark.sql.Column) = bridge.expression(c)

    // ---- the q511 pipeline, stage by stage (mirrors SparkEntry q511) ----
    val img = bridge.column(graft.functions.PatchBmpFixture(
      bx(expr("c_custkey div 4")), bx(col("c_custkey") % 4)))
    val meta = bridge.column(graft.functions.ImageMeta(bx(col("content"))))
    val withWH = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("img_id"), img.as("content"))
      .select(col("img_id"), col("content"),
        meta.getField("width").as("width"),
        meta.getField("height").as("height"))
    val tiles = graft.operators.Multimodal
      .tileGrid(withWH, "width", "height", tile = 8, stride = 8)
    val patch = graft.operators.Multimodal.cropImageAt(
      col("content"), col("tile_x"), col("tile_y"), 8, 8)
    def featPlan = Tables.spread(spark, tiles).select(
      (col("img_id") * 4 + expr("tile_y div 8") * 2 + expr("tile_x div 8"))
        .as("tile_id"),
      bridge.column(graft.functions.CenterVector(bx(
        graft.operators.Multimodal.imageBlockMeans(patch)))).as("vec"))

    time("warm (customer count)")(Tables.customer(spark, sfDir).count())
    // (a) kernel only, NO pin — aggregate over the vec so column pruning
    // cannot elide the decode+crop+featurize work (a bare count() would)
    time("feats kernel, no pin (forced agg)")(
      featPlan.agg(sum(element_at(col("vec"), 1))).collect())
    val n1 = featPlan.count()
    println(s"        tiles = $n1")
    // (b) kernel + pin write: the gate's actual first materialization
    val pinned = featPlan.localCheckpoint(eager = false)
    time("feats kernel + pin WRITE (count)")(pinned.count())
    // (c) pin re-read: what every downstream pass pays
    time("pin RE-READ (count)")(pinned.count())
    // persist(MEMORY_ONLY) alternative for comparison
    val mem = featPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    time("feats kernel + MEMORY_ONLY persist (count)")(mem.count())
    time("MEMORY_ONLY re-read (count)")(mem.count())
    // (d) the banded stage over the pinned vectors (adaptive shape)
    val (nb, rpb) = Dedup.adaptiveBandShape(n1, withinCos = 0.999,
      minBands = 16, minRows = 16)
    println(s"        band shape = ($nb, $rpb)")
    // band-collision candidate volume (pre-distinct) — the quantity the
    // adaptive geometry bounds; its per-doc growth explains any wall ratio
    // beyond the linear-CPU 10x
    val banded = pinned.select(col("tile_id"), posexplode(
        graft.operators.Similarity.bandBuckets(
          graft.operators.Similarity.asDouble(col("vec")), 64, nb, rpb))
        .as(Seq("band_id", "bucket")))
      .localCheckpoint(eager = false)
    val cand = time("band candidates (pre-distinct count)")(
      banded.as("a").join(banded.as("b"),
          col("a.band_id") === col("b.band_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.tile_id") < col("b.tile_id")).count())
    println(s"        candidate pairs = $cand (${cand.toDouble / n1}%s per tile)")
    val pairs = time("embeddingNearDups over pin (count)")(
      Dedup.embeddingNearDups(pinned, "tile_id", "vec", dim = 64,
        threshold = 0.95, nBands = nb, rowsPerBand = rpb).count())
    println(s"        verified pairs = $pairs")
    mem.unpersist()
    spark.stop()
  }
}
