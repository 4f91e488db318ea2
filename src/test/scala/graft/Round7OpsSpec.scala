package graft

import org.apache.spark.sql.functions._
import graft.operators.{Spatial, TextOps}

/** Round-7 goldens: enforced driver bounds for the bounded-by-design
  * structures (the round-6 verdict's "requires, not assumptions" item),
  * then the new header-parse expressions as they land. */
class Round7OpsSpec extends SparkSuite {
  import spark.implicits._

  test("gridDensityClusters: >4096 core cells fails loudly, not quadratically") {
    // 4097 distinct singleton cells, cut set to keep all of them core
    val pts = spark.range(4097)
      .select((col("id") / 64).cast("long").as("gx"),
        (col("id") % 64).cast("long").as("gy"))
    val e = intercept[IllegalArgumentException] {
      Spatial.gridDensityClusters(pts.toDF(), minNum = 0, minDen = 1).collect()
    }
    assert(e.getMessage.contains("4096-cell driver bound"))
  }

  test("gridDensityClusters: bound leaves in-bound grids untouched") {
    val pts = Seq((0L, 0L), (0L, 1L), (5L, 5L)).toDF("gx", "gy")
    val out = Spatial.gridDensityClusters(pts, minNum = 1, minDen = 2)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(out == Seq((0L, 2L, 2L), (5005L, 1L, 1L)))
  }

  test("greedyCover: round budget beyond 256 is rejected") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextOps.greedyCover(docs, "doc_id", "text", shingleN = 1, rounds = 257)
    }
    assert(e.getMessage.contains("256-round driver bound"))
  }

  // ---- GeoTIFF CRS byte-walk (F13 closure) ----

  test("GeoTiffCrs: round-trips the fixture algebra, projected and geographic") {
    import graft.functions.GeoTiffCrs
    for (seed <- Seq(0L, 1L, 7L, 42L, 1499L, 987654L)) {
      val got = GeoTiffCrs.parse(GeoTiffCrs.buildGeoTiff(seed))
      val projected = seed % 2 == 0
      val epsg = if (projected) 32601 + (seed / 2 % 60).toInt
                 else 4001 + (seed / 2 % 900).toInt
      val expected = (epsg, if (projected) 1 else 2,
        (100000L + seed % 900000L) / 1000000.0,
        (50000L + seed % 450000L) / 1000000.0,
        seed * 1111L % 500000000L / 1000000.0,
        seed * 777L % 200000000L / 1000000.0)
      assert(got.contains(expected), s"seed $seed: $got")
    }
  }

  test("GeoTiffCrs: hostile and CRS-free bytes give null, not a throw") {
    import graft.functions.GeoTiffCrs
    assert(GeoTiffCrs.parse(Array[Byte]()).isEmpty)
    assert(GeoTiffCrs.parse("not a tiff at all".getBytes).isEmpty)
    assert(GeoTiffCrs.parse(Array.fill[Byte](200)(0x4d)).isEmpty)
    // a plain TIFF without a GeoKeyDirectory (the q112 GPS fixture)
    assert(GeoTiffCrs.parse(
      graft.functions.ImageMeta.buildTiffGps(1000000L, 2000000L)).isEmpty)
    // truncated GeoTIFF: every prefix parses to None or the full answer
    val full = GeoTiffCrs.buildGeoTiff(42L)
    for (cut <- Seq(4, 12, 60, 100, 140))
      assert(GeoTiffCrs.parse(java.util.Arrays.copyOf(full, cut)).isEmpty)
  }

  // ---- LAS point-cloud header byte-walk ----

  test("LasMeta: round-trips the fixture algebra incl. the 1.4 u64 count") {
    import graft.functions.LasMeta
    for (seed <- Seq(0L, 1L, 613L, 14999L)) {
      val got = LasMeta.parse(LasMeta.buildLas(seed))
      val minXu = seed * 13 % 340000000L - 170000000L
      val minYu = seed * 17 % 160000000L - 80000000L
      val minZu = seed % 5000000L
      val expected = (1, 4, (seed % 11).toInt, seed * 7 + 1,
        minXu / 1000000.0, (minXu + 1000000L + seed % 9000000L) / 1000000.0,
        minYu / 1000000.0, (minYu + 500000L + seed % 4500000L) / 1000000.0,
        minZu / 1000000.0, (minZu + 100000L + seed % 900000L) / 1000000.0)
      assert(got.contains(expected), s"seed $seed: $got")
    }
  }

  test("LasMeta: 1.4 u64 count wins over legacy; hostile bytes give null") {
    import graft.functions.LasMeta
    val h = LasMeta.buildLas(3L)
    // plant a u64 count above 2^32 and zero the legacy field (spec behavior
    // for >4G clouds); the parser must read the wide count
    val big = h.clone()
    val bb = java.nio.ByteBuffer.wrap(big)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(107); bb.putInt(0)
    bb.position(247); bb.putLong(5000000000L)
    assert(LasMeta.parse(big).exists(_._4 == 5000000000L))
    assert(LasMeta.parse(Array[Byte]()).isEmpty)
    assert(LasMeta.parse("LASX".getBytes ++ Array.fill[Byte](400)(1)).isEmpty)
    assert(LasMeta.parse(java.util.Arrays.copyOf(h, 100)).isEmpty)
  }

  // ---- block-mean image features over a REAL ImageIO decode ----

  test("ImageFeature64: block means equal the fixture pixel formula exactly") {
    import graft.functions.ImageFeature64
    for ((g, m) <- Seq((0L, 0L), (5L, 3L), (777L, 1L))) {
      val arr = ImageFeature64.compute(ImageFeature64.buildBmp(g, m))
      assert(arr != null, s"($g,$m) did not decode")
      val got = arr.toDoubleArray().toSeq
      val expected = (0 until 64).map { i =>
        val bx = i % 8; val by = i / 8
        val px = for (dy <- 0 to 1; dx <- 0 to 1) yield {
          val v = g * 256 + ((2 * by + dy) * 16 + (2 * bx + dx))
          (v * v % 999983L) % 252L + m
        }
        px.sum / 4.0
      }
      assert(got == expected, s"($g,$m)")
    }
  }

  test("ImageFeature64: centered cosine separates planted dups from strangers") {
    import graft.functions.ImageFeature64
    def feat(g: Long, m: Long): Array[Double] =
      ImageFeature64.compute(ImageFeature64.buildBmp(g, m))
        .toDoubleArray().map(_ - 128.0)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val groups = (0L until 40L)
    // within-group: the ≤3/255 member shift barely moves the vector
    for (g <- groups; m <- 1L to 3L)
      assert(cos(feat(g, 0), feat(g, m)) > 0.99, s"group $g member $m")
    // cross-group: quadratic mixing decorrelates the patterns
    for (a <- groups; b <- groups if a < b) {
      val c = cos(feat(a, 0), feat(b, 0))
      assert(c < 0.7, s"groups $a vs $b: cosine $c")
    }
  }

  test("holtSmoothByKey: per-key recursion matches holtSmooth run per key") {
    import graft.operators.Analyses
    def day(s: String): java.sql.Date = java.sql.Date.valueOf(s)
    val series = Seq(
      ("a", day("2024-01-01"), 10.0), ("a", day("2024-01-02"), 14.0),
      ("a", day("2024-01-03"), 11.5), ("a", day("2024-01-04"), 20.25),
      ("b", day("2024-01-01"), 5.0), ("b", day("2024-01-03"), 3.5),
      ("b", day("2024-01-05"), 8.75),
      ("only-one-point", day("2024-01-02"), 99.0))
      .toDF("k", "d", "v")
    val byKey = Analyses.holtSmoothByKey(series, "k", "d", "v")
      .orderBy("k", "d")
      .as[(String, java.sql.Date, Double, Double, Double, Double)]
      .collect().toSeq
    val perKey = Seq("a", "b").flatMap { k =>
      Analyses.holtSmooth(series.filter(col("k") === k), "d", "v")
        .orderBy("d")
        .as[(java.sql.Date, Double, Double, Double, Double)]
        .collect().map { case (d, v, l, t, f) => (k, d, v, l, t, f) }
    }
    assert(byKey == perKey) // and the 1-point key is dropped, not crashed
  }

  test("holtSmoothByKey: executor-side plan — FlatMapGroups, no driver collect") {
    import graft.operators.Analyses
    val series = Seq(("a", java.sql.Date.valueOf("2024-01-01"), 1.0),
      ("a", java.sql.Date.valueOf("2024-01-02"), 2.0)).toDF("k", "d", "v")
    val plan = Analyses.holtSmoothByKey(series, "k", "d", "v")
      .queryExecution.executedPlan.toString
    // flatMapGroups plans as MapGroupsExec: one hash exchange on the key,
    // sort-within-partitions, then the executor-side recursion
    assert(plan.contains("MapGroups"),
      s"expected a MapGroups (executor-side recursion), got:\n$plan")
    // the single-series form collects at CONSTRUCTION time; the by-key form
    // must not — building the frame above already proves it (no action ran)
  }

  test("ImageFeature64: non-images and tiny images give null") {
    import graft.functions.ImageFeature64
    assert(ImageFeature64.compute("plainly not an image".getBytes) == null)
    // a 4×4 BMP is below the 8×8 grid — null, not a crash
    val tiny = java.awt.image.BufferedImage.TYPE_INT_RGB
    val img = new java.awt.image.BufferedImage(4, 4, tiny)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    assert(ImageFeature64.compute(bos.toByteArray) == null)
  }
}
