package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Spatial}

class SpatialKnnSpec extends SparkSuite {
  import spark.implicits._

  // unit square as GeoJSON
  val square = """{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}"""

  test("GeoJSON ring parse + derived bbox") {
    val df = Seq(square).toDF("geo")
      .select(Spatial.ringBbox(Spatial.polygonRing(col("geo"))).as("b"))
      .select("b.min_lon", "b.min_lat", "b.max_lon", "b.max_lat")
    assert(df.as[(Double, Double, Double, Double)].collect().head == ((0.0, 0.0, 10.0, 10.0)))
  }

  test("point_in_polygon: goldens incl. concave polygon and degenerate ring") {
    // concave "arrow": (0,0) (4,0) (4,4) (2,2) (0,4) — (3,3.5) is outside the notch
    val ring = Seq(Seq(0.0, 0.0), Seq(4.0, 0.0), Seq(4.0, 4.0), Seq(2.0, 2.0), Seq(0.0, 4.0))
    val pts = Seq(
      (1L, 2.0, 1.0, true),   // inside body
      (2L, 3.0, 3.5, false),  // inside bbox but in the notch
      (3L, 5.0, 1.0, false),  // outside
      (4L, 3.5, 2.5, true)    // inside right lobe
    ).toDF("id", "lon", "lat", "expected")
    val out = pts.withColumn("got",
        Spatial.pointInPolygon(col("lon"), col("lat"),
          typedLit(ring)))
      .filter(col("got") =!= col("expected"))
    assert(out.count() == 0)
    // degenerate ring (< 3 points) → false, not a crash
    val degen = Seq((0.5, 0.5)).toDF("lon", "lat")
      .select(Spatial.pointInPolygon(col("lon"), col("lat"),
        typedLit(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)))).as("r"))
    assert(degen.as[Boolean].collect().head == false)
  }

  test("point_in_polygon callable from SQL via extension registration") {
    val n = spark.sql(
      """SELECT point_in_polygon(0.5D, 0.5D,
         array(array(0D,0D), array(1D,0D), array(1D,1D), array(0D,1D))) AS r""")
      .as[Boolean].collect().head
    assert(n)
  }

  test("polygons_overlap: goldens — cross, containment, star, disjoint, concave") {
    def ring(pts: (Double, Double)*): Seq[Seq[Double]] =
      pts.map { case (x, y) => Seq(x, y) }
    val unitSq = ring((0, 0), (10, 0), (10, 10), (0, 10))
    val cases = Seq(
      // overlapping squares (edges properly cross)
      (1L, unitSq, ring((5, 5), (15, 5), (15, 15), (5, 15)), true),
      // full containment, no edge crossings (small square inside big)
      (2L, unitSq, ring((2, 2), (4, 2), (4, 4), (2, 4)), true),
      // containment the other way round (argument order must not matter)
      (3L, ring((2, 2), (4, 2), (4, 4), (2, 4)), unitSq, true),
      // star-of-david: triangles cross edge-to-edge, NO vertex of either
      // inside the other — only the proper-crossing branch catches this
      (4L, ring((0, 1), (10, 1), (5, 9)), ring((0, 7), (10, 7), (5, -1)), true),
      // disjoint
      (5L, unitSq, ring((20, 20), (30, 20), (30, 30), (20, 30)), false),
      // disjoint but bbox-overlapping: concave arrow's notch holds a
      // triangle that touches nothing
      (6L, ring((0, 0), (4, 0), (4, 4), (2, 2), (0, 4)),
        ring((1.6, 3.4), (2.4, 3.4), (2.0, 3.9)), false),
      // degenerate ring (< 3 points) → false, not a crash
      (7L, unitSq, ring((1, 1), (2, 2)), false),
      // identical rings: interiors coincide → overlap, despite every probe
      // vertex lying on the boundary (the cyclic-identity fast path)
      (8L, unitSq, unitSq, true),
      // same ring, rotated start vertex and reversed orientation
      (9L, unitSq, ring((10, 10), (0, 10), (0, 0), (10, 0)), true)
    ).toDF("id", "a", "b", "expected")
    val bad = cases.withColumn("got",
        Spatial.polygonsOverlap(col("a"), col("b")))
      .filter(col("got") =!= col("expected"))
    assert(bad.count() == 0, bad.collect().mkString(","))
    // SQL surface
    val viaSql = spark.sql(
      """SELECT polygons_overlap(
           array(array(0D,0D), array(10D,0D), array(10D,10D), array(0D,10D)),
           array(array(5D,5D), array(15D,5D), array(15D,15D), array(5D,15D))) AS r""")
      .as[Boolean].collect().head
    assert(viaSql)
  }

  test("polygons_overlap_full: holes and multipolygon goldens") {
    def ring(pts: (Double, Double)*): Seq[Seq[Double]] =
      pts.map { case (x, y) => Seq(x, y) }
    val outer = ring((0, 0), (20, 0), (20, 20), (0, 20))
    val hole = ring((5, 5), (15, 5), (15, 15), (5, 15))
    val annulus = Seq(outer, hole)
    def solid(r: Seq[Seq[Double]]) = Seq(r)
    val cases = Seq(
      // footprint wholly inside the hole: bbox overlaps, region does not
      (1L, annulus, solid(ring((8, 8), (12, 8), (12, 12), (8, 12))), false),
      // footprint crossing the hole boundary into the annulus material
      (2L, annulus, solid(ring((8, 8), (18, 8), (18, 12), (8, 12))), true),
      // footprint in the annulus material only (between hole and exterior)
      (3L, annulus, solid(ring((1, 1), (4, 1), (4, 4), (1, 4))), true),
      // footprint containing the whole hole (covers annulus material around it)
      (4L, annulus, solid(ring((4, 4), (16, 4), (16, 16), (4, 16))), true),
      // annulus inside the footprint entirely
      (5L, annulus, solid(ring((-5, -5), (25, -5), (25, 25), (-5, 25))), true),
      // footprint disjoint from the exterior
      (6L, annulus, solid(ring((30, 30), (40, 30), (40, 40), (30, 40))), false),
      // same exterior, disjoint holes: each one's hole is the other's material
      (7L, annulus,
        Seq(outer, ring((1, 1), (3, 1), (3, 3), (1, 3))), true),
      // identical polygon-with-hole structure (hole ring rotated/reversed)
      (8L, annulus,
        Seq(outer, ring((5, 15), (15, 15), (15, 5), (5, 5))), true),
      // nested holes, same exterior: material between the two hole rings
      (9L, annulus,
        Seq(outer, ring((7, 7), (13, 7), (13, 13), (7, 13))), true),
      // no-holes polygons degrade to the simple-ring semantics
      (10L, solid(outer), solid(ring((25, 0), (35, 0), (35, 10), (25, 10))), false),
      (11L, solid(outer), solid(ring((10, 10), (30, 10), (30, 30), (10, 30))), true)
    ).toDF("id", "a", "b", "expected")
    val bad = cases.withColumn("got",
        Spatial.polygonsOverlapFull(col("a"), col("b")))
      .filter(col("got") =!= col("expected"))
    assert(bad.count() == 0, bad.collect().mkString(","))
    // argument order must not matter
    val badRev = cases.withColumn("got",
        Spatial.polygonsOverlapFull(col("b"), col("a")))
      .filter(col("got") =!= col("expected"))
    assert(badRev.count() == 0, badRev.collect().mkString(","))
    // multipolygon composition: component 2 of A overlaps component 1 of B
    val mp = Seq(
      (1L,
        Seq(solid(ring((0, 0), (5, 0), (5, 5), (0, 5))),
          solid(ring((50, 50), (60, 50), (60, 60), (50, 60)))),
        Seq(solid(ring((55, 55), (70, 55), (70, 70), (55, 70))),
          solid(ring((-20, -20), (-10, -20), (-10, -10), (-20, -10)))),
        true),
      (2L,
        Seq(solid(ring((0, 0), (5, 0), (5, 5), (0, 5)))),
        Seq(solid(ring((10, 10), (15, 10), (15, 15), (10, 15)))),
        false)
    ).toDF("id", "ma", "mb", "expected")
    val badMp = mp.withColumn("got",
        Spatial.multiPolygonsOverlap(col("ma"), col("mb")))
      .filter(col("got") =!= col("expected"))
    assert(badMp.count() == 0, badMp.collect().mkString(","))
    // SQL surface
    val viaSql = spark.sql(
      """SELECT polygons_overlap_full(
           array(array(array(0D,0D), array(20D,0D), array(20D,20D), array(0D,20D)),
                 array(array(5D,5D), array(15D,5D), array(15D,15D), array(5D,15D))),
           array(array(array(8D,8D), array(12D,8D), array(12D,12D), array(8D,12D)))) AS r""")
      .as[Boolean].collect().head
    assert(!viaSql)
  }

  test("polygonJoin: bbox prefilter + exact overlap equals brute-force filter") {
    // 40 triangles marching across a fixed AOI square; join verdicts must
    // equal the per-row exact predicate with no bbox prefilter at all
    val aoiRing = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(10.0, 10.0), Seq(0.0, 10.0))
    val tris = (0 until 40).map { i =>
      val x = i - 20.0
      (i.toLong, Seq(Seq(x, x / 3), Seq(x + 3, x / 3 + 1), Seq(x + 1, x / 3 + 4)))
    }.toDF("id", "ring")
      .withColumn("bbox", Spatial.ringBbox(col("ring")))
    val aoi = Seq(1).toDF("x")
      .select(typedLit(aoiRing).as("aoi_ring"))
      .withColumn("aoi_bbox", Spatial.ringBbox(col("aoi_ring")))
    val viaJoin = Spatial.polygonJoin(tris, col("ring"), col("bbox"),
        aoi, col("aoi_ring"), col("aoi_bbox"))
      .select("id").as[Long].collect().toSet
    val brute = tris.filter(Spatial.polygonsOverlap(col("ring"), typedLit(aoiRing)))
      .select("id").as[Long].collect().toSet
    assert(viaJoin == brute)
    assert(brute.nonEmpty && brute.size < 40, s"fixture should mix verdicts: $brute")
  }

  test("bboxIntersects: overlap, touch, disjoint") {
    def bb(a: Double, b: Double, c: Double, d: Double) =
      struct(lit(a).as("min_lon"), lit(b).as("min_lat"), lit(c).as("max_lon"), lit(d).as("max_lat"))
    val df = Seq(1).toDF("x").select(
      Spatial.bboxIntersects(bb(0, 0, 10, 10), bb(5, 5, 15, 15)).as("overlap"),
      Spatial.bboxIntersects(bb(0, 0, 10, 10), bb(10, 10, 20, 20)).as("touch"),
      Spatial.bboxIntersects(bb(0, 0, 10, 10), bb(11, 0, 20, 10)).as("disjoint"))
    assert(df.as[(Boolean, Boolean, Boolean)].collect().head == ((true, true, false)))
  }

  test("grid cells cover the bbox at the given resolution") {
    val cells = Seq(1).toDF("x").select(Spatial.gridCells(
      struct(lit(-1.5).as("min_lon"), lit(0.0).as("min_lat"),
        lit(1.5).as("max_lon"), lit(0.5).as("max_lat")), 1.0).as("c"))
      .as[Seq[String]].collect().head
    assert(cells.toSet == Set("-2:0", "-1:0", "0:0", "1:0"))
  }

  test("gridJoin equals broadcast point-in-bbox join") {
    val boxes = Tables.nation(spark, sf).select(col("n_name"), struct(
      (col("n_nationkey") * 29 % 300 - 170).cast("double").as("min_lon"),
      (col("n_nationkey") * 17 % 140 - 80).cast("double").as("min_lat"),
      (col("n_nationkey") * 29 % 300 - 170 + 40).cast("double").as("max_lon"),
      (col("n_nationkey") * 17 % 140 - 80 + 30).cast("double").as("max_lat")).as("bbox"))
    val pts = Tables.customer(spark, sf).select(col("c_custkey"),
      (col("c_custkey") * 7 % 360 - 180).cast("double").as("lon"),
      (col("c_custkey") * 13 % 180 - 90).cast("double").as("lat"))
    val viaBroadcast = pts.join(broadcast(boxes),
        Spatial.pointInBbox(col("lon"), col("lat"), col("bbox")))
      .select("c_custkey", "n_name").as[(Long, String)].collect().toSet
    val viaGrid = Spatial.gridJoin(pts, "lon", "lat", boxes, "bbox", cellDeg = 25.0)
      .select("c_custkey", "n_name").as[(Long, String)].collect().toSet
    assert(viaGrid == viaBroadcast && viaGrid.nonEmpty)
  }

  test("embeddingNearDups: planted near-dups recovered with recall >= 0.9, no false positives") {
    import graft.operators.Dedup
    // Fixture embeddings are near-random (max pairwise cosine ≈ 0.51), so a
    // production threshold would match nothing — plant one perturbed copy of
    // each vector (±5% per-element noise → cosine ≈ 0.995) and assert the
    // banded LSH + verify pipeline finds the planted pairs.
    val base = Tables.embeddings(spark, sf).limit(200)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("embedding"))
    val noise = array((0 until 64).map(i =>
      lit(1.0 + 0.05 * Similarity.planeWeight(999, i))): _*)
    val dups = base.select((col("vec_id") + 100000L).as("vec_id"),
      zip_with(col("embedding"), noise, (x, n) => x * n).as("embedding"))
    val e = base.union(dups)
    val got = Dedup.embeddingNearDups(e, "vec_id", "embedding", dim = 64,
      threshold = 0.9, nBands = 8, rowsPerBand = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // ground truth by brute force on the driver (400 vecs)
    val vecs = e.as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val truth = (for {
      (i, vi) <- vecs.toSeq; (j, vj) <- vecs.toSeq if i < j
      if cos(vi, vj) >= 0.9
    } yield (i, j)).toSet
    assert(truth.size >= 200, s"expected >=200 planted pairs, got ${truth.size}")
    // tolerance at the round(·,6) threshold boundary only
    assert(got.forall { case (i, j) => cos(vecs(i), vecs(j)) >= 0.9 - 1e-5 },
      s"false positives: ${got.filter { case (i, j) => cos(vecs(i), vecs(j)) < 0.9 - 1e-5 }.take(3)}")
    val recall = truth.count(got.contains).toDouble / truth.size
    assert(recall >= 0.9, s"banded near-dup recall too low: $recall of ${truth.size}")
  }

  test("hyperplane_bands: SQL-callable, matches driver-side sign computation") {
    val row = spark.sql("SELECT hyperplane_bands(array(1.0D, -2.0D), 2, 2, 3) AS b")
      .as[Seq[String]].collect().head
    val expected = (0 until 2).map { b =>
      (0 until 3).map { r =>
        val p = b * 3 + r
        val s = 1.0 * Similarity.planeWeight(p, 0) + (-2.0) * Similarity.planeWeight(p, 1)
        if (s >= 0) '1' else '0'
      }.mkString
    }
    assert(row == expected)
  }

  test("cosine: identical vectors → 1, orthogonal → 0") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 2.0)))
      .toDF("a", "b", "c")
      .select(Similarity.cosine(col("a"), col("b")).as("same"),
        Similarity.cosine(col("a"), col("c")).as("orth"))
    val (same, orth) = df.as[(Double, Double)].collect().head
    assert(math.abs(same - 1.0) < 1e-12 && math.abs(orth) < 1e-12)
  }

  test("LSH ANN recall vs brute-force baseline on fixture embeddings") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 20)
    val brute = Similarity.bruteKnn(e, q, "vec_id", "embedding", k = 5, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // Fixture cosines are near-random (top-5 sims ≈ 0.3-0.5), the hardest
    // regime for cosine LSH — hamming-2 multi-probe (11 of 16 buckets) is
    // what it takes to hold 0.8 recall here. At production near-dup sims
    // (0.9+) the same scheme prunes far more aggressively.
    val lsh = Similarity.lshKnn(e, q, "vec_id", "embedding", dim = 64,
      nPlanes = 4, k = 5, probeRadius = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(lsh.contains).toDouble / brute.size
    assert(recall >= 0.8, s"LSH recall too low: $recall")
    assert(lsh.nonEmpty && brute.size == 100)
  }

  test("quantizeInt8: hand-computed codes, constant dim, roundtrip error bound") {
    val embs = Seq(
      (1L, Array(0.0f, 10.0f, 7.0f)),
      (2L, Array(1.0f, 10.0f, 3.0f)),
      (3L, Array(0.5f, 10.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(embs, "vec_id", "embedding")
    val codes = q.select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    // dim0: min 0 max 1 -> codes 0, 255, round(127.5)=128
    // dim1: constant -> 0; dim2: min 3 max 7 -> (7,3,5) -> 255, 0, round(127.5)=128
    assert(codes == Map(
      1L -> Seq(0, 0, 255), 2L -> Seq(255, 0, 0), 3L -> Seq(128, 0, 128)))
    // roundtrip: every reconstructed value within half a step of the original
    val rt = Similarity.dequantizeInt8(q)
      .join(embs, "vec_id")
      .select(col("vec_id"), col("decoded"), col("embedding"), col("mins"), col("maxs"))
      .as[(Long, Seq[Double], Seq[Float], Seq[Double], Seq[Double])].collect()
    rt.foreach { case (_, dec, orig, mins, maxs) =>
      dec.indices.foreach { i =>
        val step = (maxs(i) - mins(i)) / 255.0
        assert(math.abs(dec(i) - orig(i)) <= step / 2 + 1e-12)
      }
    }
  }

  test("quantizeInt8 roundtrip bound holds on fixture embeddings") {
    val e = Tables.embeddings(spark, sf)
    val q = Similarity.quantizeInt8(e, "vec_id", "embedding")
    val bad = Similarity.dequantizeInt8(q)
      .join(e, "vec_id")
      .select(size(filter(zip_with(
        zip_with(col("decoded"), col("embedding").cast("array<double>"), (d, o) => abs(d - o)),
        zip_with(col("maxs"), col("mins"), (mx, mn) => (mx - mn) / 510.0d + 1e-12),
        (err, bound) => err > bound), x => x)).as("n_bad"))
      .agg(sum(col("n_bad"))).as[Long].head()
    assert(bad == 0L)
  }

  test("mortonKey matches a reference bit-interleave and preserves locality") {
    // reference interleave on the same 16-bit quantization
    def ref(lon: Double, lat: Double): Long = {
      def cell(c: Double, lo: Double, extent: Double): Long =
        math.min(math.max(math.floor((c - lo) / extent * 65536).toLong, 0L), 65535L)
      val (nx, ny) = (cell(lon, -180, 360), cell(lat, -90, 180))
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | ((nx >> i & 1L) << (2 * i)) | ((ny >> i & 1L) << (2 * i + 1))
      }
    }
    val pts = Seq((0.0, 0.0), (-180.0, -90.0), (179.9, 89.9), (12.34, -56.78),
      (-0.001, 0.001), (200.0, 100.0) /* clamps */).toDF("lon", "lat")
    val got = pts.withColumn("m", Spatial.mortonKey(col("lon"), col("lat")))
      .as[(Double, Double, Long)].collect()
    got.foreach { case (lon, lat, m) => assert(m == ref(lon, lat), s"($lon,$lat)") }
    // locality: two points in the same quantized cell share the key; a far
    // point differs in high bits (different top-level Z quadrant)
    val near = ref(10.0001, 20.0001)
    assert(ref(10.0002, 20.0002) == near)
    assert((ref(-170.0, -80.0) >> 28) != (near >> 28))
  }

  test("zOrdered range-partitions by the morton key (sorted, non-overlapping)") {
    val df = (1L to 2000L).map { i =>
      (i, (i * 7 % 360 - 180).toDouble, (i * 13 % 180 - 90).toDouble)
    }.toDF("id", "lon", "lat")
    val parts = Spatial.zOrdered(df, "lon", "lat", numPartitions = 8)
      .select(col("__z"), spark_partition_id().as("pid"))
      .groupBy("pid").agg(min("__z").as("lo"), max("__z").as("hi"))
      .orderBy("lo").as[(Int, Long, Long)].collect()
    assert(parts.length > 1)
    // partitions cover disjoint, ordered Z ranges -> file-level min/max
    // pruning works for bbox scans
    parts.sliding(2).foreach { case Array(a, b) => assert(a._3 <= b._2); case _ => }
  }

  test("pqKnnSeeded: planted near-duplicates survive the 32x-compressed ADC scan") {
    val e = Tables.embeddings(spark, sf)
    val planted = e.filter(col("vec_id").between(100L, 109L))
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    // queries = slightly perturbed copies of corpus vectors (the retrieval
    // task ANN exists for; general top-k on this ISOTROPIC fixture is
    // information-theoretically hard for any quantizer)
    val qs = planted.toSeq.map { case (id, v) =>
      (id + 10000L, v.zipWithIndex.map { case (x, i) =>
        x + (if (i % 2 == 0) 0.01f else -0.01f) })
    }.toDF("vec_id", "embedding")
    val out = Similarity.pqKnnSeeded(e, qs, "vec_id", "embedding",
        k = 1, m = 8, ksub = 16, dim = 64, candMult = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val hits = planted.count { case (id, _) => out.get(id + 10000L).contains(id) }
    assert(hits >= 8, s"planted recall $hits/10")
  }

  test("int8Knn: exact rerank matches bruteKnn on the candidate-covered top-k") {
    val e = Tables.embeddings(spark, sf)
    val qs = e.filter(col("vec_id") < 10)
    val brute = Similarity.bruteKnn(e, qs, "vec_id", "embedding", k = 5, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val int8 = Similarity.int8Knn(e, qs, "vec_id", "embedding", k = 5, dim = 64, candMult = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // recall@5 of the compressed scan vs exact brute force
    val recall = (brute & int8).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall=$recall")
    // the reranked sims are the EXACT cosine: any common pair agrees with brute
    val bs = Similarity.bruteKnn(e, qs, "vec_id", "embedding", k = 5, dim = 64)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 6).as("sim"))
    val is = Similarity.int8Knn(e, qs, "vec_id", "embedding", k = 5, dim = 64)
    val disagree = bs.join(is, Seq("query_id", "neighbor_id"))
      .filter(bs("sim") =!= is("sim"))
    assert(disagree.count() == 0)
  }

  test("haversineKm: known city distance; radiusJoin handles wrap and pole") {
    // London -> Paris great-circle ~343.5 km
    val lp = Seq((1)).toDF("x").select(
      Spatial.haversineKm(lit(-0.1278), lit(51.5074), lit(2.3522), lit(48.8566)).as("d"))
      .head().getDouble(0)
    assert(math.abs(lp - 343.5) < 1.0, s"London-Paris got $lp")

    val pts = Seq(
      (1L, 179.9, 0.0),   // antimeridian east side
      (2L, -179.9, 0.0),  // west side: ~22.26 km from p1 across the seam
      (3L, 0.0, 89.9),    // near-pole
      (4L, 180.0, 89.9),  // other side of the pole: ~22.24 km from p3
      (5L, 0.0, 0.0)      // far from everything
    ).toDF("pid", "lon", "lat")
    val qs = Seq((10L, -179.95, 0.0), (20L, 90.0, 89.95)).toDF("qid", "qlon", "qlat")
    val got = Spatial.radiusJoin(pts, "pid", "lon", "lat",
        qs, "qid", "qlon", "qlat", radiusKm = 30.0, cellDeg = 5.0)
      .select("qid", "pid").as[(Long, Long)].collect().toSet
    // q10 sits 0.05° west of the seam: reaches p2 directly and p1 ACROSS it;
    // q20 sits 0.05° from the pole: reaches both near-pole points
    assert(got == Set((10L, 1L), (10L, 2L), (20L, 3L), (20L, 4L)), s"got $got")
  }
}
