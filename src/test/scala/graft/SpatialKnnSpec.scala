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
}
