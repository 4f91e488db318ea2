package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.9 — the reference's one non-standard operator family: spatial
  * predicates over GeoJSON geometry (reference: PostGIS columns init.sql:30,
  * 50,103; GIST indexes init.sql:172,178; bbox util
  * shared/utils/__init__.py:181-194).
  *
  * Storage model (SURVEY §1.2): geometry = GeoJSON string + derived numeric
  * bbox columns persisted at write time. Predicates are then plain conjunctive
  * range comparisons — pushdown-friendly, codegen-friendly — with the exact
  * `point_in_polygon` Catalyst expression applied only to bbox survivors.
  * That two-phase filter/recheck split is exactly what a GIST index does.
  */
object Spatial {

  /** GeoJSON geometry schema (the subset the reference models:
    * Polygon + Point, shared/models/__init__.py:95,220). */
  val geojsonSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("coordinates", ArrayType(ArrayType(ArrayType(DoubleType))))))

  /** Exterior ring (GeoJSON `coordinates[0]`) parsed from a GeoJSON Polygon
    * string column: `array<array<double>>` of [lon, lat] pairs. */
  def polygonRing(geojson: Column): Column =
    element_at(from_json(geojson, geojsonSchema).getField("coordinates"), 1)

  /** F15/A3 — derived bbox from a ring, as a struct column. Persist this at
    * write time (the reference's trigger-maintained-derived-data analog). */
  def ringBbox(ring: Column): Column = struct(
    array_min(transform(ring, p => element_at(p, 1))).as("min_lon"),
    array_min(transform(ring, p => element_at(p, 2))).as("min_lat"),
    array_max(transform(ring, p => element_at(p, 1))).as("max_lon"),
    array_max(transform(ring, p => element_at(p, 2))).as("max_lat"))

  /** bbox-overlap predicate (polygon × polygon prefilter):
    * NOT (disjoint on either axis). Plain comparisons — Catalyst can push
    * and codegen it. */
  def bboxIntersects(a: Column, b: Column): Column =
    !(a.getField("max_lon") < b.getField("min_lon") ||
      b.getField("max_lon") < a.getField("min_lon") ||
      a.getField("max_lat") < b.getField("min_lat") ||
      b.getField("max_lat") < a.getField("min_lat"))

  /** point-in-bbox predicate (point × polygon prefilter). */
  def pointInBbox(lon: Column, lat: Column, b: Column): Column =
    lon.between(b.getField("min_lon"), b.getField("max_lon")) &&
      lat.between(b.getField("min_lat"), b.getField("max_lat"))

  /** Exact point-in-polygon (custom Catalyst expression with codegen —
    * graft.functions.PointInPolygon). Resolved through the function registry,
    * so `graft.GraftExtensions.register(spark)` (or the extensions class)
    * must have installed it on the session first. */
  def pointInPolygon(lon: Column, lat: Column, ring: Column): Column =
    call_function("point_in_polygon", lon, lat, ring)

  /** Exact polygon×polygon interior-overlap (custom Catalyst expression with
    * codegen — graft.functions.PolygonsOverlap): proper-edge-crossing OR
    * containment, the GIST "recheck" half of §2.9's polygon predicate. Like
    * `pointInPolygon`, resolved through the function registry (install
    * `graft.GraftExtensions` first) and ALWAYS used behind the
    * `bboxIntersects` prefilter. */
  def polygonsOverlap(ringA: Column, ringB: Column): Column =
    call_function("polygons_overlap", ringA, ringB)

  /** [[polygonsOverlap]] for the FULL GeoJSON Polygon nesting — each side
    * ARRAY<ARRAY<ARRAY<DOUBLE>>> of rings, ring 0 the exterior and the rest
    * interior rings (holes); overlap is of the regions (exterior minus
    * holes), so a footprint wholly inside an AOI's hole does NOT overlap.
    * Native codegen kernel (graft.functions.PolygonsOverlapFull). */
  def polygonsOverlapFull(ringsA: Column, ringsB: Column): Column =
    call_function("polygons_overlap_full", ringsA, ringsB)

  /** GeoJSON MultiPolygon × MultiPolygon overlap — each side
    * ARRAY<ARRAY<ARRAY<ARRAY<DOUBLE>>>> (components × rings × points × 2).
    * A union of polygons overlaps a union iff SOME component pair overlaps,
    * so the predicate composes from the scalar kernel with `exists` over
    * the component cross-product — per-row dimension-sized work (component
    * counts are AOI design constants), still inside codegen, no explode and
    * no join fan-out. */
  def multiPolygonsOverlap(multiA: Column, multiB: Column): Column =
    exists(multiA, a => exists(multiB, b => polygonsOverlapFull(a, b)))

  /** §2.9 — polygon×polygon spatial join (AOI × scene-footprint): bbox
    * prefilter (cheap conjunctive comparisons, evaluated first) AND exact
    * ring-overlap test on survivors only. Same scale contract as
    * `spatialJoin`: broadcast the small side; for two large polygon sets use
    * the grid-cell equi-join (`gridCells` on both bboxes) with this
    * predicate as the post-join filter. */
  def polygonJoin(big: DataFrame, bigRing: Column, bigBbox: Column,
                  small: DataFrame, smallRing: Column, smallBbox: Column): DataFrame =
    big.join(broadcast(small),
      bboxIntersects(bigBbox, smallBbox) && polygonsOverlap(bigRing, smallRing))

  /** J12 — spatial join of points against polygons: bbox prefilter (cheap,
    * evaluated first) AND exact test (only on survivors).
    *
    * Scale note: with a small polygon side this is a broadcast nested-loop
    * join over an already-cheap predicate — fine. For polygon sets too large
    * to broadcast, pre-partition both sides by grid cell (add a `cell` column
    * = floor(lon/cellSize), floor(lat/cellSize), explode polygons to covered
    * cells) so the join becomes an equi-join on cell; `gridCells` provides
    * the cell assignment. */
  def spatialJoin(points: DataFrame, lon: Column, lat: Column,
                  polys: DataFrame, ringCol: Column, bboxCol: Column): DataFrame =
    points.join(broadcast(polys),
      pointInBbox(lon, lat, bboxCol) && pointInPolygon(lon, lat, ringCol))

  /** Grid cells covered by a bbox at `cellDeg` resolution — the equi-join key
    * for grid-partitioned (non-broadcast) spatial joins. */
  def gridCells(bbox: Column, cellDeg: Double): Column = {
    val minCx = floor(bbox.getField("min_lon") / cellDeg).cast("long")
    val maxCx = floor(bbox.getField("max_lon") / cellDeg).cast("long")
    val minCy = floor(bbox.getField("min_lat") / cellDeg).cast("long")
    val maxCy = floor(bbox.getField("max_lat") / cellDeg).cast("long")
    flatten(transform(sequence(minCx, maxCx), cx =>
      transform(sequence(minCy, maxCy), cy =>
        concat_ws(":", cx, cy))))
  }

  /** Grid cell of a single point at the same resolution. */
  def pointCell(lon: Column, lat: Column, cellDeg: Double): Column =
    concat_ws(":",
      floor(lon / cellDeg).cast("long"),
      floor(lat / cellDeg).cast("long"))

  /** Grid-partitioned spatial join — the non-broadcast path for polygon sets
    * too large to broadcast: polygons explode to their covered cells, points
    * key to their cell, and the join becomes a shuffled EQUI-join on the cell
    * id (plus the exact predicate on survivors). Equivalent results to
    * `spatialJoin`; chooses shuffle over broadcast. Cell size should be on
    * the order of the median polygon extent — too fine explodes polygons
    * into many cells, too coarse degrades to few fat keys. */
  def gridJoin(points: DataFrame, lonCol: String, latCol: String,
               polys: DataFrame, bboxCol: String, cellDeg: Double,
               exact: Option[(Column, Column) => Column] = None): DataFrame = {
    val cellPolys = polys.withColumn("__cell",
      explode(gridCells(col(bboxCol), cellDeg)))
    val cellPts = points.withColumn("__cell",
      pointCell(col(lonCol), col(latCol), cellDeg))
    val joined = cellPts.join(cellPolys, "__cell")
      .filter(pointInBbox(col(lonCol), col(latCol), col(bboxCol)))
    val refined = exact.fold(joined)(f => joined.filter(f(col(lonCol), col(latCol))))
    // a polygon spanning k cells can meet the same point once per cell
    refined.drop("__cell").distinct()
  }

  /** Great-circle (haversine) distance in km. One mirrored double tree —
    * sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2) with squares spelled as products
    * (never `pow`) so an external oracle evaluates the identical expression
    * shape; outputs feed the repo's round-to-6-dp-before-compare contract
    * because JVM and libm trig can differ in the last ulp. */
  def haversineKm(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val hdphi = (radians(lat2) - radians(lat1)) / 2
    val hdlmb = (radians(lon2) - radians(lon1)) / 2
    lit(2.0) * lit(6371.0088) * asin(sqrt(
      sin(hdphi) * sin(hdphi) +
        cos(radians(lat1)) * cos(radians(lat2)) * sin(hdlmb) * sin(hdlmb)))
  }

  /** Radius (distance-within) join — the ST_DWithin analog: every (query,
    * point) pair within `radiusKm` great-circle km. Candidates come from the
    * grid machinery: each query point expands to a CONSERVATIVE lat/lon
    * window (1° lat ≥ 110.574 km everywhere; the lon shrink factor uses the
    * largest |lat| reachable inside the window, degenerating to the full
    * lon band near the poles), windows crossing the antimeridian SPLIT into
    * two disjoint boxes (so wrap-around neighbors are found and nothing
    * pairs twice), and [[gridJoin]] turns the boxes into a shuffled cell
    * equi-join — never a cross join. Survivors verify on the 6-dp-rounded
    * haversine distance. */
  def radiusJoin(points: DataFrame, pidCol: String, plonCol: String, platCol: String,
                 queries: DataFrame, qidCol: String, qlonCol: String, qlatCol: String,
                 radiusKm: Double, cellDeg: Double = 5.0): DataFrame = {
    require(radiusKm > 0 && cellDeg > 0, "need radiusKm > 0 and cellDeg > 0")
    val dLat = radiusKm / 110.574
    def box(lo: Column, hi: Column, minLat: Column, maxLat: Column) =
      struct(lo.as("min_lon"), minLat.as("min_lat"), hi.as("max_lon"), maxLat.as("max_lat"))
    val qb = queries
      .select(col(qidCol), col(qlonCol).as("__qlon"), col(qlatCol).as("__qlat"))
      .withColumn("__minLat", greatest(lit(-90.0), col("__qlat") - dLat))
      .withColumn("__maxLat", least(lit(90.0), col("__qlat") + dLat))
      .withColumn("__latReach", least(lit(90.0), abs(col("__qlat")) + lit(dLat)))
      .withColumn("__dlon",
        when(col("__latReach") >= 89.0, lit(180.0)).otherwise(
          least(lit(180.0), lit(radiusKm) / (lit(111.320) * cos(radians(col("__latReach")))))))
      .withColumn("__lo", col("__qlon") - col("__dlon"))
      .withColumn("__hi", col("__qlon") + col("__dlon"))
      .withColumn("bbox", explode(
        when(col("__dlon") >= 180.0,
          array(box(lit(-180.0), lit(180.0), col("__minLat"), col("__maxLat"))))
        .when(col("__lo") < -180.0, array(
          box(lit(-180.0), col("__hi"), col("__minLat"), col("__maxLat")),
          box(col("__lo") + 360.0, lit(180.0), col("__minLat"), col("__maxLat"))))
        .when(col("__hi") > 180.0, array(
          box(col("__lo"), lit(180.0), col("__minLat"), col("__maxLat")),
          box(lit(-180.0), col("__hi") - 360.0, col("__minLat"), col("__maxLat"))))
        .otherwise(array(box(col("__lo"), col("__hi"), col("__minLat"), col("__maxLat"))))))
      .select(col(qidCol), col("__qlon"), col("__qlat"), col("bbox"))
    gridJoin(points.select(col(pidCol), col(plonCol), col(platCol)),
        plonCol, platCol, qb, "bbox", cellDeg)
      .withColumn("dist_km",
        round(haversineKm(col(plonCol), col(platCol), col("__qlon"), col("__qlat")), 6))
      .filter(col("dist_km") <= radiusKm)
      .select(col(qidCol), col(pidCol), col("dist_km"))
  }

  /** Z-order (Morton) locality key: lon/lat quantized to `bits`-bit cells,
    * bit-interleaved into one long whose ordering is the Z space-filling
    * curve. Rows sorted/range-partitioned by this key put spatially-near
    * points in the same file ranges, so a bbox predicate prunes most
    * partitions at scan time (`WHERE morton BETWEEN …` per covered Z range)
    * — the layout answer for spatial scans at 100 TB, where a per-query
    * spatial join can't afford to read the whole corpus. Pure per-row
    * integer expression (floor/shift/mask — codegen, no shuffle, no UDF);
    * out-of-range coordinates clamp to the boundary cell. */
  def mortonKey(lon: Column, lat: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "need 0 < bits <= 31")
    val n = 1L << bits
    def cell(c: Column, lo: Double, extent: Double): Column =
      least(greatest(floor((c - lo) / extent * n), lit(0L)), lit(n - 1))
    val nx = cell(lon, -180.0, 360.0)
    val ny = cell(lat, -90.0, 180.0)
    (0 until bits).map { i =>
      shiftleft(shiftright(nx, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ny, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-ordered layout: range-partition on the Morton key and sort within
    * partitions — the write-once clustering pass before a partitioned/
    * bucketed write. Adjacent Z ranges land in adjacent output files, giving
    * bbox scans min/max-pruning on the key column. */
  def zOrdered(df: DataFrame, lonCol: String, latCol: String,
               numPartitions: Int, bits: Int = 16): DataFrame = {
    val keyed = df.withColumn("__z", mortonKey(col(lonCol), col(latCol), bits))
    keyed.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
  }

  /** DBSCAN-lite grid-density clustering: bucket points into integer grid
    * cells, keep cells whose count ≥ `minNum/minDen` × the mean cell count
    * ("core" cells, cut evaluated in exact integer algebra), and connect
    * core cells that are 8-neighbors into clusters labeled by their
    * minimum `gx*1000+gy` cell id.
    *
    * Scale shape: the per-point cell assignment + count is ONE distributed
    * hash aggregation over the corpus. The connected-components step then
    * runs on the CELL table, whose size is bounded by the grid design
    * (x-domain × y-domain), not by the data — so the union-find runs on the
    * driver over that dimension-sized aggregate, the same bounded-model-fit
    * discipline as the PQ codebook fit (Similarity.scala), never a
    * corpus-sized collect. Output: one row per cluster
    * (cluster_id, n_cells, n_points), integer-exact.
    *
    * `df` must expose integer columns `gx`, `gy`. */
  def gridDensityClusters(df: DataFrame, minNum: Long,
                          minDen: Long): DataFrame = {
    val spark = df.sparkSession
    val cells = df.groupBy(col("gx"), col("gy")).agg(count(lit(1)).as("c"))
    // the core cut "c ≥ (minNum/minDen) · avg(c)" restated in EXACT integer
    // algebra — c·n_cells·minDen ≥ minNum·total — so a cell landing exactly
    // on the boundary can never flip between engines on a double-rounding
    // ulp (the suite's boundary discipline; avg(c) itself is never computed)
    val avg = cells.agg(count(lit(1)).as("__ncells"),
      sum(col("c")).as("__total"))
    val core = cells.crossJoin(broadcast(avg))
      .filter(col("c") * col("__ncells") * lit(minDen) >=
        lit(minNum) * col("__total"))
      .select(col("gx"), col("gy"), col("c"))
    // bounded collect: |core| ≤ |grid|, a design-time constant — ENFORCED,
    // not assumed: the union-find below is O(cells²) on the driver, so a
    // caller passing a fine grid must fail loudly instead of silently
    // burning driver CPU on a corpus-shaped quadratic
    val rows = core.limit(4097).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    require(rows.length <= 4096,
      s"gridDensityClusters: ${rows.length}+ core cells exceed the 4096-cell " +
        "driver bound — coarsen the grid (the union-find is O(cells²))")
    val id = rows.map { case (gx, gy, _) => gx * 1000L + gy }
    val index = id.zipWithIndex.toMap
    val parent = Array.tabulate(rows.length)(identity)
    def find(i: Int): Int = { var r = i; while (parent(r) != r) r = parent(r)
      var c = i; while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }; r }
    def union(a: Int, b: Int): Unit = { val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val (ax, ay, _) = rows(i); val (bx, by, _) = rows(j)
      if (math.abs(ax - bx) <= 1 && math.abs(ay - by) <= 1) union(i, j)
    }
    // label = min cell id in the component (ids ascend with index order
    // only within equal gx*1000+gy ordering — resolve via explicit min)
    val byRoot = rows.indices.groupBy(find)
    val out = byRoot.toSeq.map { case (_, members) =>
      val cid = members.map(id(_)).min
      (cid, members.size.toLong, members.map(rows(_)._3).sum)
    }.sortBy(_._1)
    import spark.implicits._
    out.toDF("cluster_id", "n_cells", "n_points")
  }
}
