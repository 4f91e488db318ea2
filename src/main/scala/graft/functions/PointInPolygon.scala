package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Exact point-in-polygon test as a native Catalyst expression — the engine
  * analog of the reference's PostGIS `GEOMETRY(POLYGON,4326)` + GIST-index
  * predicates (reference: database/schemas/init.sql:30,50,103; GIST indexes
  * init.sql:172,178 — the snapshot provisions PostGIS but never calls ST_*,
  * so semantics follow the standard even-odd ray-casting rule).
  *
  * Inputs: lon DOUBLE, lat DOUBLE, ring ARRAY<ARRAY<DOUBLE>> (closed or open
  * exterior ring of [lon, lat] pairs — GeoJSON `coordinates[0]`).
  *
  * Usage pattern at scale: ALWAYS behind the cheap conjunctive bbox prefilter
  * (`Spatial.pointInBbox`) so the exact test runs only on bbox survivors —
  * the engine-side replacement for the GIST index's filter/recheck split.
  *
  * Codegen: implemented with `doGenCode` emitting a tight Java loop (the
  * expression participates in whole-stage codegen rather than falling back
  * to interpreted eval per row).
  */
case class PointInPolygon(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_polygon"

  override def nullSafeEval(lonAny: Any, latAny: Any, ringAny: Any): Any = {
    val lon = lonAny.asInstanceOf[Double]
    val lat = latAny.asInstanceOf[Double]
    val ring = ringAny.asInstanceOf[ArrayData]
    PointInPolygon.contains(lon, lat, ring)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PointInPolygon.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (lon, lat, ring) =>
      s"${ev.value} = $cls.contains($lon, $lat, $ring);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PointInPolygon {
  /** Even-odd ray casting over an ArrayData ring. Boundary points follow the
    * half-open edge convention (consistent, not "on-boundary = inside"). */
  def contains(lon: Double, lat: Double, ring: ArrayData): Boolean = {
    val n = ring.numElements()
    if (n < 3) return false
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val pi = ring.getArray(i)
      val pj = ring.getArray(j)
      val xi = pi.getDouble(0); val yi = pi.getDouble(1)
      val xj = pj.getDouble(0); val yj = pj.getDouble(1)
      val crosses = (yi > lat) != (yj > lat) &&
        lon < (xj - xi) * (lat - yi) / (yj - yi) + xi
      if (crosses) inside = !inside
      j = i
      i += 1
    }
    inside
  }
}
