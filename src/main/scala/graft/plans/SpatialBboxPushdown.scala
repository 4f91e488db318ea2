package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression,
  GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.DoubleType

import graft.functions.PointInPolygon

/** Catalyst optimizer rule (injected via `SparkSessionExtensions
  * .injectOptimizerRule`, GraftExtensions): for every TOP-LEVEL conjunct
  * `point_in_polygon(lon, lat, <literal ring>)` in a Filter, add the
  * polygon's bounding-box range conjuncts
  * `lon >= minLon AND lon <= maxLon AND lat >= minLat AND lat <= maxLat`.
  *
  * Why it matters at 100 TB: the exact even-odd test is a black box to the
  * datasource — a scan under a bare `point_in_polygon` filter reads every
  * row group. The derived range predicates are plain comparisons, so
  * Catalyst's own pushdown carries them into the parquet scan as
  * `PushedFilters`, where row-group min/max statistics skip everything
  * outside the box — the engine-side analog of the reference's GIST-index
  * filter/recheck split (reference: database/schemas/init.sql:172,178),
  * derived automatically instead of written by hand.
  *
  * Soundness: the bbox CONTAINS the polygon, so the added conjunct never
  * removes a matching row; it is harvested only from positive top-level
  * conjuncts (never under NOT/OR, where strengthening would be wrong).
  * Idempotence (the injected batch runs to fixpoint): the rewrite is
  * skipped when the bbox conjuncts are already present.
  */
object SpatialBboxPushdown extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  private def bboxOf(ring: ArrayData): Option[(Double, Double, Double, Double)] = {
    val n = ring.numElements()
    if (n < 3) return None
    var minLon = Double.MaxValue; var maxLon = -Double.MaxValue
    var minLat = Double.MaxValue; var maxLat = -Double.MaxValue
    var i = 0
    while (i < n) {
      val pt = ring.getArray(i)
      if (pt == null || pt.numElements() < 2) return None
      val lo = pt.getDouble(0); val la = pt.getDouble(1)
      if (lo < minLon) minLon = lo; if (lo > maxLon) maxLon = lo
      if (la < minLat) minLat = la; if (la > maxLat) maxLat = la
      i += 1
    }
    Some((minLon, maxLon, minLat, maxLat))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val cs = conjuncts(cond)
      val extras = cs.flatMap {
        case PointInPolygon(lonE, latE, Literal(ring: ArrayData, _))
            if lonE.dataType == DoubleType && latE.dataType == DoubleType =>
          bboxOf(ring).toSeq.flatMap { case (loMin, loMax, laMin, laMax) =>
            Seq[Expression](
              GreaterThanOrEqual(lonE, Literal(loMin)),
              LessThanOrEqual(lonE, Literal(loMax)),
              GreaterThanOrEqual(latE, Literal(laMin)),
              LessThanOrEqual(latE, Literal(laMax)))
          }
        case _ => Seq.empty
      }
      val missing = extras.filterNot(e => cs.exists(_.semanticEquals(e)))
      if (missing.isEmpty) f
      else Filter(missing.foldLeft(cond)(And(_, _)), child)
  }
}
