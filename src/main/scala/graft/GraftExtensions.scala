package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.PointInPolygon

/** Session extension registering the engine's custom Catalyst expressions so
  * they are callable from SQL as well as the Column API.
  *
  * Install either at build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` /
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` —
  * or post-hoc on a live session with `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.pointInPolygonDescriptor)
  }
}

object GraftExtensions {
  private def pipBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 3,
      s"point_in_polygon(lon, lat, ring) takes 3 arguments, got ${args.length}")
    PointInPolygon(args(0), args(1), args(2))
  }

  val pointInPolygonDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("point_in_polygon"),
    new ExpressionInfo(classOf[PointInPolygon].getName, "point_in_polygon"),
    pipBuilder _)

  /** Register custom functions on an existing session (used by Verify/Bench
    * and tests, where the builder isn't ours). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "point_in_polygon", pipBuilder, "built-in")
}
