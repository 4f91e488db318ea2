package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SURVEY.md §2.11 — the reference's extension point: "an analysis is a named
  * function over files with a JSON parameter bag"
  * (reference: analyses table init.sql:113-124 — analysis_type string +
  * JSONB parameters → JSONB results; same pattern for processing_tasks
  * init.sql:57-71).
  *
  * Spark shape: a registry `name → (DataFrame, params) => DataFrame`. Params
  * arrive as a JSON string (the JSONB bag); results are DataFrames the caller
  * serializes back. Registered ops compose the operator library — adding an
  * analysis type is adding a map entry, exactly like the reference's design.
  */
object Analyses {

  type AnalysisOp = (DataFrame, String) => DataFrame

  /** Pull a string field out of the JSONB-style parameter bag. */
  private def param(json: String, key: String): Option[String] =
    Option(json).filter(_.trim.nonEmpty).flatMap { j =>
      org.json4s.jackson.JsonMethods.parse(j) \ key match {
        case org.json4s.JString(s) => Some(s)
        case _ => None
      }
    }

  /** Built-in analysis types. Each mirrors a §2 operator family so the
    * registry exercises the whole library through one uniform entry point. */
  val registry: Map[String, AnalysisOp] = Map(
    // per-group coverage bbox over point columns (A3)
    "bbox_stats" -> ((df, params) => {
      val g = param(params, "group_by").getOrElse("project_id")
      Relational.bboxAgg(df, Seq(g), col("lon"), col("lat"))
    }),
    // status rollup (A5)
    "status_rollup" -> ((df, params) => {
      val c = param(params, "column").getOrElse("status")
      Relational.rollupCount(df, c)
    }),
    // exact dedup audit over an arbitrary key column
    "dedup_audit" -> ((df, params) => {
      val key = param(params, "key").getOrElse("id")
      Dedup.exactDedup(df, param(params, "id").getOrElse(key), col(key))
    }),
    // token statistics over a text column (EXT)
    "token_stats" -> ((df, params) => {
      val c = col(param(params, "column").getOrElse("text"))
      df.select(
        size(TextOps.tokens(c)).as("n_tokens"),
        TextOps.langId(TextOps.tokens(c)).as("lang_pred"))
        .groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n"), avg(col("n_tokens")).as("avg_tokens"))
    }))

  def run(analysisType: String, input: DataFrame, paramsJson: String): DataFrame =
    registry.getOrElse(analysisType,
      throw new IllegalArgumentException(
        s"unknown analysis_type '$analysisType' (have: ${registry.keys.mkString(", ")})"))(
      input, paramsJson)

  // ---- custom typed UDAF (SURVEY §7.3): single-pass bbox Aggregator ----

  case class BBox(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double)

  /** Per-group bbox as one `Aggregator[(lon,lat), BBox, BBox]` — the typed
    * single-pass form of A3 (reference: shared/utils/__init__.py:181-194);
    * usable via `udaf(BBoxAggregator)` from SQL or `.agg(bboxUdaf(...))`. */
  object BBoxAggregator extends Aggregator[(Double, Double), BBox, BBox] {
    override def zero: BBox =
      BBox(Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)
    override def reduce(b: BBox, p: (Double, Double)): BBox =
      BBox(math.min(b.minLon, p._1), math.min(b.minLat, p._2),
        math.max(b.maxLon, p._1), math.max(b.maxLat, p._2))
    override def merge(a: BBox, b: BBox): BBox =
      BBox(math.min(a.minLon, b.minLon), math.min(a.minLat, b.minLat),
        math.max(a.maxLon, b.maxLon), math.max(a.maxLat, b.maxLat))
    override def finish(r: BBox): BBox = r
    override def bufferEncoder: Encoder[BBox] = Encoders.product[BBox]
    override def outputEncoder: Encoder[BBox] = Encoders.product[BBox]
  }

  /** Column form: `df.groupBy(...).agg(bboxUdaf(col("lon"), col("lat")))`. */
  def bboxUdaf(lon: Column, lat: Column): Column =
    udaf(BBoxAggregator).apply(lon, lat).as("bbox")

  /** Data-profiling histogram: per-group equi-width bucket counts of an
    * integer column over the GLOBAL [min, max] range (shared bucket edges
    * make groups comparable — the point of a profile). Pure integer
    * arithmetic (`(v − min)·buckets div (max − min)`, top value clamped
    * into the last bucket) so bucket assignment is engine-exact; the
    * min/max pair is one broadcast row, the histogram one hash aggregate —
    * the single-pass profiling shape that replaces per-column driver
    * loops. */
  def histogramProfile(df: DataFrame, groupCol: String, valueCol: String,
                       buckets: Int = 10): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    val mm = df.agg(
      min(col(valueCol).cast("long")).as("__mn"),
      max(col(valueCol).cast("long")).as("__mx"))
    df.select(col(groupCol), col(valueCol).cast("long").as("__v"))
      .crossJoin(broadcast(mm))
      .withColumn("bucket",
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(
            expr(s"((__v - __mn) * ${buckets}L) div (__mx - __mn)"),
            lit((buckets - 1).toLong))))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__v")).as("bucket_min"), max(col("__v")).as("bucket_max"))
  }
}
