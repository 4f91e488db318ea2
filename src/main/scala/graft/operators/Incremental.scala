package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.12 (EXT) — incremental view maintenance for additive
  * aggregates: the daily-refresh shape at 100 TB, where a materialized
  * rollup must absorb an insert/delete batch WITHOUT rescanning the base
  * table (reference analog: the dashboards init.sql's status/progress
  * rollups feed would need nightly; the engine-side generalization is
  * classic counting-IVM — Gupta & Mumick's signed-delta algebra).
  */
object Incremental {

  /** Merge a SIGNED delta batch into a materialized additive-aggregate
    * view. `view` has grain `keys` with a row-count column `cntCol` and
    * additive measure columns `sumCols`; `delta` carries base-table rows
    * plus `signCol` (+1 insert, −1 delete of a row that is in the view's
    * base). Returns the refreshed view: groups touched by the delta are
    * adjusted, groups whose count reaches zero disappear, untouched
    * groups pass through unchanged.
    *
    * Scale shape — the reason IVM exists: the base table is NEVER read.
    * The delta aggregates first (map-side partials over the batch, grain
    * = view grain), then a single full-outer equi-join against the view
    * on the grain key — both sides view-sized or smaller, and with the
    * view bucketed on its grain key the join co-locates. Work is
    * O(|delta| + |touched groups|), independent of |base|.
    *
    * Measures stay EXACT (decimal/long) through the merge — the caller
    * rounds for presentation only; a double here would drift from a
    * from-scratch recompute after enough refresh cycles. */
  def mergeAggDelta(view: DataFrame, delta: DataFrame, keys: Seq[String],
                    cntCol: String, sumCols: Seq[String],
                    signCol: String = "sign"): DataFrame = {
    val dAgg = delta.groupBy(keys.map(col): _*)
      .agg(sum(col(signCol).cast("long")).as(cntCol),
        sumCols.map(c =>
          sum(col(c) * col(signCol).cast("long")).as(c)): _*)
    val merged = view.as("v").join(dAgg.as("d"), keys, "full_outer")
    val outCnt = (coalesce(col(s"v.$cntCol"), lit(0L)) +
      coalesce(col(s"d.$cntCol"), lit(0L))).as(cntCol)
    val outSums = sumCols.map(c =>
      (coalesce(col(s"v.$c"), lit(0).cast("decimal(18,2)")) +
        coalesce(col(s"d.$c"), lit(0).cast("decimal(18,2)"))).as(c))
    merged.select(keys.map(col) ++ (outCnt +: outSums): _*)
      .filter(col(cntCol) > 0)
  }
}
