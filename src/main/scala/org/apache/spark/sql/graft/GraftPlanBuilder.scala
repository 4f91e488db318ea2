package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge into Spark's `private[sql] Dataset.ofRows` — the standard
  * extension-library pattern for materializing a DataFrame from a custom
  * LogicalPlan node (the same door SparkSessionExtensions-based libraries
  * use; `private[sql]` admits subpackages of org.apache.spark.sql). */
object GraftPlanBuilder {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
