package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only bridge into `private[sql]` plan→DataFrame construction, so
  * RoundingMarginSpec can execute the measurement sub-plans it carves
  * out of analyzed query plans (Project/Aggregate nodes re-rooted on
  * the raw pre-quantization expression). Lives in the Spark package
  * ONLY to satisfy the access modifier; nothing in src/main depends on
  * it.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
