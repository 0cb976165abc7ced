package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` constructors needed to hand a custom
  * LogicalPlan back to the public Dataset API (the standard extension
  * technique — the planner strategy itself is injected through the
  * public `spark.experimental.extraStrategies` / SparkSessionExtensions
  * surfaces).
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
