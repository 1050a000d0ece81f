package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `classic` Dataset internals (analyzed plan extraction
  * and Dataset construction from a LogicalPlan) for graft's custom
  * logical operators — the Spark-4 equivalents of the long-standing
  * `Dataset.ofRows` / `df.logicalPlan` internal APIs.
  */
object GraftPlanShim {
  def analyzedPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
  def optimizedPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.optimizedPlan
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
