package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the sql package for constructing a DataFrame from a custom
  * LogicalPlan (`Dataset.ofRows` is private[sql]; extension libraries built
  * on Catalyst use this standard escape hatch). */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
