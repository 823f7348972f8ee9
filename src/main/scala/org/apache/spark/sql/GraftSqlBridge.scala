package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door a planner-extension library needs:
  * materializing a DataFrame from a CUSTOM logical plan. Spark's public
  * surface lets extensions inject strategies and rules but offers no
  * public constructor from LogicalPlan to DataFrame, so every extension
  * library (this is the established pattern) hosts this one-line bridge
  * inside the org.apache.spark.sql package. Nothing else in graft lives
  * here.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
