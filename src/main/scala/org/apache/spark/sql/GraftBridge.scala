package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door graft needs: build a DataFrame from a custom
  * LogicalPlan (`Dataset.ofRows` has no public equivalent). Lives in the
  * spark.sql package for access; contains no logic beyond the forward. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
