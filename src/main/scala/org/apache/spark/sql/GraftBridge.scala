package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a third-party operator library needs:
  * wrap a custom [[LogicalPlan]] node back into a user-facing
  * [[DataFrame]]. Lives in the `org.apache.spark.sql` package for
  * access, contains no logic, and touches nothing else — the standard
  * extension-library bridge pattern. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
