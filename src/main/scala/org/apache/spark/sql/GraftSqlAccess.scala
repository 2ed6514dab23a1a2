package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Compile-checked bridge to one `private[sql]` entry point (the same
  * pattern as [[org.apache.spark.scheduler.GraftSchedulerAccess]]).
  *
  * `Dataset.ofRows` is how Spark's own operators wrap a hand-built
  * Catalyst plan back into the public DataFrame API; graft's custom
  * logical operators ([[graft.plans.GraftAsOfJoin]]) need the same
  * doorway. Being compile-checked, it breaks loudly on a Spark upgrade
  * instead of failing at runtime the way reflection would.
  */
object GraftSqlAccess {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
