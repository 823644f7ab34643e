package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql] Dataset.ofRows` so the library can hand a
  * self-constructed logical plan (e.g. [[graft.plans.AsofJoinPlan]]) back to
  * the session — the one hop a whole-operator extension needs that
  * `SparkSessionExtensions` doesn't expose. No other internals touched. */
object GraftSqlBridge {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)
}
