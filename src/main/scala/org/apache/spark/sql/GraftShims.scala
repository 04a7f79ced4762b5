package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow bridge to `private[sql]` session internals the public API does
  * not expose: constructing a DataFrame from an already-analyzed logical
  * plan. graft.Bench uses it for prepared-statement-style reuse — the
  * engine's query catalog builds + analyzes each plan once and re-binds
  * it per execution, re-running optimization, physical planning and the
  * FULL execution every time (no shuffle or result reuse; only the
  * DSL-construction + analysis pass is amortized, which is what a
  * production engine's prepared-plan cache amortizes too).
  */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
