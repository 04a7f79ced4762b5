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

  /** Column over an already-built Catalyst expression. The temp-function
    * registry route (`call_function`) only admits expression arguments,
    * so constants that must NOT ride the plan as literals — e.g. a
    * `Broadcast` handle to a multi-MB plane table — need direct
    * construction.
    */
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Inverse of [[column]], for wrapping an existing Column's
    * expression as a child of a directly-constructed one.
    */
  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
