package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-access shim: `Dataset.ofRows` is `private[sql]`, and graft's
  * SQL DML commands (graft.plans.GraftSqlDml) need to execute the
  * mutation-batch logical plan they construct as a DataFrame. This is the
  * standard extension-library technique for the few Catalyst entry points
  * Spark does not expose publicly — no behavior, pure forwarding. */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  /** Wrap a catalyst expression as a user-facing Column (the inverse of
    * `Column.expr`) — used by the SQL DELETE fast path to re-apply the
    * statement's own resolved predicate as the residual row filter. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    ExpressionUtils.column(e)

  /** The forward direction — the catalyst expression behind a Column
    * (used to hand user columns to custom expressions constructed
    * directly rather than through the function registry). */
  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    ExpressionUtils.expression(c)
}
