package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 moved Column onto ColumnNode and made the classic
  * converters `private[sql]`; libraries that define native Catalyst
  * expressions conventionally host a one-file bridge inside the
  * `org.apache.spark.sql` package to wrap/unwrap without a session
  * registry round-trip (the same access pattern Spark's own
  * connectors use). Only the two minimal hooks are exposed.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (possibly custom) logical plan as a DataFrame — the hook
    * a library-defined LogicalPlan node needs to enter the Dataset
    * API (the analyzer resolves any still-unresolved expressions in
    * the plan on first use).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
