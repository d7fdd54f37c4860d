package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column <-> Catalyst Expression
  * converters (Spark 4.x wraps Column around ColumnNode; classic-mode
  * conversion lives in [[org.apache.spark.sql.classic.ExpressionUtils]]).
  * Lets the graft library expose native codegen Expressions as Columns.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions' injected functions to a registry
    * (test hook: verifies extension wiring without building a session).
    */
  def registerExtensions(
      ext: SparkSessionExtensions,
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    ext.registerFunctions(reg)
}
