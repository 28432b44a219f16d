package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's private[sql] Column↔Expression conversion
  * (the standard extension-library pattern for custom Catalyst expressions).
  */
package object graftshim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER ColumnNode → Expression conversion. `expression` returns a
    * lazy `ColumnNodeExpression` wrapper, which analysis tolerates but
    * codegen rejects (`Unevaluable`): fine when the Column is handed
    * straight to a Dataset operation (the plan builder converts it),
    * WRONG inside a FunctionRegistry builder, whose result is grafted
    * into the plan as-is. SQL-function builders must use this one.
    */
  def resolvedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Register `name` as a SQL function on an EXISTING session (the
    * in-place complement of `SparkSessionExtensions.injectFunction`,
    * which only reaches sessions built with the extension configured).
    * Idempotent: re-registration replaces the previous builder.
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.GraftFunctions", name),
        builder)

  /** Register `name` as a TABLE-VALUED function on an existing session
    * (the in-place complement of
    * `SparkSessionExtensions.injectTableFunction`): the builder maps the
    * SQL call's argument expressions to a LogicalPlan spliced in place
    * of the `FROM name(...)` reference. Idempotent.
    */
  def registerTableFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState
      .tableFunctionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.GraftTableFunctions", name),
        builder)

  /** The (analyzed) logical plan behind a DataFrame — what a
    * table-function builder returns so the operator's whole Column tree
    * is spliced into the calling SQL statement's plan.
    */
  def logicalPlan(df: DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
