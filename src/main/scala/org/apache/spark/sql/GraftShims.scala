package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Accessor shim: Spark 4's Expression↔Column converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * private[sql]; this object re-exports the two conversions for
  * graft's custom Catalyst expressions (graft.functions). */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Temp-function registration on an existing session. The function
    * registry hangs off `sessionState`, which is private[sql]; graft
    * uses this for sessions it did not build (the driver's Verify
    * session) — sessions graft does build get the same builders via
    * `spark.sql.extensions=graft.GraftExtensions` instead. */
  def registerTempFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** EAGER Column → Expression conversion. The lazy form
    * ([[expression]]) wraps the column's node in a ColumnNodeExpression
    * placeholder that only standard plan-construction paths convert;
    * embedded in a CUSTOM logical node it would survive analysis and
    * fail task serialization. This runs the converter immediately,
    * yielding a plain (serializable, analyzable) catalyst tree. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Analyzed logical plan of a DataFrame (private[sql] on classic
    * Dataset) — lets graft wrap a frame in a custom LogicalPlan node. */
  def logicalPlan(df: Dataset[Row]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].logicalPlan

  /** DataFrame over a custom LogicalPlan (classic.Dataset.ofRows is
    * private[sql]) — the return path from a custom node to user code. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): Dataset[Row] =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Temp TABLE-function registration (FROM-clause / LATERAL
    * position) on an existing session — the table-function sibling of
    * [[registerTempFunction]]. */
  def registerTempTableFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => LogicalPlan): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Test seam: apply an extensions object's injected functions to a
    * registry (what session construction does internally) so specs
    * can assert the injection wiring without building a session. */
  def buildFunctionRegistry(
      ext: SparkSessionExtensions,
      reg: catalyst.analysis.FunctionRegistry): catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(reg)
}
