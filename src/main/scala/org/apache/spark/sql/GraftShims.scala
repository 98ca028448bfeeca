package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Accessor shim: Spark 4's Expression↔Column converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * private[sql]; this object re-exports the two conversions for
  * graft's custom Catalyst expressions (graft.functions). */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
