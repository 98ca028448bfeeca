package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Correctly-rounded natural log.
  *
  * Spark's builtin `log` evaluates `StrictMath.log` (fdlibm), which
  * is within 1 ulp but NOT correctly rounded — it disagrees with
  * glibc/DuckDB's `ln` by one ulp on some arguments (e.g.
  * ln(0x3ff451c3a672dbfc): fdlibm ...a376 vs glibc ...a377). Engines
  * whose results must hash-match an external oracle bit-for-bit
  * (q85's BM25 idf) need the correctly-rounded value, which
  * `java.lang.Math.log` provides via the platform intrinsic. Eval and
  * codegen both call Math.log, so the value cannot change when an
  * expression falls out of codegen. */
case class LnExact(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(x: Any): Any = Math.log(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

  override protected def withNewChildInternal(newChild: Expression): LnExact =
    copy(child = newChild)
}

object LnExact {
  def apply(c: Column): Column =
    GraftShims.column(LnExact(GraftShims.expression(c.cast("double"))))
}
