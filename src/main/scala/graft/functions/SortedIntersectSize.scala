package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Distinct-intersection SIZE of two ASCENDING-sorted long arrays via
  * a zero-allocation two-pointer merge — the hot per-pair loop of the
  * PPJoin verify (`graft.dedup.Dedup.jaccardPairs`), which evaluates
  * it once per CANDIDATE pair (142M pairs at the sf10 decade fixture).
  * Replaces `size(array_intersect(a, b))`: the builtin materializes a
  * hash set AND the intersection array per evaluation; for a size-only
  * consumer on pre-sorted inputs the merge does neither. Equal runs
  * are skipped on both sides, so the result is the DISTINCT-value
  * intersection size — exactly `array_intersect`'s set semantics even
  * if a duplicate slips in; on the (distinct-by-contract) token-hash
  * arrays the two spellings are value-identical, which is what keeps
  * every q44-family oracle hash unchanged.
  *
  * CONTRACT: both inputs ascending-sorted (callers `sort_array` the
  * per-document array ONCE — n·k log k per corpus — to buy the
  * per-PAIR merge). Unsorted inputs return an undercount, silently:
  * this is a private engine primitive, not a general SQL surface.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        c += 1
        // skip equal runs on both sides: distinct-value semantics
        i += 1; j += 1
        while (i < nx && x.getLong(i) == xv) i += 1
        while (j < ny && y.getLong(j) == yv) j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $c++;
         |    $i++; $j++;
         |    while ($i < $nx && $a.getLong($i) == $xv) $i++;
         |    while ($j < $ny && $b.getLong($j) == $yv) $j++;
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Column wrapper; inputs must be ascending-sorted arrays of
    * integers. Both sides are cast to array<bigint> here — a no-op
    * for the md5Long arrays, but without it an array<int> input
    * would be read through ArrayData.getLong as garbage with no
    * error (the same reason ArrayDot.apply casts to array<double>). */
  def apply(a: Column, b: Column): Column =
    GraftShims.column(new SortedIntersectSize(
      GraftShims.expression(a.cast("array<bigint>")),
      GraftShims.expression(b.cast("array<bigint>"))))
}
