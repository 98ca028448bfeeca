package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Document chunking as a native GENERATOR expression — one input
  * document row fans out to one row per overlapping token window
  * (`chunk` tokens every `stride`). This is the generator-expression
  * rung of the extension ladder (scalar: ArrayDot; aggregate:
  * HeavyHitters; whole-plan: GroupedTopK): registered as `chunk_text`
  * it composes anywhere explode does — SELECT, LATERAL — so SQL users
  * chunk corpora without the sequence/slice scaffolding the q75
  * composition spells out (both forms emit identical rows; the spec
  * pins that parity).
  *
  * Tokenization is the engine-wide whitespace split (TextStats.tokens
  * semantics: split on single space, empty text → one empty token →
  * one chunk), applied to the raw string here so the generator is
  * self-contained in SQL.
  */
case class ChunkText(child: Expression, chunk: Int, stride: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(chunk >= 1, s"chunk_text needs chunk >= 1, got $chunk")
  require(stride >= 1, s"chunk_text needs stride >= 1, got $stride")

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  private val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val toks = v.asInstanceOf[UTF8String].split(sep, -1)
      val n = toks.length
      Iterator.range(0, n, stride).zipWithIndex.map { case (start, idx) =>
        val end = math.min(start + chunk, n)
        InternalRow(idx, UTF8String.concatWs(sep, toks.slice(start, end): _*))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkText =
    copy(child = newChild)
}

object ChunkText {
  def apply(text: Column, chunk: Int, stride: Int): Column =
    GraftShims.column(new ChunkText(GraftShims.expression(text), chunk, stride))
}
