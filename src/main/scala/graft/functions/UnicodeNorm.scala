package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC/NFKC) as a native codegen'd
  * expression — the canonicalization step every text-dedup pipeline
  * needs BEFORE hashing: "café" composed (U+00E9) and decomposed
  * (e + U+0301) are byte-different, so md5/minhash/simhash all treat
  * visually identical documents as distinct until the corpus is
  * normalized to one form. Spark ships no normalization builtin
  * (UTF8String compares raw bytes), so this wraps the JDK's
  * `java.text.Normalizer` (exact ICU-table NFC, the same tables
  * DuckDB's `nfc_normalize` implements — which is what makes the
  * oracle comparable).
  *
  * Scale/codegen notes: per-row cost is one fast-path quick-check —
  * `Normalizer.isNormalized` is O(n) with no allocation for the
  * overwhelmingly-common already-NFC case — and only non-normalized
  * rows pay the String round-trip. The expression stays inside
  * whole-stage codegen (static-helper call, same pattern as
  * [[BloomFilter]]'s probe).
  */
case class UnicodeNormalize(child: Expression, nfkc: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], nfkc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNormalize.normalize($c, $nfkc)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {

  /** Static helper referenced from generated code (object methods
    * compile to static methods on the companion class). */
  def normalize(s: UTF8String, nfkc: Boolean): UTF8String = {
    val form = if (nfkc) Normalizer.Form.NFKC else Normalizer.Form.NFC
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  /** NFC (canonical composition) — the dedup-canonicalization form. */
  def nfc(c: Column): Column =
    GraftShims.column(new UnicodeNormalize(GraftShims.expression(c), nfkc = false))

  /** NFKC (compatibility composition) — folds ligatures, width and
    * font variants; the aggressive form for matching, not storage. */
  def nfkc(c: Column): Column =
    GraftShims.column(new UnicodeNormalize(GraftShims.expression(c), nfkc = true))
}
