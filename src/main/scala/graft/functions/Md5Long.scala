package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5 prefix as a long — the native twin of
  * `conv(substring(md5(x), 1, 15), 16, 10) :: long`, the base hash
  * H(s) under every minhash/simhash/banding path (graft.dedup) and
  * the deterministic samplers. The composed spelling materializes a
  * 32-char hex string, substrings it, and re-parses base-16 PER ROW
  * (per SHINGLE on the minhash path — the hottest expression in the
  * repo); this expression takes the first 60 bits of the raw digest
  * directly: digest → big-endian load of 8 bytes → `>>> 4`. Value is
  * bit-identical to the composed form (15 lowercase hex digits parsed
  * as an unsigned 60-bit integer), so every oracle stays untouched —
  * DedupSpec pins the equivalence. MessageDigest instances are
  * thread-local (allocation-free steady state under codegen).
  */
case class Md5Long(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    Md5Long.hash60(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
}

object Md5Long {

  /** Shared per-thread MD5 instance for every native hash expression
    * (this one and BloomFilter) — one definition so the digest
    * plumbing can't drift between them. */
  private[functions] val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s) as a non-negative long (== the first 15
    * hex digits of the canonical lowercase digest read base-16). */
  def hash60(s: UTF8String): Long = {
    // digest() below resets the instance itself — no explicit reset
    // on the repo's hottest expression
    val h = digests.get().digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Column wrapper; input is cast to string like the composed form
    * (md5() of a non-string column hashes its string rendering). */
  def apply(c: Column): Column =
    GraftShims.column(new Md5Long(GraftShims.expression(c.cast("string"))))
}
