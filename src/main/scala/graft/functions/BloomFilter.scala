package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter membership sketch (Bloom, CACM 1970) as a native
  * Catalyst aggregate + probe expression — the no-join path for
  * cross-corpus dedup: "is this incoming document already in the
  * reference corpus?" answered without shuffling either corpus.
  *
  * Scale shape (the reason this operator exists): building the filter
  * is one narrow pass over corpus A with CONSTANT-size partial state
  * (mBits/8 bytes per task, merged by bitwise OR — fully mergeable,
  * so map-side partials combine like any sum), and probing corpus B
  * is a narrow map against the broadcast bits. At 100 TB the
  * alternative — a distinct + shuffle join on the dedup key — moves
  * both corpora across the network; the bloom moves mBits/8 bytes
  * once. False positives (bounded by (1-e^(-kn/m))^k) cost only a
  * redundant downstream check; false negatives cannot occur, which is
  * the contract a dedup prefilter needs.
  *
  * Hash family: the 4 big-endian 32-bit words of md5(value), each mod
  * mBits — deliberately md5-derived (like graft.dedup's MinHash) so
  * the construction is expressible verbatim in ANSI-ish SQL:
  * `conv(substr(md5(x), 1+8*i, 8), 16, 10) % mBits` computes the same
  * positions in Spark and DuckDB, which is what lets the driver
  * hash-check the whole filter against an oracle.
  */
object BloomFilter {

  val NumHashes = 4

  // per-thread digest shared with Md5Long — one definition repo-wide

  /** The k=4 bit positions for a value: big-endian 32-bit words of the
    * md5 digest, mod mBits (== `conv(substr(md5(x),1+8i,8),16,10) % m`
    * on the hex spelling — hex chars [1+8i, 8i+8] are digest bytes
    * [4i, 4i+3]). */
  def positions(bytes: Array[Byte], mBits: Int): Array[Int] = {
    val d = Md5Long.digests.get().digest(bytes)
    val out = new Array[Int](NumHashes)
    var i = 0
    while (i < NumHashes) {
      val w = ((d(4 * i) & 0xffL) << 24) | ((d(4 * i + 1) & 0xffL) << 16) |
        ((d(4 * i + 2) & 0xffL) << 8) | (d(4 * i + 3) & 0xffL)
      out(i) = (w % mBits).toInt
      i += 1
    }
    out
  }

  def set(bits: Array[Byte], value: UTF8String, mBits: Int): Unit = {
    val ps = positions(value.getBytes, mBits)
    var i = 0
    while (i < NumHashes) {
      val p = ps(i)
      bits(p >> 3) = (bits(p >> 3) | (1 << (p & 7))).toByte
      i += 1
    }
  }

  /** Static-forwarder target for [[BloomMightContain]]'s generated
    * code (object methods compile to static methods on the companion
    * class — callable from Janino as `graft.functions.BloomFilter
    * .mightContain`). */
  def mightContain(bits: Array[Byte], value: UTF8String, mBits: Int): Boolean = {
    val ps = positions(value.getBytes, mBits)
    var i = 0
    while (i < NumHashes) {
      val p = ps(i)
      if ((bits(p >> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Column form of the build aggregate: `BloomFilter.build(col, m)`
    * in an agg(). Non-string keys are cast (rendering then matches
    * SQL's `||` string concatenation, same as the md5 dedup keys). */
  def build(c: Column, mBits: Int): Column =
    GraftShims.column(
      BloomBuildAgg(GraftShims.expression(c.cast("string")), mBits)
        .toAggregateExpression())

  /** Column form of the probe. */
  def mightContain(bits: Column, value: Column, mBits: Int): Column =
    GraftShims.column(BloomMightContain(
      GraftShims.expression(bits),
      GraftShims.expression(value.cast("string")), mBits))
}

/** The build side: a fixed-size bitset aggregate. Buffer = mBits/8
  * bytes regardless of input cardinality; update sets 4 bits per
  * value; merge is bitwise OR (associative + commutative, so Spark's
  * partial aggregation is safe); eval emits the bitset as BINARY.
  * Nulls are skipped (a null key is not a member of anything). */
case class BloomBuildAgg(
    child: Expression,
    mBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(mBits >= 8 && (mBits & 7) == 0,
    s"bloom_build needs mBits >= 8 and a multiple of 8, got $mBits")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](mBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomFilter.set(buf, v.asInstanceOf[UTF8String], mBits)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

/** The probe side: `might_contain(bits, value)` — all 4 bit positions
  * set. Codegen'd (this is the per-row hot path over the LARGE corpus;
  * the generated code calls the static helper, keeping the md5 +
  * bit-test out of interpreted eval). Null value → null, matching SQL
  * three-valued logic. */
case class BloomMightContain(left: Expression, right: Expression, mBits: Int)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(bits: Any, value: Any): Any =
    BloomFilter.mightContain(
      bits.asInstanceOf[Array[Byte]], value.asInstanceOf[UTF8String], mBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, value) => {
      s"${ev.value} = graft.functions.BloomFilter.mightContain($bits, $value, $mBits);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
