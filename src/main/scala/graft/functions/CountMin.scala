package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005) as a native
  * Catalyst aggregate: fixed-memory frequency estimation over an
  * unbounded vocabulary. depth×width counters; each value increments
  * one counter per row; a point estimate is the MIN over its row
  * counters — never an underestimate, overestimate bounded by
  * ~n/width per row with the min over depth rows driving it down.
  *
  * Complements [[HeavyHitters]] (Misra–Gries): MG keeps the top
  * identities with lower-bound counts; CMS answers point queries for
  * ANY key, including ones it has never "decided to keep" — the
  * pairing a frequency service over a 100 TB token stream needs.
  *
  * Distribution: the buffer is depth*width longs regardless of input
  * (update is O(depth) per row); merge is elementwise sum, fully
  * associative/commutative, so map-side partials combine like any
  * sum and the sketch can be built in one narrow pass and broadcast.
  *
  * Hash family: rows 0..3 use the big-endian 32-bit words of
  * md5(value) mod width — the same SQL-mirrorable construction as
  * [[BloomFilter]] (`conv(substr(md5(x), 1+8i, 8), 16, 10) % width`),
  * so the full counter array AND every estimate hash-check against a
  * DuckDB oracle. depth is capped at 4 (md5 yields 4 words).
  *
  * The probe needs no custom expression — it composes from built-ins:
  * `least(element_at(cms, i*width + pos_i + 1) ...)`, which is the
  * preferred rung of the extension ladder.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 4,
    s"countmin_build needs 1 <= depth <= 4 (md5 yields 4 words), got $depth")
  require(width >= 1, s"countmin_build needs width >= 1, got $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val ps = BloomFilter.positions(v.asInstanceOf[UTF8String].getBytes, width)
      var i = 0
      while (i < depth) { buf(i * width + ps(i)) += 1L; i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMin {
  /** Column form of the build aggregate. */
  def build(c: Column, depth: Int, width: Int): Column =
    GraftShims.column(
      CountMinAgg(GraftShims.expression(c.cast("string")), depth, width)
        .toAggregateExpression())

  /** Point estimate from a sketch column — pure built-in composition
    * (md5/conv/pmod/element_at/least), no custom expression. */
  def estimate(cms: Column, key: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    val k = key.cast("string")
    val cells = (0 until depth).map { i =>
      val pos = pmod(
        conv(substring(md5(k), 1 + 8 * i, 8), 16, 10).cast("long"), lit(width))
      element_at(cms, (pos + lit(i * width) + 1).cast("int"))
    }
    if (cells.length == 1) cells.head else least(cells: _*)
  }
}
