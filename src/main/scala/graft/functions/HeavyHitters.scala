package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst aggregate
  * (TypedImperativeAggregate) — bounded-memory top-k frequent terms
  * per group, the custom-AGGREGATE rung of the extension ladder
  * (scalar expressions: ArrayDot/WordShingles; whole-plan operator:
  * GroupedTopK; this completes the set).
  *
  * Semantics: maintains at most `capacity` counters per group.
  * Overflow decrements all counters (dropping zeros) — the classic
  * Misra–Gries step — so any term with true frequency > n/(capacity+1)
  * is guaranteed to survive, and every reported count is a lower bound
  * within n/(capacity+1) of truth. When the group's distinct-term
  * count never exceeds `capacity` the sketch is EXACT (that is the
  * regime the driver oracle checks; at 100 TB the same aggregate runs
  * with capacity « vocabulary and degrades gracefully instead of
  * OOMing — which is the point of a sketch).
  *
  * Distribution: partial aggregation applies update() map-side;
  * merge() sums counter maps then re-compacts by subtracting the
  * (capacity+1)-th largest count (the Agarwal et al. mergeable-summary
  * step, "Mergeable Summaries", PODS'12), preserving the error bound.
  * eval() emits the top-k surviving terms as array<struct<term,cnt>>
  * ordered by (cnt DESC, term ASC) — deterministic under exactness.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"heavy_hitters needs k >= 1, got $k")
  require(capacity >= k, s"heavy_hitters needs capacity >= k, got $capacity < $k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String]
      buf.get(term) match {
        case Some(c) => buf.update(term, c + 1)
        case None =>
          if (buf.size < capacity) {
            // clone: the input UTF8String may point into a reused row
            buf.update(term.clone(), 1L)
          } else {
            // Misra–Gries decrement-all (amortized O(1) per input)
            val dead = buf.iterator.collect { case (t, 1L) => t }.toArray
            buf.mapValuesInPlace((_, c) => c - 1)
            dead.foreach(buf.remove)
          }
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop <= 0
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val dead = buf.iterator.collect { case (t, c) if c <= cut => t }.toArray
      dead.foreach(buf.remove)
      buf.mapValuesInPlace((_, c) => c - cut)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val top = buf.toArray
      .sortBy { case (t, c) => (-c, t) }
      .take(k)
      .map { case (t, c) => InternalRow(t, c): Any }
    new GenericArrayData(top)
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}

object HeavyHitters {
  /** Column form: `HeavyHitters(col, k, capacity)` in an agg(). The
    * cast makes non-string term columns safe (eval reads UTF8String);
    * it folds away on already-string input. */
  def apply(c: Column, k: Int, capacity: Int): Column =
    GraftShims.column(
      new HeavyHitters(GraftShims.expression(c.cast("string")), k, capacity)
        .toAggregateExpression())
}
