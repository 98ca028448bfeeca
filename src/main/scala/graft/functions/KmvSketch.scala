package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct sketch (Bar-Yossef et al.,
  * RANDOM'02 "Counting distinct elements in a data stream"; the
  * bottom-k form analyzed in Beyer et al., SIGMOD'07 "On synopses for
  * distinct-value estimation under multiset operations") as a native
  * Catalyst TypedImperativeAggregate — the SET-ALGEBRA member of the
  * engine's mergeable-sketch family. HLL (q1A/q95) estimates a single
  * cardinality tighter per byte, but HLL registers cannot intersect:
  * the only composable HLL operation is union. A KMV sketch IS a
  * uniform sample of the distinct-hash domain, so two sketches
  * support union (k smallest of the merged minima), Jaccard
  * (fraction of the union-sketch present in both sides), and
  * therefore intersection cardinality — the question corpus-overlap /
  * cross-shard contamination audits actually ask at 100 TB, where
  * exact pairwise `count(DISTINCT)` over shard pairs is a full
  * re-shuffle of every shard.
  *
  * Input is an already-hashed LONG column (callers pass
  * `xxhash64(value)` — one engine-wide hash family keeps sketches
  * from different tables/columns combinable); values are folded to
  * the non-negative 63-bit line (`h & Long.MaxValue`) so normalized
  * position = h / 2^63. The buffer keeps the k SMALLEST distinct
  * folded hashes (a sorted set; insert rejects past the current k-th
  * min), so update is O(log k), merge is bounded by k, and the
  * shuffled partial state is ≤ k longs per group per task —
  * map-side-combinable and exactly mergeable like every sketch here.
  *
  * eval() emits the ascending array<long> of minima — the sketch
  * itself, not a scalar — because set algebra happens DOWNSTREAM in
  * pure Column code over the arrays ([[KmvSketch.estimate]],
  * [[KmvSketch.unionK]]): distinct-count estimate (k-1)/R_k, union,
  * Jaccard, intersection. With < k distinct inputs the sketch is the
  * exact distinct hash set and every estimate degrades to exact.
  * Deterministic by construction (no RNG; minima are data), so
  * estimates hash-check stably — KmvSpec pins exactness below k,
  * merge-order invariance, and the 3-sigma envelope above k.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buffer]
  with UnaryLike[Expression] {

  require(k >= 16, s"kmv_sketch needs k >= 16, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvSketch.Buffer = new KmvSketch.Buffer

  override def update(buf: KmvSketch.Buffer, input: InternalRow): KmvSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long] & Long.MaxValue)
    buf
  }

  override def merge(buf: KmvSketch.Buffer, other: KmvSketch.Buffer): KmvSketch.Buffer = {
    other.minima.foreach(insert(buf, _))
    buf
  }

  private def insert(buf: KmvSketch.Buffer, h: Long): Unit =
    if (buf.minima.size < k) buf.minima += h
    else if (h < buf.minima.lastKey && !buf.minima.contains(h)) {
      buf.minima -= buf.minima.lastKey
      buf.minima += h
    }

  override def eval(buf: KmvSketch.Buffer): Any =
    new GenericArrayData(buf.minima.toArray.map(l => l: Any))

  override def serialize(buf: KmvSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.minima.size)
    buf.minima.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvSketch.Buffer
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.minima += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  /** Sorted distinct minima; TreeMap-backed set so lastKey (current
    * k-th min, the rejection threshold) is O(log k). */
  final class Buffer {
    val minima: mutable.TreeSet[Long] = mutable.TreeSet.empty[Long]
  }

  private val TwoPow63 = 9.223372036854776e18 // 2^63 as double

  /** Aggregate form: `KmvSketch(xxhash64(col), k)` in an agg();
    * yields the ascending array<long> of the k smallest 63-bit
    * folded hashes (fewer iff the group has < k distinct values). */
  def apply(hashed: Column, k: Int): Column =
    GraftShims.column(
      new KmvSketch(GraftShims.expression(hashed.cast("long")), k)
        .toAggregateExpression())

  /** Distinct-count estimate from a sketch array: exact size below
    * k (the sketch IS the distinct hash set), else the bottom-k
    * estimator (k-1) / R_k with R_k = k-th minimum normalized to
    * [0,1). Pure Column — usable after any array-level set algebra. */
  def estimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(TwoPow63)
        / element_at(sketch, k).cast("double"))

  /** Union sketch of two sketches: the k smallest of the combined
    * distinct minima (array_union preserves distinctness; sort then
    * prefix). The result is exactly the sketch the aggregate would
    * have produced over the concatenated inputs — KMV's closure
    * property, pinned in KmvSpec. */
  def unionK(a: Column, b: Column, k: Int): Column = {
    val merged = array_sort(array_union(a, b))
    when(size(merged) <= k, merged).otherwise(slice(merged, 1, k))
  }

  /** Jaccard estimate: fraction of the union-sketch's minima present
    * in BOTH input sketches (Beyer et al.'s unbiased bottom-k form:
    * the union sketch is a uniform distinct-domain sample, so the
    * both-sides fraction estimates |A∩B|/|A∪B|). Exact below k. */
  def jaccard(a: Column, b: Column, k: Int): Column = {
    val u = unionK(a, b, k)
    // empty-union guard (two empty sketches, e.g. all-null key
    // groups): 0/0 would be NaN — J(∅,∅) is defined as 0 here
    when(size(u) > 0,
      size(array_intersect(array_intersect(u, a), b)).cast("double") /
        size(u).cast("double"))
      .otherwise(lit(0.0))
  }
}
