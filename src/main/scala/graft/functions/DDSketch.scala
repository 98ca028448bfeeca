package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** DDSketch quantile sketch (Masson/Rim/Lee, VLDB'19: "DDSketch: a
  * fast and fully-mergeable quantile sketch with relative-error
  * guarantees") as a native Catalyst TypedImperativeAggregate — the
  * QUANTILE member of the engine's mergeable-sketch family
  * (HeavyHitters = top-k, CountMin = frequency, HLL = distinct,
  * Bloom = membership, MinHash = similarity).
  *
  * Values are binned by exponent: bucket(x) = ceil(ln x / ln γ) with
  * γ = (1+α)/(1-α), so every bucket spans a (1±α) RELATIVE range and
  * the rank-r estimate 2·γ^k/(γ+1) is within α of the true rank-r
  * item — a guarantee that, unlike equal-width histograms, holds
  * identically at cents and at petabyte byte-counts. Counts are
  * exact, so rank arithmetic never drifts; only values are rounded.
  *
  * Mergeability is exact (bucket-count addition), which is the whole
  * point at 100 TB: partial sketches combine map-side, shuffle one
  * ~|buckets|-entry map per group per task, and re-aggregate across
  * days/shards without touching raw data. Bounded memory: past
  * `maxBuckets` the LOWEST buckets collapse into one (the published
  * scheme) — tail quantiles, the ones ops care about, keep their
  * guarantee; DDSketchSpec pins both properties.
  *
  * eval() emits array<double> of the rank-lower estimates for the
  * requested quantiles (rank = ceil(q·n) over the ascending walk,
  * values ≤ 0 counted in a dedicated underflow bucket estimated 0.0).
  */
case class DDSketch(
    child: Expression,
    alpha: Double,
    maxBuckets: Int,
    quantiles: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DDSketch.Buffer]
  with UnaryLike[Expression] {

  require(alpha > 0 && alpha < 1, s"dd_sketch needs 0 < alpha < 1, got $alpha")
  require(maxBuckets >= 8, s"dd_sketch needs maxBuckets >= 8, got $maxBuckets")
  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1),
    s"dd_sketch quantiles must be in [0, 1], got $quantiles")

  private val gamma = (1 + alpha) / (1 - alpha)
  private val lnGamma = math.log(gamma)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): DDSketch.Buffer = new DDSketch.Buffer

  override def update(buf: DDSketch.Buffer, input: InternalRow): DDSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (x <= 0 || x.isNaN) buf.low += 1
      else {
        val k = math.ceil(math.log(x) / lnGamma).toInt
        buf.buckets.update(k, buf.buckets.getOrElse(k, 0L) + 1)
        collapse(buf)
      }
    }
    buf
  }

  override def merge(buf: DDSketch.Buffer, other: DDSketch.Buffer): DDSketch.Buffer = {
    buf.low += other.low
    other.buckets.foreach { case (k, c) =>
      buf.buckets.update(k, buf.buckets.getOrElse(k, 0L) + c)
    }
    collapse(buf)
    buf
  }

  /** Fold the lowest buckets together until within budget — degrades
    * only the low quantiles, keeps the tail guarantee. */
  private def collapse(buf: DDSketch.Buffer): Unit =
    if (buf.buckets.size > maxBuckets) {
      val keys = buf.buckets.keys.toArray
      java.util.Arrays.sort(keys)
      val cut = keys(keys.length - maxBuckets) // lowest surviving index
      var folded = 0L
      keys.iterator.takeWhile(_ < cut).foreach { k =>
        folded += buf.buckets(k); buf.buckets.remove(k)
      }
      if (folded > 0)
        buf.buckets.update(cut, buf.buckets.getOrElse(cut, 0L) + folded)
    }

  override def eval(buf: DDSketch.Buffer): Any = {
    val n = buf.low + buf.buckets.valuesIterator.sum
    val keys = buf.buckets.keys.toArray
    java.util.Arrays.sort(keys)
    val ests = quantiles.map { q =>
      if (n == 0) 0.0
      else {
        val target = math.max(1L, math.ceil(q * n).toLong)
        if (target <= buf.low) 0.0
        else {
          // explicit found flag: the estimate itself can legitimately
          // underflow to 0.0 for subnormal-range inputs (gamma^k → 0
          // for k ≪ 0), so 0.0 is not usable as a not-found sentinel
          var cum = buf.low
          var i = 0
          var est = 0.0
          var found = false
          while (i < keys.length && !found) {
            cum += buf.buckets(keys(i))
            if (cum >= target) {
              est = 2.0 * math.pow(gamma, keys(i)) / (gamma + 1)
              found = true
            }
            i += 1
          }
          est
        }
      }
    }
    new GenericArrayData(ests.map(d => d: Any).toArray)
  }

  override def serialize(buf: DDSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.low)
    out.writeInt(buf.buckets.size)
    buf.buckets.foreach { case (k, c) => out.writeInt(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DDSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new DDSketch.Buffer
    buf.low = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val k = in.readInt()
      buf.buckets.update(k, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DDSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DDSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DDSketch =
    copy(child = newChild)
}

object DDSketch {
  /** Positive-value buckets (index → count) plus an underflow counter
    * for values ≤ 0 (estimated 0.0 on the quantile walk). */
  final class Buffer {
    var low: Long = 0L
    val buckets: mutable.HashMap[Int, Long] = mutable.HashMap.empty
  }

  /** Column form: `DDSketch(col, alpha, maxBuckets, Seq(q…))` in an
    * agg(); yields array<double> of rank-lower quantile estimates. */
  def apply(c: Column, alpha: Double, maxBuckets: Int,
            quantiles: Seq[Double]): Column =
    GraftShims.column(
      new DDSketch(GraftShims.expression(c.cast("double")), alpha,
        maxBuckets, quantiles)
        .toAggregateExpression())
}
