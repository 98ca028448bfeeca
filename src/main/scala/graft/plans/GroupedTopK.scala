package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a first-class operator (logical node + strategy +
  * physical exec), the whole-operator rung of the custom-operator
  * ladder (SURVEY.md §3 ladder (c); registered via
  * [[graft.GraftExtensions]] or late-bound through
  * `spark.experimental.extraStrategies`).
  *
  * WHY an operator instead of the window idiom
  * (`row_number().over(partitionBy(key).orderBy(o)) <= k`): the window
  * form shuffles EVERY row to its key's reducer, then sorts the whole
  * partition, then discards all but k rows per key. At 100 TB that
  * shuffle is the job. This operator runs a bounded per-key heap in
  * each map task first (the aggregation-style partial/final split), so
  * at most `k · distinct-keys-per-partition` rows reach the exchange —
  * for top-k queries (k « rows/key) that is orders of magnitude less
  * shuffle I/O — and the final phase never materializes or sorts more
  * than k rows per key. Memory is bounded by k rows per distinct key
  * per partition — the same envelope as the operator's own output —
  * vs the sort buffer of the window form.
  *
  * Result set equals the window idiom's under a TOTAL ordering; with
  * ties at the k-boundary both forms make an arbitrary (plan-dependent)
  * choice, so checked queries must order by a unique suffix — same
  * contract the window form already has.
  *
  * Relation to Spark's own InferWindowGroupLimit (3.5+): Spark already
  * prunes rank-limit windows to ≤k rows/key on both sides of the
  * shuffle, which removes most of the I/O gap for the idiom form. What
  * this operator still adds: (1) a direct API — top-k without
  * fabricating and dropping a rank column; (2) bounded HEAPS (O(n log
  * k), no sort buffer) instead of WindowGroupLimit's per-partition
  * sort + the full WindowExec machinery downstream; (3) no residual
  * Filter/Window in the plan at all when ranks aren't wanted. The
  * [[WindowTopKRewrite]] rule strips a subsumed WindowGroupLimit when
  * it fires.
  */
case class GroupedTopKPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"grouped top-k needs k >= 1, got $k")
  require(keys.nonEmpty,
    "grouped top-k needs at least one key — a GLOBAL top-k is orderBy(...).limit(k) (TakeOrderedAndProject)")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKPlan =
    copy(child = newChild)
}

/** Physical per-key bounded heap. `partial = true` runs map-side on
  * whatever partitioning the child has (no distribution requirement);
  * `partial = false` declares ClusteredDistribution on the keys so
  * EnsureRequirements inserts exactly one hash exchange between the
  * two phases — mirroring partial/final aggregation. Both phases run
  * the same heap; top-k is idempotent, so final(partial(x)) = topk(x).
  */
case class GroupedTopKExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    maxRowsInFlight: Int = GroupedTopKExec.DefaultMaxRowsInFlight)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderLocal = order
    val childOutput = child.output
    val isPartial = partial
    // the flush budget is ROWS (keys×k), not keys: 1M keys at k=100
    // would hold ~100M copied rows (many GiB) before the first flush
    val flushAt = math.max(1, maxRowsInFlight / math.max(1, k))
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val cmp = RowOrdering.create(orderLocal, childOutput)
      // mutable.PriorityQueue dequeues the MAXIMUM under cmp — with
      // cmp ordering "best first" (ascending per SortOrder), the head
      // is the worst retained row, i.e. the eviction candidate.
      val heapOrd: Ordering[InternalRow] = cmp
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      def drain(): Iterator[InternalRow] = {
        val out = heaps.values.toArray
        heaps.clear()
        out.iterator.flatMap(_.dequeueAll.reverseIterator)
      }
      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty
        private def advance(): Unit = {
          while (!pending.hasNext && iter.hasNext) {
            val row = iter.next()
            // probe with the projection's reused buffer (UnsafeRow
            // equality is content-based); copy the key only on miss —
            // the hit path is the hot path and must not allocate
            val probe = keyProj(row)
            val heap = heaps.get(probe) match {
              case Some(h) => h
              case None =>
                val h = mutable.PriorityQueue.empty[InternalRow](heapOrd)
                heaps.put(probe.copy(), h)
                h
            }
            if (heap.size < kLocal) heap.enqueue(row.copy())
            else if (cmp.compare(row, heap.head) < 0) {
              heap.dequeue()
              heap.enqueue(row.copy())
            }
            // Map-side memory guard: the PARTIAL phase may flush its
            // current per-key winners downstream and start over — the
            // final phase re-reduces, so a superset is correct and
            // memory stays bounded by ~maxRowsInFlight rows. The
            // FINAL phase must hold each key's full candidate set to
            // emit exactly k, so its memory is k·keys-per-partition —
            // the size of its own output, the same contract as
            // collect_list (raise shuffle partitions to shrink it).
            if (isPartial && heaps.size >= flushAt) pending = drain()
          }
          if (!pending.hasNext && !iter.hasNext && heaps.nonEmpty) {
            pending = drain()
          }
        }
        override def hasNext: Boolean = {
          if (!pending.hasNext) advance()
          pending.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          pending.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

object GroupedTopKExec {
  /** ~1M ROWS in flight before a partial-phase flush (the exec
    * divides by k, so at k=100 that is ~10k keys at a time) —
    * generous for 128 GiB executors, and genuinely small enough to
    * never OOM a 4 GiB one regardless of k. */
  val DefaultMaxRowsInFlight: Int = 1 << 20
}

/** Plans [[GroupedTopKPlan]] as the partial→final exec pair. */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKPlan(keys, order, k, child) =>
      val partial = GroupedTopKExec(keys, order, k, partial = true,
        planLater(child))
      GroupedTopKExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

object GroupedTopK {

  /** Idempotently late-bind the strategy onto an existing session
    * (sessions built with `spark.sql.extensions=graft.GraftExtensions`
    * already have it). `experimental.extraStrategies` is the public
    * extension point for exactly this. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(GroupedTopKStrategy)) {
      spark.experimental.extraStrategies = cur :+ GroupedTopKStrategy
    }
  }

  /** Top `k` rows per `keys` group, "top" = first under `order`
    * (pass `col.desc` / `col.asc`; bare columns default ascending).
    * Keeps the child's full row — no column loss, no added rank. */
  def topK(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val sortOrders = order.map(GraftShims.eagerExpression(_) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    GraftShims.ofRows(spark,
      GroupedTopKPlan(keys.map(GraftShims.eagerExpression), sortOrders, k,
        GraftShims.logicalPlan(df)))
  }
}
