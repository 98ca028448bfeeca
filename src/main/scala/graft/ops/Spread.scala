package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism-restoring repartitions for two shapes the planner
  * cannot size on its own (optimization guide §2.2/§2.5):
  *
  *  1. **Pre-fan-out redistribution** ([[fanout]]): AQE's partition
  *     coalescing sizes post-shuffle partitions by their INPUT bytes.
  *     A stage whose input is a few MB of collected posting/neighbor
  *     lists but whose body is a C(n,2) pair Generate (the q11B/qDB/
  *     qB4/q132 wedge shape) gets coalesced into one or two tasks, and
  *     the quadratic explode runs serially — at ANY scale, because the
  *     coalescer never sees the Generate's output volume. An explicit
  *     hash repartition with a pinned partition count is exempt from
  *     AQE coalescing (REPARTITION_BY_NUM), so the explode keeps the
  *     configured shuffle width. The extra exchange moves only the
  *     pre-explode (small) rows.
  *
  *  2. **Unsplittable-scan spreading ([[scan]])**: a source that
  *     arrives as fewer splits than the cluster has cores (one file
  *     with one parquet row group — or a gzip file, guide §2.5) runs
  *     its whole first stage serially: scan, filters, and every
  *     narrow expression fused into it. When downstream per-row work
  *     is expensive (shingling, hashing, per-row decode), a
  *     round-robin repartition right after the read spreads it.
  *     ADAPTIVE: when the scan already yields at least `target`
  *     splits (any real-scale dataset), this is the identity — no
  *     exchange is added, so the rewrite never costs a full-data
  *     shuffle at 100 TB.
  */
object Spread {

  /** Configured shuffle width — the deployment's parallelism knob. */
  private def width(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** Hash-repartition `df` on `keys` with a PINNED partition count so
    * AQE cannot coalesce the downstream fan-out stage (see class
    * doc). Use immediately before a Generate whose output is much
    * larger than its input (pair explodes over collected lists). */
  def fanout(df: DataFrame, keys: Seq[Column]): DataFrame =
    df.repartition(width(df), keys: _*)

  /** Spread an under-split scan (see class doc). Fires ONLY when the
    * planned scan is a single partition — the guide §2.5 "one huge
    * unsplittable file" case, where the whole first stage is serial
    * no matter how many cores exist. Any multi-split source keeps its
    * natural scan parallelism: repartitioning it would shuffle EVERY
    * byte to upgrade partial parallelism, and at sf10 that turned a
    * 7-row-group lineitem scan (7-way) into a serial full-gigabyte
    * shuffle (q12A measured 6.9x slower). `target` (<= 0 = session
    * default parallelism) sizes the spread. Call it on the narrow
    * projected frame, before the expensive per-row work. Pass a
    * high-cardinality `keys` where one exists: a keyless round-robin
    * repartition first pays a local SORT of its input
    * (sortBeforeRepartition, guide §2.5) so retried tasks reproduce
    * their row assignment — hash partitioning needs no such sort. */
  def scan(df: DataFrame, keys: Seq[Column] = Nil, target: Int = 0): DataFrame = {
    val t =
      if (target > 0) target
      else df.sparkSession.sparkContext.defaultParallelism
    // planned partition count only — building the RDD runs no job
    if (df.rdd.getNumPartitions > 1 || t <= 1) df
    else if (keys.nonEmpty) df.repartition(t, keys: _*)
    else df.repartition(t)
  }
}
