package graft.ops

import org.apache.spark.sql.{DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._

/** Overlap join of two HALF-OPEN interval sets [start, end) on a
  * shared long axis (epoch seconds, positions, offsets).
  *
  * A bare `a.start < b.end AND b.start < a.end` join has no equi-key,
  * so Spark plans a broadcast-nested-loop (fine only when one side is
  * tiny) or a cartesian product — the classic 100 TB killer. This is
  * the standard bucketing rewrite: each interval explodes to the
  * fixed-width buckets it touches, the join runs as an EQUI-join on
  * bucket plus the overlap predicate, and each qualifying pair is
  * emitted exactly once by keeping only the bucket that contains
  * `max(starts)` (both intervals cover that point, so both occupy
  * that bucket — no post-hoc distinct needed).
  *
  * Cost: |rows| · (interval_width / bucketWidth) exploded rows and a
  * shuffle keyed by bucket; comparisons are bucket-local. Pick
  * bucketWidth ≈ typical interval length — much smaller explodes too
  * many copies, much larger degrades toward all-pairs within a
  * bucket. Floor-based bucketing keeps negative axis values correct.
  *
  * Caller contract: the four bound column names must be distinct
  * between the two frames (prefix your sides); both frames' other
  * columns pass through.
  */
object IntervalJoin {

  def overlapJoin(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // integer floor-division, not floor(double /): `/` promotes the
    // long axis to double and loses ulps above 2^53 (epoch-nanos are
    // ~1.7e18), mis-bucketing edge intervals into silently missed
    // pairs. v − pmod(v, w) is the exact floor multiple, and the
    // IntegralDivide of that multiple is exact for any sign.
    def fdiv(v: org.apache.spark.sql.Column) = {
      val m = v.cast("long") - pmod(v.cast("long"), lit(bucketWidth))
      GraftShims.column(IntegralDivide(
        GraftShims.expression(m), GraftShims.expression(lit(bucketWidth))))
    }
    def bkt(c: String) = fdiv(col(c))
    // half-open: the last occupied bucket is the one holding end-1.
    // Degenerate [s, s) intervals follow the RAW overlap predicate
    // (s1 < e2 AND s2 < e1) exactly like the plain theta join this
    // rewrite must mirror — the containment bucket bkt(greatest of
    // starts) is always on the degenerate side's 2-bucket list, so
    // emission parity holds there too.
    val lb = left.withColumn("_graft_bkt",
      explode(sequence(bkt(lStart), fdiv(col(lEnd) - 1))))
    val rb = right.withColumn("_graft_rbkt",
      explode(sequence(bkt(rStart), fdiv(col(rEnd) - 1))))
    lb.join(rb,
        col("_graft_bkt") === col("_graft_rbkt") &&
          col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
          col("_graft_bkt") === fdiv(greatest(col(lStart), col(rStart))))
      .drop("_graft_bkt", "_graft_rbkt")
  }
}
