package graft.ops

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join handling — the runtime half of the skew story
  * (ops/Skew.saltedSum is the plan-time half for aggregations). A
  * 95%-one-key join must still return exact results, and with AQE's
  * skew thresholds lowered to test scale, the skewed partition is
  * SPLIT at runtime (isSkewJoin) instead of serializing one reducer.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join and results stay exact") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      // force SMJ so the skew path (not broadcast) is what's tested
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // 200k rows, 95% on key 7; right side 100 keys × 1 row
      val left = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, 7L).otherwise(col("id") % 100)
          .as("k"), col("id").as("v"))
      val right = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      assert(joined.count() === 200000)

      joined.collect() // materialize so AQE finalizes the plan
      // QueryStageExec wrappers are leaf-like (collect can't descend),
      // so assert on the rendered final plan
      val s = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(s.contains("SortMergeJoin(skew=true)"),
        s"AQE did not mark the join as skew-handled:\n$s")
      assert(s.contains("skewed"), s"no skewed AQEShuffleRead:\n$s")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
