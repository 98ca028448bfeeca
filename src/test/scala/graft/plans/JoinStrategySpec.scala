package graft.plans

import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the join-strategy control surface the engine relies on: the
  * same equi-join resolves to a broadcast-hash, shuffled-hash, or
  * sort-merge plan under the corresponding hint, with identical
  * results. At 100 TB picking the wrong one of these is the
  * difference between a per-node hash probe and a full two-sided
  * sort — Dedup's PPJoin path (`Dedup.scala` shuffle_hash hint) and
  * every broadcast() call in graft depend on these mappings holding.
  */
class JoinStrategySpec extends SparkSpec {
  import spark.implicits._

  private lazy val left =
    (1 to 2000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
  private lazy val right =
    (1 to 500).map(i => (i.toLong * 2, s"r$i")).toDF("k", "rv")

  private def planOf(df: org.apache.spark.sql.DataFrame) = {
    df.count() // force AQE to finalize
    df.queryExecution.executedPlan match {
      // AQE's wrapper is a leaf to collect() — unwrap the real plan
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
  }

  test("broadcast() forces BroadcastHashJoin") {
    val p = planOf(left.join(broadcast(right), "k"))
    assert(p.collectWithSubqueries { case j: BroadcastHashJoinExec => j }.nonEmpty, p)
    assert(p.collectWithSubqueries { case e: BroadcastExchangeExec => e }.nonEmpty, p)
  }

  test("shuffle_hash hint forces ShuffledHashJoin (no sort)") {
    val p = planOf(left.join(right.hint("shuffle_hash"), "k"))
    assert(p.collectWithSubqueries { case j: ShuffledHashJoinExec => j }.nonEmpty, p)
    assert(p.collectWithSubqueries { case j: SortMergeJoinExec => j }.isEmpty, p)
  }

  test("merge hint forces SortMergeJoin") {
    val p = planOf(left.join(right.hint("merge"), "k"))
    assert(p.collectWithSubqueries { case j: SortMergeJoinExec => j }.nonEmpty, p)
  }

  test("all three strategies return identical results") {
    val expected = left.join(right, "k").collect().toSet
    assert(left.join(broadcast(right), "k").collect().toSet === expected)
    assert(left.join(right.hint("shuffle_hash"), "k").collect().toSet === expected)
    assert(left.join(right.hint("merge"), "k").collect().toSet === expected)
    assert(expected.size === 500)
  }
}
