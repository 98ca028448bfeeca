package graft.plans

import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the scale claims behind q99 (changelog compaction) and the
  * max_by idiom it rests on: latest-record-wins must plan as ONE
  * aggregation with a map-side partial — the shuffle then carries one
  * row per key per task — and must NOT fall back to the window-sort
  * idiom (row_number = 1), which shuffles and sorts the entire log.
  * Also pins max_by's struct-ordering tie-break (lexicographic, so a
  * ts tie resolves by the second field) — the determinism q99's
  * oracle equivalence depends on.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val log = Seq(
    // (key, seq, ts, payload) — key 1 has a ts tie at 30
    (1L, 1L, 10L, "a"), (1L, 2L, 30L, "b"), (1L, 3L, 30L, "c"),
    (2L, 4L, 5L, "x"), (2L, 5L, 50L, "y")
  ).toDF("k", "seq", "ts", "v")

  private def compact = log.groupBy("k")
    .agg(max_by(struct(col("v"), col("ts")), struct(col("ts"), col("seq"))).as("last"),
      count(lit(1)).as("n"))
    .select(col("k"), col("last.v").as("v"), col("n"))

  test("compaction plans as aggregation, not a window sort") {
    val df = compact
    df.count() // force AQE to finalize
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    // struct-ordered max_by has no hash-agg buffer ⇒ Spark picks
    // SortAggregate; the load-bearing property is partial+final (one
    // row per key per task at the exchange), not which agg exec
    val aggs = p.collectWithSubqueries {
      case a: HashAggregateExec => a
      case a: ObjectHashAggregateExec => a
      case a: SortAggregateExec => a
    }
    // partial + final of the same aggregate ⇒ at least 2 agg nodes
    assert(aggs.size >= 2, p)
    assert(p.collectWithSubqueries { case w: WindowExec => w }.isEmpty, p)
  }

  test("max_by struct ordering breaks ts ties by the second field") {
    val got = compact.collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // key 1: ts tie at 30 between seq 2 ("b") and seq 3 ("c") — the
    // larger seq wins under lexicographic struct comparison
    assert(got(1L) === ("c", 3L))
    assert(got(2L) === ("y", 2L))
  }
}
