package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parquet AGGREGATE pushdown (DataSource V2): count/min/max answered
  * from row-group footer statistics without materializing a single
  * row — at 100 TB the difference between a metadata sweep and a full
  * scan for the audit queries a pipeline runs constantly (row counts,
  * key bounds). V1 is Spark's default parquet path, so the pushdown
  * lives in a v2-routed session (useV1SourceList="") — confs are
  * session-scoped and `newSession()` shares the context, so the rest
  * of the suite keeps the default path.
  */
class AggPushdownSpec extends SparkSpec {

  test("count/min/max are answered by footer stats under v2") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val src = "/root/testdata/sf0.001/orders.parquet"

    val pushed = s2.read.parquet(src)
      .agg(count(lit(1)).as("n"),
        min("o_orderkey").as("mn"), max("o_orderkey").as("mx"))
    assert(pushed.queryExecution.executedPlan.toString
        .contains("PushedAggregation: [COUNT"),
      "expected a non-empty PushedAggregation in the v2 scan")

    // same aggregates through the default (row-materializing) path
    val expect = spark.read.parquet(src)
      .agg(count(lit(1)).as("n"),
        min("o_orderkey").as("mn"), max("o_orderkey").as("mx"))
      .collect()(0)
    val got = pushed.collect()(0)
    assert(got.getLong(0) == expect.getLong(0))
    assert(got.getLong(1) == expect.getLong(1))
    assert(got.getLong(2) == expect.getLong(2))
  }

  test("group-by aggregates fall back to a real scan (not pushable)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val grouped = s2.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    // v2 scans always print the label; "[]" = nothing was pushed
    assert(grouped.queryExecution.executedPlan.toString
      .contains("PushedAggregation: []"))
    assert(grouped.count() > 0)
  }
}
