package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources

/** Runtime (row-level) filter injection — DPP's sibling for
  * NON-partition join keys: when one join side carries a selective
  * filter, Catalyst builds a bloom filter over its keys at runtime
  * and pushes a `might_contain` probe into the other side's scan,
  * cutting the shuffled row count before the join. At 100 TB this is
  * what keeps a "join the 3-day dim slice against the full fact"
  * query from shuffling the full fact. The thresholds default to
  * cluster scale (10 GB application side), so the spec lowers them to
  * prove the mechanism; production relies on the defaults.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("bloom runtime filter injected into the probe side of a selective shuffle join") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    // conf.get can return an explicit null (adaptive threshold's
    // default) — treat that as "unset" or the restore crashes
    val saved = keys.map(k =>
      k -> util.Try(Option(spark.conf.get(k))).toOption.flatten)
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // any probe-side scan qualifies (default 10GB — cluster scale)
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")
      // force a shuffle join: a broadcast join already prunes the
      // probe side at the join, so no runtime filter is injected
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val dir = "/root/testdata/sf0.001"
      val o = Sources.table(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_custkey")
      val li = Sources.table(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val joined = o.join(li, col("o_orderkey") === col("l_orderkey"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom runtime filter (might_contain) in:\n$optimized")

      // semantics unchanged: bloom false positives are re-checked by
      // the join, so the count must equal the filterless-plan twin
      val expected = {
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        try joined.count() finally
          spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      }
      assert(joined.count() === expected && expected > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
