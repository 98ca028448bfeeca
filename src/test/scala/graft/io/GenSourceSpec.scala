package graft.io

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The DSv2 connector contract (qC9's engine side): the V2 scan must
  * prune columns, absorb id-range filters, and — the scale property —
  * plan FEWER input partitions under a pushed bound, the same way
  * file stats prune parquet scans. */
class GenSourceSpec extends SparkSpec {

  private def read(rows: Long, parts: Int) =
    spark.read.format("graftgen")
      .option("rows", rows).option("parts", parts).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("generates deterministic rows with the documented derivations") {
    val rows = read(1000, 4).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.length === 1000)
    assert(rows.map(_._1).toSet === (0L until 1000L).toSet)
    rows.foreach { case (id, grp, v, tag) =>
      assert(grp === id % 97)
      assert(v === (id * 48271L) % 2147483647L)
      assert(tag === "t" + (id % 7))
    }
  }

  test("column pruning reaches the scan's read schema") {
    val df = read(1000, 4).select("grp", "tag")
    assert(scanOf(df).scan.readSchema().fieldNames.toSeq === Seq("grp", "tag"))
  }

  test("id bound is pushed and prunes input partitions") {
    val unbounded = read(400000, 32)
    val bounded = unbounded.filter(col("id") >= 50000 && col("id") < 350000)
    val all = scanOf(unbounded).scan.toBatch.planInputPartitions()
    val pruned = scanOf(bounded).scan.toBatch.planInputPartitions()
    assert(all.length === 32)
    // [50000, 350000) over 12500-wide ranges → partitions 4..27
    assert(pruned.length === 24, "pushed bound must skip whole partitions")
    // the filter is absorbed (reported as pushed), and the result is
    // exactly the bound's ids whether evaluated by source or engine
    assert(scanOf(bounded).scan.description().contains("bounds=[50000,350000)"))
    assert(bounded.count() === 300000L)
    assert(bounded.agg(min("id"), max("id")).collect().head.toSeq
      === Seq(50000L, 349999L))
  }

  test("residual filters on derived columns still evaluate correctly") {
    val df = read(10000, 8).filter(col("grp") === 13 && col("id") < 5000)
    // grp isn't absorbable — Spark must re-apply it post-scan
    assert(df.count() === (0L until 5000L).count(_ % 97 == 13))
  }
}
