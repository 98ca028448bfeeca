package graft.io

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition pruning = the other half of scan discipline: a
  * date-partitioned layout lets a day filter skip whole directories.
  * At 100 TB this is the difference between listing/reading one day
  * and the full history. */
class PartitionedWriteSpec extends SparkSpec {

  test("date-partitioned write + day filter prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft_part").toString
    val events = Sources.table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("d", to_date(col("ts")))
    events.write.mode("overwrite").partitionBy("d").parquet(s"$dir/ev")

    val day = java.sql.Date.valueOf("2024-01-05")
    val q = spark.read.parquet(s"$dir/ev").filter(col("d") === day)

    val scans = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // the day predicate must land in partitionFilters (directory
    // pruning), not dataFilters (row filtering after a full read)
    assert(scans.head.partitionFilters.exists(_.toString.contains("2024-01-05")),
      s"expected partition filter, got: ${scans.head.partitionFilters}")

    val expected = events.filter(col("d") === day).count()
    assert(q.count() === expected && expected > 0)
  }
}
