package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Table loading for the driver-generated parquet test tables
  * (TESTDATA.md). One parquet file per table under the sf dir.
  *
  * At 100 TB each of these would be a partitioned parquet dataset (or
  * an Iceberg/Delta table); `spark.read.parquet(dir)` handles both a
  * single file and a partitioned directory tree transparently, so the
  * call shape is already scale-correct. Filters/projections declared
  * downstream reach the scan via Catalyst (PushedFilters/ReadSchema).
  */
object Sources {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.parquet carries TIMESTAMP(NANOS), which Spark 4 refuses
      // to map to TimestampType; read the raw int64 and floor-divide to
      // micros — the same truncation DuckDB applies reading ns parquet.
      // DELIBERATE session-wide side effect: nanosAsLong stays set
      // (the conf is consulted at scan execution, so it can't be
      // scoped to this read). Net effect: other ns-parquet reads in
      // the session yield LongType instead of failing outright.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
