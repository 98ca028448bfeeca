package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
      // events.parquet has shipped `ts` in two encodings across testdata
      // generations; normalize both to session-TZ TimestampType so every
      // downstream query sees one type:
      //  - TIMESTAMP(NANOS): Spark 4 refuses to map it to TimestampType;
      //    read the raw int64 and floor-divide to micros — the same
      //    truncation DuckDB applies reading ns parquet.
      //    DELIBERATE session-wide side effect: nanosAsLong stays set
      //    (the conf is consulted at scan execution, so it can't be
      //    scoped to this read). Net effect: other ns-parquet reads in
      //    the session yield LongType instead of failing outright.
      //  - timestamp[us] with isAdjustedToUTC=false: Spark 4 infers
      //    TIMESTAMP_NTZ, on which unix_micros/interval arithmetic fails
      //    analysis. Cast NTZ→LTZ: with the session TZ pinned UTC in
      //    every entrypoint (Verify/Bench/Profile/OpBench/PlanAudit/
      //    specs) the cast is wall-clock-identity, matching DuckDB
      //    reading the same naive parquet under UTC.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
