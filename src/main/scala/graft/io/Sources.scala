package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
