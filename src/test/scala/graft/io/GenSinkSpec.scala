package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The V2 write-protocol contract (qD5's engine side): lossless
  * round-trip, one file per input partition (the no-driver-funnel
  * property), and truncate-on-overwrite. */
class GenSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() =
    Files.createTempDirectory("graft_sink_spec").toString

  test("round-trips long/double/string/boolean losslessly") {
    val dir = tmpDir()
    val df = Seq(
      (1L, 1.5, "plain", true),
      (2L, -0.25, "quote\" slash\\ tab\t nl\n", false),
      (3L, 123.456789, "unicode é中", true))
      .toDF("id", "x", "s", "b")
    df.write.format("graftsink").option("path", dir).mode("append").save()
    val back = spark.read.json(dir)
      .select(col("id"), col("x"), col("s"), col("b"))
    assert(back.orderBy("id").collect().toSeq
      === df.orderBy("id").collect().toSeq)
  }

  test("writes one file per partition, no driver funnel") {
    val dir = tmpDir()
    spark.range(1000).repartition(7)
      .select(col("id"), (col("id") % 5).cast("string").as("tag"))
      .write.format("graftsink").option("path", dir).mode("append").save()
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".jsonl"))
    assert(files.length === 7, "expected one task file per partition")
    assert(spark.read.json(dir).count() === 1000)
  }

  test("overwrite truncates previous contents") {
    val dir = tmpDir()
    spark.range(10).select(col("id")).write
      .format("graftsink").option("path", dir).mode("append").save()
    spark.range(3).select(col("id")).write
      .format("graftsink").option("path", dir).mode("overwrite").save()
    assert(spark.read.json(dir).count() === 3)
  }
}
