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

  test("non-finite doubles serialize as JSON null, record stays readable") {
    val dir = tmpDir()
    Seq((1L, 1.5), (2L, Double.NaN), (3L, Double.PositiveInfinity),
      (4L, Double.NegativeInfinity))
      .toDF("id", "x")
      .write.format("graftsink").option("path", dir).mode("append").save()
    val back = spark.read.json(dir).select(col("id"), col("x"))
    // all four records survive (no corrupt-record nulling), with the
    // non-finite values mapped to null and the finite one intact
    assert(back.count() === 4)
    assert(back.filter(col("id") === 1L).select("x").as[Double].head() === 1.5)
    assert(back.filter(col("x").isNull).select("id").as[Long]
      .collect().sorted.toSeq === Seq(2L, 3L, 4L))
  }

  test("streaming epoch commit reconciles against the committed set") {
    val dir = tmpDir()
    val d = new java.io.File(dir); d.mkdirs()
    def touch(name: String): java.io.File = {
      val f = new java.io.File(d, name)
      Files.write(f.toPath, "{}\n".getBytes("UTF-8")); f
    }
    val committed = touch("part-e7-p0-t100.jsonl")
    val loser = touch("part-e7-p0-t101.jsonl")   // zombie attempt's rename
    val stale = touch("part-e7-p3-t55.jsonl")    // prior replay, more partitions
    val tmp = touch(".part-e7-p1-t102.jsonl.tmp") // crashed attempt's temp
    val otherEpoch = touch("part-e6-p0-t9.jsonl") // untouched: different epoch
    val w = new GenSinkStreamingWrite(new org.apache.spark.sql.types.StructType(), dir, truncate = false)
    w.commit(7L, Array(GenSinkFile(committed.getPath)))
    assert(committed.exists())
    assert(!loser.exists() && !stale.exists() && !tmp.exists())
    assert(otherEpoch.exists())
  }
}
