package graft.io

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Contract test for the events `ts` column: the driver-generated
  * testdata has shipped THREE different parquet encodings across
  * regenerations —
  *   1. int64 TIMESTAMP(NANOS)             (rounds ≤5)
  *   2. int64 timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ (round 6)
  *   3. int64 timestamp[us] isAdjustedToUTC=true  → TIMESTAMP      (plain LTZ)
  * — and encoding #2 silently broke 21 queries in round 6 because the
  * reader only special-cased #1. This spec writes a tiny fixture in
  * each encoding (all carrying the SAME instant, 2024-03-01T12:34:56.789Z)
  * and asserts [[Sources.table]] normalizes every one to a session-TZ
  * TimestampType column with identical micros — so the next testdata
  * regeneration that changes encoding fails a unit test instead of the
  * round's correctness gate.
  */
class TsEncodingSpec extends SparkSpec {

  private val instantMicros = {
    // 2024-03-01T12:34:56.789Z, derived without host-TZ dependence
    java.time.Instant.parse("2024-03-01T12:34:56.789Z").toEpochMilli * 1000L
  }

  /** Writes a one-row events.parquet whose ts is int64 TIMESTAMP in
    * `unit`, adjusted-to-UTC per `utc` — the raw parquet-mr path,
    * because Spark itself cannot author a NANOS timestamp column. */
  private def writeRaw(dir: String, unit: TimeUnit, utc: Boolean): Unit = {
    val tsVal = unit match {
      case TimeUnit.NANOS  => instantMicros * 1000L
      case TimeUnit.MICROS => instantMicros
      case TimeUnit.MILLIS => instantMicros / 1000L
    }
    val schema: MessageType = Types.buildMessage()
      .addField(Types.required(PrimitiveTypeName.INT64).named("event_id"))
      .addField(Types.required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(utc, unit)).named("ts"))
      .addField(Types.required(PrimitiveTypeName.INT64).named("user_id"))
      .addField(Types.required(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.required(PrimitiveTypeName.DOUBLE).named("value"))
      .addField(Types.required(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props"))
      .named("events")
    val fac = new SimpleGroupFactory(schema)
    val g = fac.newGroup()
      .append("event_id", 1L).append("ts", tsVal).append("user_id", 7L)
      .append("event_type", "click").append("value", 1.5)
      .append("props", "{}")
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withConf(new Configuration())
      .withType(schema)
      .build()
    try w.write(g) finally w.close()
  }

  /** Spark-authored fixture: `ntz`=true writes TIMESTAMP_NTZ
    * (timestamp[us] isAdjustedToUTC=false), else plain TimestampType. */
  private def writeSpark(dir: String, ntz: Boolean): Unit = {
    val tsType: DataType = if (ntz) TimestampNTZType else TimestampType
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val row =
      if (ntz) Row(1L, java.time.LocalDateTime.ofEpochSecond(
        instantMicros / 1000000L, (instantMicros % 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC), 7L, "click", 1.5, "{}")
      else Row(1L, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(instantMicros / 1000000L,
          (instantMicros % 1000000L) * 1000L)), 7L, "click", 1.5, "{}")
    // write to a scratch dir, then move the single part file to the
    // fixture name Sources.table expects (events.parquet)
    val scratch = Files.createTempDirectory("graft_ts_scratch").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(row), 1), schema)
      .write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
  }

  private def assertNormalized(dir: String, label: String): Unit = {
    val df = Sources.table(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"$label: ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
    val got = df.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == instantMicros,
      s"$label: instant drifted — got $got, expected $instantMicros")
  }

  test("TIMESTAMP(NANOS) events normalize to TimestampType (legacy encoding)") {
    val dir = Files.createTempDirectory("graft_ts_nanos").toString
    writeRaw(dir, TimeUnit.NANOS, utc = true)
    assertNormalized(dir, "nanos")
  }

  test("TIMESTAMP_NTZ events normalize to TimestampType (round-6 encoding)") {
    val dir = Files.createTempDirectory("graft_ts_ntz").toString
    writeSpark(dir, ntz = true)
    assertNormalized(dir, "ntz")
  }

  test("plain TIMESTAMP (LTZ) events pass through unchanged") {
    val dir = Files.createTempDirectory("graft_ts_ltz").toString
    writeSpark(dir, ntz = false)
    assertNormalized(dir, "ltz")
  }

  test("raw parquet-mr NTZ micros (the driver's exact footer) normalize too") {
    // the driver writes via pyarrow, not Spark — same footer shape as
    // this parquet-mr form: int64 timestamp(MICROS, isAdjustedToUTC=false)
    val dir = Files.createTempDirectory("graft_ts_ntz_raw").toString
    writeRaw(dir, TimeUnit.MICROS, utc = false)
    assertNormalized(dir, "ntz-raw")
  }
}
