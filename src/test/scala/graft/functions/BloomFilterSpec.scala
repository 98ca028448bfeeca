package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1 << 16

  private def buildBits(values: Seq[String], parts: Int): Array[Byte] =
    values.toDF("v").repartition(parts)
      .agg(BloomFilter.build($"v", M).as("bits"))
      .collect()(0).getAs[Array[Byte]]("bits")

  test("bits equal an independent driver-side fold (MessageDigest)") {
    val vals = (1 to 1000).map(i => s"value-$i")
    val expected = new Array[Byte](M / 8)
    vals.foreach(v => BloomFilter.set(expected, UTF8String.fromString(v), M))
    // ... which must itself match the documented SQL hash spelling
    val hexPos = spark.sql(
      s"SELECT CAST(conv(substr(md5('value-1'), 1, 8), 16, 10) AS BIGINT) % $M")
      .collect()(0).getLong(0)
    assert(BloomFilter.positions("value-1".getBytes("UTF-8"), M)(0) === hexPos)
    assert(buildBits(vals, 1).toSeq === expected.toSeq)
  }

  test("merge (partition layout) cannot change the bits") {
    val vals = (1 to 500).map(i => s"doc $i with some text")
    assert(buildBits(vals, 1).toSeq === buildBits(vals, 7).toSeq)
  }

  test("no false negatives, three-valued nulls, fp bounded at this fill") {
    val present = (1 to 1000).map(i => s"present-$i")
    val bitsDf = present.toDF("v").agg(BloomFilter.build($"v", M).as("bits"))
    val probes = (present ++ (1 to 1000).map(i => s"absent-$i"))
      .toDF("v").crossJoin(broadcast(bitsDf))
      .select($"v", BloomFilter.mightContain($"bits", $"v", M).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(present.forall(probes(_)), "bloom false negative")
    // kn/m = 4*1000/65536 → fp ≈ 1.2e-5; 1% leaves huge slack
    val fp = (1 to 1000).count(i => probes(s"absent-$i"))
    assert(fp <= 10, s"false-positive count $fp implausibly high")
    // null probe → null (not false): SQL three-valued logic
    val nullRow = Seq(Option.empty[String]).toDF("v").crossJoin(broadcast(bitsDf))
      .select(BloomFilter.mightContain($"bits", $"v", M)).collect()(0)
    assert(nullRow.isNullAt(0))
    // null keys are skipped by the build, not hashed as a sentinel
    val withNull = (present.map(Option(_)) :+ Option.empty[String]).toDF("v")
      .agg(BloomFilter.build($"v", M).as("bits"))
      .collect()(0).getAs[Array[Byte]]("bits")
    assert(withNull.toSeq === bitsDf.collect()(0).getAs[Array[Byte]]("bits").toSeq)
  }

  test("false positives exist when the filter saturates (it is a sketch)") {
    val m = 64 // 8 bytes; 100 values * 4 hashes saturate it
    val bits = (1 to 100).map(i => s"v$i").toDF("v")
      .agg(BloomFilter.build($"v", m).as("bits"))
      .collect()(0).getAs[Array[Byte]]("bits")
    val absent = (1 to 50).map(i => s"absent$i")
    val hits = absent.count(v =>
      BloomFilter.mightContain(bits, UTF8String.fromString(v), m))
    assert(hits > 0, "a saturated 64-bit filter must show false positives")
  }

  test("probe runs inside whole-stage codegen (no fallback to eval)") {
    val bits = (1 to 10).map(i => s"x$i").toDF("v")
      .agg(BloomFilter.build($"v", M).as("bits"))
      .collect()(0).getAs[Array[Byte]]("bits")
    // probe as a projection over a generated range — the shape whose
    // plan shows whether doGenCode compiled or fell back to eval
    val probed = spark.range(1, 11)
      .select(BloomFilter.mightContain(
        lit(bits), concat(lit("x"), $"id".cast("string")), M).as("hit"))
    assert(probed.filter($"hit").count() === 10)
    val codegenStages = probed.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty,
      s"probe fell out of codegen:\n${probed.queryExecution.executedPlan}")
  }
}
