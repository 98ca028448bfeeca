package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r15 parallelism-restoring repartitions (ops/Spread):
  *  - `scan` is the IDENTITY (no added exchange, same plan object)
  *    when the source already yields >= target splits — the property
  *    that makes it free at real scale;
  *  - `scan` spreads an under-split source to the target width and
  *    keeps the exact multiset of rows;
  *  - `fanout` yields exactly the configured shuffle width (the AQE
  *    coalescer must not shrink it — REPARTITION_BY_NUM), rows
  *    preserved.
  */
class SpreadSpec extends SparkSpec {
  import spark.implicits._

  test("scan is the identity when the input already has enough splits") {
    val df = spark.range(0, 1000, 1, numPartitions = 8).toDF("id")
    val out = Spread.scan(df, Seq(col("id")), target = 4)
    // identity: the SAME DataFrame reference, so no exchange can appear
    assert(out eq df)
  }

  test("scan is the identity for ANY multi-split source, even below target") {
    // r15 sf10 lesson: a 7-row-group file scans 7-way naturally;
    // repartitioning it to 32 shuffles every byte for partial gain —
    // only the truly unsplittable single-partition case may fire
    val df = spark.range(0, 1000, 1, numPartitions = 2).toDF("id")
    val out = Spread.scan(df, Seq(col("id")), target = 32)
    assert(out eq df)
  }

  test("scan spreads an under-split source and preserves the rows") {
    val df = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
    val out = Spread.scan(df, Seq(col("id")), target = 4)
    assert(out.rdd.getNumPartitions == 4)
    assert(out.as[Long].collect().sorted.toSeq == (0L until 1000L))
  }

  test("keyless scan spread also reaches the target width") {
    val df = spark.range(0, 100, 1, numPartitions = 1).toDF("id")
    val out = Spread.scan(df, target = 4)
    assert(out.rdd.getNumPartitions == 4)
    assert(out.as[Long].collect().sorted.toSeq == (0L until 100L))
  }

  test("fanout pins the configured shuffle width against AQE coalescing") {
    // tiny frame: AQE would coalesce a plain groupBy output to 1
    // partition; the pinned-width repartition must keep all 4
    val df = spark.range(0, 64, 1, numPartitions = 2).toDF("k")
      .groupBy("k").agg(count(lit(1)).as("n"))
    val out = Spread.fanout(df, Seq(col("k")))
    assert(out.rdd.getNumPartitions ==
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    assert(out.agg(sum("n")).head().getLong(0) == 64L)
  }
}
