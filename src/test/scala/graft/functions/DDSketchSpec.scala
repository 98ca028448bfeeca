package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkSpec

/** DDSketch contract: relative-error accuracy, EXACT mergeability
  * (the 100 TB re-aggregation property), and bounded memory under
  * collapse with the tail guarantee preserved. */
class DDSketchSpec extends SparkSpec {
  import spark.implicits._

  private val alpha = 0.02

  test("quantile estimates land within the relative-error guarantee") {
    val n = 100000
    val df = (1 to n).map(_.toDouble).toDF("x")
    val est = df.agg(DDSketch(col("x"), alpha, 2048,
      Seq(0.5, 0.9, 0.99)).as("e"))
      .select(col("e")).head().getSeq[Double](0)
    val exact = Seq(0.5, 0.9, 0.99).map(q => math.ceil(q * n))
    est.zip(exact).foreach { case (e, x) =>
      assert(math.abs(e - x) <= alpha * x,
        f"estimate $e%.1f off exact $x%.1f beyond alpha")
    }
  }

  test("merge is exact: partitioned aggregation equals single-partition") {
    val df = (1 to 50000).map(i => ((i % 13).toLong, (i * 7919 % 99991).toDouble))
      .toDF("g", "x")
    val one = df.coalesce(1).groupBy("g")
      .agg(DDSketch(col("x"), alpha, 2048, Seq(0.5, 0.95)).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val many = df.repartition(7, col("x")).groupBy("g")
      .agg(DDSketch(col("x"), alpha, 2048, Seq(0.5, 0.95)).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(one === many, "bucket-count merge must be exact, not approximate")
  }

  test("collapse bounds memory and keeps the tail guarantee") {
    val maxB = 16
    val agg = new DDSketch(BoundReference(0, DoubleType, nullable = true),
      alpha, maxB, Seq(0.99))
    var buf = agg.createAggregationBuffer()
    // 6 decades of range: far more natural buckets than 16
    val xs = (1 to 20000).map(i => math.pow(10.0, (i % 600001) % 6 + (i % 97) / 97.0))
    xs.foreach(x => buf = agg.update(buf, InternalRow(x)))
    assert(buf.buckets.size <= maxB, s"bucket budget exceeded: ${buf.buckets.size}")
    val est = agg.eval(buf)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()(0)
    val sorted = xs.sorted
    val exact = sorted(math.ceil(0.99 * xs.size).toInt - 1)
    assert(math.abs(est - exact) <= alpha * exact,
      f"collapsed sketch lost the tail: est $est%.2f vs exact $exact%.2f")
  }
}
