package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 8

  /** Driver-side reference CMS over the same md5-word hash family. */
  private def bruteCms(values: Seq[String]): Array[Long] = {
    val buf = new Array[Long](D * W)
    values.foreach { v =>
      val ps = BloomFilter.positions(v.getBytes("UTF-8"), W)
      (0 until D).foreach(i => buf(i * W + ps(i)) += 1L)
    }
    buf
  }

  private val corpus: Seq[String] =
    (1 to 300).map(i => s"term${i % 23}") // 23 distinct, skewed counts

  private def sketchOf(parts: Int): Seq[Long] =
    corpus.toDF("v").repartition(parts)
      .agg(CountMin.build($"v", D, W).as("cms"))
      .collect()(0).getSeq[Long](0)

  test("counters equal the driver-side fold; merge is layout-invariant") {
    assert(sketchOf(1) === bruteCms(corpus).toSeq)
    assert(sketchOf(7) === bruteCms(corpus).toSeq)
  }

  test("estimates never underestimate and match the CMS definition") {
    val exact = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cms = bruteCms(corpus)
    val rows = corpus.distinct.toDF("term")
      .crossJoin(broadcast(corpus.toDF("v").agg(CountMin.build($"v", D, W).as("cms"))))
      .select($"term", CountMin.estimate($"cms", $"term", D, W).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    rows.foreach { case (t, est) =>
      val expected = (0 until D).map { i =>
        cms(i * W + BloomFilter.positions(t.getBytes("UTF-8"), W)(i))
      }.min
      assert(est === expected, s"estimate mismatch for $t")
      assert(est >= exact(t), s"CMS underestimated $t")
    }
    // 23 terms into 8 buckets/row: collisions must force at least one
    // genuine overestimate, or the test corpus is not exercising the
    // sketch regime at all
    assert(rows.exists { case (t, est) => est > exact(t) })
  }

  test("nulls are skipped, not hashed as a sentinel") {
    val withNull = (corpus.map(Option(_)) :+ Option.empty[String]).toDF("v")
      .agg(CountMin.build($"v", D, W)).collect()(0).getSeq[Long](0)
    assert(withNull === bruteCms(corpus).toSeq)
    assert(withNull.sum === corpus.size.toLong * D)
  }

  test("depth is capped at the md5 word count") {
    intercept[IllegalArgumentException] {
      CountMinAgg(GraftTestShim.expr(lit("x")), 5, 8)
    }
  }
}

/** Minimal accessor for building the agg directly in a spec. */
private object GraftTestShim {
  def expr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftShims.expression(c)
}
