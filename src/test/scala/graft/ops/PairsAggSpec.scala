package graft.ops

import graft.SparkSpec

class PairsAggSpec extends SparkSpec {
  import spark.implicits._

  test("G1 explodePairs: itertools.combinations order, i<j") {
    val df = Seq((1, Seq("a", "b", "c")), (2, Seq("x")), (3, Seq[String]()))
      .toDF("id", "arr")
    val out = Pairs.explodePairs(df, "arr")
      .select("id", "t1", "t2").as[(Int, String, String)].collect().toSeq
    assert(out === Seq((1, "a", "b"), (1, "a", "c"), (1, "b", "c")))
  }

  test("A2 vs A5: Σ(r+1) per-topic differs from 1+Σr per-pair (demo.py:180-187 vs 436-442)") {
    // two "tweets" in one group, both containing topic "a" / pair (a,b)
    val df = Seq(
      ("g", Seq("a", "b"), 2),
      ("g", Seq("a", "b"), 3)).toDF("k", "phrases", "r")
    val exploded = df.select($"k", org.apache.spark.sql.functions.explode($"phrases").as("topic"), $"r")
    val a2 = Aggregates.weightedFreq1D(exploded, Seq("k"), "topic", "r")
      .filter($"topic" === "a").select("frequency").as[Long].collect().head
    assert(a2 === (2 + 1) + (3 + 1)) // Σ(r+1) = 7

    val pairs = Pairs.explodePairs(df, "phrases")
    val a5 = Aggregates.weightedFreq2D(pairs, Seq("k"), "t1", "t2", "r")
      .select("frequency").as[Long].collect().head
    assert(a5 === 1 + (2 + 3)) // 1+Σr = 6 ≠ 7
  }

  test("A3 weighted sentiment ratio: Σ s·(l+1) / (Σ l + 1)") {
    val df = Seq(("g", "a", 0.5, 1), ("g", "a", -0.25, 3)).toDF("k", "topic", "s", "l")
    val out = Aggregates.weightedSentiment1D(df, Seq("k"), "topic", "s", "l")
      .select("sentiment").as[Double].collect().head
    assert(math.abs(out - (0.5 * 2 + -0.25 * 4) / (1 + 3 + 1)) < 1e-12)
  }

  test("A6 monthPivot: lexicographic month columns, zero fill, max reducer") {
    val df = Seq(("t1", "2018-1", 5L), ("t1", "2018-10", 7L), ("t2", "2018-1", 1L))
      .toDF("topic", "month", "frequency")
    val piv = Aggregates.monthPivot(df, Seq("topic"), "month",
      Seq("2018-1", "2018-10"), "frequency")
    val rows = piv.orderBy("topic").collect()
    assert(piv.columns.toSeq === Seq("topic", "2018-1", "2018-10"))
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("t1", 5L, 7L), ("t2", 1L, 0L)))
  }
}
