package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GroupedTopK: value parity with the window idiom, the partial→final
  * single-exchange plan shape, and the WindowTopKRewrite fire/no-fire
  * contract. */
class GroupedTopKSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    // 6 keys × 40 rows, unique (v, id) suffix → total order
    (0 until 240).map(i => (i % 6, (i * 131) % 97, i))
      .toDF("key", "v", "id")
  }

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("key", "v", "id")
  }

  test("topK matches the window idiom under a total order") {
    val got = GroupedTopK
      .topK(df, Seq(col("key")), Seq(col("v").desc, col("id").asc), 3)
      .select("key", "v", "id")
    assert(got.collect().toSet == windowTopK(3).collect().toSet)
    assert(got.count() == 18)
  }

  test("k = 1 (argmax) and k larger than any group") {
    val one = GroupedTopK.topK(df, Seq(col("key")), Seq(col("v").desc, col("id").asc), 1)
    assert(one.count() == 6)
    val all = GroupedTopK.topK(df, Seq(col("key")), Seq(col("v").desc, col("id").asc), 1000)
    assert(all.count() == 240)
  }

  test("plans as partial → single exchange → final") {
    // AQE's wrapper hides the plan from collect(); the shape is the
    // same either way, so assert on the non-adaptive plan.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = GroupedTopK
        .topK(df, Seq(col("key")), Seq(col("v").desc, col("id").asc), 3)
        .queryExecution.executedPlan
      val s = plan.toString
      val execs = plan.collect { case g: GroupedTopKExec => g }
      assert(execs.map(_.partial).sorted == Seq(false, true),
        s"expected one partial and one final exec, got $execs")
      assert("Exchange".r.findAllIn(s).size == 1, s"expected exactly one exchange:\n$s")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("partial-phase flush (tiny maxRowsInFlight) loses no winners") {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val child = df.queryExecution.executedPlan
      def attr(n: String) = child.output.find(_.name == n).get
      val order = Seq(SortOrder(attr("v"), Descending), SortOrder(attr("id"), Ascending))
      val winners = windowTopK(3).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      // flush every 2 keys (6 keys interleave → flushes constantly):
      // supersets stream out mid-partition, no winner may be lost
      val flushy = GroupedTopKExec(Seq(attr("key")), order, 3,
        partial = true, child, maxRowsInFlight = 2)
        .executeCollect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      assert(winners.subsetOf(flushy), s"flush dropped winners: ${winners -- flushy}")
      // no flush: the partial phase retains ≤ 3 rows per key per
      // partition — real map-side pruning
      val retained = GroupedTopKExec(Seq(attr("key")), order, 3,
        partial = true, child)
        .executeCollect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      assert(winners.subsetOf(retained))
      assert(retained.size <= 4 * 6 * 3, s"partial retained ${retained.size} rows")
      assert(retained.size < 240, "partial phase pruned nothing")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("partial phase bounds what reaches the exchange") {
    // 1 key, 1000 rows over 4 input partitions: the window idiom
    // shuffles all 1000 rows; partial top-k passes at most k per
    // input partition.
    import spark.implicits._
    val skew = (0 until 1000).map(i => (1, i)).toDF("key", "v").repartition(4)
    val got = GroupedTopK.topK(skew, Seq(col("key")), Seq(col("v").desc), 5)
    assert(got.collect().map(_.getInt(1)).sorted.toSeq == (995 until 1000))
  }

  test("WindowTopKRewrite fires on the idiom and preserves results") {
    WindowTopKRewrite.install(spark)
    try {
      val rewritten = windowTopK(3)
      val s = rewritten.queryExecution.executedPlan.toString
      assert(s.contains("GroupedTopK ") && !s.contains("WindowGroupLimit"),
        s"rewrite did not fire (or left a redundant group-limit):\n$s")
      val expected = df.collect().groupBy(_.getInt(0)).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r.getInt(1), r.getInt(2))).take(3)
      }.map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      assert(rewritten.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
        == expected)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == WindowTopKRewrite)
    }
  }

  test("rewrite keeps the rank column values intact") {
    WindowTopKRewrite.install(spark)
    try {
      val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
      val rewritten = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      assert(rewritten.queryExecution.executedPlan.toString.contains("GroupedTopK "))
      val ranks = rewritten.select("key", "rn").collect()
        .groupBy(_.getInt(0)).view.mapValues(_.map(_.getInt(1)).sorted.toSeq).toMap
      assert(ranks.values.forall(_ == Seq(1, 2)))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == WindowTopKRewrite)
    }
  }

  test("rewrite does NOT fire when unsafe") {
    WindowTopKRewrite.install(spark)
    try {
      val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
      // sibling window function would see reduced input → must not fire
      val sibling = df
        .withColumn("rn", row_number().over(w))
        .withColumn("s", sum("v").over(Window.partitionBy("key")))
        .filter(col("rn") <= 2)
      assert(!sibling.queryExecution.executedPlan.toString.contains("GroupedTopK "))
      // rank() admits >k rows on ties → must not fire
      val rk = df.withColumn("r", rank().over(w)).filter(col("r") <= 2)
      assert(!rk.queryExecution.executedPlan.toString.contains("GroupedTopK "))
      // rn = 2 is not a prefix bound → must not fire
      val eq2 = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 2)
      assert(!eq2.queryExecution.executedPlan.toString.contains("GroupedTopK "))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == WindowTopKRewrite)
    }
  }
}
