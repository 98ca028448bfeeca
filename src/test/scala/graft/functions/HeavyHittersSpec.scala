package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra–Gries heavy hitters: exact mode, sketch-mode survival
  * guarantee, distributed merge, and the SQL aggregate surface. */
class HeavyHittersSpec extends SparkSpec {

  private def terms(rows: Seq[(Int, String)]) = {
    import spark.implicits._
    rows.toDF("g", "term")
  }

  test("exact mode (capacity >= distinct) matches groupBy counts") {
    val data = (0 until 300).map(i => (i % 2, s"t${i % (7 + (i % 2))}"))
    val got = terms(data)
      .groupBy("g").agg(HeavyHitters(col("term"), 3, 1024).as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select(col("g"), col("e.term"), col("e.cnt"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    val expected = data.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((g, t), c) => (g, t, c) }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(3)
      }.toSet
    assert(got == expected)
  }

  test("distributed merge: many partitions, same exact result") {
    val data = (0 until 5000).map(i => (0, s"w${i % 23}"))
    val one = terms(data).coalesce(1)
      .groupBy("g").agg(HeavyHitters(col("term"), 5, 64).as("hh"))
      .select(explode(col("hh"))).collect().toSeq
    val many = terms(data).repartition(16)
      .groupBy("g").agg(HeavyHitters(col("term"), 5, 64).as("hh"))
      .select(explode(col("hh"))).collect().toSeq
    assert(one == many)
  }

  test("sketch mode: a majority item survives tiny capacity with a lower-bound count") {
    // 600 of 1000 inputs are "hot"; capacity 4 → guaranteed survival
    // for anything with freq > n/(cap+1) = 200, count within 200 of truth
    val data = (0 until 1000).map(i =>
      (0, if (i % 5 < 3) "hot" else s"cold${i % 97}"))
    val got = terms(data).coalesce(1)
      .groupBy("g").agg(HeavyHitters(col("term"), 1, 4).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.length == 1)
    assert(got.head._1 == "hot")
    assert(got.head._2 >= 400 && got.head._2 <= 600,
      s"count ${got.head._2} outside Misra-Gries bound [400, 600]")
  }

  test("null inputs are skipped") {
    import spark.implicits._
    val df = Seq((0, Some("a")), (0, None), (0, Some("a"))).toDF("g", "term")
    val got = df.groupBy("g").agg(HeavyHitters(col("term"), 2, 8).as("hh"))
      .select(explode(col("hh")).as("e")).select(col("e.term"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L)))
  }

  test("heavy_hitters resolves as a SQL aggregate") {
    graft.GraftFunctions.register(spark)
    terms((0 until 100).map(i => (i % 2, s"s${i % 5}")))
      .createOrReplaceTempView("hh_t")
    val rows = spark.sql(
      """SELECT g, h.term, h.cnt
         FROM (SELECT g, explode(hh) AS h
               FROM (SELECT g, heavy_hitters(term, 2, 100) AS hh
                     FROM hh_t GROUP BY g))""").collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getLong(2) == 10L))
  }
}
