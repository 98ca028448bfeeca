package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (builder brief: "skewed keys → salting or AQE
  * skew-join"). Salted aggregation splits each hot grouping key into
  * `salts` sub-keys for the first (wide, parallel) partial aggregate,
  * then re-aggregates the per-salt partials — identical results to a
  * direct groupBy for any algebraic aggregate, but the first shuffle
  * spreads a hot key over `salts` reducers instead of one.
  *
  * At 100 TB this is the difference between one straggler reducer
  * holding a billion rows for a hot key and 64 reducers holding
  * 1/64th each. (AQE's skew-join handling covers joins; salting
  * covers aggregations and is deterministic here — salt = hash of a
  * secondary column, not rand() — so results are reproducible.)
  */
object Skew {

  /** Two-phase salted sum: groupBy(keys + salt) partial sums, then
    * groupBy(keys) final sums. `saltFrom` should be a column that
    * varies within a key group (e.g. the row id). */
  def saltedSum(df: DataFrame, keys: Seq[String], saltFrom: Column,
                salts: Int, sums: (String, String)*): DataFrame = {
    require(sums.nonEmpty, "saltedSum needs at least one (column, alias) sum")
    require(salts >= 1, // pmod(_, 0) is a mid-job ANSI divide-by-zero
      s"saltedSum needs salts >= 1, got $salts")
    require(!df.columns.contains("__salt"),
      "input already has a __salt column; rename it before salting")
    val salted = df.withColumn("__salt", pmod(hash(saltFrom), lit(salts)))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(sums.head._1)).as(sums.head._2),
        sums.tail.map { case (c, a) => sum(col(c)).as(a) }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col(sums.head._2)).as(sums.head._2),
        sums.tail.map { case (_, a) => sum(col(a)).as(a) }: _*)
  }
}
