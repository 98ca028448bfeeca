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

  /** Skew-safe INNER equi-join on `key`: the (hub-skewed) LEFT side
    * gets a deterministic salt from `saltFrom` (a column varying
    * within a key group); the RIGHT side — which must be slim per key,
    * e.g. one rank row per node — is replicated across all `salts`
    * sub-keys. Row-identical to `left.join(right, key)` (each left
    * row meets its key's right rows at exactly its own salt), but a
    * hot key's rows spread over `salts` reducers instead of one.
    *
    * Why AQE's skew-join split is NOT enough for the iterative graph
    * family (both failure shapes pinned by GraphSkewSpec):
    *  (a) OptimizeSkewedJoin only matches a join whose BOTH inputs
    *      are sort/shuffle-fed directly; an aggregate-fed side (a
    *      PageRank ranks frame, any groupBy output joined on its own
    *      key without an intervening exchange) breaks the pattern and
    *      the rule declines;
    *  (b) a skewed reduce partition can only be split at MAP-output
    *      granularity — a hub key co-located into one mapper by an
    *      earlier same-key shuffle (e.g. a checkpointed edges⋈degrees
    *      frame) is runtime-unsplittable no matter the thresholds.
    * Salting re-shuffles on (key, salt) and is immune to both. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFrom: Column, salts: Int): DataFrame = {
    require(salts >= 1, s"saltedJoin needs salts >= 1, got $salts")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "input already has a __salt column; rename it before salting")
    val l = left.withColumn("__salt", pmod(hash(saltFrom), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
