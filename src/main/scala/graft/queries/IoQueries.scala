package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{Sinks, Sources}
import graft.io.Sources.table

/** Source/sink driver surface (SURVEY.md §2.1 SRC1/SNK1) plus the
  * deterministic sampler. These make the CSV path and the sampling
  * path oracle-checkable instead of spec-only:
  *
  *  - q57 round-trips a table through the DISTRIBUTED CSV sink and
  *    the glob scan (header + inferSchema, the reference's read shape,
  *    ref demo.py:53) and aggregates the re-read — any loss or type
  *    drift in the CSV layer breaks the hash against the
  *    parquet-direct oracle.
  *  - q59 is the scale-safe twin of the reference's
  *    `orderBy(rand()).limit(n)` sample (ref demo.py:55): a
  *    deterministic content-hash filter. Unlike rand(seed) — whose
  *    output depends on partition layout and row order — md5(key) is
  *    a pure row function: same rows selected on 1 executor or 1000,
  *    re-runnable, and expressible in any engine (which is what makes
  *    it oracle-checkable at all).
  */
object IoQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SRC1+SNK1 end-to-end: parquet → distributed CSV write (one file
    // per partition) → glob scan with header+inferSchema → aggregate.
    "q57_csv_roundtrip" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q57_csv").toString
      val src = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_orderpriority"))
      Sinks.writeCsv(src, tmp)
      Sinks.readCsv(s, tmp)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum("o_custkey").as("sum_cust"),
          countDistinct("o_orderpriority").as("n_prio"))
    }),

    // Deterministic 1/16 content-hash sample: first hex nibble of
    // md5(key). Narrow filter, no shuffle, no sort — contrast with
    // orderBy(rand(seed)).limit(n), a global sort whose result set
    // depends on partitioning.
    "q59_hash_sample" -> ((s, dir) =>
      table(s, dir, "orders")
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0")
        .select("o_orderkey", "o_custkey", "o_orderstatus"))
  )

  def oracles: Map[String, String] = Map(
    // the oracle reads parquet DIRECTLY — the CSV round-trip must be
    // lossless for the hash to match
    "q57_csv_roundtrip" ->
      """SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(o_custkey) AS BIGINT) AS sum_cust,
           count(DISTINCT o_orderpriority) AS n_prio
         FROM orders GROUP BY o_orderstatus""",

    "q59_hash_sample" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus
         FROM orders
         WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'"""
  )
}
