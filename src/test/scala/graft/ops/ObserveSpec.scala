package graft.ops

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `Dataset.observe` — the zero-extra-pass pipeline-metrics surface.
  * At 100 TB a separate `count()`/`agg()` quality probe re-reads the
  * input; observe piggybacks named aggregates onto the action that
  * is already running (accumulator-backed, exactly-once per action),
  * which is how a production pipeline audits row counts and null
  * rates without doubling its I/O.
  */
class ObserveSpec extends SparkSpec {

  test("observe collects row/null/sum metrics on the same action") {
    import spark.implicits._
    val df = Seq(
      (1, Some(10L)), (2, None), (3, Some(30L)), (4, Some(2L)), (5, None)
    ).toDF("id", "v")

    val obs = Observation("ingest_audit")
    val out = df
      .observe(obs,
        count(lit(1)).as("n_rows"),
        count(when(col("v").isNull, 1)).as("n_null_v"),
        sum("v").as("sum_v"))
      .filter(col("id") % 2 === 1) // metrics see PRE-filter rows
      .collect()

    assert(out.length == 3)
    val m = obs.get
    assert(m("n_rows") == 5L)
    assert(m("n_null_v") == 2L)
    assert(m("sum_v") == 42L)
  }

  test("observe composes with aggregation downstream") {
    import spark.implicits._
    val df = (1 to 100).toDF("x")
    val obs = Observation("scan_side")
    val total = df
      .observe(obs, max(col("x")).as("max_x"), min(col("x")).as("min_x"))
      .groupBy((col("x") % 10).as("g")).agg(sum("x").as("s"))
      .collect().map(_.getLong(1)).sum
    assert(total == 5050L)
    assert(obs.get("max_x") == 100)
    assert(obs.get("min_x") == 1)
  }
}
