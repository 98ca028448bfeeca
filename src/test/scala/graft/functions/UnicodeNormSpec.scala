package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  private val decomposedCafe = "café"      // e + combining acute
  private val composedCafe = "café"         // precomposed é

  test("NFC composes combining marks and is idempotent on composed input") {
    val df = Seq(
      (1, decomposedCafe),
      (2, composedCafe),
      (3, "naïve Ångström"),
      (4, "plain ascii")
    ).toDF("id", "s")
      .select(col("id"), UnicodeNormalize.nfc(col("s")).as("n"),
        length(col("s")).as("raw_len"),
        length(UnicodeNormalize.nfc(col("s"))).as("nfc_len"))
    val rows = df.collect().map(r => r.getInt(0) ->
      (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(rows(1)._1 == composedCafe && rows(1)._2 == 5 && rows(1)._3 == 4)
    assert(rows(2)._1 == composedCafe && rows(2)._2 == 4 && rows(2)._3 == 4)
    assert(rows(3)._1 == "naïve Ångström")
    assert(rows(4)._1 == "plain ascii" && rows(4)._2 == rows(4)._3)
  }

  test("NFKC additionally folds compatibility forms (ligature, fullwidth)") {
    val df = Seq(("ﬁle ＡＢ", decomposedCafe)).toDF("a", "b")
      .select(UnicodeNormalize.nfkc(col("a")).as("a"),
        UnicodeNormalize.nfkc(col("b")).as("b"),
        UnicodeNormalize.nfc(col("a")).as("a_nfc"))
    val r = df.collect()(0)
    assert(r.getString(0) == "file AB")          // ﬁ → fi, fullwidth → ASCII
    assert(r.getString(1) == composedCafe)        // NFKC ⊇ NFC composition
    assert(r.getString(2) == "ﬁle ＡＢ") // NFC leaves compat forms
  }

  test("null propagates and the expression stays codegen'd (no fallback)") {
    val df = Seq((1, Option.empty[String]), (2, Some(decomposedCafe)))
      .toDF("id", "s")
      .select(col("id"), UnicodeNormalize.nfc(col("s")).as("n"))
    assert(df.collect().map(_.isNullAt(1)).toSeq == Seq(true, false))
    // WholeStageCodegen must cover the project — UnicodeNormalize
    // implements doGenCode, so no CodegenFallback node may appear.
    // (A local Seq folds to LocalTableScan at plan time, so assert on
    // a range-backed frame the optimizer cannot pre-evaluate.)
    val ranged = spark.range(4).select(
      UnicodeNormalize.nfc(concat(lit(decomposedCafe + " "),
        col("id").cast("string"))).as("n"))
    assert(ranged.collect().forall(_.getString(0).startsWith(composedCafe)))
    val wsc = ranged.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, ranged.queryExecution.executedPlan.toString)
  }

  test("SQL surface: nfc_normalize / nfkc_normalize registered") {
    graft.GraftFunctions.register(spark)
    val r = spark.sql(
      s"SELECT nfc_normalize('$decomposedCafe') AS a, nfkc_normalize('ﬁn') AS b")
      .collect()(0)
    assert(r.getString(0) == composedCafe)
    assert(r.getString(1) == "fin")
  }
}
