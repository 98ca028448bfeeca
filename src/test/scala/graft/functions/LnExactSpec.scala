package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LnExactSpec extends SparkSpec {
  import spark.implicits._

  test("evaluates Math.log and differs from the builtin by the documented ulp") {
    // the argument from q85's idf domain where fdlibm (builtin log)
    // and glibc/DuckDB disagree by one ulp
    val x = java.lang.Double.longBitsToDouble(0x3ff451c3a672dbfcL)
    val row = Seq(x).toDF("x")
      .select(LnExact($"x").as("exact"), log($"x").as("builtin"))
      .head()
    assert(row.getDouble(0) === Math.log(x))
    assert(row.getDouble(1) === StrictMath.log(x))
    // on a correctly-rounded-vs-fdlibm split point they differ — the
    // reason the expression exists; if this ever fails the builtin
    // became correctly rounded and LnExact can be retired
    assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) !==
      java.lang.Double.doubleToLongBits(row.getDouble(1)))
  }

  test("null in, null out; codegen and eval agree") {
    val rows = Seq(Option(math.E), None).toDF("x")
      .select(LnExact($"x")).collect()
    assert(rows(0).getDouble(0) === 1.0)
    assert(rows(1).isNullAt(0))
    val viaRange = spark.range(1, 4)
      .select(LnExact($"id".cast("double")).as("l"))
    val codegenStages = viaRange.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty)
    assert(viaRange.collect().map(_.getDouble(0)).toSeq ===
      Seq(1.0, 2.0, 3.0).map(Math.log))
  }
}
