package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Md5Long contract: bit-equality with the composed
  * conv(substring(md5(x), 1, 15), 16, 10) spelling it replaces (the
  * invariant every dedup/sampler oracle rests on), the 60-bit range,
  * and interpreted-vs-codegen agreement. */
class Md5LongSpec extends SparkSpec {
  import spark.implicits._

  private def composed = (c: org.apache.spark.sql.Column) =>
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("equals the composed conv/substring/md5 chain on varied inputs") {
    val rnd = new Random(11)
    val rows = Seq("", " ", "a", "the quick brown fox", "naïve café ünïcode",
      "日本語テキスト", "0", "-1", "line\nbreak", "tab\tsep") ++
      (1 to 2000).map(_ => rnd.nextString(rnd.nextInt(24))) ++
      (1 to 500).map(i => s"shingle_$i token_${i * 7}")
    val df = rows.toDF("s")
    val mismatch = df.select(
        Md5Long(col("s")).as("native"), composed(col("s")).as("chain"))
      .filter(col("native") =!= col("chain")).count()
    assert(mismatch === 0)
  }

  test("values are non-negative 60-bit (safe for % P arithmetic)") {
    val df = (1 to 1000).map(i => s"k$i").toDF("s")
      .select(Md5Long(col("s")).as("h"))
    val Array(lo, hi) = df.agg(min("h"), max("h")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    assert(lo >= 0L)
    assert(hi < (1L << 60))
  }

  test("interpreted eval matches codegen") {
    val h = Md5Long.hash60(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"))
    val fromDf = Seq("abc").toDF("s")
      .select(Md5Long(col("s"))).collect()(0).getLong(0)
    assert(h === fromDf)
  }

  test("non-string input hashes its string rendering (cast parity)") {
    val df = Seq(42L, 7L).toDF("v")
    val mismatch = df.select(Md5Long(col("v")).as("native"),
        composed(col("v").cast("string")).as("chain"))
      .filter(col("native") =!= col("chain")).count()
    assert(mismatch === 0)
  }
}
