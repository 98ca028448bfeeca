package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JaroWinkler contract: textbook reference values, the two
  * implementation bodies (interpreted Scala vs generated Java) in
  * lockstep on random inputs, and the 0.7 boost threshold edge. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  test("textbook reference values match (the DuckDB-pinned family)") {
    // classic literature pairs, values cross-checked against
    // DuckDB 1.x jaro_winkler_similarity during development
    assert(JaroWinkler.sim("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(JaroWinkler.sim("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(JaroWinkler.sim("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(JaroWinkler.sim("apple", "applesauce") === 0.9)
    assert(JaroWinkler.sim("abc", "abc") === 1.0)
    assert(JaroWinkler.sim("", "abc") === 0.0)
    assert(JaroWinkler.sim("a", "b") === 0.0)
  }

  test("boost only fires above jaro 0.7") {
    // jaro('aXXXX','aYYYY') = 0.4667 < 0.7: prefix must NOT boost
    assert(JaroWinkler.sim("aXXXX", "aYYYY") === 0.4666666666666666)
    assert(JaroWinkler.sim("abWWWW", "abZZZZ") === 0.5555555555555555)
  }

  test("interpreted eval and codegen agree on random inputs") {
    val rnd = new Random(7)
    def word(): String =
      (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    val pairs = (1 to 2000).map(_ => (word(), word()))
    val df = pairs.toDF("a", "b")
    // codegen path: whole-stage over the expression
    val gen = df.select(JaroWinkler(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0))
    // reference path: the Scala body directly
    val ref = pairs.map { case (a, b) => JaroWinkler.sim(a, b) }
    gen.zip(ref).zip(pairs).foreach { case ((g, r), p) =>
      assert(g === r, s"codegen/eval drift on $p")
    }
  }
}
