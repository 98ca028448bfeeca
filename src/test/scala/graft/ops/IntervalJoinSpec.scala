package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Bucketed interval-overlap join vs driver-side brute force, across
  * random interval sets (negative axis values, width-1 intervals,
  * bucket-straddling spans) and bucket widths. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (1 to 10).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(7L + i)).foreach(f)
    }

  test("overlap join equals brute force on random intervals") {
    val gen = for {
      ls <- Gen.listOfN(25, for {
        s <- Gen.choose(-50L, 50L); w <- Gen.choose(1L, 30L)
      } yield (s, s + w))
      rs <- Gen.listOfN(25, for {
        s <- Gen.choose(-50L, 50L); w <- Gen.choose(1L, 30L)
      } yield (s, s + w))
      width <- Gen.oneOf(1L, 7L, 64L)
    } yield (ls, rs, width)
    forAll(gen) { case (ls, rs, width) =>
      val left = ls.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("lid", "ls", "le")
      val right = rs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("rid", "rs", "re")
      val got = IntervalJoin.overlapJoin(left, "ls", "le", right, "rs", "re", width)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val expected = for {
        ((s1, e1), i) <- ls.zipWithIndex
        ((s2, e2), j) <- rs.zipWithIndex
        if s1 < e2 && s2 < e1
      } yield (i.toLong, j.toLong)
      assert(got.sorted.toSeq == expected.sorted, s"width=$width")
      assert(got.length == got.toSet.size, "duplicate pairs emitted")
    }
  }
}
