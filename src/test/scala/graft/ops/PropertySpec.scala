package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based checks (SURVEY.md §5.2): the native aggregates
  * equal a brute-force Scala fold on generated micro-datasets, and
  * the salted two-phase aggregation is exactly the direct groupBy.
  * (scalatestplus isn't in the offline dep set — samples are drawn
  * directly from ScalaCheck Gens with fixed seeds.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (1 to 12).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private val tweetGen = Gen.listOfN(30, for {
    key <- Gen.oneOf("g1", "g2")
    phrases <- Gen.someOf(Seq("a", "b", "c", "d")).map(_.toList)
    r <- Gen.choose(0, 10)
    l <- Gen.choose(0, 10)
    s <- Gen.choose(-50, 50) // integer-scaled sentiment
  } yield (key, phrases, r, l, s))

  test("A2 weighted frequency equals brute-force fold") {
    forAll(tweetGen) { rows =>
      val df = rows.toDF("k", "phrases", "r", "l", "s")
        .select($"k", explode($"phrases").as("topic"), $"r")
      val got = Aggregates.weightedFreq1D(df, Seq("k"), "topic", "r")
        .as[(String, String, Long)].collect().toMap2
      val want = rows.flatMap { case (k, ps, r, _, _) => ps.map(p => ((k, p), r + 1L)) }
        .groupBy(_._1).map { case (kp, vs) => kp -> vs.map(_._2).sum }
      assert(got === want)
    }
  }

  test("A5 pair frequency equals brute-force fold (1 + Σr)") {
    forAll(tweetGen) { rows =>
      val df = rows.toDF("k", "phrases", "r", "l", "s")
        .select($"k", $"phrases", $"r")
      val pairs = Pairs.explodePairs(df, "phrases")
      val got = Aggregates.weightedFreq2D(pairs, Seq("k"), "t1", "t2", "r")
        .as[(String, String, String, Long)].collect()
        .map(t => ((t._1, t._2, t._3), t._4)).toMap
      val want = rows.flatMap { case (k, ps, r, _, _) =>
        ps.combinations(2).map { case Seq(x, y) => ((k, x, y), r.toLong) }
      }.groupBy(_._1).map { case (kp, vs) => kp -> (1L + vs.map(_._2).sum) }
      assert(got === want)
    }
  }

  test("A3 weighted sentiment equals brute-force ratio") {
    forAll(tweetGen) { rows =>
      val df = rows.toDF("k", "phrases", "r", "l", "s")
        .select($"k", explode($"phrases").as("topic"), $"s", $"l")
      val got = Aggregates.weightedSentiment1D(df, Seq("k"), "topic", "s", "l")
        .as[(String, String, Double)].collect()
        .map(t => ((t._1, t._2), t._3)).toMap
      val want = rows.flatMap { case (k, ps, _, l, s) => ps.map(p => ((k, p), (s.toLong * (l + 1), l.toLong))) }
        .groupBy(_._1).map { case (kp, vs) =>
          kp -> vs.map(_._2._1).sum.toDouble / (vs.map(_._2._2).sum + 1)
        }
      assert(got.keySet === want.keySet)
      got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9) }
    }
  }

  test("salted aggregation is exactly the direct groupBy") {
    forAll(Gen.listOfN(50, Gen.zip(Gen.oneOf("x", "y", "z"), Gen.choose(-1000L, 1000L)))) { rows =>
      val df = rows.toDF("k", "v").withColumn("id", monotonically_increasing_id())
      val got = Skew.saltedSum(df, Seq("k"), col("id"), 8, ("v", "sv"))
        .as[(String, Long)].collect().toMap
      val want = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      assert(got === want)
    }
  }

  test("md5 hash sample is invariant to partitioning; rand(seed) is not guaranteed") {
    // the q59 sampler's contract: selection depends only on row
    // CONTENT, so any repartitioning/ordering yields the same set —
    // the property that makes a sample reproducible on a cluster
    val df = (1L to 2000L).toDF("id")
    def sample(d: org.apache.spark.sql.DataFrame): Set[Long] =
      d.filter(substring(md5(col("id").cast("string")), 1, 1) === "0")
        .as[Long].collect().toSet
    val base = sample(df)
    assert(base.nonEmpty && base.size < 2000)
    assert(sample(df.repartition(17, col("id"))) === base)
    assert(sample(df.orderBy(col("id").desc).coalesce(1)) === base)
  }

  test("bloom filter: no false negatives for ANY generated corpus or layout") {
    import graft.functions.BloomFilter
    val m = 1 << 12
    forAll(Gen.zip(
      Gen.listOfN(60, Gen.alphaNumStr.map(s => "k" + s.take(12))),
      Gen.choose(1, 9))) { case (keys, parts) =>
      val bits = keys.toDF("k").repartition(parts)
        .agg(BloomFilter.build(col("k"), m).as("b"))
        .collect()(0).getAs[Array[Byte]]("b")
      keys.foreach { k =>
        assert(BloomFilter.mightContain(bits,
          org.apache.spark.unsafe.types.UTF8String.fromString(k), m),
          s"false negative for $k")
      }
    }
  }

  test("count-min: never underestimates for ANY generated corpus or layout") {
    import graft.functions.CountMin
    val (d, w) = (4, 8)
    forAll(Gen.zip(
      Gen.listOfN(120, Gen.oneOf((1 to 15).map("t" + _))),
      Gen.choose(1, 9))) { case (vals, parts) =>
      val cms = vals.toDF("v").repartition(parts)
        .agg(CountMin.build(col("v"), d, w).as("cms"))
      val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ests = vals.distinct.toDF("t").crossJoin(broadcast(cms))
        .select(col("t"), CountMin.estimate(col("cms"), col("t"), d, w))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      ests.foreach { case (t, est) =>
        assert(est >= exact(t), s"CMS underestimated $t: $est < ${exact(t)}")
      }
    }
  }

  private implicit class Tup3Ops(rows: Array[(String, String, Long)]) {
    def toMap2: Map[(String, String), Long] =
      rows.map(t => ((t._1, t._2), t._3)).toMap
  }
}
