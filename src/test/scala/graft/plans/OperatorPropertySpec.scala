package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.dedup.Components
import graft.functions.HeavyHitters

/** Property-based checks for the round-2 operators, brute-forced on
  * generated micro-datasets (same fixed-seed Gen harness as
  * ops.PropertySpec): GroupedTopK against a driver-side sort-take,
  * connected components against a driver-side union-find, and the
  * Misra-Gries guarantees (never over-count; no heavy item missed). */
class OperatorPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (1 to 10).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(1337L + i)).foreach(f)
    }

  test("GroupedTopK equals driver-side sort-take on random data (incl. null keys)") {
    val gen = for {
      rows <- Gen.listOfN(60, for {
        k <- Gen.oneOf(Some(1), Some(2), Some(3), None)
        v <- Gen.choose(-100, 100)
        id <- Gen.choose(0, 1000000)
      } yield (k, v, id))
      kTop <- Gen.choose(1, 4)
    } yield (rows.distinctBy(_._3), kTop)
    forAll(gen) { case (rows, kTop) =>
      val df = rows.toDF("key", "v", "id")
      val got = GroupedTopK
        .topK(df, Seq(col("key")), Seq(col("v").desc, col("id").asc), kTop)
        .collect()
        .map(r => (Option(r.get(0)).map(_.asInstanceOf[Int]), r.getInt(1), r.getInt(2)))
        .toSet
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
        g.sortBy(r => (-r._2, r._3)).take(kTop)
      }.toSet
      assert(got == expected)
    }
  }

  test("connectedComponents equals driver-side union-find on random graphs") {
    val gen = Gen.listOfN(40, for {
      a <- Gen.choose(0L, 19L)
      b <- Gen.choose(0L, 19L)
    } yield (a, b)).map(_.filter { case (a, b) => a != b })
    forAll(gen) { edges =>
      val verts = (0L until 20L).toSeq
      val got = Components
        .connectedComponents(edges.toDF("id1", "id2"), verts.toDF("id"), "id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver union-find
      val parent = scala.collection.mutable.Map(verts.map(v => v -> v): _*)
      def find(v: Long): Long =
        if (parent(v) == v) v else { val r = find(parent(v)); parent(v) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val roots = verts.groupBy(find)
      val expected = roots.flatMap { case (_, members) =>
        val m = members.min; members.map(_ -> m)
      }
      assert(got == expected)
    }
  }

  test("HeavyHitters never over-counts and never misses a heavy item") {
    val gen = for {
      n <- Gen.choose(50, 300)
      stream <- Gen.listOfN(n, Gen.frequency(
        5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
        2 -> Gen.oneOf((0 until 40).map(i => s"cold$i"))))
      cap <- Gen.choose(3, 8)
    } yield (stream, cap)
    forAll(gen) { case (stream, cap) =>
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = stream.map(t => (0, t)).toDF("g", "term").coalesce(2)
        .groupBy("g")
        .agg(HeavyHitters(col("term"), cap, cap).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.term"), col("e.cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // reported counts are lower bounds of truth
      got.foreach { case (t, c) =>
        assert(c <= truth(t), s"over-counted $t: $c > ${truth(t)}")
      }
      // any item with freq > n/(cap+1) must be reported (merge of 2
      // partitions at capacity `cap` keeps the bound additive)
      val bound = 2.0 * stream.size / (cap + 1)
      truth.filter(_._2 > bound).keys.foreach { t =>
        assert(got.contains(t), s"missed heavy item $t (freq ${truth(t)}, bound $bound)")
      }
    }
  }
}
