package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.{Components, Dedup}
import graft.queries.GraphQueries

/** Result-identity across checkpoint strategies: EagerLocal (the
  * single-JVM default), Reliable (SparkContext checkpoint dir — on a
  * cluster, HDFS/S3-durable) and Staged (parquet round-tripping) must
  * produce byte-identical results for every iterative core. The
  * strategy decides where intermediate blocks LIVE and what survives
  * executor loss; it must never change what the loop computes.
  *
  * Staged-mode housekeeping is pinned too: superseded step rounds are
  * reclaimed (the footprint is O(2 rounds), not O(all rounds)) while
  * the final round stays readable through the returned frame.
  */
class CheckpointStrategySpec extends SparkSpec {
  import spark.implicits._

  private val strategies: Seq[(String, CheckpointStrategy)] = Seq(
    "eager-local" -> CheckpointStrategy.EagerLocal,
    "reliable" -> CheckpointStrategy.Reliable,
    "staged" -> CheckpointStrategy.Staged())

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toSeq.sorted

  private def identical(run: CheckpointStrategy => DataFrame): Unit = {
    val results = strategies.map { case (name, s) => name -> sortedRows(run(s)) }
    val (refName, ref) = results.head
    for ((name, rows) <- results.tail)
      assert(rows == ref, s"$name diverged from $refName")
    assert(ref.nonEmpty, "degenerate test: empty reference result")
  }

  // two chains + an isolated vertex — exercises multi-round
  // convergence, the pointer-jump path (chain of 9 > jumpAfter) and
  // the singleton left join
  private lazy val ccPairs =
    (1L to 8L).map(i => (i, i + 1)) ++ Seq((20L, 21L), (21L, 22L))
  private lazy val ccVerts = (1L to 22L).map(Tuple1(_))

  test("connectedComponents is strategy-invariant") {
    val pairs = ccPairs.toDF("id1", "id2")
    val verts = ccVerts.toDF("v")
    identical(s => Components.connectedComponents(pairs, verts, "v", ckpt = s))
  }

  test("pageRank is strategy-invariant") {
    // directed ring + chords: every node has outdegree >= 1
    val edges = ((1L to 10L).map(i => (i, i % 10 + 1)) ++
      Seq((1L, 5L), (3L, 7L), (9L, 2L))).toDF("src", "dst")
    identical(s => GraphQueries.pageRank(edges, iters = 3, ckpt = s))
  }

  test("kcore is strategy-invariant") {
    // a K5 clique (4-core) plus a tail that peels away over rounds
    val clique = for {
      a <- 1L to 5L; b <- 1L to 5L if a < b
    } yield (a, b)
    val tail = Seq((5L, 6L), (6L, 7L), (7L, 8L))
    val edges = (clique ++ tail).toDF("p1", "p2")
    identical(s => GraphQueries.kcore(edges, k = 3, ckpt = s))
  }

  test("triangleCount is strategy-invariant") {
    val edges = (Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L), (5L, 6L))).toDF("p1", "p2")
    identical(s => GraphQueries.triangleCount(edges, ckpt = s))
  }

  test("jaccardPairs is strategy-invariant") {
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d", "e"), "x"),
      (2L, Seq("a", "b", "c", "d", "f"), "x"),
      (3L, Seq("a", "b", "c", "d", "e"), "x"),
      (4L, Seq("p", "q", "r"), "x"),
      (5L, Seq("a", "b", "z", "w", "v"), "x")
    ).toDF("id", "toks", "bkt")
    identical(s =>
      Dedup.jaccardPairs(docs, "id", "toks", "bkt", 0.6, ckpt = s))
  }

  test("staged mode reclaims superseded rounds, keeps the live one") {
    val dir = Scratch.tempDir("ckpt_spec_")
    val mat = CheckpointStrategy.Staged(Some(dir)).session("t")
    val d1 = mat.step(Seq(1, 2, 3).toDF("x"))
    assert(d1.count() == 3)
    val d2 = mat.step(d1.select((col("x") * 2).as("x")))
    val d3 = mat.step(d2.select((col("x") + 1).as("x")))
    // step0 and step1 are superseded and reclaimed; step2 remains
    // readable through the returned frame
    val left = new java.io.File(dir, "ckpt_t").listFiles()
      .map(_.getName).filter(_.startsWith("step")).toSet
    assert(left == Set("step2"), s"unexpected staged files: $left")
    assert(d3.as[Int].collect().sorted.toSeq == Seq(3, 5, 7))
  }
}
