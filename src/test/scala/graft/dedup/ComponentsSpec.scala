package graft.dedup

import graft.SparkSpec

/** Connected-components labeling: chains, cycles, singletons, and
  * duplicate/reversed edge input. */
class ComponentsSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)], vertices: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    Components
      .connectedComponents(
        edges.toDF("id1", "id2"), vertices.toDF("id"), "id")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("chain, triangle, and singleton components") {
    val got = run(
      edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain 1-2-3-4
        (10L, 11L), (11L, 12L), (10L, 12L)), // triangle
      vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 99L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("cycles and duplicate/reversed edges converge") {
    val got = run(
      edges = Seq((5L, 6L), (6L, 7L), (7L, 5L), (6L, 5L), (5L, 6L)),
      vertices = Seq(5L, 6L, 7L))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("jump schedule never changes the labeling, only the round count") {
    import spark.implicits._
    // mixed topology: chain + triangle + singleton
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    val verts = (1L to 12L) :+ 99L
    def labelsAt(jumpAfter: Int): (Map[Long, Long], Int) = {
      val (df, rounds) = Components.connectedComponentsWithRounds(
        edges.toDF("id1", "id2"), verts.toDF("id"), "id", jumpAfter = jumpAfter)
      (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
    }
    val (eager, eagerRounds) = labelsAt(0)   // jump from round 1
    val (adaptive, _) = labelsAt(2)          // production default
    val (never, neverRounds) = labelsAt(100) // plain propagation
    assert(eager === adaptive && adaptive === never)
    assert(eagerRounds <= neverRounds) // jumping can only shorten
  }

  test("long chain converges by diameter, and the cap raises") {
    val chain = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(run(chain, 0L until 12L) == (0L until 12L).map(_ -> 0L).toMap)
    intercept[IllegalStateException] {
      import spark.implicits._
      Components.connectedComponents(
        chain.toDF("id1", "id2"), (0L until 12L).toDF("id"), "id", maxIter = 2)
    }
  }
}
