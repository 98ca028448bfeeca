package graft.plans

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Ledger of every unpartitioned window in main source (round 8,
  * VERDICT r7 item 5): an unpartitioned `Window.orderBy` /
  * `Window.partitionBy()` funnels its whole input frame through ONE
  * task, so each surviving site must operate on a frame whose size is
  * bounded by something other than the data — a vocabulary, a
  * `limit(k)`, or a partition-count ledger. This spec pins the exact
  * per-file census of such sites; adding one fails the build until it
  * is documented here with its bound.
  *
  * Per-site bound proofs (file: count — site → bound):
  *  - ops/DistributedRank.scala: 1 — the range-ledger prefix window →
  *    `parts` rows (one per range partition; 32 in-repo), never data.
  *  - queries/DedupSim.scala: 4 — q113 tf/dot/rrf rank windows over
  *    `orderBy.limit(100)` frames (≤100 rows; the rrf join of two
  *    100-row top lists is ≤100 rows); qE7 codebook row_number over
  *    an `orderBy.limit(16)` frame.
  *  - queries/EvalQueries.scala: 4 — q123 bucket-offset window over
  *    doc_id/1024 bucket aggregates (corpus/1024 rows; next rung is a
  *    second bucketing level, q123's own two-level precedent);
  *    q124/q125-family at-risk window over distinct integer
  *    `dur_days` (observation-span-bounded, ~10³); q12A rank over an
  *    `orderBy.limit(20)` frame; q12D class-index row_number over the
  *    lang vocabulary (K≈5).
  *  - queries/EventQueries.scala: 6 — qFC trigram rank over the
  *    event-type-trigram vocabulary (K³, K≈6); q111 rank over an
  *    `orderBy.limit(10)` frame; q112 bucket-max prefix window over
  *    event_id/1000 ledger rows (events/1000; two-level ledger is the
  *    next rung); q11E PSI total over per-event-type bins (K rows);
  *    q11F UCB rank over K arms; q122 jackknife totals over 32 hash
  *    buckets.
  *  - queries/GraphQueries.scala: 1 — Adamic–Adar rank over an
  *    `orderBy.limit(20)` frame.
  *  - queries/Relational2.scala: 1 — qD1 Pareto prefix-min over
  *    distinct l_quantity (TPC-H domain: 50 values).
  *  - queries/TextQueries.scala: 1 — q105 skipgram rank over an
  *    `orderBy.limit(30)` frame.
  *  - queries/TrainingQueries.scala: 5 — qA8-family remainder-rank
  *    over (returnflag × linestatus) strata (≤6 rows); information-
  *    gain marginal total over the label vocabulary (K rows); qB1
  *    ECDF cumulative window over distinct n_chars (value-domain
  *    bounded; range-partitioned prefix sum is the documented next
  *    rung); q11D mixture totals ×2 over the source-domain frame
  *    (K rows).
  *
  * Former unbounded sites and their round-8 conversions: q106 ntile×4
  * + global max → DistributedRank range-ledger ntile + broadcast agg;
  * qA9 ntile(8) → range-ledger ntile; q108 vocabulary rank →
  * range-ledger row_number; qE2 inlined ledger → the shared helper;
  * q105/q111 rank-then-filter → TakeOrdered limit-then-rank.
  */
class GlobalWindowLedgerSpec extends AnyFunSuite {

  private val expected = Map(
    "ops/DistributedRank.scala" -> 1,
    "queries/DedupSim.scala" -> 4,
    "queries/EvalQueries.scala" -> 4,
    "queries/EventQueries.scala" -> 6,
    "queries/GraphQueries.scala" -> 1,
    "queries/Relational2.scala" -> 1,
    "queries/TextQueries.scala" -> 1,
    "queries/TrainingQueries.scala" -> 5
  )

  private val site = raw"Window\.(orderBy|partitionBy\(\))".r

  test("unpartitioned-window census matches the documented ledger") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    assert(java.nio.file.Files.isDirectory(root),
      s"spec must run from the repo root (cwd: ${System.getProperty("user.dir")})")
    val census = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map { p =>
        val code = java.nio.file.Files.readAllLines(p).asScala
          .map(_.trim)
          .filterNot(l => l.startsWith("//") || l.startsWith("*")
            || l.startsWith("/*"))
        val n = code.map(l => site.findAllIn(l).size).sum
        root.relativize(p).toString -> n
      }
      .filter(_._2 > 0).toMap
    val drift = (census.keySet ++ expected.keySet).toSeq.sorted.flatMap { f =>
      val (got, exp) = (census.getOrElse(f, 0), expected.getOrElse(f, 0))
      if (got != exp) Some(s"$f: found $got unpartitioned window site(s), " +
        s"ledger documents $exp") else None
    }
    assert(drift.isEmpty,
      drift.mkString(
        "unpartitioned-window census drifted — every such window pulls " +
          "its frame through ONE task, so each site needs a documented " +
          "bound in this spec's scaladoc ledger:\n  ", "\n  ", ""))
  }
}
