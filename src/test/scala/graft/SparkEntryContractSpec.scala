package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants for the query registry. The registry
  * is assembled by `Map ++ Map` over twelve modules — a duplicated
  * query name would SILENTLY drop the earlier module's query (and
  * its oracle would then check the wrong plan), so uniqueness is
  * load-bearing, not stylistic. No SparkSession needed: these are
  * pure map properties.
  */
class SparkEntryContractSpec extends AnyFunSuite {

  test("query names are globally unique across modules") {
    val perModule = Seq(
      graft.queries.Relational.queries, graft.queries.Relational2.queries,
      graft.queries.TweetOps.queries, graft.queries.TextQueries.queries,
      graft.queries.DedupSim.queries, graft.queries.EventQueries.queries,
      graft.queries.MultimodalQueries.queries, graft.queries.IoQueries.queries,
      graft.queries.PipelineQueries.queries, graft.queries.PlanQueries.queries,
      graft.queries.TrainingQueries.queries, graft.queries.GraphQueries.queries,
      graft.queries.EvalQueries.queries)
    val all = perModule.flatMap(_.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"duplicate query names across modules: $dups")
    assert(SparkEntry.queries.size === all.size)
  }

  test("every oracle key has a query; every staging key has a query") {
    val q = SparkEntry.queries.keySet
    val orphanOracles = SparkEntry.oracleSql.keySet.diff(q)
    assert(orphanOracles.isEmpty, s"oracles without queries: $orphanOracles")
    val orphanStaging = SparkEntry.staging.keySet.diff(q)
    assert(orphanStaging.isEmpty, s"staging without queries: $orphanStaging")
  }

  test("every query has an oracle (the driver's correctness gate)") {
    val missing = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(missing.isEmpty,
      s"queries without oracles (driver records only rows>0): $missing")
  }

  test("query names follow the hex-sequential naming scheme") {
    // two-char hex ids (plus the historical q1G); the space filled at
    // qFF, so round 6 onward continues with three-char ids (q100…)
    val bad = SparkEntry.queries.keySet
      .filterNot(_.matches("q[0-9A-Z]{2,3}_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming query names: $bad")
  }
}
