package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew-handling proof for the GRAPH family (round-9 VERDICT item 8) —
  * the planted-pathology discipline DedupSpec applies to the LSH
  * bucket self-join, extended to the graph queries' power-law hub
  * keys. Three behaviors pinned, because together they ARE the
  * design rationale:
  *
  *  1. AQE's skew split DOES fire on a hub join whose inputs look
  *     like 100 TB scans (hot key's rows spread across many mappers,
  *     both sides shuffle-fed) — and splitting never changes the
  *     integer-exact aggregate.
  *  2. AQE DECLINES on pageRank's actual per-iteration join: the
  *     ranks side is aggregate-fed (breaks OptimizeSkewedJoin's
  *     Sort-over-Shuffle pattern) and the checkpointed edge view
  *     co-locates each hub into one mapper (reduce partitions split
  *     only at map granularity). If a Spark upgrade ever makes this
  *     splittable, this pin fails and the salting fallback can be
  *     retired.
  *  3. The fallback that is immune to both: `Skew.saltedJoin` /
  *     `pageRank(salts = n)` spreads the hub over n reducers with
  *     bit-identical ranks; `Skew.saltedSum` does the same for the
  *     degree AGGREGATION half (AQE skew handling never covers
  *     aggregations).
  *
  * Thresholds are scaled to spec data exactly like DedupSpec (a
  * cluster run keeps the 256 MB defaults); broadcast is disabled so
  * joins plan as the sort-merge joins they would be at 100 TB.
  */
class GraphSkewSpec extends SparkSpec {
  import spark.implicits._

  // star hub: node 1 points at 2..N+1 and each spoke points back, so
  // every node has out-degree >= 1 (pageRank's contract) and the hub
  // key holds half of all edge rows — the planted power law
  private def hubEdges(spokes: Int) = {
    val out = spark.range(2, spokes + 2)
      .select(lit(1L).as("src"), col("id").as("dst"))
    out.union(out.select(col("dst").as("src"), col("src").as("dst")))
  }

  private val aqeKeys = Seq(
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    "spark.sql.adaptive.forceOptimizeSkewedJoin")

  private def withScaledSkewConfs[A](body: => A): A = {
    val saved = aqeKeys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1kb")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512b")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlanOf(df: org.apache.spark.sql.DataFrame): String = {
    // finalize THIS DataFrame's adaptive plan (count() builds a
    // separate QueryExecution), then inspect it
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), s"plan did not finalize:\n$p")
    p
  }

  test("AQE splits the hub join when inputs look like cluster scans") {
    withScaledSkewConfs {
      // round-robin repartition models a parquet scan: the hub's rows
      // arrive from MANY map tasks, so the skewed reduce partition is
      // splittable at map granularity
      val e = hubEdges(20000).repartition(8).localCheckpoint()
      val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      val ed = e.join(deg, "src").repartition(8).localCheckpoint()
      val ranks = deg.select(col("src").as("node"), lit(1000000L).as("rank"))
        .localCheckpoint() // materialized: shuffle-fed join input
      val it = ed.join(ranks, ed("src") === ranks("node"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy("dst").agg(sum(col("c").cast("decimal(38,0)")).as("cs"))
      val plan = finalPlanOf(it)
      assert(plan.contains("skew=true"),
        s"AQE skew-join split did not fire on the hub key; plan:\n$plan")
      // the split must not change the exact sums: every spoke
      // contributes floor(1e6/1) to the hub's inbox, the hub
      // floor(1e6/20000)=50 to each spoke
      val cs = it.as[(Long, java.math.BigDecimal)].collect().toMap
      assert(cs(1L).longValueExact() === 20000L * 1000000L)
      assert(cs(2L).longValueExact() === 50L)
    }
  }

  test("AQE declines on the aggregate-fed, mapper-clustered iteration join (salting's raison d'etre)") {
    withScaledSkewConfs {
      val r = GraphQueries.pageRank(hubEdges(20000), iters = 1)
      val plan = finalPlanOf(r)
      // the hub partition IS skewed (~5x the median, verified during
      // round-9 diagnosis) yet no split happens: the ranks side is an
      // aggregate and the checkpointed ed frame holds the whole hub
      // in one map output. This pin documents WHY pageRank carries a
      // salts parameter; if it starts failing, Spark learned to split
      // this shape and the salting fallback can be retired.
      assert(!plan.contains("skew=true"),
        s"AQE now splits the aggregate-fed join — revisit the salting fallback:\n$plan")
    }
  }

  test("salted pageRank spreads the hub and matches the plain ranks exactly") {
    val edges = hubEdges(5000)
    val plain = GraphQueries.pageRank(edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    val salted = GraphQueries.pageRank(edges, iters = 2, salts = 16)
    // the iteration shuffle now keys on (src, __salt): the hub's rows
    // hash across 16 sub-keys instead of one
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"),
      s"salted path did not salt the join key:\n$plan")
    assert(salted.as[(Long, Long)].collect().toMap === plain)
    // non-degenerate: the hub out-accumulates every spoke
    assert(plain.size === 5001 && plain(1L) > plain.removed(1L).values.max)
  }

  test("salted degree aggregation over the hub equals the direct groupBy") {
    val edges = hubEdges(5000).withColumn("one", lit(1L))
    val direct = edges.groupBy("src").agg(sum("one").as("deg"))
      .as[(Long, Long)].collect().toMap
    val salted = graft.ops.Skew
      .saltedSum(edges, Seq("src"), col("dst"), 16, ("one", "deg"))
      .as[(Long, Long)].collect().toMap
    assert(salted === direct)
    assert(direct(1L) === 5000L) // the hub really is a hub
  }
}
