package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.CheckpointStrategy

/** Connected components over an undirected candidate-pair edge list —
  * the step that turns near-dup PAIRS (LSH q42, SimHash q54, Jaccard
  * q44) into dedup CLUSTERS with one canonical representative each,
  * which is what a training-data pipeline actually deletes against.
  *
  * Algorithm: iterative minimum-label propagation with ADAPTIVE
  * pointer jumping. Every vertex starts labeled with itself; each
  * round every vertex takes the min label over its neighbors
  * (self-loops added up front fold "own label" into the same
  * aggregation — one join + one partial/final min agg instead of a
  * separate self join). The first `jumpAfter` rounds stop there: the
  * graphs this operator actually sees — near-dup clusters from
  * banded similarity edges — are dense and shallow (diameter ≤ 2–3),
  * and for them a second join per round is pure overhead (measured
  * 0.78× vs plain propagation in OpBench). Only if the loop is STILL
  * running after `jumpAfter` rounds (a deep topology) does each
  * round add the pointer-jump shortcut label(v) ← label(label(v)),
  * which roughly halves the remaining distance per round → O(log d)
  * rounds for diameter d (the bound of Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14, reached here with a
  * simpler per-round shape). ScaleSmokeSpec pins the round count on
  * chain and clique topologies.
  *
  * Convergence detection: per-vertex labels are monotonically
  * non-increasing, so the exact decimal SUM of labels is strictly
  * decreasing until fixed point — comparing one scalar per round
  * (computed on the round's own checkpointed output) replaces
  * carrying a prev column and scanning for changed rows. Lineage is
  * cut per round through the caller's [[graft.io.CheckpointStrategy]]
  * (default EagerLocal, which doubles as the cache: each round reads
  * the previous labels twice; Reliable/Staged for clusters that must
  * survive executor loss mid-iteration).
  *
  * Scale shape: each round is two shuffles over the EDGE list — never
  * an all-pairs product. The iteration touches only edge ENDPOINTS;
  * in a dedup workload the overwhelming majority of documents are
  * singletons and never enter the loop; they get their identity label
  * from one final left join. `maxIter` caps the loop regardless, and
  * hitting the cap raises rather than returning a half-converged
  * labeling.
  */
object Components {

  /** Labels every id in `vertices(idCol)` with the smallest id
    * reachable through `pairs` (columns id1/id2, undirected, need not
    * be deduplicated); vertices with no edges label themselves.
    * Output: (idCol, cluster_id), one row per vertex. */
  def connectedComponents(
      pairs: DataFrame,
      vertices: DataFrame,
      idCol: String,
      maxIter: Int = 50,
      ckpt: CheckpointStrategy = CheckpointStrategy.EagerLocal): DataFrame =
    connectedComponentsWithRounds(pairs, vertices, idCol, maxIter,
      ckpt = ckpt)._1

  /** As [[connectedComponents]], also returning the number of label
    * rounds executed (the fixed-point round included) — the handle
    * ScaleSmokeSpec uses to assert the O(log d) bound. `jumpAfter` is
    * the round index from which pointer jumping is added (shallow
    * graphs converge before it; deep ones pay 2 extra rounds over
    * always-jumping and save a join on every round before it). */
  /** `initLabels`: failure-recovery hook. A run whose round k was
    * fully materialized by a durable strategy (Reliable/Staged) can
    * restart from that round's (id, label) frame instead of identity
    * labels — min-label propagation is confluent from any
    * intermediate labeling (labels only decrease toward each
    * component's minimum, and the minimum vertex always holds its own
    * label), so the resumed run reaches the IDENTICAL fixed point.
    * CheckpointRecoverySpec proves the round-trip: crash mid-
    * iteration, re-read the staged round parquet, resume, same
    * labels. */
  def connectedComponentsWithRounds(
      pairs: DataFrame,
      vertices: DataFrame,
      idCol: String,
      maxIter: Int = 50,
      jumpAfter: Int = 2,
      ckpt: CheckpointStrategy = CheckpointStrategy.EagerLocal,
      initLabels: Option[DataFrame] = None): (DataFrame, Int) = {
    // per-round materialization via the caller's checkpoint strategy:
    // EagerLocal for single-JVM speed (default), Reliable/Staged for
    // executor-loss survival at cluster scale (see CheckpointStrategy)
    val mat = ckpt.session("components")
    val sym = pairs
      .select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
    // self-loops make the neighbor-min include the vertex's own label
    // (built straight from the symmetric list — the distinct dedups
    // them); pre-partitioned on the per-round join key and persisted
    val edges = sym
      .union(sym.select(col("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("dst"))
      .persist()

    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    def sumsEqual(a: java.math.BigDecimal, b: java.math.BigDecimal): Boolean =
      (a == null && b == null) || (a != null && b != null && a.compareTo(b) == 0)

    // symmetric edge list → src alone covers every endpoint
    var labels = mat.step(initLabels
      .map(_.select(col("id"), col("label")))
      .getOrElse(edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))))
    // prevSum starts null (= sum over zero endpoints): a non-empty
    // graph always changes labels in round 1, and an empty one
    // converges right there — no separate init-sum or isEmpty job
    var prevSum: java.math.BigDecimal = null
    var round = 0
    var converged = false
    try {
      while (!converged) {
        if (round >= maxIter) {
          throw new IllegalStateException(
            s"connectedComponents did not converge in $maxIter rounds — " +
              "component diameter exceeds the cap; raise maxIter")
        }
        // min label over neighbors ∪ self (via the self-loops):
        // one join + one partial/final min aggregation
        val nm = edges
          .join(labels, edges("dst") === labels("id"))
          .groupBy(col("src"))
          .agg(min("label").as("label"))
        val hopped =
          if (round < jumpAfter) nm.select(col("src").as("id"), col("label"))
          else {
            // pointer jumping through the PREVIOUS round's labels:
            // label(v) ← min(label(v), prevLabel(label(v))). Every
            // label value is an endpoint id, so the lookup is total;
            // left join + coalesce keeps the shape robust anyway.
            // Honest bound (sf10-measured): the jump contracts ~2×
            // per round when label values chain (id-sorted paths —
            // ScaleSmokeSpec's 65k chain converges in ≤24 rounds),
            // but on LSH-hairball components whose labels collapse
            // onto a local minimum early, rounds pace at the
            // component's EFFECTIVE DIAMETER (the sf10 fixture's
            // 16k-node component took 28 rounds; a second jump level
            // was measured to buy nothing — 28 either way). Hence
            // the default cap is 50, comfortably above both regimes,
            // and hitting it still raises rather than returning a
            // half-converged labeling.
            val byId = labels.select(col("id").as("l_id"), col("label").as("l_label"))
            nm.join(byId, nm("label") === byId("l_id"), "left")
              .select(col("src").as("id"),
                least(col("label"), coalesce(col("l_label"), col("label"))).as("label"))
          }
        val step = mat.step(hopped)
        val sumNow = labelSum(step)
        converged = sumsEqual(sumNow, prevSum)
        prevSum = sumNow
        labels = step
        round += 1
        // env-guarded round trace: convergence pathologies (the sf10
        // qC1 non-convergence) are invisible without per-round sums
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          System.err.println(s"[cc] round=$round labelSum=$sumNow")
      }
    } finally edges.unpersist() // also on mid-loop job failure
    val out = vertices.select(col(idCol))
      .join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("label"), col(idCol)).as("cluster_id"))
    (out, round)
  }
}
