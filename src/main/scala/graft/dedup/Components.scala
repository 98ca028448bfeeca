package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected candidate-pair edge list —
  * the step that turns near-dup PAIRS (LSH q42, SimHash q54, Jaccard
  * q44) into dedup CLUSTERS with one canonical representative each,
  * which is what a training-data pipeline actually deletes against.
  *
  * Algorithm: iterative minimum-label propagation. Every vertex starts
  * labeled with itself; each round every vertex takes the min of its
  * own label and its neighbors' labels; fixed point = every vertex
  * holds the smallest id in its component. Each round is two shuffles
  * (edge⋈label join + min aggregation) over the EDGE list — never an
  * all-pairs product — and lineage is cut per round with an eager
  * localCheckpoint so the plan stays O(1) deep regardless of rounds.
  *
  * Scale shape: rounds = component DIAMETER. Near-dup clusters are
  * dense and shallow (pairs share bands/fingerprints transitively), so
  * diameter stays in the low single digits at any corpus size — the
  * pathological long-chain case that motivates the O(log n)
  * large-star/small-star variant (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14) does not arise from
  * banded similarity edges; `maxIter` caps the loop regardless, and
  * hitting the cap raises rather than returning a half-converged
  * labeling.
  */
object Components {

  /** Labels every id in `vertices(idCol)` with the smallest id
    * reachable through `pairs` (columns id1/id2, undirected, need not
    * be deduplicated); vertices with no edges label themselves.
    * Output: (idCol, cluster_id), one row per vertex.
    *
    * The iteration touches only edge ENDPOINTS — in a dedup workload
    * the overwhelming majority of documents are singletons and never
    * enter the loop; they get their identity label from one final
    * left join. Edges are persisted pre-partitioned on the join key,
    * so each round shuffles only the (endpoint-sized) label frame,
    * and convergence is a scan of the round's own output (prev label
    * carried in-frame), not an extra join. */
  def connectedComponents(
      pairs: DataFrame,
      vertices: DataFrame,
      idCol: String,
      maxIter: Int = 25): DataFrame = {
    val edges = pairs
      .select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
      .repartition(col("dst"))
      .persist()

    // symmetric edge list → src alone covers every endpoint
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var round = 0
    var converged = false
    try {
    while (!converged) {
      if (round >= maxIter) {
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds — " +
            "component diameter exceeds the cap; raise maxIter")
      }
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src"))
        .agg(min("label").as("nmin"))
      // every looped vertex has ≥1 neighbor → inner join is total
      val hop = labels
        .join(neighborMin, labels("id") === neighborMin("src"))
        .select(labels("id"), col("label").as("prev"),
          least(col("label"), col("nmin")).as("label"))
      // pointer jumping: label(v) ← label(label(v)). Neighbor-min
      // alone needs DIAMETER rounds (a 40-ring: ~20); shortcutting
      // through the current label's own label roughly halves the
      // remaining distance every round → O(log d) rounds total.
      val byId = labels.select(col("id").as("l_id"), col("label").as("l_label"))
      val step = hop
        .join(byId, hop("label") === byId("l_id"), "left")
        .select(hop("id"), col("prev"),
          least(col("label"), coalesce(col("l_label"), col("label"))).as("label"))
        .localCheckpoint()
      converged = step.filter(col("label") =!= col("prev")).isEmpty
      labels = step.select("id", "label")
      round += 1
    }
    } finally edges.unpersist() // also on mid-loop job failure
    vertices.select(col(idCol))
      .join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("label"), col(idCol)).as("cluster_id"))
  }
}
