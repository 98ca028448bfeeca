package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextStats

/** qB4 df-cap recall audit (VERDICT r11 item 3).
  *
  * qB4 (sparse TF cosine via an inverted-index join,
  * queries/DedupSim.scala) prunes dimensions with document frequency
  * df > 50 BEFORE the pair build. That cap is what bounds the
  * quadratic Σ C(df,2) candidate term at scale, but it is not free:
  * it removes those dims from candidate GENERATION (a pair supported
  * only by df>50 dims is never formed) and from the METRIC itself
  * (norms and dots are computed in the df≤50 subspace). This audit
  * measures both effects on a bounded sample, against the EXACT
  * full-space cosine.
  *
  * Discipline: the q132 md5-ranked document sample — the 8192 docs
  * with the smallest md5(doc_id), a partition-invariant, engine-
  * reproducible choice — bounds the exact side's quadratic to
  * C(df_in_sample, 2) per dim, so the audit runs at any SF. The
  * capped side is the PRODUCTION qB4 query itself (full-corpus dfs
  * decide the cap, exactly as in production) restricted to pairs with
  * both endpoints in the sample; the exact side recomputes tf cosine
  * over ALL dims for the same docs. Reported per SF as one JSON line
  * (committed as DIAG_B4.json):
  *   recall        = |exact ∩ capped| / |exact|   (pairs with
  *                   full-space cos ≥ 0.5 the capped query keeps)
  *   lost_*        = count + cosine distribution of dropped pairs
  *   spurious      = capped-subspace pairs whose full-space cos < 0.5
  *
  * Usage: tools/run_main.sh graft.DiagB4 <sfDir> [sampleDocs]
  */
object DiagB4 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val sampleDocs = if (args.length > 1) args(1).toInt else 8192
    val spark = graft.io.Scratch.configure(SparkSession.builder()
      .master("local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The audit's frames are all post-explodePairs aggregates, where
      // Catalyst's Generate keeps the CHILD's size estimate — at sf10
      // the planner broadcast a side it estimated in the MBs that
      // materialized at 1.4 GB and killed the run on maxResultSize.
      // Estimate-driven broadcasts off (explicit broadcast() hints —
      // samp, lshPairs' internals — are honored regardless); result
      // ceiling raised for the remaining legitimate driver pulls.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.io.Sources.table(spark, dir, "documents")
    val samp = docs
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("mk"))
      .orderBy(col("mk"), col("doc_id"))
      .limit(sampleDocs)
      .select("doc_id")
      .localCheckpoint()

    // exact side: full-space tf cosine over the sampled docs, no cap
    val tf = docs.join(broadcast(samp), Seq("doc_id"))
      .select(col("doc_id"),
        explode(TextStats.shingles(TextStats.tokens(col("text")), 3)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("tf"))
    val posting = tf.groupBy("g")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("dt"))
    val norms = tf.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("n2"))
    val exact = graft.ops.Pairs.explodePairs(posting, "dt", "x", "y")
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        (col("x.tf") * col("y.tf")).as("p"))
      .groupBy("d1", "d2").agg(sum("p").as("dot"))
      .join(norms.select(col("doc_id").as("d1"), col("n2").as("na")), "d1")
      .join(norms.select(col("doc_id").as("d2"), col("n2").as("nb")), "d2")
      .select(col("d1"), col("d2"),
        (col("dot").cast("double")
          / sqrt((col("na").cast("decimal(38,0)") * col("nb"))
            .cast("double"))).as("cos_exact"))
      .where(col("cos_exact") >= 0.5)

    val exactPinned = exact.localCheckpoint()
    def num(v: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

    // LSH recovery channel (the 100 TB design question the audit
    // answers): pairs the df cap loses are dominated by large
    // near-dup families whose shared dims have df ≈ family size —
    // exactly what the minhash-LSH operators (q41/q42/q74) find
    // without any df sensitivity. Count, per cap, how many lost
    // pairs the LSH band channel (same 3-gram dims, q132's 8×2
    // banding) would recover — evidence for "route family dedup
    // through LSH, keep the capped index for the rare-dim band".
    val sampDocs = docs.join(broadcast(samp), Seq("doc_id"))
      .withColumn("shingles",
        TextStats.shingles(TextStats.tokens(col("text")), 3))
      .select("doc_id", "shingles")
    val lshPairs = graft.dedup.Dedup.lshCandidatePairs(
        graft.dedup.Dedup.minhashBandKeys(
          sampDocs, "doc_id", "shingles", 8, 2), "doc_id")
      .select(col("id1").as("d1"), col("id2").as("d2"), lit(1).as("in_lsh"))
      .localCheckpoint()

    // cap-pressure context computed once: full-corpus df histogram
    val fullDf = docs
      .select(col("doc_id"),
        explode(TextStats.shingles(TextStats.tokens(col("text")), 3)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("tf"))
      .groupBy("g").agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val dimsTotal = fullDf.count()

    // sweep: for each cap, the production query (a) restricted to the
    // sample for recall vs exact, (b) full-corpus output count+wall
    // for the cost axis
    val caps = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
      else Seq(50, 100, 200, 400)
    caps.foreach { cap =>
      spark.conf.set("graft.qB4.dfCap", cap.toString)
      val t0 = System.nanoTime()
      val full = SparkEntry.queries("qB4_sparse_cosine")(spark, dir)
        .localCheckpoint()
      val nFull = full.count()
      val fullWall = (System.nanoTime() - t0) / 1e9
      val capped = full
        .join(broadcast(samp.select(col("doc_id").as("d1"))), Seq("d1"))
        .join(broadcast(samp.select(col("doc_id").as("d2"))), Seq("d2"))
        .select(col("d1"), col("d2"), col("cos").as("cos_capped"))
      val joined = exactPinned.join(capped, Seq("d1", "d2"), "full_outer")
        .localCheckpoint()
      val nExact = joined.filter(col("cos_exact").isNotNull).count()
      val nCapped = joined.filter(col("cos_capped").isNotNull).count()
      val nMatched = joined
        .filter(col("cos_exact").isNotNull && col("cos_capped").isNotNull)
        .count()
      val lost = joined
        .filter(col("cos_exact").isNotNull && col("cos_capped").isNull)
      val nLost = lost.count()
      val nLostRecoveredByLsh = lost.join(lshPairs, Seq("d1", "d2")).count()
      val lostStats =
        if (nLost == 0) (0.0, 0.0, 0.0)
        else {
          val r = lost.agg(max("cos_exact"), avg("cos_exact"),
            expr("percentile(cos_exact, 0.5)")).head()
          (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        }
      val dimsCappedOut = fullDf.filter(col("df") > cap).count()
      val recall = if (nExact == 0) 1.0 else nMatched.toDouble / nExact
      println(s"""{"diag":"qB4_dfcap_recall","sf_dir":"$dir","df_cap":$cap,"sample_docs":$sampleDocs,"exact_pairs":$nExact,"capped_pairs":$nCapped,"matched":$nMatched,"recall":${num(recall)},"lost":$nLost,"lost_recovered_by_lsh":$nLostRecoveredByLsh,"lost_cos_max":${num(lostStats._1)},"lost_cos_avg":${num(lostStats._2)},"lost_cos_p50":${num(lostStats._3)},"spurious":${nCapped - nMatched},"dims_total":$dimsTotal,"dims_capped_out":$dimsCappedOut,"full_output_rows":$nFull,"full_query_s":${num(fullWall)}}""")
      joined.unpersist(blocking = false); full.unpersist(blocking = false)
    }
    spark.stop()
  }
}
