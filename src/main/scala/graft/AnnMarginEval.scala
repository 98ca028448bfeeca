package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** int8 ANN margin eval at sf10 scale (VERDICT r12 bonus / r13 item 7).
  *
  * ANN_EVAL_SF10's int8_dot row measures recall 0.125 — explained in
  * the artifact as the 8-bit RESOLUTION FLOOR: the replica fixture
  * jitters copies by ±1%, below the ~0.8%/dim quantization step, so
  * no 8-bit code can order those neighbors. This main turns that
  * prose claim into a measurement at the SAME scale: a deterministic
  * margin-separated corpus with the real sf10 embedding shape (n and
  * dims read from the actual table) — the SimilaritySpec one-hot-
  * cluster construction scaled up — where each query's true top-10
  * (its 10 cluster co-members, dot ≈ 6400) sits far above the noise
  * band AND far above the quantization error (dot-error std ~4 vs
  * margin ~1600). If per-vector int8 scaling is sound, recall must be
  * ~1.0 here; if the sf10 0.125 were a quantizer bug, it would
  * reproduce.
  *
  * Corpus: ids 0..11·⌊n/11⌋-1, cluster = id % ⌊n/11⌋ (every cluster
  * exactly 11 members, so true top-10 = exactly the co-member set —
  * no small-gap decision at the k boundary). Element d of a vector:
  * cluster base ±10.0 (sign = parity of an md5 nibble of
  * "cluster_d" — hash-derived, not an affine pattern, same rationale
  * as Similarity.planeWeight) plus member noise
  * 0.1·(((id·31 + d·7) mod 11) − 5) ∈ [−0.5, +0.5] (the spec's
  * pattern). Truth is the exact double-dot ranking — the SAME metric
  * int8 ranks by — so the measured gap is pure quantization loss
  * (norms are near-equal by construction, so dot ≈ cosine ranking
  * anyway). Queries are ids 0..7 (int8TopK's dense-id contract),
  * which land in 8 DISTINCT clusters.
  *
  * `runMain graft.AnnMarginEval <sfDir>` → one JSON line (appended to
  * ANN_EVAL_SF10.json with method int8_dot_margin).
  */
object AnnMarginEval {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "tmp/sf10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.io.Scratch.configure(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // real sf10 shape: n vectors, dims — the eval runs at the actual
    // scale the 0.125 row was measured at
    val real = graft.io.Sources.table(spark, sfDir, "embeddings")
    val dims = real.select(size(col("embedding"))).head().getInt(0)
    val nReal = real.count()
    val nClusters = (nReal / 11L).toInt
    val n = nClusters * 11L

    val emb = spark.range(n)
      .select(col("id").as("vec_id"),
        (col("id") % nClusters).as("cl"))
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)), d => {
          val sign = when(
            conv(substring(md5(concat_ws("_", col("cl"), d)), 1, 8),
              16, 10).cast("long") % 2 === 0, lit(10.0f))
            .otherwise(lit(-10.0f))
          sign + (((col("vec_id") * 31 + d * 7) % 11).cast("float")
            - lit(5.0f)) * lit(0.1f)
        }).as("embedding"))
      .localCheckpoint() // one materialization shared by both sides

    val k = 10
    val nQ = 8
    def topkOf(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

    val t0 = System.nanoTime()
    val quant = topkOf(Similarity.int8TopK(emb, "vec_id", "embedding",
      nQueries = nQ, k = k).select("qid", "nn_id"))
    val wall = (System.nanoTime() - t0) / 1e9

    // exact truth under the SAME metric (double dot)
    val e = emb.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val exact = topkOf(e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        Similarity.dot(col("qv"), col("v")).as("d"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("d").desc, col("nn_id").asc)))
      .filter(col("rn") <= k)
      .select("qid", "nn_id"))

    require(quant.keySet == exact.keySet, "query sets differ")
    val recall = quant.keys.toSeq
      .map(qq => (quant(qq) intersect exact(qq)).size.toDouble / k)
      .sum / nQ
    def num(v: Double, s: Int) =
      String.format(java.util.Locale.ROOT, s"%.${s}f", Double.box(v))
    // Quoted figures DERIVED from the corpus geometry (ADVICE r14: the
    // note must not contradict its own n_vectors/dims fields if the
    // sf10 shape changes). Co-member dot: every dim contributes
    // (±10)² = 100 with matching signs → ~100·dims. Noise band: for
    // cross-cluster pairs each dim is ±100 with hash-random sign →
    // std ~100·√dims. int8 dot error: per-vector scale = maxabs/127
    // with maxabs ≤ 10.5 by construction; per-element quant error std
    // ≈ scale/√12, and the dot accumulates ~2·dims error terms of
    // magnitude ~10·that → std ≈ √(2·dims)·10·scale/√12.
    val coDot = 100.0 * dims
    val noiseStd = 100.0 * math.sqrt(dims.toDouble)
    val int8Scale = 10.5 / 127.0
    val errStd = math.sqrt(2.0 * dims) * 10.0 * int8Scale / math.sqrt(12.0)
    println(s"""{"method":"int8_dot_margin","recall_at_10":${num(recall, 3)},"wall_s":${num(wall, 2)},"n_queries":$nQ,"n_vectors":$n,"dims":$dims,"sf":"$sfDir","note":"margin-separated corpus at the source embeddings table's shape (n,dims read from $sfDir): 11-member clusters, co-member dot ~${coDot.round} vs noise band std ~${noiseStd.round} and int8 dot-error std ~${num(errStd, 1)} -- measures that per-vector int8 scaling holds when neighbor gaps exceed the 8-bit step at $n-vector scale, i.e. the 0.125 int8_dot row above is the fixture's resolution floor, not a quantizer or scale defect."}""")
    spark.stop()
  }
}
