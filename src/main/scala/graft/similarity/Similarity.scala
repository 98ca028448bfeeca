package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (builder brief):
  * brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH bucketing as the scale path. Pure Column
  * expressions — the fold order of every dot product is the explicit
  * left-to-right `aggregate`, bit-reproducible in DuckDB's list_sum.
  *
  * Scale shapes:
  *  - brute force is a broadcast of ONE query vector + a narrow map
  *    + TakeOrderedAndProject (per-partition heap, k-row driver
  *    merge) — no shuffle of the corpus. Right for one-off queries;
  *    for query batches, use the LSH buckets to cut candidates.
  *  - LSH bucket assignment is a narrow map (8 dot products per
  *    row); bucket join beats all-pairs at 100 TB by orders of
  *    magnitude. Recall is tuned by planes-per-table × #tables
  *    (here one table of 8 planes — the demo shape).
  */
object Similarity {

  /** embedding column (array<float>) cast to array<double> so all
    * arithmetic is double (matches the oracle exactly). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** left-fold dot product of two equal-length double arrays —
    * a native codegen'd Expression (graft.functions.ArrayDot); same
    * fold order as the interpreted HOF form, ~10× faster per row. */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayDot(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** cosine similarity; expression shape dot/(sqrt·sqrt) is mirrored
    * verbatim by the oracle for bit parity. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Brute-force top-k by cosine against the corpus vector with
    * `queryId` (ties broken by id for determinism): one broadcast
    * query row, a narrow map over the corpus, TakeOrderedAndProject.
    * This is the exact baseline the LSH/IVF paths approximate. */
  def bruteForceTopKById(corpus: DataFrame, idCol: String, vecCol: String,
                         queryId: Long, k: Int): DataFrame = {
    val e = corpus.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm2(col("v")))
      // zero-norm vectors make cos NaN (Spark sorts NaN ABOVE all
      // numbers, so they'd fill the top-k) — same guard as ivfNNAll
      .filter(col("nrm") > 0)
    val q = e.filter(col(idCol) === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    e.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cos"))
  }

  /** Seeded Lloyd k-means coarse quantizer for the IVF paths: init =
    * the first k vectors by id (the same deterministic seed the
    * untrained path uses as its final centroids), then `iters` fixed
    * Lloyd rounds — assign every vector to its argmin-L2 centroid
    * (broadcast of k rows + a narrow map), recompute each centroid as
    * the dim-wise mean of its members (posexplode → (cell, dim) avg —
    * a partial/final agg over n·dims rows, no collect of vectors),
    * pull the k×dims means back to the driver (tiny by construction)
    * for the next round's broadcast literal. Empty cells keep their
    * previous centroid.
    *
    * Deterministic up to float summation order inside avg() — fixed
    * iteration count, fixed init, no RNG — which is why the ORACLE
    * paths (q48/q55) stay on the untrained first-k quantizer: their
    * results must be bit-stable across engines. Trained centroids are
    * a RECALL upgrade at the same probe budget (SimilaritySpec pins
    * trained ≥ first-k on a clustered corpus), not a semantics
    * change: the search path is identical either way.
    *
    * Returns (cid, cv, cc) ready for the assignment/probe joins. */
  def kmeansCentroids(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = vecs.sparkSession
    val e = vecs.select(col("id"), col("v"))
    var cents: Array[(Long, Seq[Double])] = e.orderBy(col("id").asc).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }
    for (_ <- 0 until iters) {
      val cdf = broadcast(spark.createDataFrame(cents.toSeq).toDF("cid", "cv")
        .withColumn("cc", dot(col("cv"), col("cv"))))
      val means = e.crossJoin(cdf)
        .withColumn("d2", col("cc") - lit(2.0) * dot(col("v"), col("cv")))
        .groupBy("id")
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cell"),
          first(col("v")).as("v"))
        .select(col("cell"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("cell", "d").agg(avg("x").as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
          s => s.getField("m")).as("cv"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      cents = cents.map { case (cid, cv) => (cid, means.getOrElse(cid, cv)) }
    }
    spark.createDataFrame(cents.toSeq).toDF("cid", "cv")
      .withColumn("cc", dot(col("cv"), col("cv")))
  }

  /** First-k-by-id coarse quantizer — fully deterministic ⇒ the
    * DuckDB-oracle-checkable default — or, with `trainIters` > 0,
    * [[kmeansCentroids]] seeded from the same first-k init. */
  private def quantizer(e: DataFrame, kCentroids: Int, trainIters: Int): DataFrame =
    if (trainIters > 0) kmeansCentroids(e.select(col("id"), col("v")), kCentroids, trainIters)
    else
      // orderBy+limit, so sparse/offset id spaces still yield k centroids
      e.orderBy(col("id").asc).limit(kCentroids)
        .select(col("id").as("cid"), col("v").as("cv"))
        .withColumn("cc", dot(col("cv"), col("cv")))

  /** IVF index build — the amortizable half of the IVF path: coarse
    * quantizer (first-k default, Lloyd-trained with `trainIters` > 0)
    * plus the argmin-L2 cell assignment of every corpus vector.
    * Returns (centroids, assigned) where assigned = (id, v, nrm,
    * cell); callers persist `assigned` (parquet / localCheckpoint)
    * and reuse it across query batches — that amortization is the
    * ONLY way IVF beats brute force: assignment costs kCentroids
    * dots per corpus row, brute force costs one dot per row per
    * query, so an un-amortized index loses whenever
    * kCentroids > nQueries (the round-11 ANN_EVAL_SF1 finding:
    * per-query ivfTopK re-assigned the corpus 8 times and lost to
    * brute force at recall 1.0). AnnEval prices the build and the
    * break-even batch count per SF. */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
                kCentroids: Int = 16, trainIters: Int = 0)
      : (DataFrame, DataFrame) = {
    val e = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm2(col("v")))
      .filter(col("nrm") > 0)
    val cents = quantizer(e, kCentroids, trainIters)
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("d2", col("cc") - lit(2.0) * dot(col("v"), col("cv")))
      .groupBy("id")
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cell"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
      .select(col("id"), col("v"), col("nrm"), col("cell"))
    (cents, assigned)
  }

  /** Query-batch search over a PRE-BUILT IVF index (from
    * [[ivfAssign]]): queries are the dense corpus ids 0..nQueries−1
    * (the embeddings table's contract, like int8TopK); each probes
    * its nProbe nearest cells and takes cosine top-k over their
    * members, all in ONE job. Semantics per query are identical to
    * [[ivfTopK]] at the same (kCentroids, nProbe): same quantizer,
    * same probe order, same tie-breaks — and with
    * nProbe = kCentroids it equals brute force exactly
    * (SimilaritySpec pins both).
    *
    * Scale: the query side is nQueries rows (broadcast with their
    * probe cells); the corpus side is scanned once, each row scored
    * only against queries probing its cell — |corpus|·nProbe/k dots
    * in expectation, i.e. a kCentroids/nProbe-fold per-query dot cut
    * vs brute force, with no shuffle of the corpus (top-k is the
    * WindowTopKRewrite per-qid heap). */
  def ivfBatchTopK(cents: DataFrame, assigned: DataFrame,
                   nQueries: Int, nProbe: Int = 4, topK: Int = 10)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = assigned.filter(col("id") < nQueries)
      .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    // nProbe nearest cells per query: queries × centroids is
    // nQueries·kCentroids rows — tiny, one hash agg, broadcast out
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("d2", col("cc") - lit(2.0) * dot(col("qv"), col("cv")))
      .groupBy("qid")
      .agg(slice(array_sort(collect_list(struct(col("d2"), col("cid")))),
          1, nProbe).as("pc"),
        first(col("qv")).as("qv"), first(col("qn")).as("qn"))
      .select(col("qid"), col("qv"), col("qn"),
        explode(col("pc.cid")).as("cell"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("id").asc)))
      .filter(col("rn") <= topK)
      .select(col("qid"), col("id").as("nn_id"), col("cell"), col("cos"))
  }

  /** IVF-style ANN: coarse quantizer (first-k default, Lloyd-trained
    * with `trainIters` > 0), cell assignment by argmin squared-L2,
    * query probes the nProbe nearest cells and searches only their
    * members.
    *
    * Scale: assignment is a broadcast of k centroid rows + a narrow
    * map (k dots/row); search touches |corpus|·nProbe/k vectors in
    * expectation instead of all of them — but NOTE the assignment is
    * rebuilt per call: for query batches use [[ivfAssign]] +
    * [[ivfBatchTopK]], which amortize it. */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queryId: Long, kCentroids: Int = 16, nProbe: Int = 4,
              topK: Int = 10, trainIters: Int = 0): DataFrame = {
    val e = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm2(col("v")))
      // zero-norm guard BEFORE training/assignment (same as ivfNNAll):
      // a zero vector in a probed cell would rank NaN-first in top-k
      .filter(col("nrm") > 0)
    val cents = quantizer(e, kCentroids, trainIters)
    // cell assignment: argmin_c (|c|² − 2·v·c)  (|v|² constant per v)
    // via min_by partial aggregation — map-side combine, no window
    // sort; ties break to the lower centroid id through the struct
    // ordering
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("d2", col("cc") - lit(2.0) * dot(col("v"), col("cv")))
      .groupBy("id")
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cell"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
      .select(col("id"), col("v"), col("nrm"), col("cell"))
    // probe cells: the nProbe centroids nearest to the query vector
    val q = e.filter(col("id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val probes = broadcast(cents).crossJoin(broadcast(q))
      .withColumn("d2", col("cc") - lit(2.0) * dot(col("qv"), col("cv")))
      .orderBy(col("d2").asc, col("cid").asc)
      .limit(nProbe)
      .select(col("cid").as("cell"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .orderBy(col("cos").desc, col("id").asc)
      .limit(topK)
      .select(col("id").as("vec_id"), col("cell"), col("cos"))
  }

  /** All-vectors nearest neighbor through IVF cells — the scale
    * path for corpus-wide NN (the all-pairs form is O(n²) and its
    * per-label variant q45 has a bucket whose cardinality doesn't
    * grow with data). Index side: each vector lives in its argmin
    * cell. Query side: each vector probes its `nProbe` nearest
    * cells and takes the cosine argmax over their members.
    *
    * Contract: NN WITHIN THE PROBED CELLS — deterministic (and so
    * oracle-checkable); recall vs the exact global NN is a quality
    * property pinned by SimilaritySpec, not by the oracle.
    *
    * Scale: two broadcast-centroid narrow maps + hash aggregations
    * keyed by id, one equi-join on cell, one argmax aggregation —
    * every shuffle is linear in the corpus, nothing quadratic. */
  def ivfNNAll(corpus: DataFrame, idCol: String, vecCol: String,
               kCentroids: Int = 16, nProbe: Int = 4,
               trainIters: Int = 0,
               queryIds: Option[DataFrame] = None): DataFrame = {
    val e = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm2(col("v")))
      // zero-norm vectors make cos NaN (which Spark sorts ABOVE all
      // numbers) — they can be neither query nor neighbor
      .filter(col("nrm") > 0)
    val cents = quantizer(e, kCentroids, trainIters)
    val withD2 = e.crossJoin(broadcast(cents))
      .withColumn("d2", col("cc") - lit(2.0) * dot(col("v"), col("cv")))
    val assigned = withD2.groupBy("id")
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cell"),
        first(col("v")).as("nv"), first(col("nrm")).as("nn"))
      .select(col("id").as("nn_id"), col("cell"), col("nv"), col("nn"))
    // queryIds: optional bounded query side (a one-column "id"
    // frame) — the INDEX side above always covers the full corpus;
    // with a fixed kCentroids, an all-vectors query side makes the
    // probed-member volume quadratic, so large-scale evals bound it
    val qSide = queryIds.fold(withD2)(q =>
      withD2.join(broadcast(q), Seq("id")))
    // nProbe nearest cells per query vector via ONE hash aggregation
    // (sort_array over kCentroids structs) — no sort-based window
    val probes = qSide.groupBy("id")
      .agg(slice(array_sort(collect_list(struct(col("d2"), col("cid")))),
          1, nProbe).as("pc"),
        first(col("v")).as("qv"), first(col("nrm")).as("qn"))
      .select(col("id").as("qid"), col("qv"), col("qn"),
        explode(col("pc.cid")).as("cell"))
    probes.join(assigned, Seq("cell"))
      .filter(col("qid") =!= col("nn_id"))
      .withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .groupBy("qid")
      .agg(max_by(struct(col("nn_id"), col("cos")),
        struct(col("cos"), -col("nn_id"))).as("best"))
      .select(col("qid").as("vec_id"),
        col("best.nn_id").as("nn_id"), col("best.cos").as("cos"))
  }

  /** Int8 scalar quantization + integer-dot ANN — the embedding-store
    * COMPRESSION path: PER-VECTOR symmetric scale m_v = max |x_i|
    * within the vector, code_i = floor(x_i·127/m_v + 0.5) ∈
    * [-127, 127] (round-to-nearest — see the inline note), similarity
    * = the exact INTEGER dot of code vectors rescaled by the exact
    * float product qdot·m_q·m_c/127² ≈ dot(x,y) (SimilaritySpec pins
    * recall@k vs the exact-double-dot ranking). The scale is
    * per-vector, not corpus-global, for a measured reason: with one
    * global M = max |x| over the corpus, a single stretched outlier
    * vector quantizes everyone else into a handful of levels —
    * AnnEval measured recall@10 collapsing 0.975 (sf1) → 0.113 (sf10)
    * on the replica fixture's wider value range; per-vector scaling
    * confines an outlier's damage to its own vector. Every arithmetic
    * step is exact (max comparison, integer dot in double range,
    * one fixed-order float product), so a DuckDB oracle reproduces
    * the ranking bit-for-bit.
    *
    * Scale: int8 codes are 4× smaller than float32 — at 100 TB of
    * embeddings that is the difference between a corpus that fits in
    * cluster memory and one that doesn't, and integer dots are the
    * SIMD-friendliest kernel there is. The plan is one tiny global
    * aggregate broadcast back (the scale), one narrow coding map, a
    * broadcast of the nQueries code rows, and a per-query top-k window
    * over |corpus|·nQueries scored rows (the WindowTopKRewrite shape;
    * candidates can first be cut by any of the LSH/IVF paths — the
    * quantizer composes with them, it replaces only the re-rank
    * arithmetic). */
  /** NOTE: the probe set is `id < nQueries` — a DENSE 0-based id
    * contract (the embeddings table's), unlike quantizer's
    * orderBy+limit; callers with sparse/offset ids must re-key. */
  def int8TopK(corpus: DataFrame, idCol: String, vecCol: String,
               nQueries: Int = 8, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("m", array_max(transform(col("v"), x => abs(x))))
      // a zero vector has no scale (and a NaN-free ranking needs it
      // out of both sides — the q45 house rule)
      .filter(col("m") > 0)
    val coded = e
      .select(col("id"), col("m"),
        // round-to-nearest via floor(y + 0.5): UNBIASED per-element
        // error (plain floor's systematic −0.5 shift injects a cross
        // term that swamps the small dot margins of near-orthogonal
        // vectors), and bit-identical in every engine — no HALF_UP /
        // HALF_EVEN divergence risk
        transform(col("v"),
          x => floor((x * lit(127.0)) / col("m") + lit(0.5)).cast("double")).as("codes"))
    val q = coded.filter(col("id") < nQueries)
      .select(col("id").as("qid"), col("m").as("mq"), col("codes").as("qc"))
    coded.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nn_id"),
        dot(col("qc"), col("codes")).cast("long").as("qdot"),
        col("mq"), col("m"))
      // exact dequantized score, ONE fixed op order both engines
      // reproduce: ((qdot·mq)·mc)/127²
      .withColumn("score",
        col("qdot").cast("double") * col("mq") * col("m") / lit(16129.0))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("score").desc, col("nn_id").asc)))
      .filter(col("rn") <= k)
      .select("qid", "nn_id", "qdot", "score", "rn")
  }

  /** Deterministic pseudo-random hyperplane weight: md5 of the
    * (plane, dim) index, mapped to [-1000, 1000]. Hash-derived, NOT
    * an affine LCG over the flat index — an affine map makes every
    * plane a constant shift of one arithmetic progression (strongly
    * correlated bits, skewed buckets). */
  def planeWeight(k: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$k:$d".getBytes("UTF-8"))
    val h = ((md(0) & 0xffL) << 40) | ((md(1) & 0xffL) << 32) |
      ((md(2) & 0xffL) << 24) | ((md(3) & 0xffL) << 16) |
      ((md(4) & 0xffL) << 8) | (md(5) & 0xffL)
    h % 2001L - 1000L
  }

  /** Multi-probe hyperplane LSH (Lv et al., VLDB'07): each query
    * searches its own bucket PLUS the `numPlanes` Hamming-1 buckets
    * (one sign bit flipped — the buckets a near-boundary neighbor most
    * likely fell into), then exact-cosine re-ranks the candidates.
    * Multi-probe recovers most of the recall of building multiple
    * hash TABLES while storing exactly ONE — at 100 TB that is the
    * difference between T copies of the index and one copy with T×
    * probes, and probing is a broadcast of #queries·(numPlanes+1)
    * tiny rows against the bucketed corpus (an equi-join; the corpus
    * is never re-hashed or re-shuffled per probe).
    *
    * Candidate sets are deterministic (derived sign planes), so the
    * whole output — candidates, cosine re-rank, top-k — is DuckDB-
    * oracle-checkable; recall ≥ the single-probe table at equal index
    * cost is pinned by SimilaritySpec. */
  def multiProbeTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     nQueries: Int = 8, numPlanes: Int = 8, dims: Int = 64,
                     k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = corpus.select(col(idCol).as("id"), col(vecCol).as("raw"),
        asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm2(col("v")))
      .filter(col("nrm") > 0) // zero-norm: cos NaN sorts above all numbers
      .withColumn("bucket", lshBucket(col("raw"), numPlanes, dims))
      .select(col("id"), col("v"), col("nrm"), col("bucket"))
    val q = e.filter(col("id") < nQueries)
      .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        col("bucket").as("qb"))
    val probes = q.select(col("qid"), col("qv"), col("qn"),
      explode(array(col("qb") +:
        (0 until numPlanes).map(j => col("qb").bitwiseXOR(lit(1L << j))): _*))
        .as("bucket"))
    e.join(broadcast(probes), Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nn_id"),
        (dot(col("qv"), col("v")) / (col("nrm") * col("qn"))).as("cos"))
      .withColumn("rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("cos").desc, col("nn_id").asc)))
      .filter(col("rn") <= k)
  }

  /** Random-hyperplane LSH bucket id over `numPlanes` planes for a
    * `dims`-dim embedding: bit k = sign of ⟨v, plane_k⟩. `dims` must
    * match the vector length (a shorter plane would silently
    * truncate the dot product). */
  def lshBucket(vec: Column, numPlanes: Int = 8, dims: Int = 64): Column = {
    val bits = (0 until numPlanes).map { k =>
      val w = array((0 until dims).map(d => lit(planeWeight(k, d).toDouble)): _*)
      when(dot(asDouble(vec), w) > 0, lit(1L << k)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
