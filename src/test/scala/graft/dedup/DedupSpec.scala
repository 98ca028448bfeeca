package graft.dedup

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("embeddingDupPairs finds scaled duplicates, not orthogonal vectors") {
    // v2 = 0.5·v1 (same direction → cosine 1.0); v3 orthogonal
    val df = Seq(
      (1L, "b", Seq(1.0f, 2.0f, 0.0f, 0.0f)),
      (2L, "b", Seq(0.5f, 1.0f, 0.0f, 0.0f)),
      (3L, "b", Seq(0.0f, 0.0f, 3.0f, 0.0f)),
      (4L, "other", Seq(1.0f, 2.0f, 0.0f, 0.0f)) // same dir, different bucket
    ).toDF("vec_id", "bkt", "embedding")
    val pairs = Dedup.embeddingDupPairs(df, "vec_id", "embedding", "bkt", 0.95)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L))) // bucket isolation keeps 4 out
  }

  test("simhashNearPairs: identical token sets → hamming 0; disjoint sets are far") {
    val df = Seq(
      (1L, "b", Seq("alpha", "beta", "gamma", "delta")),
      (2L, "b", Seq("delta", "alpha", "gamma", "beta")), // same set, order differs
      (3L, "b", Seq("zz1", "zz2", "zz3", "zz4", "zz5", "zz6"))
    ).toDF("doc_id", "bkt", "toks")
    val fp = Dedup.simhash32(df, "doc_id", "toks")
      .join(df.select("doc_id", "bkt"), "doc_id")
    val near = Dedup.simhashNearPairs(fp, "doc_id", "simhash", "bkt", 3)
      .select("id1", "id2", "hamming").collect()
    assert(near.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(near.head.getInt(2) === 0) // identical sets → identical fingerprint
  }

  test("simhashNearPairsBanded == all-pairs radius search (exactness) and sub-quadratic candidates") {
    import org.apache.spark.sql.functions._
    // overlapping token windows over a shared vocab → a real spread
    // of hamming distances, including near and identical pairs
    val vocab = (0 until 40).map(i => s"w$i")
    val docs = (0L until 120L).map { id =>
      val start = (id % 30).toInt
      val toks = (0 until 12).map(k => vocab((start + k) % vocab.length)) ++
        (if (id % 7 == 0) Seq("extra1", "extra2") else Nil)
      (id, toks)
    }.toDF("doc_id", "toks")
    val fp = Dedup.simhash(docs, "doc_id", "toks", 60)
    val exact = fp.select(col("doc_id").as("id1"), col("simhash").as("h1"))
      .join(fp.select(col("doc_id").as("id2"), col("simhash").as("h2")))
      .filter(col("id1") < col("id2"))
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= 3)
      .select("id1", "id2", "hamming")
    val banded = Dedup.simhashNearPairsBanded(fp, "doc_id", "simhash", 60, 3)
    val e = exact.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = banded.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(e.nonEmpty, "test corpus produced no near pairs — radius too tight")
    assert(b === e) // pigeonhole guarantee: zero false negatives, verify drops FPs
    // candidate volume (pairs sharing ≥1 of the 4 15-bit bands, i.e.
    // the pre-verify join size) must be far below the n²/2 all-pairs
    val keys = fp.select(col("doc_id").as("id"),
        explode(array((0 until 4).map(i => struct(lit(i).as("band"),
          shiftright(col("simhash"), i * 15).bitwiseAND(lit((1L << 15) - 1)).as("bv"))): _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bv").as("bv"))
    val candidates = keys.select(col("band"), col("bv"), col("id").as("id1"))
      .join(keys.select(col("band"), col("bv"), col("id").as("id2")), Seq("band", "bv"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct().count()
    val allPairs = (120L * 119L) / 2
    assert(candidates < allPairs / 4,
      s"banding candidate set ($candidates) is not sub-quadratic vs $allPairs")
  }

  test("minhashBandKeys == lshBandKeys(minhashSignatures) on a real spread of shingle sets") {
    import org.apache.spark.sql.functions._
    // overlapping shingle windows → shared and distinct minima across
    // docs, exercising every band multiplier
    val docs = (0L until 60L).map { id =>
      val start = (id % 20).toInt
      (id, (0 until 6).map(k => s"sh${(start + k) % 25}"))
    }.toDF("doc_id", "shingles")
    val twoStep = Dedup.lshBandKeys(
      Dedup.minhashSignatures(docs, "doc_id", "shingles", 8), "doc_id", 2)
      .select("doc_id", "band", "band_key")
    val fused = Dedup.minhashBandKeys(docs, "doc_id", "shingles", 8, 2)
      .select("doc_id", "band", "band_key")
    assert(fused.exceptAll(twoStep).isEmpty && twoStep.exceptAll(fused).isEmpty)
    assert(fused.count() === 60L * 4)
  }

  test("LSH subset restriction: pairs-over-subset == full pairs semi-joined to subset") {
    import org.apache.spark.sql.functions._
    // qC1 rides the q74/qA1 staged full-corpus candidate pairs by
    // semi-joining both endpoints to its gated subset. That is only
    // sound because band keys are per-doc functions of the doc's own
    // shingles (no corpus-dependent state) — this test pins the
    // algebraic identity the reuse depends on, on a corpus with
    // planted duplicate groups that straddle the subset boundary.
    val docs = (0L until 80L).map { id =>
      val grp = (id % 8).toInt // 8 near-dup families of 10 docs
      (id, (0 until 6).map(k => s"g$grp-sh${k + (id % 2).toInt}"))
    }.toDF("doc_id", "shingles")
    // gated subset: ~60% of docs, cutting through every family
    val subset = docs.filter(col("doc_id") % 5 < 3)
    val subsetPairs = Dedup.lshCandidatePairs(
      Dedup.minhashBandKeys(subset, "doc_id", "shingles", 8, 2), "doc_id")
    val ids = subset.select("doc_id")
    val restricted = Dedup.lshCandidatePairs(
      Dedup.minhashBandKeys(docs, "doc_id", "shingles", 8, 2), "doc_id")
      .join(ids.withColumnRenamed("doc_id", "id1"), Seq("id1"), "left_semi")
      .join(ids.withColumnRenamed("doc_id", "id2"), Seq("id2"), "left_semi")
      // USING joins move the key first — restore (id1, id2) order
      // because exceptAll compares positionally
      .select("id1", "id2")
    assert(subsetPairs.exceptAll(restricted).isEmpty
      && restricted.exceptAll(subsetPairs).isEmpty)
    assert(subsetPairs.count() > 0) // the identity must not hold vacuously
  }

  test("LSH pathological bucket: AQE skew-join split fires on the candidate self-join") {
    import org.apache.spark.sql.functions._
    // Dedup.scala's scale note claims a pathological band bucket
    // (thousands of identical docs landing on one (band, band_key))
    // is handled by AQE's skew-join split rather than serializing the
    // whole bucket product into one task. Reproduce that bucket at
    // spec scale and assert the split actually fires: thresholds are
    // scaled down in the same proportion as the data (a 100 TB run
    // uses the 256MB defaults), broadcast is disabled so the
    // self-join plans as the sort-merge join it would be at scale.
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1kb")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512b")
      // the candidate pairs feed a distinct (a fresh shuffle), which
      // AQE counts as "extra shuffle introduced" — force the split
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // one pathological bucket: 1500 docs share (band 0, key 0) —
      // the all-identical-docs case; 800 singleton buckets around it
      val giant = spark.range(1500).select(lit(0).as("band"),
        lit(0L).as("band_key"), (col("id") + 1000000L).as("doc_id"))
      val background = spark.range(800).select(lit(0).as("band"),
        (col("id") + 1L).as("band_key"), col("id").as("doc_id"))
      val pairs = Dedup.lshCandidatePairs(giant.union(background), "doc_id")
      assert(pairs.count() === 1500L * 1499L / 2)
      // execute the DataFrame's OWN QueryExecution (count() builds a
      // separate one) so its adaptive plan finalizes, then inspect it
      pairs.queryExecution.toRdd.count()
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"plan did not finalize:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE skew-join split did not fire; final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("jaccardPairs keeps pairs whose Jaccard sits EXACTLY on the threshold") {
    // 28-token set fully inside a 35-token set: J = 28/35 = 0.8. The
    // former float prune bounds (ceil(0.8/1.8·63) = ceil of
    // 28.000…004 = 29 > the true α = 28) silently dropped this pair;
    // the integer rational bounds must keep it.
    val small = (1 to 28).map(i => s"tok$i")
    val big = (1 to 35).map(i => s"tok$i")
    val df = Seq((1L, "b", small), (2L, "b", big)).toDF("id", "bkt", "toks")
    val pairs = Dedup.jaccardPairs(df, "id", "toks", "bkt", 0.8)
      .select("id1", "id2", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq === Seq((1L, 2L, 0.8)))
  }

  test("jaccardPairs input contract: duplicate (bucket, id) rows MERGE into one document") {
    // ADVICE r10: the df-pricing groupBy re-gathers each document
    // from its exploded tokens, so two rows sharing (bucket, id)
    // become ONE concatenated token multiset — the scaladoc'd
    // uniqueness requirement. Pin the documented behavior so a future
    // rewrite that silently changes it (back to row-per-document, or
    // to an error) fails here and gets the contract re-decided
    // deliberately. Doc 1 arrives split across two rows {a,b}+{c,d};
    // doc 2 is {a,b,c,d}. Under the merge contract 1 ≡ 2 (J = 1.0);
    // under row-per-document NO pair reaches J ≥ 0.8.
    val df = Seq(
      (1L, "b", Seq("a", "b")),
      (1L, "b", Seq("c", "d")),
      (2L, "b", Seq("a", "b", "c", "d"))
    ).toDF("id", "bkt", "toks")
    val pairs = Dedup.jaccardPairs(df, "id", "toks", "bkt", 0.8)
      .select("id1", "id2", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq === Seq((1L, 2L, 1.0)),
      "duplicate (bucket, id) rows must merge per the documented contract")
  }

  test("jaccardPairs drops empty token sets without affecting pairs") {
    // scaladoc'd: empty sets can never generate prefix candidates and
    // are excluded from `base` by the explode — output is as if the
    // row were absent, and no null/zero-size artifact appears.
    val df = Seq(
      (1L, "b", Seq("a", "b", "c")),
      (2L, "b", Seq("a", "b", "c")),
      (3L, "b", Seq.empty[String])
    ).toDF("id", "bkt", "toks")
    val pairs = Dedup.jaccardPairs(df, "id", "toks", "bkt", 0.8)
      .select("id1", "id2").as[(Long, Long)].collect()
    assert(pairs.toSeq === Seq((1L, 2L)))
  }
}
