package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Invariants for the round-5 operators that a hash-equality oracle
  * can't express: algebraic bounds, relabeling invariance, and
  * monotone stage counts — run at sf0.001 so the whole suite stays
  * fast. */
class QueryPropertySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("qB1: KS statistic is a bounded ECDF distance") {
    val r = SparkEntry.queries("qB1_ks_drift")(spark, dir).collect()(0)
    val na = r.getAs[Long]("na")
    val nb = r.getAs[Long]("nb")
    val d = r.getAs[Long]("d_scaled")
    val ks = r.getAs[Double]("ks")
    assert(na > 0 && nb > 0)
    assert(d >= 0 && d <= na * nb, "scaled D outside [0, na*nb]")
    assert(ks >= 0.0 && ks <= 1.0)
  }

  test("qB2: triangle summary is invariant under node relabeling") {
    import graft.queries.GraphQueries
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .where(col("l_orderkey") % 8 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    def edges(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
        .select(least(f(col("a.p")), f(col("b.p"))).as("p1"),
          greatest(f(col("a.p")), f(col("b.p"))).as("p2"))
        .distinct()
    val base = GraphQueries.triangleCount(edges(identity)).collect()(0)
    // order-reversing injection: id -> C - id flips every degree tie
    // and the whole orientation; counts must not move
    val relabeled = GraphQueries
      .triangleCount(edges(c => lit(1000000L) - c)).collect()(0)
    assert(base.getAs[Long]("n_triangles") === relabeled.getAs[Long]("n_triangles"))
    assert(base.getAs[Long]("n_wedges") === relabeled.getAs[Long]("n_wedges"))
    assert(base.getAs[Long]("n_edges") === relabeled.getAs[Long]("n_edges"))
  }

  test("qBD: k-center selection radius is non-increasing") {
    val rows = SparkEntry.queries("qBD_kcenter_coreset")(spark, dir)
      .orderBy("round").collect()
    assert(rows.length === 3)
    val radii = rows.map(_.getAs[Double]("radius2"))
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"radius grew across rounds: ${radii.mkString(", ")}")
    assert(rows.map(_.getAs[Long]("center_id")).distinct.length === 3,
      "a center was selected twice")
  }

  test("qC1: curation stage counts are monotone non-increasing") {
    val r = SparkEntry.queries("qC1_curation_pipeline")(spark, dir).collect()
    assert(r.nonEmpty)
    val h = r.head
    val nIn = h.getAs[Long]("n_input")
    val nF = h.getAs[Long]("n_filtered")
    val nE = h.getAs[Long]("n_exact")
    val nN = h.getAs[Long]("n_near")
    assert(nIn >= nF && nF >= nE && nE >= nN && nN > 0,
      s"stage counts not monotone: $nIn >= $nF >= $nE >= $nN")
    // packed docs across all bins == survivors
    assert(r.map(_.getAs[Long]("n_docs")).sum === nN)
  }

  test("qB0: BPE pair counts are bounded by the corpus pair total") {
    val rows = SparkEntry.queries("qB0_bpe_pairs")(spark, dir).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val counts = rows.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      "top-20 not sorted by count")
    import graft.text.TextStats
    val totalPairs = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(TextStats.tokens(col("text"))).as("w"))
      .where(length(col("w")) >= 2)
      .agg(sum(length(col("w")) - 1)).head().getLong(0)
    assert(counts.sum <= totalPairs)
  }

  test("qC2: banding finds every exact duplicate hash") {
    // inject a guaranteed duplicate by unioning a doc with itself
    // under a new id, then check the pair surfaces with hamming 0
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val dup = docs.orderBy("doc_id").limit(1)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    import graft.dedup.Dedup
    val h = docs.select(col("doc_id"), col("text"))
      .unionByName(dup)
      .select(col("doc_id"), Dedup.md5Long(col("text")).as("ph"))
    val bands = h.select(col("doc_id"), col("ph"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bv", expr("shiftright(ph, band * 15) & 32767"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        expr("bit_count(a.ph ^ b.ph)").as("hamming"))
      .distinct()
    val exact = cand.filter(col("id2") === col("id1") + 1000000L
      && col("hamming") === 0)
    assert(exact.count() === 1L, "planted duplicate not found by banding")
  }

  test("qED: GroupedTopK selection equals the window idiom; keys are ≤ 0") {
    import org.apache.spark.sql.expressions.Window
    val two53 = 9007199254740992L
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("u",
        ((graft.dedup.Dedup.md5Long(col("doc_id").cast("string")) % two53)
          + lit(1L)).cast("double") / lit(two53.toDouble))
      .withColumn("skey", graft.functions.LnExact(col("u")) / col("n_chars"))
    val win = d.withColumn("rn", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("skey").desc, col("doc_id").asc)))
      .where(col("rn") <= 5).select("source", "doc_id")
    val op = SparkEntry.queries("qED_weighted_reservoir")(spark, dir)
      .select("source", "doc_id")
    assert(op.exceptAll(win).isEmpty && win.exceptAll(op).isEmpty,
      "operator top-5 diverges from the window idiom")
    // ln(u ≤ 1) ≤ 0 and w > 0, so every key is non-positive — a
    // positive key means the uniform construction broke
    assert(d.filter(col("skey") > 0.0).isEmpty)
  }

  test("qF0: Gram matrix is Cauchy–Schwarz-consistent with PSD diagonal") {
    val g = SparkEntry.queries("qF0_gram_matrix")(spark, dir).collect()
      .map(r => ((r.getAs[Int]("i"), r.getAs[Int]("j")), r.getAs[Long]("s_xy"))).toMap
    assert(g.size === 136)
    for (i <- 0 until 16) assert(g((i, i)) >= 0L, s"negative diagonal at $i")
    for (i <- 0 until 16; j <- i + 1 until 16) {
      val xy = BigInt(g((i, j))); val xx = BigInt(g((i, i))); val yy = BigInt(g((j, j)))
      assert(xy * xy <= xx * yy, s"Cauchy–Schwarz violated at ($i,$j)")
    }
  }

  test("qF1: candles bracket open/close inside [low, high]") {
    val rows = SparkEntry.queries("qF1_ohlc_candles")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lo = r.getAs[Double]("low"); val hi = r.getAs[Double]("high")
      assert(lo <= hi)
      assert(r.getAs[Double]("open") >= lo && r.getAs[Double]("open") <= hi)
      assert(r.getAs[Double]("close") >= lo && r.getAs[Double]("close") <= hi)
      assert(r.getAs[Long]("n") >= 1L)
    }
  }

  test("qF2: Gini is in [0, 1) and zero for a uniform group") {
    val rows = SparkEntry.queries("qF2_gini_concentration")(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"${r.getAs[String]("source")}: gini $g")
    }
    // uniform sizes → rank_mass = x·n(n+1)/2 → numerator is exactly 0
    import spark.implicits._
    val uni = Seq.tabulate(50)(i => ("s", i.toLong, 100L))
      .toDF("source", "doc_id", "n_chars")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("n_chars").asc, col("doc_id").asc)
    val gU = uni.withColumn("i", row_number().over(w).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("t"),
        sum(col("i") * col("n_chars")).as("rm"))
      .select(((lit(2L) * col("rm") - (col("n") + 1) * col("t")).cast("double")
        / (col("n") * col("t")).cast("double")).as("gini"))
      .collect()(0).getAs[Double]("gini")
    assert(gU === 0.0)
  }

  test("qF3: group split never leaks; audit counts are consistent") {
    val r = SparkEntry.queries("qF3_split_leakage")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_leaky_group_split") === 0L)
    assert(r.getAs[Long]("n_leaky_doc_split") <= r.getAs[Long]("n_multi"))
    assert(r.getAs[Long]("n_multi") < r.getAs[Long]("n_clusters"))
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_val")
      + r.getAs[Long]("n_test") >= r.getAs[Long]("n_clusters"))
  }

  test("qF4: decayed score is bounded by the undecayed fixed-point sum") {
    val rows = SparkEntry.queries("qF4_time_decay")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Long]("s_fp")
      assert(s >= 0L, "negative decayed mass from positive values")
      // the float score is EXACTLY the advertised single division of
      // the integer sum — no hidden float accumulation
      assert(r.getAs[Double]("decayed_score") === s.toDouble / 4.096e7)
    }
  }

  test("qEE: repetition signals are consistent per-doc invariants") {
    val rows = SparkEntry.queries("qEE_doc_repetition")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nBig = r.getAs[Long]("n_big"); val topBig = r.getAs[Long]("top_big")
      val nSpan = r.getAs[Long]("n_span"); val nDup = r.getAs[Long]("n_dup_pos")
      assert(topBig >= 1 && topBig <= nBig)
      assert(nDup >= 0 && nDup <= nSpan)
      // a duplicated 5-gram contributes its whole count (≥ 2):
      // n_dup_pos can never be exactly 1
      assert(nDup != 1, s"doc ${r.getAs[Long]("doc_id")}: impossible dup count 1")
      // a doc with ≥6 tokens has one more bigram position than
      // 5-gram positions deficit of exactly 3
      assert(nBig === nSpan + 3,
        "bigram/5-gram position counts inconsistent for the same token stream")
    }
  }
}
