package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Algebraic invariants for the round-7 eval-science queries —
  * properties the hash oracle can't express (bounds, monotonicity,
  * conservation laws). sf0.001 keeps the suite fast. */
class EvalQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q123: Heaps exponent is a sublinear growth rate, vocab ≤ tokens") {
    val r = SparkEntry.queries("q123_heaps_law")(spark, dir).collect()(0)
    val beta = r.getAs[Double]("heaps_beta")
    assert(beta > 0.0 && beta < 1.0, s"Heaps beta $beta outside (0,1)")
    assert(r.getAs[Long]("vocab_total") <= r.getAs[Long]("tokens_total"))
  }

  test("q124: matches never exceed treated; caliper bounds the distance") {
    val rows = SparkEntry.queries("q124_caliper_match")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_treated"))
      assert(r.getAs[Long]("n_matched") >= 0L)
    }
  }

  test("q125: KM survival is in (0,1] and non-increasing in duration") {
    val rows = SparkEntry.queries("q125_kaplan_meier")(spark, dir)
      .orderBy("dur_days").collect()
    assert(rows.nonEmpty)
    val s = rows.map(_.getAs[Double]("survival"))
    assert(s.forall(v => v > 0.0 && v <= 1.0))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a },
      s"survival increased: ${s.mkString(", ")}")
    rows.foreach(r =>
      assert(r.getAs[Long]("deaths") <= r.getAs[Long]("at_risk")))
  }

  test("q126: BT wins are conserved and strengths are positive") {
    val rows = SparkEntry.queries("q126_bradley_terry")(spark, dir).collect()
    assert(rows.length == 5)
    val wins = rows.map(_.getAs[Long]("n_wins")).sum
    val comps = rows.map(_.getAs[Long]("n_comparisons")).sum
    // every comparison contributes exactly one win and appears in two
    // rows' comparison counts
    assert(comps == wins * 2, s"comparisons $comps != 2 x wins $wins")
    rows.foreach(r => assert(r.getAs[Double]("strength") > 0.0))
  }

  test("q127: noise matrix rows partition the voted docs; K² bound") {
    val rows = SparkEntry.queries("q127_label_noise")(spark, dir).collect()
    assert(rows.length <= 25)
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum <= nDocs)
    // the true-class boost must make the diagonal dominate
    val diag = rows.filter(r => r.getAs[String]("label") == r.getAs[String]("predicted"))
      .map(_.getAs[Long]("n")).sum
    val off = rows.filter(r => r.getAs[String]("label") != r.getAs[String]("predicted"))
      .map(_.getAs[Long]("n")).sum
    assert(diag > off, s"diagonal $diag not dominant over $off")
  }

  test("q128: turns bound events, rates are probabilities") {
    val rows = SparkEntry.queries("q128_dialog_turns")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_turns_sum") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Double]("avg_turn_len") >= 1.0)
      val p = r.getAs[Double]("open_u_rate")
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("q128 pick key: ties on ts resolve by event_id, not arrival order") {
    // the open/close-role picks must stay deterministic when
    // (user_id, ts) stops being unique — the generator property the
    // padded (ts, event_id) key exists to not depend on
    import org.apache.spark.sql.functions._
    val ts0 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00.5")
    val df = spark.createDataFrame(Seq(
      (7L, 30L, ts0, "a"), // same ts, higher id — must NOT open
      (7L, 10L, ts0, "u"), // same ts, lowest id — opens
      (7L, 20L, ts0, "x")  // same ts, middle id — must NOT close; 30 closes
    )).toDF("user_id", "event_id", "ts", "role")
    val key = concat(
      lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
      lpad(col("event_id").cast("string"), 10, "0"))
    val r = df.groupBy("user_id")
      .agg(min_by(col("role"), key).as("open"),
        max_by(col("role"), key).as("close"))
      .collect()(0)
    assert(r.getAs[String]("open") == "u" && r.getAs[String]("close") == "a")
  }

  test("q129: the capped sample yields exactly C(102,2) slopes per group") {
    val rows = SparkEntry.queries("q129_theil_sen")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getAs[Long]("n_pairs") == 5151L))
  }

  test("q12B: ALL row is never 'reversed'; counts partition the table") {
    val rows = SparkEntry.queries("q12B_simpson_audit")(spark, dir).collect()
    val all = rows.filter(_.getAs[String]("stratum") == "ALL")
    assert(all.length == 1 && !all(0).getAs[Boolean]("reversed"))
    val strata = rows.filter(_.getAs[String]("stratum") != "ALL")
    assert(strata.map(r => r.getAs[Long]("n_o") + r.getAs[Long]("n_f")).sum ==
      all(0).getAs[Long]("n_o") + all(0).getAs[Long]("n_f"))
  }

  test("q12C: fertility ≥ 1 (subword split never merges tokens)") {
    val rows = SparkEntry.queries("q12C_tokenizer_fertility")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("subwords") >= r.getAs[Long]("tokens"))
      assert(r.getAs[Double]("fertility") >= 1.0)
    }
  }

  test("q12D: kappa is in [-1, 1] and positive under the true-label bias") {
    val r = SparkEntry.queries("q12D_fleiss_kappa")(spark, dir).collect()(0)
    val k = r.getAs[Double]("kappa")
    assert(k >= -1.0 && k <= 1.0)
    // raters agree on the true label 60% of the time — far above the
    // ~1/5 chance rate, so agreement must be positive
    assert(k > 0.0, s"kappa $k not positive despite 60% true-label bias")
    val pb = r.getAs[Double]("p_bar")
    assert(pb >= 0.0 && pb <= 1.0)
  }

  test("q12E: rank metrics are probabilities; ndcg ≤ 1 by IDCG optimality") {
    val r = SparkEntry.queries("q12E_rank_metrics")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_queries") > 0)
    val mrr = r.getAs[Double]("mrr")
    val ndcg = r.getAs[Double]("mean_ndcg10")
    val hit = r.getAs[Double]("hit_rate10")
    assert(mrr >= 0.0 && mrr <= 1.0)
    assert(ndcg >= 0.0 && ndcg <= 1.0)
    assert(hit >= 0.0 && hit <= 1.0)
    // RR ≥ 1/rank cap and hit-rate relation: a hit in top-10 implies rr ≥ 1/10
    assert(mrr >= hit / 10.0 - 1e-9)
  }

  test("q12F: required n per arm shrinks as the relative variance shrinks") {
    val rows = SparkEntry.queries("q12F_power_analysis")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_per_arm") > 0L)
      assert(r.getAs[Double]("var_cents") > 0.0)
    }
    // n_per_arm ∝ var/mean² — the ordering must match across arms
    val byCv = rows.sortBy(r =>
      r.getAs[Double]("var_cents") /
        math.pow(r.getAs[Double]("mean_dollars") * 100, 2))
    val ns = byCv.map(_.getAs[Long]("n_per_arm"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a <= b },
      s"n_per_arm not monotone in cv²: ${ns.mkString(",")}")
  }

  test("q130: truncated-dim recall is a fraction of a full-recall bound") {
    val r = SparkEntry.queries("q130_matryoshka_recall")(spark, dir).collect()(0)
    val rec = r.getAs[Double]("recall_at_10")
    assert(rec >= 0.0 && rec <= 1.0)
    assert(r.getAs[Long]("s_overlap") <= r.getAs[Long]("n_probes") * 10)
  }

  test("q131: capping never increases any total or share") {
    val rows = SparkEntry.queries("q131_contribution_cap")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("sum_cents_capped") <= r.getAs[Long]("sum_cents_raw"))
      assert(r.getAs[Long]("max_user_capped") <= r.getAs[Long]("max_user_raw"))
      val kf = r.getAs[Double]("kept_frac")
      assert(kf > 0.0 && kf <= 1.0)
    }
  }

  test("q132: recall is monotone non-increasing in the threshold") {
    val rows = SparkEntry.queries("q132_dedup_threshold_pr")(spark, dir)
      .orderBy("t10").collect()
    assert(rows.length == 5)
    // raising t can only shrink both predicted and truth sets; TP+FN
    // (truth count at t) must be non-increasing
    val truthCounts = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn"))
    assert(truthCounts.zip(truthCounts.tail).forall { case (a, b) => b <= a })
    val predCounts = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fp"))
    assert(predCounts.zip(predCounts.tail).forall { case (a, b) => b <= a })
    // the sampled-n audit column (round 11): the deterministic doc
    // sample is min(cap, |documents|) — exactly |documents| at this
    // fixture (cap 8192 > corpus), so the full-truth twin semantics
    // hold at the certified small SFs
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.forall(_.getAs[Long]("n_docs_sampled") == math.min(8192L, nDocs)))
  }

  test("q133: DiD cells partition events; SE is positive") {
    val rows = SparkEntry.queries("q133_did_estimator")(spark, dir).collect()
    assert(rows.length == 5)
    val total = spark.read.parquet(s"$dir/events.parquet").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Double]("se_cents") > 0.0)
      val t = r.getAs[Double]("t_stat")
      assert(!t.isNaN && !t.isInfinite)
    }
  }

  test("q134: entropy is bounded by ln(l_distinct); min_k ≥ l_distinct") {
    val rows = SparkEntry.queries("q134_l_diversity")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l = r.getAs[Long]("l_distinct")
      val h = r.getAs[Double]("min_entropy")
      assert(h >= -1e-9 && h <= math.log(l.toDouble) + 1e-9,
        s"entropy $h outside [0, ln($l)]")
      assert(r.getAs[Long]("min_k") >= l)
    }
  }

  test("q135: grid candidates verify exactly against brute force") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q135_grid_spatial_join")(spark, dir)
    val total = out.agg(sum("n_near")).collect()(0).getLong(0)
    // brute-force recount (150×10 at sf0.001 — fine in a test): the
    // grid join must find EXACTLY the pairs within the L∞ radius
    def md5b(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 13), 16, 10).cast("long")
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(md5b(concat(col("c_custkey"), lit("|x|c"))).%(1048576L).as("x"),
        md5b(concat(col("c_custkey"), lit("|y|c"))).%(1048576L).as("y"))
    val supp = spark.read.parquet(s"$dir/supplier.parquet")
      .select(md5b(concat(col("s_suppkey"), lit("|x|s"))).%(1048576L).as("sx"),
        md5b(concat(col("s_suppkey"), lit("|y|s"))).%(1048576L).as("sy"))
    val brute = cust.crossJoin(supp)
      .filter(abs(col("x") - col("sx")) <= 60000L
        && abs(col("y") - col("sy")) <= 60000L).count()
    assert(total == brute, s"grid join found $total pairs, brute force $brute")
  }

  test("q136: EWMA is a convex combination — bounded by the window extremes") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q136_ewma_chart")(spark, dir)
      .orderBy("event_type", "d").collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val ns = rs.map(_.getAs[Long]("n").toDouble)
      rs.zipWithIndex.foreach { case (r, i) =>
        val window = ns.slice(math.max(0, i - 11), i + 1)
        val e = r.getAs[Double]("ewma")
        assert(e >= window.min - 1e-9 && e <= window.max + 1e-9,
          s"ewma $e outside window [${window.min}, ${window.max}]")
      }
    }
  }

  test("q137: absorption probabilities are monotone in steps and ≤ 1") {
    val rows = SparkEntry.queries("q137_markov_absorption")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val p = r.getAs[Double]("p_absorb_2step")
      assert(p >= 0.0 && p <= 1.0 + 1e-9)
      // two-step adds non-negative mass over one-step
      assert(r.getAs[Long]("p2_fp") >= 0L)
      assert(r.getAs[Long]("p1_fp") + r.getAs[Long]("p2_fp") <= 1000000000L)
    }
    // 'purchase' itself transitions onward: its row must exist
    assert(rows.exists(_.getAs[String]("state") == "purchase"))
  }

  test("q12A: top authority is rank 1 with relative score exactly 1") {
    val rows = SparkEntry.queries("q12A_hits")(spark, dir)
      .orderBy("rnk").collect()
    // sf0.001 has only 10 suppliers; the query caps at top-20
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows(0).getAs[Double]("authority_rel") == 1.0)
    val fps = rows.map(_.getAs[Long]("authority_fp"))
    assert(fps.zip(fps.tail).forall { case (a, b) => b <= a })
    rows.foreach(r => {
      val rel = r.getAs[Double]("authority_rel")
      assert(rel > 0.0 && rel <= 1.0)
    })
  }
}
