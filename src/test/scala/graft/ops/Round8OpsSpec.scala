package graft.ops

import graft.SparkSpec

/** Round-8 additions (q247–q253) — semantic invariants the oracle hash
  * can't name: probability-mass identities, rank-sum algebra, survival
  * monotonicity, reweighting mass conservation, S-curve monotonicity,
  * and cosine bounds.
  */
class Round8OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q247: bins partition the corpus; conf lies inside its decile; " +
    "ECE and Brier are bounded") {
    val rows = graft.Queries.all("q247_calibration_audit")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val conf = r.getAs[Double]("conf")
      // decile edges with 1e-6 slop (conf is a rounded mean of scores
      // whose binning multiplied by 10 in float)
      assert(conf >= bin / 10.0 - 1e-6 && conf <= (bin + 1) / 10.0 + 1e-6)
      assert(r.getAs[Double]("brier_bin") >= 0.0
        && r.getAs[Double]("brier_bin") <= 1.0)
      assert(r.getAs[Double]("ece_term") >= 0.0)
    }
    assert(rows.map(_.getAs[Double]("ece_term")).sum <= 1.0 + 1e-9)
  }

  test("q248: U_A + U_B = n_A·n_B (the rank-sum identity), U in range") {
    val r = graft.Queries.all("q248_mann_whitney")(spark, sfDir).head()
    val na = r.getAs[Long]("na"); val nb = r.getAs[Long]("nb")
    val u = r.getAs[Double]("u_stat")
    assert(na > 0 && nb > 0)
    assert(u >= 0.0 && u <= na.toDouble * nb,
      s"U=$u outside [0, ${na * nb}]")
    // recompute U_B from the complementary group and check the identity
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("n_chars", "lang").collect()
    val all = docs.map(d => (d.getLong(0), d.getString(1) == "en"))
      .sortBy(_._1)
    // average ranks with ties
    val ranks = all.zipWithIndex.groupBy(_._1._1).toSeq
      .flatMap { case (_, g) =>
        val avg = g.map(_._2 + 1).sum.toDouble / g.length
        g.toSeq.map { case ((_, isA), _) => (isA, avg) }
      }
    val ra = ranks.collect { case (true, rk) => rk }.sum
    val uRef = ra - na.toDouble * (na + 1) / 2
    assert(math.abs(u - uRef) < 1e-6, s"U=$u ref=$uRef")
  }

  test("q249: outgoing transition probabilities sum to 1 per from_type") {
    val rows = graft.Queries.all("q249_markov_transitions")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (ft, g) =>
      val pSum = g.map(_.getAs[Double]("p")).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$ft: Σp = $pSum")
      val nSum = g.map(_.getAs[Long]("n_trans")).sum
      assert(nSum > 0)
    }
  }

  test("q250: survival is strictly decreasing, (0,1]; risk decreasing; " +
    "deaths ≤ risk") {
    val rows = graft.Queries.all("q250_km_retention")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    var lastS = 1.0 + 1e-12
    var lastRisk = Long.MaxValue
    rows.foreach { r =>
      val sV = r.getAs[Double]("surv")
      val risk = r.getAs[Long]("risk")
      val deaths = r.getAs[Long]("deaths")
      assert(deaths > 0 && deaths <= risk)
      assert(sV >= 0.0 && sV < lastS, s"surv not decreasing at t=${r.get(0)}")
      assert(risk < lastRisk || lastRisk == Long.MaxValue)
      lastS = sV; lastRisk = risk
    }
  }

  test("q251: reweighted mass is conserved (Σ n_s·w_s = N) and " +
    "ess_ratio ≤ 1") {
    val rows = graft.Queries.all("q251_importance_reweight")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    val mass = rows.map(r =>
      r.getAs[Long]("n_docs") * r.getAs[Double]("weight")).sum
    assert(math.abs(mass - n) / n < 1e-4, s"mass $mass vs N $n")
    val ess = rows.head.getAs[Double]("ess_ratio")
    assert(ess > 0.0 && ess <= 1.0 + 1e-9)
    assert(rows.forall(r => r.getAs[Double]("ess_ratio") == ess))
  }

  test("q252: the banding S-curve is monotone in mean_j and hits both " +
    "tails") {
    val rows = graft.Queries.all("q252_lsh_calibration")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("decile"))
    assert(rows.nonEmpty)
    val ps = rows.map(r =>
      (r.getAs[Double]("mean_j"), r.getAs[Double]("p_candidate")))
    ps.sliding(2).foreach {
      case Array((j1, p1), (j2, p2)) =>
        assert(j2 >= j1 - 1e-9)
        assert(p2 >= p1 - 1e-9, s"S-curve not monotone: $p1 -> $p2")
      case _ => ()
    }
    ps.foreach { case (j, p) =>
      val ref = 1.0 - math.pow(1.0 - math.pow(j, 4), 16)
      assert(math.abs(p - ref) < 1e-5)
    }
  }

  test("q254: Chao1 is a richness floor above the observed vocabulary " +
    "and Good-Turing mass is a probability") {
    val rows = graft.Queries.all("q254_unseen_species")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Long]("vocab")
      assert(r.getAs[Double]("chao1") >= v.toDouble - 1e-9)
      val p0 = r.getAs[Double]("p_unseen")
      assert(p0 >= 0.0 && p0 <= 1.0)
      assert(r.getAs[Long]("n1") <= v && r.getAs[Long]("n2") <= v)
    }
  }

  test("q255: the log-log fit matches a driver-side reference on the " +
    "same points") {
    val r = graft.Queries.all("q255_heaps_fit")(spark, sfDir).head()
    import org.apache.spark.sql.functions._
    val pts = graft.Tables.table(spark, sfDir, "documents")
      .select(col("source"),
        explode(graft.ops.TextStats.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
      .collect().map(p => (math.log(p.getAs[Long]("n").toDouble),
        math.log(p.getAs[Long]("v").toDouble)))
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getAs[Double]("beta") - beta) < 1e-4,
      s"beta ${r.getAs[Double]("beta")} vs reference $beta")
    assert(r.getAs[Double]("r2") >= 0.0 && r.getAs[Double]("r2") <= 1.0)
    assert(r.getAs[Double]("k_hat") > 0.0)
  }

  test("q256: the changepoint day maximizes |cusum| (driver-side replay)") {
    val r = graft.Queries.all("q256_cusum_changepoint")(spark, sfDir).head()
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .orderBy(col("day"))
      .collect().map(d => (d.getAs[java.sql.Date]("day"), d.getAs[Long]("x")))
    val n = daily.length
    val total = daily.map(_._2).sum
    var cum = 0L
    val ns = daily.zipWithIndex.map { case ((day, x), i) =>
      cum += x
      (day, n.toLong * cum - (i + 1).toLong * total)
    }
    val best = ns.maxBy(t => (math.abs(t._2.toDouble), -t._1.getTime))
    assert(r.getAs[java.sql.Date]("cp_day") == best._1,
      s"cp ${r.getAs[java.sql.Date]("cp_day")} vs replay ${best._1}")
    assert(r.getAs[Long]("n_days") == n.toLong)
    assert(r.getAs[Double]("stat") >= 0.0)
  }

  test("q257: AUC bounded, recall monotone in threshold, TP+FN constant") {
    val rows = graft.Queries.all("q257_roc_pr")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("thresh"))
    assert(rows.length == 11)
    val auc = rows.head.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    assert(rows.forall(_.getAs[Double]("auc") == auc))
    // P = TP + FN is the positive count at every threshold
    val p = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).distinct
    assert(p.length == 1 && p.head > 0)
    // recall non-increasing as the threshold rises; recall(0) = 1
    assert(rows.head.getAs[Double]("recall") == 1.0)
    val recalls = rows.flatMap(r => Option(r.getAs[Double]("recall")))
    recalls.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9)
      case _ => ()
    }
    graft.ops.Dedup.releaseCaches()
  }

  test("q258: lateness shares shrink as the watermark widens and the " +
    "planted jitter bounds max lateness") {
    val r = graft.Queries.all("q258_watermark_audit")(spark, sfDir).head()
    val l1 = r.getAs[Long]("late_1s"); val l10 = r.getAs[Long]("late_10s")
    val l60 = r.getAs[Long]("late_60s")
    assert(l1 >= l10 && l10 >= l60)
    val maxLate = r.getAs[Long]("max_late_us")
    assert(maxLate < 120000000L,
      "lateness cannot exceed the planted jitter bound")
    // counts and the max must tell the same story (at sf0.001 the
    // stream can be too sparse for 120s jitter to reorder anything —
    // zero lateness is then the CORRECT answer, not a failed plant)
    assert((l1 > 0) == (maxLate > 1000000L))
    assert((l60 > 0) == (maxLate > 60000000L))
    assert(r.getAs[Double]("share_1s") <= 1.0)
  }

  test("q259: anchor count conserved and accuracy beats the prior-guess " +
    "floor only if labels separate (bounds check)") {
    val rows = graft.Queries.all("q259_knn_accuracy")(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Long]("n_anchors")).sum == 50L)
    rows.foreach { r =>
      val acc = r.getAs[Double]("acc")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_anchors"))
    }
  }

  test("q260/q261: native session_window batch and streaming agree " +
    "row-for-row, and sessions respect the 30-minute gap") {
    val batch = graft.Queries.all("q260_session_window_batch")(spark, sfDir)
      .collect()
    val stream = graft.Queries.all("q261_stream_session_window")(spark, sfDir)
      .collect()
    assert(batch.nonEmpty)
    assert(batch.map(_.toSeq).toSeq == stream.map(_.toSeq).toSeq,
      "engine-managed streaming session state must not change the answer")
    batch.foreach { r =>
      assert(r.getAs[Long]("end_us") >= r.getAs[Long]("start_us")
        + 30L * 60 * 1000000, "end = last event + gap")
      assert(r.getAs[Long]("n_events") > 0)
    }
    // consecutive sessions of the same user are separated by > gap
    batch.groupBy(_.getAs[Long]("user_id")).foreach { case (_, g) =>
      g.sortBy(_.getAs[Long]("start_us")).sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_us") > a.getAs[Long]("end_us"),
            "next session must start after the previous session's end")
        case _ => ()
      }
    }
  }

  test("q262: the waterfall conserves flow (out_k = in_k+1, " +
    "in - dropped = out, token mass non-increasing)") {
    val rows = graft.Queries.all("q262_curation_waterfall")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("stage"))
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_in") - r.getAs[Long]("n_dropped")
        == r.getAs[Long]("n_out"))
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_in") == a.getAs[Long]("n_out"))
        assert(b.getAs[Long]("tok_out") <= a.getAs[Long]("tok_out"))
      case _ => ()
    }
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.head.getAs[Long]("n_in") == nDocs)
  }

  test("q263: transformWithState running totals equal the batch " +
    "cumulative window (state survives micro-batch boundaries)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val streamed = graft.Queries.all("q263_stream_running_totals")(
      spark, sfDir).collect()
    assert(streamed.nonEmpty)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val batch = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("cum_n", row_number().over(w).cast("long"))
      .withColumn("cum_cents", sum(col("cents")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("cum_n"),
        col("cum_cents"))
      .orderBy(col("user_id"), col("event_id"))
      .collect()
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq,
      "per-event running state must be batch-identical")
  }

  test("q265: incremental LSH finds exactly the full-index pairs that " +
    "involve the new batch") {
    import org.apache.spark.sql.functions._
    val inc = graft.Queries.all("q265_incremental_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.ops.Dedup.releaseCaches()
    val full = graft.ops.Dedup.minhashNearDuplicates(
      graft.Tables.table(spark, sfDir, "documents"), "text", "doc_id",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.7,
      useWordShingles = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.ops.Dedup.releaseCaches()
    val expected = full.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    assert(inc == expected,
      s"incremental=${inc.size} expected=${expected.size}")
    assert(inc.forall(p => p._1 % 10 == 0 || p._2 % 10 == 0),
      "no old-x-old pair may appear")
  }

  test("q266: Welch t agrees in SIGN with Mann-Whitney z on the same " +
    "contrast, and df lies between min(n)-1 and n-2") {
    val tRow = graft.Queries.all("q266_welch_t")(spark, sfDir).head()
    val uRow = graft.Queries.all("q248_mann_whitney")(spark, sfDir).head()
    val tStat = tRow.getAs[Double]("t_stat")
    val z = uRow.getAs[Double]("z")
    assert(tStat.signum == z.signum || tStat.abs < 0.5 || z.abs < 0.5,
      s"parametric and rank tests disagree in sign: t=$tStat z=$z")
    val na = tRow.getAs[Long]("na"); val nb = tRow.getAs[Long]("nb")
    val df = tRow.getAs[Double]("df")
    assert(df >= math.min(na, nb) - 1 - 1e-9 && df <= na + nb - 2 + 1e-9)
  }

  test("q267: MASE is the ratio of the two MAEs and every type has " +
    "backtest days") {
    val rows = graft.Queries.all("q267_mase_backtest")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") > 0)
      val ratio = r.getAs[Double]("mae_seasonal") / r.getAs[Double]("mae_naive")
      assert(math.abs(r.getAs[Double]("mase") - ratio) < 1e-3)
    }
  }

  test("q268: Neyman allocations sum to the budget and shift mass " +
    "toward high-sigma strata relative to proportional") {
    val rows = graft.Queries.all("q268_neyman_allocation")(spark, sfDir)
      .collect()
    graft.ops.Dedup.releaseCaches()
    assert(rows.nonEmpty)
    val neySum = rows.map(_.getAs[Double]("alloc_neyman")).sum
    val propSum = rows.map(_.getAs[Double]("alloc_prop")).sum
    assert(math.abs(neySum - 1000.0) < 1.0, s"neyman sums to $neySum")
    assert(math.abs(propSum - 1000.0) < 1.0, s"prop sums to $propSum")
    rows.foreach(r => assert(r.getAs[Double]("alloc_neyman") >= 0))
  }

  test("q269: the Chapman estimate brackets the true count within the " +
    "estimator's sampling error at 60% capture rates") {
    val r = graft.Queries.all("q269_capture_recapture")(spark, sfDir).head()
    val nTrue = r.getAs[Long]("n_true")
    assert(r.getAs[Long]("m") > 0, "overlap must exist at 60%+60%")
    assert(r.getAs[Long]("m") <= math.min(r.getAs[Long]("n_a"),
      r.getAs[Long]("n_b")))
    val chapman = r.getAs[Double]("n_hat_chapman")
    // var(N̂) ≈ N(1-p)²/p² per capture; 60/60 → generous 25% tolerance
    // at sf0.001's 50 docs
    assert(math.abs(chapman - nTrue) / nTrue < 0.25,
      s"chapman=$chapman true=$nTrue")
  }

  test("q270: the exported manifest matches the q262 waterfall's final " +
    "stage (the keep-set survived the physical round-trip)") {
    val manifest = graft.Queries.all("q270_curated_export")(spark, sfDir)
      .collect()
    val waterfall = graft.Queries.all("q262_curation_waterfall")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("stage")).last
    assert(manifest.map(_.getAs[Long]("n_docs")).sum
      == waterfall.getAs[Long]("n_out"),
      "exported docs must equal the waterfall's survivors")
    assert(manifest.map(_.getAs[Long]("tok_sum")).sum
      == waterfall.getAs[Long]("tok_out"),
      "exported token mass must equal the waterfall's surviving mass")
    assert(manifest.map(_.getAs[Int]("shard")).toSet.subsetOf(Set(0, 1, 2, 3)))
  }

  test("q271/q272: range frame includes self; typed group stats " +
    "conserve the event count") {
    val rf = graft.Queries.all("q271_range_frame")(spark, sfDir).collect()
    assert(rf.nonEmpty)
    assert(rf.forall(_.getAs[Long]("n_hour") >= 1L),
      "the RANGE frame includes the current row")
    val tg = graft.Queries.all("q272_typed_groups")(spark, sfDir).collect()
    val nEvents = graft.Tables.events(spark, sfDir).count()
    assert(tg.map(_.getAs[Long]("n_events")).sum == nEvents)
    tg.foreach { r =>
      assert(r.getAs[Long]("max_gap_us") <= r.getAs[Long]("span_us"))
    }
  }

  test("q273: consistent hashing moves ONLY the removed node's keys") {
    val rows = graft.Queries.all("q273_consistent_ring")(spark, sfDir)
      .collect()
    val byNode = rows.map(r => r.getAs[Int]("node") -> r).toMap
    // nodes 0-2: every original key stays; gains come only from node 3
    (0 to 2).foreach { n =>
      val r = byNode(n)
      assert(r.getAs[Long]("n_stayed") == r.getAs[Long]("n_before"),
        s"node $n lost keys it should have kept")
    }
    val n3 = byNode(3)
    assert(n3.getAs[Long]("n_stayed") == 0L)
    assert((0 to 2).map(byNode(_).getAs[Long]("n_gained")).sum
      == n3.getAs[Long]("n_before"),
      "exactly node 3's keys must redistribute")
  }

  test("q274: gap fill recovers the planted outage days within the " +
    "series' local variation") {
    val rows = graft.Queries.all("q274_gap_fill")(spark, sfDir).collect()
    graft.ops.Dedup.releaseCaches()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_gaps") > 0, "the plant must create gaps")
      assert(r.getAs[Double]("mae") <= r.getAs[Double]("max_err") + 1e-9)
    }
  }

  test("q275: volume + rate effects reconcile to the revenue delta") {
    val r = graft.Queries.all("q275_mix_shift")(spark, sfDir).head()
    val delta = (r.getAs[Long]("c1") - r.getAs[Long]("c0")).toDouble
    val sum = r.getAs[Double]("volume_effect") + r.getAs[Double]("rate_effect")
    assert(math.abs(sum - delta) < 0.02,
      s"decomposition $sum vs delta $delta")
  }

  test("q253: centroid cosines are within [-1, 1] and cover all label " +
    "pairs") {
    val rows = graft.Queries.all("q253_centroid_drift")(spark, sfDir)
      .collect()
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("label").distinct().count()
    assert(rows.length == (labels * (labels - 1) / 2).toInt)
    rows.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(r.getAs[Int]("label_a") < r.getAs[Int]("label_b"))
    }
  }
}
