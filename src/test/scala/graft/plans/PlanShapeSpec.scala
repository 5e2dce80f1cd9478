package graft.plans

import graft.SparkSpec

/** Physical-plan shape assertions for the round-7 operators — the
  * scaladoc scale claims pinned by name so a regression in plan choice
  * (broadcast → sort-merge, window → self-join, stray cartesian) fails
  * a targeted test instead of only showing up as a bench delta.
  */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.Queries.all(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q227 sorted-neighborhood generates candidates with NO join") {
    val p = plan("q227_sorted_neighborhood")
    assert(!p.contains("Join"), "the window is the candidate generator")
    assert(p.contains("Window"), "lead() window expected")
  }

  test("q205 rendezvous assignment is join-free and sort-merge-free") {
    val p = plan("q205_rendezvous_shards")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q220 vocab membership goes through a broadcast join") {
    val p = plan("q220_oov_rate")
    assert(p.contains("BroadcastHashJoin"), "500-row vocab must broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q204 RRF lists come from TakeOrdered, anchors broadcast") {
    val p = plan("q204_rrf_fusion")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
    assert(p.contains("Broadcast"), "1-row anchors must broadcast")
  }

  test("q207 rolling-active grid fans out via broadcast, not cartesian") {
    val p = plan("q207_rolling_active_users")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "day-grid range join should broadcast the tiny grid side")
    assert(!p.contains("CartesianProduct"))
  }

  test("q218 memorization coverage: hash joins only, no nested loop") {
    val p = plan("q218_memorization_coverage")
    assert(!p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"))
  }

  test("q212 modularity: class lookups broadcast at gate scale") {
    val p = plan("q212_modularity_audit")
    assert(!p.contains("CartesianProduct"))
  }

  // ---- round-8: the two corpus-sized global windows the r7 verdict
  // flagged (q178 global row_number, q174 global ntile) are now
  // two-phase ranks; pin "no partition-less Window over a corpus frame"
  // as a structural assertion so a regression fails here, not in bench.
  //
  // ALLOWED partition-less windows (r8 verdict #5 — each input is
  // k-bounded or value-domain-bounded BY CONSTRUCTION, annotated at the
  // site; future sweeps skip these):
  //   q195 retrieval ranks   — limit(50) frame feeds the window
  //   q211 nDCG@20           — limit(20) frame feeds the window
  //   q250 ROC/AUC           — per-DISTINCT-n_chars aggregate
  //   q257/q266 survival     — per-DISTINCT-event-time aggregate
  //   q267 CUSUM day grid    — per-DAY aggregate (calendar-sized)
  //   q247 calibration/ECE   — per-DISTINCT-score aggregate
  //   Ranks callers          — none since r9 (monotonic-id local rank)
  //   q288 rank correlation  — two per-DISTINCT-value grids (x, y)

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
  import org.apache.spark.sql.execution.window.WindowExec

  private def partitionlessWindows(p: SparkPlan): Seq[WindowExec] = p match {
    case a: AdaptiveSparkPlanExec => partitionlessWindows(a.inputPlan)
    case _ =>
      (p match {
        case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
        case _ => Nil
      }) ++ p.children.flatMap(partitionlessWindows)
  }

  test("q264 hints force all three equi-join strategies") {
    val p = plan("q264_join_strategies")
    assert(p.contains("BroadcastHashJoin"), "broadcast hint must bind")
    assert(p.contains("ShuffledHashJoin"), "shuffle_hash hint must bind")
    assert(p.contains("SortMergeJoin"), "merge hint must bind")
  }

  test("q286 bucketed join: no ShuffleExchange under the SortMergeJoin") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val plan = graft.Queries.all("q286_bucketed_join")(spark, sfDir)
      .queryExecution.executedPlan
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other => other
    }
    def findSmj(p: SparkPlan): Seq[SortMergeJoinExec] = {
      val q = strip(p)
      (q match {
        case j: SortMergeJoinExec => Seq(j)
        case _ => Nil
      }) ++ q.children.flatMap(findSmj)
    }
    def hasShuffle(p: SparkPlan): Boolean = {
      val q = strip(p)
      q.isInstanceOf[ShuffleExchangeExec] || q.children.exists(hasShuffle)
    }
    val smjs = findSmj(plan)
    assert(smjs.nonEmpty, "merge-hinted bucketed join must be SMJ")
    smjs.foreach { j =>
      assert(!hasShuffle(j.left) && !hasShuffle(j.right),
        "bucketed scan must satisfy the join distribution — no shuffle")
    }
    graft.ops.Dedup.releaseCaches()
  }

  test("q178 quantile-norm has no partition-less Window (two-phase rank)") {
    val p = graft.Queries.all("q178_quantile_norm")(spark, sfDir)
      .queryExecution.executedPlan
    assert(partitionlessWindows(p).isEmpty,
      "global rank must come from Ranks.globalRowNumber, not a " +
        "single-partition window")
    graft.ops.Dedup.releaseCaches()
  }

  test("q174 rfm-segments has no partition-less Window (arithmetic ntile)") {
    val p = graft.Queries.all("q174_rfm_segments")(spark, sfDir)
      .queryExecution.executedPlan
    assert(partitionlessWindows(p).isEmpty,
      "quintile cuts must come from ntileFromRank over a two-phase rank")
    graft.ops.Dedup.releaseCaches()
  }

  // ---- round-10: catalog-wide crossJoin audit (r9 advice #7). The
  // repo convention — every CartesianProduct / BroadcastNestedLoopJoin
  // sits above at least one side that is bounded BY CONSTRUCTION (a
  // 1-row ungrouped aggregate, a limit/top-k, a LocalRelation of
  // driver literals, a range grid) — was followed everywhere but
  // asserted nowhere. This sweep walks EVERY catalog query's physical
  // plan (built against schema-identical empty tables, the
  // EmptyInputSpec idiom — plan STRUCTURE is data-independent; the
  // pre-AQE sparkPlan is inspected so empty-relation elimination can't
  // hide join nodes) and fails on any product join whose sides are
  // both unbounded. Queries whose product sides are bounded by a VALUE
  // DOMAIN the detector can't see structurally are allowlisted with
  // the reason, mirroring the partition-less-window allowlist above.
  import org.apache.spark.sql.execution.{GenerateExec, LocalTableScanExec,
    RangeExec, GlobalLimitExec, TakeOrderedAndProjectExec, UnionExec,
    UnaryExecNode}
  import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
  import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
  import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
  import org.apache.spark.sql.execution.joins.{BaseJoinExec,
    BroadcastNestedLoopJoinExec, CartesianProductExec}

  // Value-domain-bounded product sides the structural detector cannot
  // prove, each with the bound it actually has. Four recurring shapes:
  // (enum) a keyed aggregate / distinct over a bounded value domain
  // (sources, folds, calendar days); (key-slice) a filter pinning a
  // unique key to a literal range, ≤k rows by data contract;
  // (capped-grid) grouping keys capped by least()/div to a constant
  // grid; (group-slice) a single group sliced out of a grouped
  // aggregate. Every entry is an author-reviewed reason — adding here
  // is the ONLY way past the sweep, so a new unbounded crossJoin fails
  // loudly instead of riding in on a broadcast() hint.
  private val crossJoinAllowlist: Map[String, String] = Map(
    "q165_cross_source_overlap" -> "enum: sources × sources pair frame",
    "q219_js_divergence_matrix" -> "enum: sources × sources pair frame",
    "q24_simsearch_brute" -> "key-slice: query side vec_id < 10",
    "q87_embedding_neardup" -> "key-slice: batch side vec_id < 50",
    "q102_embedding_neardup_lsh" ->
      "key-slice: planted-dup audit side derived from vec_id < 50",
    "q181_ks_drift" -> "enum: DISTINCT(source) grid side",
    "q196_contrastive_triplets" -> "key-slice: anchor side vec_id < 100",
    "q197_kmv_overlap_matrix" ->
      "enum: per-source KMV sketch pair frame (sources²)",
    "q204_rrf_fusion" -> "key-slice: anchor sides vec_id = 0 / vec_id = 1",
    "q206_rank_agreement" -> "enum: per-source aggregate pair frame",
    "q207_rolling_active_users" ->
      "enum: DISTINCT(to_date(ts)) day-grid side (calendar-bounded)",
    "q211_ndcg_eval" -> "key-slice: anchor side vec_id = 0",
    "q234_srp_calibration" -> "key-slice: anchor side vec_id < 20",
    "q238_fold_balance" -> "enum: DISTINCT(fold) grid side, fold = md5 % 5",
    "q275_mix_shift" ->
      "group-slice: w0/w1 are single groups of a groupBy(wk), wk <= 1",
    "q278_sql_entry" -> "key-slice: vec_id = (SELECT min(vec_id)) one row",
    "q294_kendall_tau" ->
      "capped-grid: cells keyed by least(div,9) — <= 10 x 10 rows",
    "q295_acf_daily" ->
      "enum: calendar day grid (datediff-keyed), lags <= 7")

  private def strip10(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => strip10(a.inputPlan)
    case r: ReusedExchangeExec => strip10(r.child)
    case other => other
  }

  /** Is this side's row count bounded by construction (independent of
    * corpus size)? Conservative structural walk.
    */
  private def boundedSide(plan: SparkPlan): Boolean = {
    val p = strip10(plan)
    p match {
      case _: LocalTableScanExec => true
      case r: RangeExec => r.numElements <= BigInt(1000000)
      case _: GlobalLimitExec => true
      case _: TakeOrderedAndProjectExec => true
      case a: BaseAggregateExec =>
        a.groupingExpressions.isEmpty || boundedSide(a.child)
      case s: InMemoryTableScanExec => boundedSide(s.relation.cachedPlan)
      case j: BaseJoinExec => boundedSide(j.left) && boundedSide(j.right)
      case u: UnionExec => u.children.forall(boundedSide)
      // A generator (explode/posexplode/inline/stack) can blow a
      // bounded child up by an unbounded per-row factor — a limit-100
      // of rows each carrying a million-element array is NOT a bounded
      // join side. Treat as unbounded; a genuinely bounded generate
      // must earn an explicit allowlist entry with its reviewed bound.
      case _: GenerateExec => false
      case u: UnaryExecNode => boundedSide(u.child)
      case _ => false
    }
  }

  private def productJoins(plan: SparkPlan): Seq[BaseJoinExec] = {
    val p = strip10(plan)
    val kids = p match {
      case s: InMemoryTableScanExec => Seq(s.relation.cachedPlan)
      case other => other.children
    }
    (p match {
      case j: BroadcastNestedLoopJoinExec => Seq(j)
      case j: CartesianProductExec => Seq(j)
      case _ => Nil
    }) ++ kids.flatMap(productJoins)
  }

  private lazy val emptyDir10: String = {
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_xjoin").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .limit(0).write.parquet(s"$dir/$t.parquet")
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$src/events.parquet").limit(0)
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("catalog sweep: every product join has a bounded side") {
    val bad = graft.Queries.all.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => crossJoinAllowlist.contains(name) }
      .flatMap { case (name, fn) =>
        val v = try {
          val plan = fn(spark, emptyDir10).queryExecution.sparkPlan
          productJoins(plan)
            .filterNot(j => boundedSide(j.left) || boundedSide(j.right))
            .map(j => s"$name: ${j.nodeName}")
        } catch { case e: Throwable =>
          Seq(s"$name: plan build failed: ${e.getClass.getSimpleName}")
        }
        graft.ops.Dedup.releaseCaches()
        v
      }
    assert(bad.isEmpty, s"unbounded product joins:\n${bad.mkString("\n")}")
  }

  test("crossJoin audit detector flags a planted unbounded product") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id")
    val planted = docs.crossJoin(docs.withColumnRenamed("doc_id", "d2"))
    val joins = productJoins(planted.queryExecution.sparkPlan)
    assert(joins.nonEmpty, "planted corpus×corpus cross join must plan " +
      "as a product join")
    assert(joins.exists(j => !boundedSide(j.left) && !boundedSide(j.right)),
      "detector must see both sides as unbounded")
  }

  // ---- round-10: the r9 verdict confirmed globalRunningMax shuffled
  // the corpus TWICE (Window.partitionBy(__pid) demanded a
  // hashpartitioning Exchange directly above the range exchange). Now
  // the local running max is a mapPartitions scan; pin "exactly one
  // ShuffleExchange between the scan and the running-max output" so
  // the double shuffle cannot regress. The pinned (cached) subtree is
  // reached through InMemoryRelation.cachedPlan.
  test("globalRunningMax shuffles the corpus exactly once") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.functions._
    def shuffles(p: SparkPlan): Int = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
        case s: InMemoryTableScanExec => Seq(s.relation.cachedPlan)
        case other => other.children
      }
      (if (p.isInstanceOf[ShuffleExchangeExec]) 1 else 0) +
        kids.map(shuffles).sum
    }
    val df = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
    val out = graft.ops.Ranks.globalRunningMax(
      df, Seq(col("event_id")), col("us"), "run_max", numPartitions = 8)
    out.count() // materialize so the AQE final plan is the real one
    val n = shuffles(out.queryExecution.executedPlan)
    assert(n == 1,
      s"expected exactly ONE ShuffleExchange (the range repartition) " +
        s"on the running-max path, found $n — the second " +
        "hashpartitioning(__pid) exchange is the r9 double-shuffle bug")
    graft.ops.Dedup.releaseCaches()
  }
}
