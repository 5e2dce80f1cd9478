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
}
