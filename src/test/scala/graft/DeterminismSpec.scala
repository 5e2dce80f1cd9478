package graft

import org.apache.spark.sql.functions._

/** Codifies the SKILL.md determinism probe as a standing test: a
  * representative slice of the catalog — window cumsums, a min-label
  * fixpoint, decimal-routed float sums, a deterministic bootstrap, a
  * rank-window sample, the sweep added this round — must produce
  * VALUE-IDENTICAL output on a second run in the same session. This is
  * the property the driver's hash compare silently depends on; a
  * nondeterministic plan (unstable sort, float accumulation order,
  * impure expression) fails here by name instead of as a once-in-N
  * hash flake.
  */
class DeterminismSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val probes = Seq(
    "q148_sequence_pack",    // per-shard window cumsum (the r6 flake site)
    "q94_simhash_clusters",  // iterative min-label fixpoint
    "q126_token_surprisal",  // decimal-routed float sums
    "q222_bootstrap_ci",     // md5-deterministic Poisson bootstrap
    "q221_ttr_budget",       // threshold + rank-window sample
    "q243_threshold_sweep")  // blocked pair frame reused across buckets

  test("representative queries are value-identical across reruns") {
    probes.foreach { name =>
      def run(): Seq[String] =
        Queries.all(name)(spark, sfDir).collect().toSeq.map(_.toString)
      val a = run()
      graft.ops.Dedup.releaseCaches()
      val b = run()
      graft.ops.Dedup.releaseCaches()
      assert(a == b, s"$name diverged between two runs")
      assert(a.nonEmpty, s"$name probe must bind")
    }
  }
}
