package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up (untimed): JVM/codegen/parquet-footer costs land here, not
    // on whichever query happens to run first (VERDICT r1 bench hygiene)
    try { SparkEntry.queries("q01_gold_flagship")(spark, sfDir).count() }
    catch { case _: Throwable => () }
    // Per-query rep-min (r10 verdict #2): six same-code full runs spread
    // ~30% with a DIFFERENT "regressed" set each run — single-shot
    // timings carry accumulated GC/alloc/page-cache drag that reads as
    // regression. SPARK_GRAFT_BENCH_REPS=k (default 1, the driver's
    // cheap mode) runs k FULL PASSES over the catalog and reports each
    // query's MIN across passes. Passes, not back-to-back reps: box
    // noise arrives in multi-minute PHASES (cgroup throttling, kernel
    // background work), and back-to-back reps of one query sit inside
    // the same phase — measured: back-to-back rep-min still left 11.8%
    // median / 50% worst same-code disagreement on the slowest-20,
    // while pass-interleaving puts ~12 minutes between a query's two
    // timings so a phase poisons at most one of them. Default is 2
    // (VERDICT r13 #1): three consecutive rounds of single-pass driver
    // artifacts were noise-dominated (r11 ~2x, r12 ~2.7x, r13 ~8.6x the
    // quiet series) precisely because the official mode ran reps=1 —
    // the artifact must carry its own noise defense, at the cost of one
    // extra catalog pass.
    val reps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    // (time, succeeded) per query per pass. A failed pass's
    // time-to-failure must never enter the rep-min (ADVICE r11 #2: a
    // fast-failing pass would otherwise mask both the failure and the
    // query's real runtime).
    def onePass(): Map[String, (Double, Boolean)] = SparkEntry.queries.map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val t = (System.nanoTime() - t0) / 1e9
        // cache lifecycle: result consumed, release dedup-pinned caches
        // (inside the timed window — the release is part of the query's
        // cost)
        graft.ops.Dedup.releaseCaches()
        name -> (t, ok)
    }
    val passes = (0 until reps).map(_ => onePass())
    // preserve the catalog's iteration order in the emitted map; min is
    // over SUCCESSFUL passes only. All-pass failures are surfaced in
    // `failed` (and fall back to the raw min so the total stays finite
    // and the regression is visible as a named failure, not a timing).
    val results = SparkEntry.queries.map { case (name, _) =>
      val ts = passes.map(_(name))
      val okTimes = ts.filter(_._2).map(_._1)
      name -> (if (okTimes.nonEmpty) okTimes.min else ts.map(_._1).min)
    }
    val failed = SparkEntry.queries.keys.filter { name =>
      passes.forall(p => !p(name)._2)
    }.toSeq
    def f(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Self-describing noise band (VERDICT r11 #7): with reps >= 2, the
    // per-query cross-pass spread (max-min)/min over the slowest-20 IS
    // the run's agreement band — shipping it in the artifact saves the
    // judge re-deriving it from two separate runs.
    val agreement: Option[(Double, Double, Int)] =
      if (reps >= 2) {
        val spreads = results.toSeq.sortBy(-_._2).take(20).flatMap {
          case (name, _) =>
            val ok = passes.map(_(name)).filter(_._2).map(_._1)
            if (ok.size >= 2 && ok.min > 0) Some((ok.max - ok.min) / ok.min)
            else None
        }.sorted
        if (spreads.isEmpty) None
        else Some((spreads(spreads.size / 2), spreads.last, spreads.size))
      } else None
    val agreementJson = agreement.map { case (med, worst, n) =>
      s""","agreement":{"median_pct":${f(med * 100)},"worst_pct":${f(worst * 100)},"n_queries":$n,"reps":$reps}"""
    }.getOrElse("")
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    // Full per-query map goes to a FILE, not stdout: the downstream
    // log-tail capture truncated the 117/139/144-query single-line JSON
    // in rounds 4 and 5 (parsed:null both rounds). Only a compact summary
    // — guaranteed well under 1 KB — is printed, and printed LAST so the
    // tail capture always contains it whole.
    val fullJson = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "BENCH_FULL.json")
    val payload =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$fullJson,"sf":"$sfDir"$agreementJson$failedJson}"""
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outFile),
        payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    // round-stamped copy: BENCH_FULL.json is overwritten every round, so
    // per-query round-over-round diffs died with it (VERDICT r7 #7).
    // Round resolution (r8 advice #3 — the old cwd-only scan stamped r01
    // from any other working directory and a blanket catch hid it):
    // 1. SPARK_GRAFT_ROUND env var, if set;
    // 2. max BENCH_r<N>.json + 1, scanned in the repo root — located by
    //    walking up from cwd to the first directory holding build.sbt —
    //    falling back to cwd only if no repo root is found (and saying so).
    // Failures log to stderr instead of vanishing.
    try {
      val root: java.io.File = {
        var d = new java.io.File(".").getCanonicalFile
        var found: java.io.File = null
        while (d != null && found == null) {
          if (new java.io.File(d, "build.sbt").isFile) found = d
          else d = d.getParentFile
        }
        if (found == null) {
          System.err.println(
            "BENCH: no build.sbt ancestor; stamping round from cwd")
          new java.io.File(".").getCanonicalFile
        } else found
      }
      val round = sys.env.get("SPARK_GRAFT_ROUND").map(_.toInt).getOrElse {
        val re = "BENCH_r(\\d+)\\.json".r
        val dir = root.listFiles()
        (if (dir == null) Array.empty[Int]
          else dir.flatMap(f => re.findFirstMatchIn(f.getName)
            .map(_.group(1).toInt))).foldLeft(0)(math.max) + 1
      }
      java.nio.file.Files.write(
        new java.io.File(root, f"BENCH_FULL_r$round%02d.json").toPath,
        payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"BENCH: round-stamped write failed: $e")
    }
    // Compact final line: slowest-5 only in "queries" (stable schema for
    // the driver), plus the query count and the path to the full map.
    val slowest = results.toSeq.sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    // spark.stop() BEFORE the println: executor/context shutdown logs land
    // ahead of the payload, so (with build.sbt's StdoutOutput+showSuccess
    // settings) the JSON is the very last line of process output — the
    // driver's tail parse sees it first.
    spark.stop()
    println(
      s"""{"metric":"total","value":${f(total)},"unit":"sec","n_queries":${results.size},"queries":$slowest,"queries_file":"$outFile","sf":"$sfDir"$agreementJson$failedJson}""")
  }
}
