package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-7 hardening specs — the VERDICT/ADVICE r6 items that want a
  * targeted assert rather than (or in addition to) the oracle hash:
  *  - q182's decile cut points pinned to the explicit order-statistic
  *    definition (smallest value with CDF ≥ q, i.e. the ceil(q·n)-th
  *    sorted value) so a percentile_disc convention drift on either
  *    engine is caught by name, not by an opaque hash mismatch;
  *  - the reliable-checkpoint path proven value-identical on FULL
  *    oracle-gated queries (q160 BFS, q143 PageRank), not just on toy
  *    frames — closing the "spec-gated only" gap;
  *  - the max-basket guard exercised with a planted jumbo basket;
  *  - q181's single-source corpus guard (0 drift, not NaN).
  */
class Round7OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q182: decile cuts are the ceil(q*n)-th order statistic") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the query's recrawled corpus: every 50th doc appears twice
    val recr = docs.select(col("n_chars"))
      .unionByName(docs.filter(col("doc_id") % 50 === 0).select(col("n_chars")))
    val sorted = recr.collect().map(_.getLong(0)).sorted
    val n = sorted.length.toLong
    val cuts = recr.agg(
      expr("percentile_disc(0.1) WITHIN GROUP (ORDER BY n_chars)").as("c1"),
      (2 to 9).map(k =>
        expr(s"percentile_disc(0.$k) WITHIN GROUP (ORDER BY n_chars)")
          .as(s"c$k")): _*).head()
    for (k <- 1 to 9) {
      // smallest value with CDF >= k/10  ==  x(ceil(k*n/10)), 1-indexed;
      // exact integer ceil — a double could flip at integer boundaries.
      // Spark's percentile_disc emits DOUBLE; n_chars << 2^53 so the
      // data value round-trips exactly.
      val idx = ((k * n + 9) / 10).toInt
      assert(cuts.getAs[Double](s"c$k") == sorted(idx - 1).toDouble,
        s"c$k: got ${cuts.getAs[Double](s"c$k")}, " +
          s"order statistic ${sorted(idx - 1)} at rank $idx of $n")
    }
  }

  test("reliable checkpoint: q160/q143 full queries value-identical") {
    val s = spark
    def run(name: String): Seq[String] =
      graft.Queries.all(name)(s, sfDir).collect().toSeq.map(_.toString).sorted
    val localBfs = run("q160_bfs_levels")
    val localPr = run("q143_copurchase_rank")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_r7_ckpt")
    val hadDir = s.sparkContext.getCheckpointDir
    s.sparkContext.setCheckpointDir(ckptDir.toString)
    s.conf.set(Lineage.ReliableConfKey, "true")
    try {
      assert(run("q160_bfs_levels") == localBfs)
      assert(run("q143_copurchase_rank") == localPr)
      // the iterated state actually landed in the reliable dir
      val wrote = java.nio.file.Files.walk(ckptDir)
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "reliable mode must write to the checkpoint dir")
    } finally {
      s.conf.unset(Lineage.ReliableConfKey)
      // restore EXACTLY the prior state — setCheckpointDir(null) unsets
      // (Option(null) = None), so later suites that assert the
      // no-checkpoint-dir fail-fast path see a clean context
      s.sparkContext.setCheckpointDir(hadDir.orNull)
    }
  }

  test("co-occurrence max-basket guard clips a planted jumbo basket") {
    import spark.implicits._
    val sane = (1 to 3).map(p => (2L, p.toLong))
    val jumbo = (1 to 100).map(p => (1L, 1000L + p))
    val items = (sane ++ jumbo).toDF("okey", "pk")
    val edges = Graph.coOccurrenceEdges(items, "okey", "pk", maxBasket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // jumbo basket capped at its 10 smallest parts: 10*9 directed pairs
    val jumboEdges = edges.filter(_._1 >= 1000L)
    assert(jumboEdges.length == 10 * 9)
    // deterministic keep-set: the 10 smallest part ids
    assert(jumboEdges.map(_._1).toSet == (1001L to 1010L).toSet)
    // sane basket untouched
    assert(edges.count(_._1 < 1000L) == 3 * 2)
    val clipped = Graph.clippedGroups(items, "okey", "pk", maxBasket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(clipped.toSeq == Seq((1L, 100L)))
  }

  test("q181: single-source corpus reports 0 drift, not NaN") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val oneSource = docs.withColumn("source", lit("only"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_r7_ks")
    try {
      oneSource.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val rows = graft.Queries.all("q181_ks_drift")(spark, tmp.toString).collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[String]("source") == "only")
      assert(rows.head.getAs[Double]("ks") == 0.0)
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(tmp.toFile)
    }
  }
}
