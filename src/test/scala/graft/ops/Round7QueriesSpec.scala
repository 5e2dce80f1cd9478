package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-7 additions (q186–q190) — semantic invariants the oracle hash
  * can't name: sketch error bounds, containment planted-superset
  * behavior, calibration variance, histogram mass conservation, and the
  * exact-fp collapse inside simhashClusters.
  */
class Round7QueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q186: sampled stratum is a subset audit with the q180 schema") {
    val rows = graft.Queries.all("q186_detector_agreement_sampled")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val verdicts = rows.map(_.getAs[String]("verdict")).toSet
    assert(verdicts.subsetOf(Set("both", "jaccard_only", "simhash_only")))
    // the stratum is ≤ corpus: pair counts cannot exceed the full audit's
    val full = graft.Queries.all("q180_detector_agreement")(spark, sfDir)
      .collect().map(r => r.getAs[String]("verdict") -> r.getAs[Long]("n_pairs"))
      .toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") <= full(r.getAs[String]("verdict")))
    }
  }

  test("q187: HLL estimate lands within the m=64 error regime") {
    val rows = graft.Queries.all("q187_hll_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val est = r.getAs[Double]("est_distinct")
      // 1.04/sqrt(64) = 13% std error; 4 sigma plus raw-estimate bias
      // headroom (no small-range correction is applied, by design)
      assert(math.abs(est - exact) / exact < 0.60,
        s"${r.getAs[String]("source")}: est $est vs exact $exact")
      assert(r.getAs[Long]("n_regs") <= 64L)
    }
  }

  test("q188: containment flags a planted strict substring") {
    import spark.implicits._
    val long = "The quick brown fox jumps over the lazy dog while " +
      "seventeen astronomers catalogue variable stars beyond the veil " +
      "of the northern winter sky every clear evening this year."
    val sub = long.substring(20, 150)
    val docs = Seq(
      (1L, long, "en", "a", long.length.toLong),
      (2L, sub, "en", "a", sub.length.toLong),
      (3L, "completely unrelated text that shares no thirteen-gram " +
        "with either of the planted documents in this tiny fixture corpus",
        "en", "a", 120L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_r7_cont")
    try {
      docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val out = graft.Queries.all("q188_containment_pairs")(spark, tmp.toString)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Double]("containment")))
      // the substring doc is contained in the long doc, not vice versa
      assert(out.exists(p => p._1 == 2L && p._2 == 1L && p._3 == 1.0))
      assert(!out.exists(p => p._1 == 1L && p._2 == 2L))
      assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(tmp.toFile)
    }
  }

  test("q189: estimator errors concentrate per Broder variance") {
    val rows = graft.Queries.all("q189_minhash_calibration")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // Var = J(1-J)/32 <= 1/128 => sigma <= 0.089; |err| < 4 sigma + bucket
    // width means every populated bucket sits within [-4, 3] (width-1/8
    // buckets; bucket b covers [b/8, (b+1)/8))
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= -4 && b <= 3, s"bucket $b out of the variance regime")
      assert(r.getAs[Double]("avg_est") >= 0.0)
      assert(r.getAs[Double]("avg_exact") >= 0.2)
    }
  }

  test("q190: histogram mass equals the fingerprinted corpus") {
    val nFp = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(graft.functions.VectorExpressions.md5_simhash60(
        TextStats.tokens(lower(col("text")))).as("fp"))
      .filter(col("fp").isNotNull).count()
    val rows = graft.Queries.all("q190_cluster_size_histogram")(spark, sfDir)
      .collect()
    val mass = rows.map(r => r.getAs[Long]("n_docs")).sum
    assert(mass == nFp, s"histogram mass $mass != fingerprinted docs $nFp")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
    }
  }

  test("q191: CMS never undercounts; top tokens are exact-ordered") {
    val rows = graft.Queries.all("q191_cms_overcount")(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"${r.getAs[String]("tokn")}: CMS undercounted")
      assert(r.getAs[Long]("est_n") ==
        r.getAs[Long]("exact_n") + r.getAs[Long]("overcount"))
    }
    val exacts = rows.map(_.getAs[Long]("exact_n")).toSeq
    assert(exacts == exacts.sortBy(-_))
  }

  test("q192: KMV union row dominates every per-source sketch") {
    val rows = graft.Queries.all("q192_kmv_distinct")(spark, sfDir).collect()
    val bySource = rows.map(r => r.getAs[String]("source") -> r).toMap
    val union = bySource("__union__")
    bySource.foreach { case (src, r) =>
      assert(r.getAs[Long]("exact_distinct")
        <= union.getAs[Long]("exact_distinct"))
      // union's kth min hash can only be <= any source's (more values)
      assert(union.getAs[Long]("kth_min_hash")
        <= r.getAs[Long]("kth_min_hash"), s"union kth > $src kth")
    }
    assert(rows.length >= 2)
  }

  test("q193: epoch planner conserves the budget within rounding") {
    val rows = graft.Queries.all("q193_epoch_planner")(spark, sfDir).collect()
    val tokTotal = rows.map(_.getAs[Long]("tok_avail")).sum
    val allocTotal = rows.map(_.getAs[Double]("tok_alloc")).sum
    val budget = 4.0 * tokTotal
    // one redistribution round conserves the budget exactly unless the
    // SECOND round would clip again; allow only tiny rounding drift when
    // nothing re-clips (epochs_final <= 4 for unclipped sources here)
    assert(math.abs(allocTotal - budget) / budget < 0.05,
      s"alloc $allocTotal vs budget $budget")
    rows.filter(_.getAs[Boolean]("clipped")).foreach { r =>
      assert(math.abs(r.getAs[Double]("epochs_final") - 4.0) < 1e-9)
    }
  }

  test("q194: streaming dedup counts equal batch distinct counts") {
    val streamed = graft.Queries.all("q194_stream_dedup")(spark, sfDir)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n_unique"))
      .toMap
    val batch = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy(col("source"))
      .agg(countDistinct(md5(col("text").cast("binary"))).as("n"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    assert(streamed == batch)
  }

  test("q195: BM25 scores are positive and rank-ordered") {
    val rows = graft.Queries.all("q195_bm25_topk")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Double]("bm25")).toSeq
    assert(scores.forall(_ > 0.0))
    assert(scores == scores.sortBy(-_))
    rows.foreach(r => assert(r.getAs[Long]("n_terms") <= 3L))
  }

  test("q196: triplet labels — positive same-label, negative cross-label") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = graft.Queries.all("q196_contrastive_triplets")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("vec_id")
      assert(emb(r.getAs[Long]("pos_id")) == emb(a), s"pos label differs for $a")
      assert(emb(r.getAs[Long]("neg_id")) != emb(a), s"neg label equals for $a")
      assert(math.abs(r.getAs[Double]("margin")
        - (r.getAs[Double]("cos_pos") - r.getAs[Double]("cos_neg"))) < 2e-6)
    }
  }

  test("q197: overlap matrix is upper-triangular and non-negative") {
    val rows = graft.Queries.all("q197_kmv_overlap_matrix")(spark, sfDir)
      .collect()
    val nSrc = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source")).distinct().count()
    assert(rows.length == nSrc * (nSrc - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      assert(r.getAs[Double]("est_overlap") >= 0.0)
      assert(r.getAs[Long]("exact_overlap") >= 0L)
      // union of the pair can never estimate below the larger side by
      // more than rounding: the union sketch's kth min <= either side's
      assert(r.getAs[Double]("est_union") + 0.01
        >= math.max(r.getAs[Double]("est_a"), r.getAs[Double]("est_b")))
    }
  }

  test("q198: decay scores are rank-ordered and recency-bounded") {
    val rows = graft.Queries.all("q198_decay_engagement")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sortBy(-_))
    rows.foreach { r =>
      assert(r.getAs[Double]("score") > 0.0)
      // decayed weight <= 1 per event: score can never exceed raw count
      assert(r.getAs[Double]("score") <= r.getAs[Long]("n_events").toDouble)
      assert(r.getAs[Long]("n_events") >= r.getAs[Long]("n_days"))
    }
  }

  test("q199: skew profile — gini in range, hot keys rank-ordered") {
    val rows = graft.Queries.all("q199_join_skew_profile")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4, 5))
    val ns = rows.map(_.getAs[Long]("n")).toSeq
    assert(ns == ns.sortBy(-_))
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"gini $g out of range")
    }
    // cross-check gini against a direct computation from per-key counts
    val perKey = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy(col("o_custkey")).count().collect()
      .map(_.getAs[Long]("count")).sorted
    val n = perKey.length.toLong
    val t = perKey.sum
    val sIdx = perKey.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val expect = 2.0 * sIdx / (n * t).toDouble - (n + 1).toDouble / n
    assert(math.abs(rows.head.getAs[Double]("gini") - expect) < 1e-5)
  }

  test("q200: Benford audit covers digits 1-9 with a proper distribution") {
    val rows = graft.Queries.all("q200_benford_audit")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    val pObs = rows.map(_.getAs[Double]("p_obs")).sum
    assert(math.abs(pObs - 1.0) < 1e-4)
    val pb = rows.map(_.getAs[Double]("p_benford")).toSeq
    assert(pb == pb.sortBy(-_)) // log10(1+1/d) strictly decreasing
    rows.foreach(r => assert(r.getAs[Double]("chi2_term") >= 0.0))
  }

  test("q201: lift matrix is upper-triangular over the type alphabet") {
    val rows = graft.Queries.all("q201_event_lift_matrix")(spark, sfDir)
      .collect()
    val types = graft.Tables.events(spark, sfDir)
      .select(col("event_type")).distinct().count()
    assert(rows.length == types * (types - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      assert(r.getAs[Double]("lift") > 0.0)
      assert(r.getAs[Long]("n_ab") > 0L)
    }
  }

  test("q202: burstiness stats are positive and near-Poisson-scaled") {
    val rows = graft.Queries.all("q202_burstiness_audit")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_us") > 0.0)
      val cv = r.getAs[Double]("cv")
      assert(cv > 0.0 && !cv.isNaN && !cv.isInfinite)
      assert(cv < 10.0, s"cv $cv implausibly bursty for the synth stream")
    }
  }

  test("q203: stream-static enrich counts equal the batch join") {
    val rows = graft.Queries.all("q203_stream_enrich")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("c_nationkey"),
        r.getAs[String]("event_type")) -> r.getAs[Long]("n_events")).toMap
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey"))
    val nCust = cust.agg(max(col("c_custkey"))).head().getLong(0)
    val batch = graft.Tables.events(spark, sfDir)
      .withColumn("c_custkey", col("user_id") % nCust + 1)
      .join(cust, Seq("c_custkey"))
      .groupBy(col("c_nationkey"), col("event_type")).count()
      .collect().map(r => (r.getAs[Long]("c_nationkey"),
        r.getAs[String]("event_type")) -> r.getAs[Long]("count")).toMap
    assert(rows == batch)
  }

  test("simhashClusters: exact-fp collapse preserves components") {
    import spark.implicits._
    // two exact-dup groups bridged by a 1-bit neighbor, plus a singleton:
    // {1,2} share fp A; 3 has fp A^1 (hamming 1 from A); {4,5} share fp B
    // far from A; 6 alone. Components: {1,2,3}, {4,5}, {6}.
    val a = 0x0F0F0F0FL
    val b = 0x7000000000000000L
    val withFp = Seq(
      (1L, a), (2L, a), (3L, a ^ 1L), (4L, b), (5L, b), (6L, 0x123456789AL))
      .toDF("id", "fp")
    val got = Dedup.simhashClusters(withFp, maxHammingDistance = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L))
  }
}
