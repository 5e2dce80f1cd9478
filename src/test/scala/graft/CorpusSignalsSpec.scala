package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextStats}

/** q104–q106 corpus-signal queries: ground-truth checks for the repetition
  * metrics, the equal-mix resampling policy, and the novelty identity —
  * beyond the driver's DuckDB hash gate, these pin the SEMANTICS (what the
  * numbers mean) with independently computed expectations.
  */
class CorpusSignalsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("wordBigrams: adjacent pairs in order; empty under 2 tokens") {
    val out = Seq(
      (1L, Seq("a", "b", "b", "c")),
      (2L, Seq("solo")),
      (3L, Seq.empty[String]))
      .toDF("id", "tok")
      .select($"id", TextStats.wordBigrams($"tok").as("bg"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a b", "b b", "b c"))
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("repetitionSignals matches a pure-Scala recompute on sampled docs") {
    val got = Queries.repetitionSignals(spark, sfDir)
      .filter($"doc_id" < 5)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter($"doc_id" < 5)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect().toMap
    texts.foreach { case (id, text) =>
      val tok = text.split("\\s+").filter(_.nonEmpty).toSeq
      val bigrams = tok.sliding(2).map(_.mkString(" ")).toSeq
      val counts = bigrams.groupBy(identity).view.mapValues(_.size)
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (_, nTok, ttr, topF, dupF) = got(id)
      assert(nTok == tok.size)
      assert(ttr == r6(tok.distinct.size.toDouble / tok.size))
      assert(topF == r6(counts.values.max.toDouble / bigrams.size))
      assert(dupF == r6(
        counts.values.filter(_ > 1).sum.toDouble / bigrams.size))
    }
  }

  test("domainMix: rates in (0,1], smallest source keeps everything") {
    val rows = Queries.domainMix(spark, sfDir)
      .select($"source", $"n_docs", $"total_tok", $"rate", $"n_kept", $"kept_tok")
      .as[(String, Long, Long, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, totalTok, rate, nKept, keptTok) =>
      assert(rate > 0.0 && rate <= 1.0, s"$src rate $rate")
      assert(nKept <= nDocs && keptTok <= totalTok, s"$src kept more than it had")
    }
    val minTotal = rows.map(_._3).min
    val smallest = rows.filter(_._3 == minTotal)
    smallest.foreach { case (src, nDocs, totalTok, rate, nKept, keptTok) =>
      assert(rate == 1.0, s"$src is the budget anchor but rate=$rate")
      assert(nKept == nDocs && keptTok == totalTok,
        s"$src at rate 1.0 must keep every doc (u < 1 always)")
    }
  }

  test("signal queries survive an empty corpus (no rows, no crash)") {
    // at 100 TB empty inputs are routine (a partition filter that matches
    // nothing, a new source with no docs yet) — every signal query must
    // degrade to an empty result, not throw
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    spark.read.parquet(s"$sfDir/documents.parquet").limit(0)
      .write.parquet(s"$dir/documents.parquet")
    Seq(Queries.repetitionSignals, Queries.domainMix, Queries.ngramNovelty,
      Queries.weightedQuality)
      .foreach { q =>
        assert(q(spark, dir).count() == 0)
        graft.ops.Dedup.releaseCaches()
      }
  }

  test("signal queries tolerate NULL text (dropped or null-propagated, no crash)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nulls").toString
    spark.read.parquet(s"$sfDir/documents.parquet").limit(10)
      .withColumn("text",
        when($"doc_id" % 3 === 0, lit(null: String)).otherwise($"text"))
      .write.parquet(s"$dir/documents.parquet")
    // null text -> null token array -> the size filter drops the doc on the
    // gram paths; domain-mix keeps the doc (membership is id-hash-based)
    // with a null token count that aggregates skip — same as the SQL twin
    assert(Queries.repetitionSignals(spark, dir).count() > 0)
    assert(Queries.ngramNovelty(spark, dir).count() > 0)
    graft.ops.Dedup.releaseCaches()
    val mix = Queries.domainMix(spark, dir)
      .select($"n_docs", $"n_kept").as[(Long, Long)].collect()
    assert(mix.nonEmpty && mix.forall { case (d, k) => k <= d })
  }

  test("WeightedMean aggregator: exact value, partition-invariant, SQL-reachable") {
    val df = Seq(("a", 0.5, 10L), ("a", 0.25, 30L), ("b", 1.0, 5L))
      .toDF("k", "x", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      d.groupBy($"k")
        .agg(graft.functions.Aggregators.weighted_mean($"x", $"w").as("m"))
        .orderBy($"k").as[(String, Double)].collect().toSeq
    val expected = Seq("a" -> (0.5 * 10 + 0.25 * 30) / 40.0, "b" -> 1.0)
    assert(run(df) == expected)
    // decimal buffer => identical under any partitioning / merge order
    assert(run(df.repartition(7)) == expected)
    // SQL path through the session registration
    GraftExtensions.install(spark)
    df.createOrReplaceTempView("wm_in")
    val viaSql = spark.sql(
      "SELECT k, weighted_mean(x, w) AS m FROM wm_in GROUP BY k ORDER BY k")
      .as[(String, Double)].collect().toSeq
    assert(viaSql == expected)
  }

  test("lengthBatches: size cap, non-negative waste, doc conservation") {
    val rows = Queries.lengthBatches(spark, sfDir)
      .select($"batch_size", $"max_tok", $"sum_tok", $"padding_waste")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (sz, mx, sm, waste) =>
      assert(sz >= 1 && sz <= 32)
      assert(waste == mx * sz - sm && waste >= 0)
    }
    // every tokenized doc lands in exactly one batch
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(graft.ops.TextStats.tokenCount(lower($"text")) > 0).count()
    assert(rows.map(_._1).sum == nDocs)
  }

  test("incrementalNew: exact duplicate implies near duplicate; batch-bounded output") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // plant a verbatim copy of a corpus doc in the incoming batch so the
    // exact path is exercised even though the testdata has no exact dups
    val planted = docs.filter($"doc_id" === 1)
      .select(lit(900001L).as("doc_id"), $"text", $"lang", $"source", $"n_chars")
    val incoming = docs.filter($"doc_id" % 10 === 0).unionByName(planted)
    val out = graft.ops.Dedup.incrementalNew(
      corpus = docs.filter($"doc_id" % 10 =!= 0), incoming = incoming)
      .select($"id", $"exact_new", $"near_new")
      .as[(Long, Boolean, Boolean)].collect()
    graft.ops.Dedup.releaseCaches()
    assert(out.length <= incoming.count())
    // the planted copy must be flagged seen on BOTH paths
    val p = out.find(_._1 == 900001L).get
    assert(!p._2 && !p._3, s"planted verbatim copy flagged new: $p")
    // exact dup => hamming 0 => near dup (implication, never violated)
    out.foreach { case (id, exactNew, nearNew) =>
      assert(exactNew || !nearNew, s"doc $id: exact dup but near_new=true")
    }
  }

  test("ngramNovelty: sum of n_unique equals the global df=1 gram count") {
    val out = Queries.ngramNovelty(spark, sfDir)
      .select($"doc_id", $"n_bigrams", $"n_unique", $"novelty")
      .as[(Long, Long, Long, Double)].collect()
    Dedup.releaseCaches()
    out.foreach { case (id, nB, nU, nov) =>
      assert(nU <= nB && nov >= 0.0 && nov <= 1.0, s"doc $id: $nU/$nB $nov")
    }
    // independent ground truth: count bigrams that appear in exactly one doc
    val df1 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", TextStats.tokens(lower($"text")).as("tok"))
      .filter(size($"tok") >= 2)
      .select($"doc_id",
        explode(array_distinct(TextStats.wordBigrams($"tok"))).as("bigram"))
      .groupBy($"bigram").agg(count(lit(1)).as("df"))
      .filter($"df" === 1).count()
    assert(out.map(_._3).sum == df1)
  }

  test("event transitions: rows partition the step stream; p sums to 1") {
    val rows = Queries.eventTransitions(spark, sfDir)
      .as[(String, String, Long, Double)].collect()
    val events = spark.read.parquet(s"$sfDir/events.parquet").count()
    val users = spark.read.parquet(s"$sfDir/events.parquet")
      .select($"user_id").distinct().count()
    // every event except each user's last contributes exactly one step
    assert(rows.map(_._3).sum == events - users)
    rows.groupBy(_._1).values.foreach { g =>
      val p = g.map(_._4).sum
      assert(math.abs(p - 1.0) < 1e-4, s"p sums to $p for ${g.head._1}")
    }
  }

  test("corpus datasheet: entropy and means match a Scala recompute") {
    val r = Queries.corpusDatasheet(spark, sfDir).collect().head
    Dedup.releaseCaches()
    val langs = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy($"lang").count().as[(String, Long)].collect()
    val tot = langs.map(_._2).sum.toDouble
    val ent = langs.map { case (_, c) =>
      BigDecimal(-math.log(c / tot) * c / tot)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(r.getAs[Long]("n_docs") == tot.toLong)
    assert(r.getAs[Long]("n_langs") == langs.length)
    assert(math.abs(r.getAs[Double]("lang_entropy") - ent) < 1e-7)
    val q = r.getAs[Double]("mean_quality")
    assert(q > 0.0 && q <= 1.0)
  }

  test("MAD outliers: median/MAD match a Scala recompute per source") {
    val got = Queries.madOutliers(spark, sfDir)
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    Dedup.releaseCaches()
    val scored = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"source", TextStats.qualityScore($"text").as("q"))
      .as[(String, Double)].collect().groupBy(_._1)
    scored.foreach { case (src, rows) =>
      val qs = rows.map(_._2).sorted
      val med = qs((qs.length + 1) / 2 - 1) // lower median, rank ⌈n/2⌉
      val ads = qs.map(q => math.abs(q - med)).sorted
      val mad = ads((ads.length + 1) / 2 - 1)
      val (_, n, gm, gmad, nOut) = got(src)
      assert(n == qs.length && gm == med && gmad == mad)
      assert(nOut == ads.count(_ > 3 * mad))
    }
  }

  test("cross-source overlap: hashed-gram jaccard equals a set recompute") {
    val got = Queries.crossSourceOverlap(spark, sfDir)
      .as[(String, String, Long, Long, Long, Double)].collect()
    Dedup.releaseCaches()
    assert(got.length >= 2 && got.exists(_._5 > 0))
    // recompute ONE pair (the most-overlapping) from raw text 13-grams:
    // the md5-hashed path must agree exactly (no collisions on this corpus)
    val top = got.maxBy(_._5)
    val sets = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter($"source".isin(top._1, top._2) && length($"text") >= 13)
      .select($"source", $"text").as[(String, String)].collect()
      .groupBy(_._1).map { case (s0, ds) =>
        s0 -> ds.flatMap(d => d._2.sliding(13)).toSet
      }
    val (a, b) = (sets(top._1), sets(top._2))
    assert(top._3 == a.size && top._4 == b.size)
    assert(top._5 == (a & b).size)
    got.foreach { r =>
      assert(r._6 >= 0.0 && r._6 <= 1.0 && r._5 <= math.min(r._3, r._4))
    }
  }

  test("source divergence: KL is non-negative and totals partition grams") {
    val got = Queries.sourceDivergence(spark, sfDir)
      .as[(String, Long, Double)].collect()
    Dedup.releaseCaches()
    // Gibbs: KL >= 0 for full-support smoothed models; the 8-place
    // per-term rounding can dip the sum at most 1024 * 5e-9 below zero
    got.foreach { case (src, ng, kl) =>
      assert(kl > -1e-5, s"$src kl=$kl")
      assert(ng > 0)
    }
    val totalBigrams = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(TextStats.tokens(lower($"text")).as("tok"))
      .filter(size($"tok") >= 2)
      .agg(sum(size($"tok") - 1)).as[Long].head()
    assert(got.map(_._2).sum == totalBigrams)
  }

  test("time to convert: quartiles are ordered data values") {
    val r = Queries.timeToConvert(spark, sfDir).collect().head
    val (p25, p50, p75) = (r.getAs[Long]("p25_us"),
      r.getAs[Long]("p50_us"), r.getAs[Long]("p75_us"))
    assert(p25 <= p50 && p50 <= p75 && p25 >= 0)
    assert(r.getAs[Long]("n_users") > 0)
    assert(r.getAs[Double]("mean_s") > 0.0)
  }

  test("DSIR weights rank the target slice above the rest of the corpus") {
    // target = English: English docs must score higher log-importance on
    // average than non-English — the whole point of importance weighting
    val langs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"lang")
    val w = Queries.dsirWeights(spark, sfDir).join(langs, Seq("doc_id"))
      .select($"lang" === "en", $"dsir_logw")
      .as[(Boolean, Double)].collect()
    Dedup.releaseCaches()
    val en = w.filter(_._1).map(_._2)
    val rest = w.filter(!_._1).map(_._2)
    assert(en.nonEmpty && rest.nonEmpty)
    assert(en.sum / en.length > rest.sum / rest.length,
      s"en mean ${en.sum / en.length} !> rest mean ${rest.sum / rest.length}")
  }
}
