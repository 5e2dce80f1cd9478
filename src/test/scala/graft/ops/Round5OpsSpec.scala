package graft.ops

import graft.{Queries, SparkSpec}
import org.apache.spark.sql.functions._

/** Round-5 additions: passage-level exact dedup, temperature mixture
  * weighting, stratified splits, RAG chunking, vocabulary stats, and
  * histogram-exact winsorization — the invariants behind q118–q123.
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  // ------------------------------------------------- q118 passage dedup

  test("passage dedup conserves the distinct-fingerprint count") {
    val out = Queries.passageDedup(spark, sfDir)
    val keptTotal = out.agg(sum($"n_kept")).as[Long].head()
    // ground truth recomputed independently: one survivor per distinct
    // 20-token passage string across the corpus
    val distinctPassages = docs
      .select($"doc_id", TextStats.tokens($"text").as("tok"))
      .filter(size($"tok") > 0)
      .select(posexplode(transform(
        sequence(lit(0), expr("CAST((size(tok) + 19) div 20 AS INT)") - 1),
        w => array_join(slice($"tok", w * 20 + 1, lit(20)), " "))))
      .select($"col").distinct().count()
    assert(keptTotal == distinctPassages)
    val bad = out.filter($"n_kept" > $"n_passages" || $"n_kept" < 0).count()
    assert(bad == 0)
  }

  test("passage dedup: a verbatim duplicate document keeps nothing") {
    val a = Seq((1L, Seq.fill(3)("alpha beta gamma delta epsilon zeta eta " +
      "theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon")
      .mkString(" ")))
    val dup = (a :+ (2L, a.head._2)).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_pd").toString
    dup.write.parquet(s"$tmp/documents.parquet")
    val out = Queries.passageDedup(spark, tmp).collect()
    // doc 1 keeps exactly one passage (its 3 windows are identical); doc 2
    // (a byte-copy) keeps zero and therefore vanishes from the output
    assert(out.length == 1)
    assert(out.head.getAs[Long]("doc_id") == 1L)
    assert(out.head.getAs[Long]("n_kept") == 1L)
    assert(out.head.getAs[Long]("n_passages") == 3L)
  }

  // ------------------------------------------------- q119 temperature mix

  test("temperature mix: shares sum to 1 and upsampling is monotone") {
    val rows = Queries.temperatureMix(spark, sfDir)
      .select($"p_data", $"p_sample", $"repeat_factor")
      .as[(Double, Double, Double)].collect()
    assert(math.abs(rows.map(_._1).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
    // α < 1 flattens the distribution: smaller p_data ⇒ larger repeat factor
    val sorted = rows.sortBy(_._1)
    val factors = sorted.map(_._3)
    assert(factors.zip(factors.tail).forall { case (a, b) => a >= b },
      s"repeat factors not monotone non-increasing in p: ${factors.toSeq}")
    // the largest source is downsampled (<1), the smallest upsampled (>1)
    assert(factors.head > 1.0 && factors.last < 1.0)
  }

  // ------------------------------------------------- q120 stratified split

  test("stratified split partitions the corpus with stable membership") {
    val out = Queries.stratifiedSplit(spark, sfDir)
    assert(out.agg(sum($"n_docs")).as[Long].head() == docs.count())
    val splits = out.select($"split").distinct().as[String].collect().toSet
    assert(splits == Set("train", "val", "test"))
    // ~90% of docs land in train overall (md5-uniform, so ±5% slack at sf0.001)
    val byName = out.groupBy($"split").agg(sum($"n_docs").as("n"))
      .as[(String, Long)].collect().toMap
    val frac = byName("train").toDouble / docs.count()
    assert(frac > 0.85 && frac < 0.95, s"train fraction $frac")
  }

  // ------------------------------------------------- q121 rag chunks

  test("rag chunks tile every document: stride 48, full coverage, ragged tail") {
    val out = Queries.ragChunks(spark, sfDir)
    // starts follow chunk_id * 48 + 1 exactly
    assert(out.filter($"start_tok" =!= $"chunk_id" * 48 + 1).count() == 0)
    assert(out.filter($"len_tok" < 1 || $"len_tok" > 64).count() == 0)
    // the last chunk of each doc ends at the doc's token count
    val lens = docs.select($"doc_id",
      size(TextStats.tokens($"text")).cast("long").as("n_tok"))
      .filter($"n_tok" > 0)
    val lastEnd = out.groupBy($"doc_id")
      .agg(max($"start_tok" + $"len_tok" - 1).as("end_tok"),
        count(lit(1)).as("n_chunks"))
    val joined = lastEnd.join(lens, "doc_id")
    assert(joined.filter($"end_tok" =!= $"n_tok").count() == 0)
    // chunk count matches the closed form
    val wrong = joined.filter($"n_chunks" =!=
      when($"n_tok" <= 64, lit(1L))
        .otherwise(expr("CAST((n_tok - 17) div 48 AS BIGINT) + 1"))).count()
    assert(wrong == 0)
  }

  // ------------------------------------------------- q122 vocab growth

  test("vocab growth: vocabulary bounds and hapax containment") {
    val rows = Queries.vocabGrowth(spark, sfDir)
      .select($"total_tok", $"vocab", $"hapax", $"ttr", $"top_share")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (tot, vocab, hapax, ttr, top) =>
      assert(vocab <= tot && hapax <= vocab)
      assert(ttr > 0.0 && ttr <= 1.0)
      assert(top > 0.0 && top <= 1.0)
    }
  }

  // ------------------------------------------------- q123 winsorize

  test("winsorize: bounds are order statistics and clip counts respect ranks") {
    val rows = Queries.winsorizeQuality(spark, sfDir)
      .select($"n_docs", $"p05", $"p95", $"mean_q", $"mean_q_wins",
        $"n_clipped_lo", $"n_clipped_hi")
      .as[(Long, Double, Double, Double, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, lo, hi, _, mw, nLo, nHi) =>
      assert(lo <= hi)
      assert(mw >= lo - 1e-9 && mw <= hi + 1e-9)
      // strictly-below-p05 rows number fewer than rank ceil(0.05 n); same
      // above p95 by symmetry of the rank definition
      assert(nLo < (n * 5 + 99) / 100, s"n_clipped_lo=$nLo n=$n")
      assert(nHi <= n - (n * 95 + 99) / 100, s"n_clipped_hi=$nHi n=$n")
    }
  }

  // ------------------------------------------------- q126 surprisal

  test("surprisal: positive, bounded by ln(corpus), token-conserving") {
    val toks = docs.select(explode(TextStats.tokens(lower($"text"))).as("t"))
    val total = toks.count()
    val out = Queries.tokenSurprisal(spark, sfDir)
    assert(out.agg(sum($"n_tok")).as[Long].head() == total)
    val maxS = math.log(total.toDouble) + 1e-6 // hapax bound: −ln(1/total)
    val bad = out.filter($"avg_surprisal" <= 0.0 || $"avg_surprisal" > maxS).count()
    assert(bad == 0)
    // a doc of only hapax tokens would hit the bound; the corpus mean must
    // sit strictly inside (sanity that the model isn't degenerate)
    val mean = out.agg(avg($"avg_surprisal")).as[Double].head()
    assert(mean > 0.0 && mean < maxS)
  }

  // ------------------------------------------------- q127 snapshot diff

  test("snapshot diff statuses partition the union of snapshots") {
    val out = Queries.snapshotDiff(spark, sfDir)
      .groupBy($"status").agg(sum($"n_docs").as("n")).as[(String, Long)]
      .collect().toMap
    assert(out.getOrElse("added", 0L) ==
      docs.filter($"doc_id" % 7 === 0 && $"doc_id" % 5 =!= 0).count())
    assert(out.getOrElse("removed", 0L) ==
      docs.filter($"doc_id" % 7 =!= 0 && $"doc_id" % 5 === 0).count())
    // changed = revised ids present in both snapshots
    assert(out.getOrElse("changed", 0L) ==
      docs.filter($"doc_id" % 7 =!= 0 && $"doc_id" % 5 =!= 0 &&
        $"doc_id" % 11 === 0).count())
    // the four statuses partition the union of the two snapshots
    assert(out.values.sum ==
      docs.filter($"doc_id" % 7 =!= 0 || $"doc_id" % 5 =!= 0).count())
  }

  // ------------------------------------------------- q128 fuzzy match

  test("fuzzy match: every part with a same-block distinct name gets its NN") {
    val out = Queries.fuzzyBlockedMatch(spark, sfDir)
    val rows = out.select($"p_partkey", $"nn_dist", $"nn_id")
      .as[(Long, Int, Long)].collect()
    assert(rows.nonEmpty)
    // names differ, so no distance-0 self matches; threshold respected
    assert(rows.forall { case (_, d, _) => d >= 1 && d <= 4 })
    // NN is symmetric in candidacy: the matched id must itself be a part
    val ids = spark.read.parquet(s"$sfDir/part.parquet")
      .select($"p_partkey").as[Long].collect().toSet
    assert(rows.forall { case (id, _, nn) => ids.contains(nn) && nn != id })
  }

  // ------------------------------------------------- q129 BPE

  test("BPE merges: monotone frequencies, distinct pairs, prefix-stable") {
    val m6 = Queries.bpeMerges(spark, sfDir)
      .as[(Int, String, Long)].collect().toSeq
    assert(m6.size == 6)
    assert(m6.map(_._1) == (1 to 6))
    // merging pair P of count f can only create pairs of count <= f and
    // only shrink others, so the chosen max is non-increasing per round
    val freqs = m6.map(_._3)
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b },
      s"merge freqs not monotone: $freqs")
    assert(m6.map(_._2).distinct.size == 6, "a pair merged twice")
    assert(m6.forall(_._3 > 0))
    // fewer rounds yield a prefix of the same table (the chain is causal)
    val m3 = Bpe.merges(
      spark.read.parquet(s"$sfDir/documents.parquet"), "text", rounds = 3)
      .as[(Int, String, Long)].collect().toSeq
    assert(m3 == m6.take(3))
  }

  // ------------------------------------------------- q130 Zipf

  test("zipf slope: negative (frequency decreases in rank) per lang") {
    val rows = Queries.zipfSlope(spark, sfDir)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nVocab, slope) =>
      assert(nVocab > 1, s"$lang vocab too small")
      assert(slope < 0.0, s"$lang slope $slope should be negative")
    }
  }

  // ------------------------------------------------- q132 winnowing

  test("winnowing guarantee: a planted shared run >= k+w-1 chars is detected") {
    // two otherwise-different docs share one 40-char run (> 20+8-1=27):
    // winnowing MUST select at least one fingerprint inside the run for
    // both docs (the paper's detection guarantee), so the pair surfaces
    val shared = "the quick brown fox jumps over lazy dogs"  // 40 chars
    val a = (1L, s"completely unrelated preamble text here $shared and a tail")
    val b = (2L, s"$shared with some other trailing content entirely different")
    val c = (3L, "no overlap with anything else in this tiny corpus at all ok")
    val tmp = java.nio.file.Files.createTempDirectory("graft_win").toString
    Seq(a, b, c).toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val pairs = Queries.winnowOverlap(spark, tmp)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"planted overlap missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "no-overlap doc must not pair")
  }

  test("winnowing samples ~2/(w+1) of the gram index") {
    val K = 20; val W = 8
    val g = docs.filter(length($"text") >= K + W - 1)
      .select($"doc_id", (length($"text") - (K - 1)).cast("long").as("n_grams"))
    val totalGrams = g.agg(sum($"n_grams")).as[Long].head()
    // recompute the sampled-set size via the query's own machinery: count
    // distinct fingerprints per doc through the public query at this dir
    // is awkward; instead assert the density bound on a direct rebuild
    val fps = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(length($"text") >= K + W - 1)
      .select($"doc_id",
        transform(sequence(lit(1), length($"text") - (K - 1)),
          i => conv(substring(md5($"text".substr(i, lit(K)).cast("binary")),
            1, 15), 16, 10).cast("long")).as("h"))
      .select($"doc_id", explode(array_distinct(
        transform(sequence(lit(1), size($"h") - (W - 1)),
          j => array_min(slice($"h", j, lit(W)))))).as("fp"))
      .count()
    val density = fps.toDouble / totalGrams
    // expected 2/(w+1) ≈ 0.22 for random hashes; distinct-collapse pulls
    // it lower on repetitive text — assert well under 1 and over 1/w²
    assert(density < 0.5, s"sampling not sparse: $density")
    assert(density > 1.0 / (W * W), s"suspiciously sparse: $density")
  }

  // ------------------------------------------------- q133 funnel

  test("curation funnel: monotone stages, splits partition the survivors") {
    val byStage = Queries.curationFunnel(spark, sfDir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val funnel = Seq("1_raw", "2_dedup", "3_decontam", "4_quality", "5_length")
      .map(byStage(_))
    funnel.zip(funnel.tail).foreach { case ((na, ta), (nb, tb)) =>
      assert(na >= nb && ta >= tb, s"funnel not monotone: $funnel")
    }
    val (n5, t5) = byStage("5_length")
    val splits = Seq("6_train", "7_val", "8_test").map(byStage(_))
    assert(splits.map(_._1).sum == n5 && splits.map(_._2).sum == t5,
      "splits must partition the final survivors")
  }

  // ------------------------------------------------- q134 BPE encode

  test("BPE encode: compression is bounded and monotone in merge rounds") {
    val enc6 = Bpe.encodeSymbols(docs, "text", rounds = 6)
      .agg(sum($"n_sym")).as[Long].head()
    val enc3 = Bpe.encodeSymbols(docs, "text", rounds = 3)
      .agg(sum($"n_sym")).as[Long].head()
    val chars = docs
      .select(explode(TextStats.tokens(lower($"text"))).as("w")).distinct()
      .agg(sum(length($"w"))).as[Long].head()
    // each merge round can only shrink vocab symbol mass, never grow it
    assert(enc6 <= enc3 && enc3 <= chars, s"$enc6 <= $enc3 <= $chars")
    assert(enc6 < chars, "6 merges should compress this corpus")
  }

  // ------------------------------------------------- q135 SCD2

  test("SCD2: intervals chain, one open row per user, no consecutive repeats") {
    val rows = Queries.scd2History(spark, sfDir)
      .select($"user_id", $"event_type", $"valid_from", $"valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3))))
      .groupBy(_._1)
    rows.foreach { case (u, hist0) =>
      val hist = hist0.sortBy(_._3.getTime)
      // exactly one open interval, and it is the last
      assert(hist.count(_._4.isEmpty) == 1, s"user $u open rows != 1")
      assert(hist.last._4.isEmpty, s"user $u open row not last")
      // closed intervals chain: valid_to == next valid_from
      hist.zip(hist.tail).foreach { case (a, b) =>
        assert(a._4.contains(b._3), s"user $u gap: ${a._4} -> ${b._3}")
        assert(a._2 != b._2, s"user $u consecutive repeat ${a._2}")
      }
    }
  }

  // ------------------------------------------------- q136 forget keys

  test("deletion propagation: cascade conserves rows and respects FKs") {
    val rows = Queries.forgetKeys(spark, sfDir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // kept + deleted = table total, per table
    assert(rows("1_customer")._1 + rows("1_customer")._2 == cust.count())
    assert(rows("2_orders")._1 + rows("2_orders")._2 == orders.count())
    assert(rows("3_lineitem")._1 + rows("3_lineitem")._2 == li.count())
    // the cascade deletes at least one row per level on this keyset
    assert(rows("1_customer")._2 > 0)
    // orders of deleted customers are deleted; lineitems of deleted orders
    // are deleted (FK direction: no orphaned children survive)
    val keys = cust.filter($"c_custkey" % 97 === 0).select($"c_custkey")
    val expOrders = orders.join(keys,
      orders("o_custkey") === keys("c_custkey"), "left_semi").count()
    assert(rows("2_orders")._2 == expOrders)
  }

  test("winsorize: clipping at exact p0/p100 is the identity") {
    // degenerate check on a single-lang frame: with every value inside
    // [lo, hi], the winsorized mean equals the raw mean
    val out = Queries.winsorizeQuality(spark, sfDir)
    val same = out.filter($"n_clipped_lo" === 0 && $"n_clipped_hi" === 0)
      .filter($"mean_q" =!= $"mean_q_wins").count()
    assert(same == 0)
  }
}
