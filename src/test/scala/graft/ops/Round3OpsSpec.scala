package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-3 operator family: exact threshold similarity search, token-budget
  * shard packing, char-n-gram contamination units, and the deterministic
  * hash-reservoir property.
  */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- thresholdSearch

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("thresholdSearch finds exactly the vectors within the radius") {
    // batch vector ~ e1; corpus: near-identical, orthogonal, opposite
    val batch = Seq((1L, vec(1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, vec(0.9, 0.1, 0.0)), // cos ~ 0.994
      (11L, vec(0.0, 1.0, 0.0)), // cos 0
      (12L, vec(-1.0, 0.0, 0.0)) // cos -1
    ).toDF("vec_id", "embedding")
    val got = SimSearch.thresholdSearch(corpus, batch, threshold = 0.5)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("thresholdSearch equals brute-force top-k filtered at the threshold") {
    // recall-1.0 claim: against a random-ish corpus the threshold scan
    // returns exactly the pairs brute-force scoring would keep
    val corpus = (0 until 40).map { i =>
      (i.toLong + 100L, vec(math.sin(i * 1.7), math.cos(i * 0.9), math.sin(i * 0.3 + 1)))
    }.toDF("vec_id", "embedding")
    val batch = Seq((1L, vec(0.5, 0.5, 0.7)), (2L, vec(-0.3, 0.8, 0.1)))
      .toDF("vec_id", "embedding")
    val viaThreshold = SimSearch.thresholdSearch(corpus, batch, threshold = 0.8)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    val viaBrute = SimSearch.bruteForceTopK(corpus, batch, k = 40)
      .filter(col("score") >= 0.8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(viaThreshold == viaBrute && viaThreshold.nonEmpty)
  }

  // ------------------------------------------------- packIntoShards

  test("packIntoShards assigns docs to shards by start offset div budget") {
    val docs = Seq(
      ("g", 1L, 3000L), ("g", 2L, 2000L), ("g", 3L, 1500L), ("g", 4L, 4500L),
      ("h", 1L, 5000L) // oversized single doc: own shard, never split
    ).toDF("lang", "doc_id", "toks")
    val got = TextStats.packIntoShards(docs, "lang", "doc_id", col("toks"), 4000L)
      .select("lang", "doc_id", "shard_id")
      .as[(String, Long, Long)].collect().toSet
    // starts g: 0, 3000, 5000, 6500 -> shards 0,0,1,1 ; h: 0 -> 0
    assert(got == Set(("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 1L),
      ("g", 4L, 1L), ("h", 1L, 0L)))
  }

  test("packIntoShards: shard ids are contiguous and docs stay whole") {
    val docs = (1 to 50).map(i => ("g", i.toLong, (i * 37 % 900 + 100).toLong))
      .toDF("lang", "doc_id", "toks")
    val rows = TextStats.packIntoShards(docs, "lang", "doc_id", col("toks"), 1000L)
      .groupBy("shard_id").agg(sum("toks").as("total"))
      .orderBy("shard_id")
      .as[(Long, Long)].collect()
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong)) // contiguous
    // every shard's payload stays below budget + the max doc size (a doc
    // is never split, so the only overshoot is the doc that crosses the line)
    assert(rows.forall(_._2 < 1000L + 999L))
  }

  // ------------------------------------------------- charNgrams

  test("charNgrams emits distinct sliding windows and guards short text") {
    val df = Seq("abcde", "ab", "aaaa").toDF("text")
    val got = df.select(TextStats.charNgrams(col("text"), 3).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("abc", "bcd", "cde"))
    assert(got(1) == Seq.empty) // len < n: empty, not sequence-descend garbage
    assert(got(2) == Seq("aaa")) // distinct collapses repeats
  }

  test("contamination unit: planted 13-gram overlap is detected") {
    val bench = Seq((1L, "here is a very secret eval answer nobody should train on"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (20L, "scraped page containing secret eval answer inside it"), // overlaps
      (21L, "totally unrelated content with zero overlap at all zzz")
    ).toDF("doc_id", "text")
    val bGrams = bench.select(explode(TextStats.charNgrams(col("text"), 13)).as("gram")).distinct()
    val cGrams = corpus.select(col("doc_id"),
      explode(TextStats.charNgrams(col("text"), 13)).as("gram"))
    val hits = cGrams.join(broadcast(bGrams), Seq("gram"))
      .groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(hits.getOrElse(20L, 0L) > 0L)
    assert(!hits.contains(21L))
  }

  // ------------------------------------------------- hash reservoir

  test("hash-reservoir sample: growing the corpus only evicts, never reshuffles") {
    def topK(ids: Seq[Long], k: Int): Seq[Long] = {
      val df = ids.toDF("doc_id")
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("hk"))
        .orderBy(col("hk"), col("doc_id")).limit(k)
      df.select("doc_id").as[Long].collect().toSeq
    }
    val before = topK(1L to 50L, 10)
    val after = topK(1L to 80L, 10)
    // consistent-hash property: survivors keep their relative hash order,
    // and everyone who left was displaced by a lower-hashing newcomer
    val survivors = before.filter(after.contains)
    assert(after.filter(survivors.contains) == survivors)
    val newcomers = after.filterNot(before.contains)
    assert(newcomers.forall(_ > 50L))
    assert(before.size - survivors.size == newcomers.size)
  }
}
