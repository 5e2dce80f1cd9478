package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-4 additions: multiprobe LSH, md5-based oracle-checkable simhash,
  * cluster-native simhash dedup, and the recall-gate invariants behind the
  * re-pointed q21/q22/q25/q40 driver queries.
  */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  // ------------------------------------------------- multiprobe LSH

  test("lshTopK probeRadius=planes equals brute force exactly") {
    val corpus = emb.filter($"vec_id" >= 10)
    val queries = emb.filter($"vec_id" < 10)
    val brute = SimSearch.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(_.toSeq).toSet
    val full = SimSearch.lshTopK(corpus, queries, k = 5, planes = 4, probeRadius = 4)
      .collect().map(_.toSeq).toSet
    assert(full == brute)
  }

  test("multiprobe recall is monotone in probeRadius") {
    val corpus = emb.filter($"vec_id" >= 10)
    val queries = emb.filter($"vec_id" < 10)
    val brute = SimSearch.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallAt(radius: Int): Double = {
      val got = SimSearch.lshTopK(corpus, queries, k = 5, planes = 4, probeRadius = radius)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      got.intersect(brute).size.toDouble / brute.size
    }
    val r0 = recallAt(0); val r1 = recallAt(1); val r4 = recallAt(4)
    assert(r0 <= r1 && r1 <= r4, s"recall not monotone: $r0 $r1 $r4")
    assert(r4 == 1.0)
    assert(r1 > r0, "1-bit multiprobe should add candidates on this corpus")
  }

  // ------------------------------------------------- md5 simhash

  test("md5Simhash: 60-bit range, deterministic, null on empty") {
    def fp60 = graft.functions.VectorExpressions.md5_simhash60(
      TextStats.tokens(lower($"text")))
    val got = docs.limit(50).select(fp60.as("fp")).as[Option[Long]].collect()
    assert(got.forall(_.forall(fp => fp >= 0L && fp < (1L << 60))))
    val again = docs.limit(50).select(fp60.as("fp")).as[Option[Long]].collect()
    assert(got.toSeq == again.toSeq)
    val empty = Seq("", "   ").toDF("text")
      .select(fp60.as("fp")).as[Option[Long]].collect()
    assert(empty.forall(_.isEmpty))
  }

  test("native md5_simhash60 is bit-identical to the composed reference") {
    val native = graft.functions.VectorExpressions.md5_simhash60(
      TextStats.tokens(lower($"text")))
    val composed = TextStats.md5Simhash(TextStats.tokens(lower($"text")))
    val diff = docs.limit(100)
      .select(native.as("a"), composed.as("b"))
      .filter(!($"a" <=> $"b")).count()
    assert(diff == 0L)
  }

  test("md5Simhash: near-identical token streams land within small hamming") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = a + " ok" // one extra token
    val df = Seq(a, b).toDF("text")
      .select(graft.functions.VectorExpressions.md5_simhash60(
        TextStats.tokens(lower($"text"))).as("fp"))
    val Array(fa, fb) = df.as[Long].collect()
    assert(java.lang.Long.bitCount(fa ^ fb) <= 12)
  }

  // ------------------------------------------------- simhash machinery

  test("simhashPairs over md5 fingerprints equals brute-force hamming join") {
    val withFp = docs.select($"doc_id".as("id"),
      graft.functions.VectorExpressions.md5_simhash60(
        TextStats.tokens(lower($"text"))).as("fp"))
      .filter($"fp".isNotNull).cache()
    val bucketed = Dedup.simhashPairs(withFp, maxHammingDistance = 8)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    val brute = withFp.as("l").join(withFp.as("r"), $"l.id" < $"r.id")
      .select($"l.id", $"r.id", bit_count($"l.fp".bitwiseXOR($"r.fp")).cast("int"))
      .as[(Long, Long, Int)].collect().filter(_._3 <= 8).toSet
    Dedup.releaseCaches(); withFp.unpersist()
    assert(bucketed == brute)
  }

  test("simhashClusters equals pair-list -> clusters() components") {
    val withFp = docs.select($"doc_id".as("id"),
      graft.functions.VectorExpressions.md5_simhash60(
        TextStats.tokens(lower($"text"))).as("fp"))
      .filter($"fp".isNotNull).cache()
    val pairs = Dedup.simhashPairs(withFp, maxHammingDistance = 8)
    val viaPairs = Dedup.clusters(pairs)
      .select("id", "cluster_id").as[(Long, Long)].collect().toMap
    val native = Dedup.simhashClusters(withFp, maxHammingDistance = 8)
      .select("id", "cluster_id").as[(Long, Long)].collect().toMap
    Dedup.releaseCaches(); withFp.unpersist()
    // native emits every fingerprinted doc; the pair path only members of
    // some pair — on pair members the labels must agree exactly, and
    // non-members must be singletons
    viaPairs.foreach { case (id, cl) =>
      assert(native(id) == cl, s"doc $id: native=${native(id)} pairs=$cl")
    }
    native.foreach { case (id, cl) =>
      if (!viaPairs.contains(id)) assert(cl == id, s"singleton $id got $cl")
    }
  }

  // ------------------------------------------------- q21 recall-gate shape

  test("minhash banding output is a subset of the exact shingle-Jaccard pairs") {
    val sh = array_distinct(Dedup.wordShingles($"text", 3))
    val base = docs.select($"doc_id".as("id"), sh.as("sh"))
      .filter(size($"sh") > 0).cache()
    val exact = base.as("l").join(broadcast(base.as("r")), $"l.id" < $"r.id")
      .withColumn("j", size(array_intersect($"l.sh", $"r.sh")).cast("double") /
        size(array_union($"l.sh", $"r.sh")).cast("double"))
      .filter($"j" >= 0.7)
      .select($"l.id", $"r.id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDuplicates(docs, "text", "doc_id",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.7,
      useWordShingles = true)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    Dedup.releaseCaches(); base.unpersist()
    assert(lsh.subsetOf(exact), "banding emitted a pair the exact set lacks")
    // and on this corpus the banding recall is total (the q21 gate claim)
    assert(lsh == exact)
  }
}
