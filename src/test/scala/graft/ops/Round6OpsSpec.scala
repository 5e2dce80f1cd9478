package graft.ops

import graft.{Queries, SparkSpec}
import org.apache.spark.sql.functions._

/** Round-6 additions: cluster-native winnowing (star edges → min-label
  * components) and the star-edge transform itself — the invariants
  * behind q145 and the retirement of q132's quadratic pair emission.
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  // ------------------------------------------------- starEdges

  test("star edges: linear in bucket size, component-preserving") {
    // one bucket of 5 members, one of 2, one singleton
    val m = Seq(
      (10L, "A"), (11L, "A"), (12L, "A"), (13L, "A"), (14L, "A"),
      (20L, "B"), (21L, "B"),
      (30L, "C")).toDF("id", "fp")
    val edges = Dedup.starEdges(m).as[(Long, Long)].collect().toSet
    // 5-bucket emits 4 edges (not C(5,2)=10), 2-bucket 1, singleton 0
    assert(edges == Set((11L, 10L), (12L, 10L), (13L, 10L), (14L, 10L),
      (21L, 20L)))
  }

  test("star edges bridge buckets transitively through shared members") {
    // doc 2 is in buckets A and B: components must merge {1,2,3}
    val m = Seq((1L, "A"), (2L, "A"), (2L, "B"), (3L, "B")).toDF("id", "fp")
    val labels = Dedup.clusters(Dedup.starEdges(m))
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // ------------------------------------------------- winnowClusters

  test("winnow clusters: components equal the pairwise formulation's") {
    // the star-edge path must produce exactly the connected components of
    // the minShared=1 pair graph on real corpus text (native hash both
    // sides, so the fingerprints are identical)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val viaStars = Dedup.winnowClusters(docs)
      .as[(Long, Long)].collect().toMap
    val pairs = Dedup.winnowOverlapPairs(docs, minShared = 1)
      .select($"id1", $"id2")
    val viaPairs = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(viaStars == viaPairs)
  }

  test("winnow clusters: planted shared run clusters docs together") {
    val shared = "the quick brown fox jumps over lazy dogs"  // 40 chars
    val rows = Seq(
      (1L, s"completely unrelated preamble text here $shared and a tail"),
      (2L, s"$shared with some other trailing content entirely different"),
      (3L, s"yet another carrier of $shared embedded midway through text"),
      (4L, "no overlap with anything else in this tiny corpus at all ok"))
      .toDF("doc_id", "text")
    val labels = Dedup.winnowClusters(rows).as[(Long, Long)].collect().toMap
    assert(labels.get(1L).contains(1L) && labels.get(2L).contains(1L) &&
      labels.get(3L).contains(1L), s"planted cluster missed: $labels")
    assert(!labels.contains(4L), "no-overlap doc must not appear")
  }

  test("q145 gate query returns one labeled row per clustered doc") {
    val out = Queries.winnowClustersQ(spark, sfDir)
    assert(out.columns.toSeq == Seq("doc_id", "cluster_id"))
    val n = out.count()
    val nDistinct = out.select($"doc_id").distinct().count()
    assert(n == nDistinct, "doc_id must be unique")
    val badLabel = out.filter($"cluster_id" > $"doc_id").count()
    assert(badLabel == 0, "cluster_id is a min — never above the member id")
  }
}
