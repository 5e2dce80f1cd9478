package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("backward as-of: greatest right time <= left time, per key") {
    val left = Seq(
      (1L, 100L, ts(10)), // after r@05 → matches 05
      (2L, 100L, ts(20)), // after r@15 → matches 15
      (3L, 100L, ts(1)),  // before any right → null
      (4L, 200L, ts(30))  // other key, right@30 equal ts → inclusive match
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, ts(5), 50L),
      (100L, ts(15), 51L),
      (200L, ts(30), 52L)
    ).toDF("k", "t", "rid")

    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t",
      Seq("rid"), tiebreak = Some("rid"))
      .orderBy("id")
      .select("id", "asof_rid")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(out.toSeq == Seq(
      (1L, Some(50L)), (2L, Some(51L)), (3L, None), (4L, Some(52L))))
  }

  test("equal-timestamp right rows: tiebreak picks the largest") {
    val left = Seq((1L, 9L, ts(10))).toDF("id", "k", "t")
    val right = Seq((9L, ts(10), 1L), (9L, ts(10), 7L), (9L, ts(10), 3L))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t",
      Seq("rid"), tiebreak = Some("rid")).select("asof_rid").as[Long].head()
    assert(out == 7L)
  }

  test("binned range join == naive range join (keyed and pure-range)") {
    import org.apache.spark.sql.functions._
    val n = 300
    val ev = (1 to n).map(i =>
      (i.toLong, i % 5L, new java.sql.Timestamp(1700000000000L + i * 97000L)))
      .toDF("event_id", "user_id", "ts")
    val naive = ev.as("l").join(ev.as("r"),
        col("l.user_id") === col("r.user_id") &&
        col("r.ts") > col("l.ts") &&
        unix_millis(col("r.ts")) <= unix_millis(col("l.ts")) + 600000L)
      .select(col("l.event_id"), col("r.event_id"))
      .as[(Long, Long)].collect().toSet
    val binned = RangeJoin.binned(ev, ev, "user_id", "ts", 600000L,
        leftCols = Seq("event_id"), rightCols = Seq("event_id"))
      .select(col("l_event_id"), col("r_event_id"))
      .as[(Long, Long)].collect().toSet
    assert(binned == naive && naive.nonEmpty)

    // pure range join: constant key — binning alone bounds the pairs
    val evK = ev.withColumn("one", lit(1))
    val pureNaive = ev.as("l").join(ev.as("r"),
        col("r.ts") > col("l.ts") &&
        unix_millis(col("r.ts")) <= unix_millis(col("l.ts")) + 200000L)
      .select(col("l.event_id"), col("r.event_id"))
      .as[(Long, Long)].collect().toSet
    val pureBinned = RangeJoin.binned(evK, evK, "one", "ts", 200000L,
        leftCols = Seq("event_id"), rightCols = Seq("event_id"))
      .select(col("l_event_id"), col("r_event_id"))
      .as[(Long, Long)].collect().toSet
    assert(pureBinned == pureNaive && pureNaive.nonEmpty)
  }

  test("kmeansCentroids converge toward separated blobs; codebook stays k") {
    // two tight blobs around +1 and -1 in every dimension
    val vecs = (0 until 60).map { i =>
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array.tabulate(4)(d =>
        sign * (1.0f + ((i * 31 + d * 7) % 10) / 100.0f)))
    }.toDF("vec_id", "embedding")
    val cents = SimSearch.kmeansCentroids(vecs, k = 2, iterations = 4)
    assert(cents.length == 2)
    // each refined centroid sits inside one blob (all components same sign,
    // magnitude ~1), and the two centroids take opposite signs
    val signs = cents.map { case (_, v) =>
      assert(v.forall(x => math.abs(x) > 0.9 && math.abs(x) < 1.2), v.toSeq)
      assert(v.forall(_ > 0) || v.forall(_ < 0), v.toSeq)
      v(0) > 0
    }
    assert(signs.toSet == Set(true, false))
    // a k-means codebook drops into ivfTopK unchanged
    val out = SimSearch.ivfTopK(vecs.filter($"vec_id" >= 5),
      vecs.filter($"vec_id" < 2), k = 3, cents, nprobe = 2)
    assert(out.count() > 0)
  }

  test("ivfTopK agrees with brute force when probing enough cells") {
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 17 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val corpus = vecs.filter($"vec_id" >= 5)
    val queries = vecs.filter($"vec_id" < 2)
    val cents = SimSearch.sampledCentroids(corpus, k = 4)
    val brute = SimSearch.bruteForceTopK(corpus, queries, k = 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    // probe ALL cells → identical to brute force
    val ivfAll = SimSearch.ivfTopK(corpus, queries, k = 3, cents,
      nprobe = cents.length)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(ivfAll == brute)
    // probe 1 cell → a subset of candidates, still correctly ranked
    val ivf1 = SimSearch.ivfTopK(corpus, queries, k = 3, cents, nprobe = 1)
      .select("rank").as[Int].collect().toSeq
    assert(ivf1.nonEmpty && ivf1.forall(_ <= 3))
  }
}
