package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Aggregators
import graft.functions.Aggregators.MGState

/** Property specs for the round-6c operator family (q171–q179), pinning
  * the invariants the oracle gate cannot express directly:
  *  - the Misra–Gries MERGE guarantee (superset of true heavy hitters
  *    under adversarial partitioning and merge order),
  *  - PQ assignment == a brute-force Scala reference argmin,
  *  - quantile normalization equalizes per-source marginals.
  */
class Round6cOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // ------------------------------------------------------- Misra–Gries

  /** Reference fold of a stream through a k-counter MG summary. */
  private def mgFold(k: Int, items: Seq[String]): MGState =
    items.foldLeft(new Aggregators.MisraGries(k).zero) { (b, w) =>
      new Aggregators.MisraGries(k).reduce(b, w)
    }

  test("Misra-Gries: candidates are a superset of true > N/k items " +
    "under every partitioning and merge order") {
    val k = 16
    val agg = new Aggregators.MisraGries(k)
    // skewed synthetic stream: item i appears (i+1)*12 times, plus noise
    // (N ≈ 1136, N/k ≈ 71 → the six heaviest items MUST survive)
    val rng = new scala.util.Random(42)
    val heavyStream = (0 until 12).flatMap(i => Seq.fill((i + 1) * 12)(s"h$i"))
    val noise = (0 until 200).map(i => s"n${rng.nextInt(150)}")
    val stream = rng.shuffle(heavyStream ++ noise)
    val n = stream.size
    val trueCounts = stream.groupBy(identity).map { case (w, ws) => w -> ws.size }
    val mustSurvive = trueCounts.filter(_._2 > n / k).keySet
    assert(mustSurvive.nonEmpty, "fixture must have heavy items")
    // adversarial partitionings: 1, 2, 3, 7 slices; both merge directions
    for (slices <- Seq(1, 2, 3, 7)) {
      val parts = stream.grouped(math.max(1, n / slices)).toSeq
      val partials = parts.map(p => mgFold(k, p))
      val mergedLtr = partials.reduce(agg.merge)
      val mergedRtl = partials.reverse.reduce(agg.merge)
      for (m <- Seq(mergedLtr, mergedRtl)) {
        val cands = agg.finish(m).split(" ").toSet
        assert(mustSurvive.subsetOf(cands),
          s"slices=$slices lost ${mustSurvive -- cands}")
        assert(m.counts.size <= k, s"state exceeded k: ${m.counts.size}")
      }
    }
  }

  test("Misra-Gries: q173 final output equals the exact heavy-hitter set") {
    val out = graft.Queries.all("q173_heavy_hitters")(spark, sfDir).collect()
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.ops.TextStats.tokens(lower(col("text")))).as("w"))
    val n = toks.count()
    val exact = toks.groupBy("w").count()
      .filter(col("count") * 200 > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(_.getString(0)).toSet == exact.keySet)
    out.foreach(r => assert(exact(r.getString(0)) == r.getLong(1)))
  }

  // ------------------------------------------------ product quantization

  test("PQ assignment matches a brute-force reference argmin") {
    val rows = graft.Queries.all("q175_product_quantize")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // Scala reference: quantize, slice, argmin with (dist, code) tie-break
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map { f =>
        // HALF_UP away from zero, matching Spark/DuckDB round (JVM
        // math.round rounds -x.5 UP toward +inf — wrong for negatives)
        val v = f.toDouble * 1000
        if (v < 0) -math.round(-v) else math.round(v)
      })
      .sortBy(_._1)
    val codebook = vecs.take(16).map(_._2)
    val cells = scala.collection.mutable.Map.empty[(Int, Int), (Long, Long)]
    for ((_, qv) <- vecs; m <- 0 until 4) {
      val (d, c) = codebook.zipWithIndex.map { case (cb, ci) =>
        var acc = 0L
        var i = 0
        while (i < 16) {
          val diff = qv(m * 16 + i) - cb(m * 16 + i)
          acc += diff * diff
          i += 1
        }
        (acc, ci)
      }.min
      val (n0, e0) = cells.getOrElse((m, c), (0L, 0L))
      cells((m, c)) = (n0 + 1, e0 + d)
    }
    assert(rows.keySet == cells.keySet)
    rows.foreach { case (key, (nv, err)) =>
      assert(cells(key) == ((nv, err)), s"cell $key")
    }
  }

  // ---------------------------------------------- quantile normalization

  test("quantile normalization equalizes per-source marginals") {
    // after mapping, every source's normalized mean must sit within the
    // global score envelope, and per-source means must be closer to the
    // global mean than the raw means are on aggregate (the calibration
    // property; exact equality of marginals needs equal group sizes)
    val out = graft.Queries.all("q178_quantile_norm")(spark, sfDir).collect()
    val rawMeans = out.map(_.getDouble(2))
    val normMeans = out.map(_.getDouble(3))
    val gRaw = rawMeans.sum / rawMeans.length
    def spread(xs: Array[Double]) = xs.map(x => math.abs(x - gRaw)).sum
    assert(spread(normMeans) <= spread(rawMeans) * 1.05,
      s"normalization widened the cross-source spread: " +
        s"${spread(normMeans)} vs ${spread(rawMeans)}")
  }

  // --------------------------------------------------- split leakage

  test("split leakage counters are internally consistent") {
    val r = graft.Queries.all("q179_split_leakage")(spark, sfDir).head()
    val (clusters, leaky, leakyDocs) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(clusters > 0, "planted re-crawl must create dup clusters")
    assert(leaky <= clusters)
    assert(leakyDocs >= 2 * leaky, "a leaky cluster has >= 2 docs")
  }
}
