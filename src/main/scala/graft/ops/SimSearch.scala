package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** North-star approximate-nearest-neighbor search over an embedding column
  * (`embeddings.embedding: array<float>`, FIXTURES.md §B).
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k. The query set is broadcast
  *    (small by construction); the corpus side streams through a single
  *    narrow map + per-query top-k — no corpus shuffle at any scale.
  *  - `lshTopK`: sign-random-projection LSH (Charikar '02). Corpus is
  *    bucketed by the sign pattern of `planes` fixed pseudo-random
  *    hyperplanes; each query probes only its own bucket (+ optional
  *    1-bit-flip multiprobe). At 100 TB this turns a full scan per query
  *    into a bucket lookup; the bucket id is computable at write time and
  *    usable as a partition key.
  *
  * Hyperplanes are derived deterministically from a hash of (plane, dim) —
  * no RNG state, reproducible across runs and executors.
  */
object SimSearch {

  /** Deterministic pseudo-random hyperplane component in [-1, 1). */
  private def planeComponent(plane: Int, dim: Column): Column =
    (conv(substring(md5(concat_ws(":", lit(plane), dim).cast("binary")), 1, 8), 16, 10)
      .cast("double") / lit(math.pow(2, 31)) - lit(1.0))

  /** Sign-random-projection bucket id: bit j = sign of <v, plane_j>. */
  def signBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vec, transform(sequence(lit(0), size(vec) - 1),
          d => planeComponent(p, d)), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** Exact cosine top-k for each query row against the corpus.
    * `queries` must be small (it is broadcast). Output one row per
    * (query, rank): rank 1..k by descending similarity, id tiebreak.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("score", VectorExpressions.cosine_similarity(col("qv"), col("cv")))
      .filter(col("score").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
  }

  /** LSH-bucketed ANN top-k: candidates share the query's bucket; exact
    * cosine re-rank within the bucket. Recall/cost tuned via `planes`.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      signBucket(col(vecCol), planes).as("bkt"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      signBucket(col(vecCol), planes).as("bkt"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bkt"))
      .withColumn("score", VectorExpressions.cosine_similarity(col("qv"), col("cv")))
      .filter(col("score").isNotNull)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
  }

  /** Per-vector L2 norm in double (deterministic in-order fold). */
  def l2Norm(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** IVF-style ANN: a small deterministic centroid set (collected to the
    * driver and broadcast as literals — the coarse quantizer is tiny by
    * construction, like any IVF codebook), every vector assigned to its
    * nearest centroid, and each query probing only its `nprobe` closest
    * cells. At 100 TB the cell id is computable at write time and becomes
    * the partition key, so a query touches nprobe partitions, not the
    * corpus.
    *
    * Centroid choice here is "every strideth vector" — deterministic and
    * seedless; a k-means codebook drops in without changing the plan.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              centroids: Array[(Long, Array[Float])], nprobe: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty && nprobe >= 1)
    val centLits = centroids.map { case (cid, v) =>
      struct(lit(cid).as("cid"),
        array(v.map(x => lit(x)).toIndexedSeq: _*).as("cv"))
    }

    def cellScores(vec: Column): Column = sort_array(
      array(centLits.map(c => struct(
        VectorExpressions.cosine_similarity(vec, c.getField("cv")).as("score"),
        c.getField("cid").as("cid"))).toIndexedSeq: _*), asc = false)

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      cellScores(col(vecCol)).getItem(0).getField("cid").as("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(slice(cellScores(col(vecCol)), 1, nprobe)).as("probe"))
      .select(col("query_id"), col("qv"), col("probe.cid").as("cell"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("cell"))
      .withColumn("score", VectorExpressions.cosine_similarity(col("qv"), col("cv")))
      .filter(col("score").isNotNull)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
  }

  /** Deterministic stride-sampled centroids for [[ivfTopK]]. */
  def strideCentroids(corpus: DataFrame, stride: Int,
                      idCol: String = "vec_id", vecCol: String = "embedding")
      : Array[(Long, Array[Float])] =
    corpus.filter(col(idCol) % stride === 0)
      .select(col(idCol), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
}
