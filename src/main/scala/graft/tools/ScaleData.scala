package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic corpus augmentation for scaling-curve runs (r3 VERDICT
  * #8: no scale factor above sf0.1 existed, so scale claims beyond it were
  * design-by-argument).
  *
  * Each source document is emitted `copies` times: copy 0 verbatim, copy
  * k > 0 with a short " vk" suffix — so every original near-dup CLUSTER
  * grows ×copies while staying a genuine near-dup cluster (pairwise
  * shingle-Jaccard stays high). That makes pair counts grow
  * QUADRATICALLY in `copies` while docs grow linearly — exactly the
  * stress that separates pair-materializing dedup from cluster-native
  * dedup. Embeddings are likewise replicated with a tiny deterministic
  * per-copy perturbation on one dimension (keeps near-neighbor structure,
  * avoids exact duplicates).
  *
  * Usage: runMain graft.tools.ScaleData [srcDir] [outDir] [copies]
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sfbig")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val bigDocs = docs
      .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("k"))
      .select(
        (col("doc_id") + col("k") * maxId).as("doc_id"),
        when(col("k") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" v"), col("k"))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
    bigDocs.repartition(16).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVec = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    val bigEmb = emb
      .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("k"))
      .select(
        (col("vec_id") + col("k") * maxVec).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + col("k").cast("float") * lit(0.001f))
            .otherwise(x)).as("embedding"))
    bigEmb.repartition(16).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    println(s"""{"docs":${bigDocs.count()},"vecs":${bigEmb.count()},"out":"$out"}""")
    spark.stop()
  }
}
