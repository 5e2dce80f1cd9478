package graft
import org.apache.spark.sql.SparkSession
/** Scratch driver for verifying the SQL extension surface. */
object ExtDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    spark.sql("""
      SELECT a.vec_id, b.vec_id AS nid,
             round(cosine_similarity(a.embedding, b.embedding), 4) AS cos,
             round(dot_product(a.embedding, b.embedding), 2) AS dot
      FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id IN (0, 1)
      ORDER BY nid""").show()
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs")
    spark.sql("""
      SELECT doc_id, simhash64(split(lower(text), '\\s+')) AS sh,
             size(minhash_signature(split(lower(text), '\\s+'), 32)) AS sig
      FROM docs ORDER BY doc_id LIMIT 3""").show()
    try {
      spark.sql("SELECT minhash_signature(array('a'), 1 + 1)").show()
      println("PROBE: non-literal k accepted (constant-folded)")
    } catch { case e: Exception => println(s"PROBE: non-literal k -> ${e.getMessage.take(100)}") }
    spark.stop()
  }
}
