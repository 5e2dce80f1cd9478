package graft.ops


import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking (rsync/LBFS lineage; Muthitacharoen et al.
  * '01): split each document at tokens chosen by CONTENT (hash of the
  * token ≡ 0 mod `mod`), not at fixed offsets, so an insertion reshuffles
  * only the chunk it lands in — every chunk downstream of it re-aligns
  * and keeps its fingerprint. That locality is what makes chunk-level
  * dedup and incremental corpus sync work: day-2's re-crawl shares every
  * untouched chunk with day-1's store.
  *
  * Plan shape (100 TB): one corpus scan → posexplode → per-doc boundary
  * cumsum (window keyed on doc_id — parallel across docs, no global
  * sort) → hash-agg reassembly keyed on (doc_id, chunk_id). Linear in
  * corpus tokens; nothing corpus-wide is ever collected or broadcast.
  */
object Cdc {

  /** Per-document content-defined chunks: (doc_id, chunk_id, fp) where fp
    * is the md5 of the space-joined chunk tokens. Expected chunk length =
    * `mod` tokens. A token is a boundary iff the low 60 bits of its md5
    * are ≡ 0 (mod `mod`); the boundary token CLOSES its chunk.
    */
  def chunks(docs: DataFrame, textCol: String = "text", mod: Int = 8,
      idCol: String = "doc_id", keepCols: Seq[String] = Nil): DataFrame = {
    val carried = keepCols.map(c => max(col(c)).as(c))
    val tok = docs.select(col(idCol) +: keepCols.map(col) :+
      posexplode(TextStats.tokens(lower(col(textCol)))).as(Seq("pos", "t")): _*)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tok
      .withColumn("bd",
        when(conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long")
          % mod === 0, 1L).otherwise(0L))
      .withColumn("chunk_id", coalesce(sum(col("bd")).over(w), lit(0L)))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(md5(array_join(
        expr("transform(array_sort(collect_list(struct(pos, t))), x -> x.t)"),
        " ")).as("fp"), carried: _*)
  }
}
