package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Streaming corpus ingest with dedup screening — the ingest-time form of
  * the q117 batch screen: documents arrive as a stream, and each
  * micro-batch is admitted only if it is BOTH exact-new (content
  * fingerprint unseen) and near-new (outside Hamming radius 8 of every
  * corpus simhash), measured against the corpus accumulated so far.
  *
  * Scale shape per micro-batch (inherited from `Dedup.incrementalNew`):
  * every join is keyed on (chunk, value) or the fingerprint, all outputs
  * are bounded by the BATCH, and the corpus side streams once through the
  * narrow fingerprint projection — nothing scales with corpus × corpus.
  * On a cluster the corpus fingerprint table would be a maintained index
  * (written alongside the corpus) rather than re-derived per batch; the
  * foreachBatch body is the portable form.
  */
object CorpusStreams {

  /** Start the screening sink: admitted docs (exact_new AND near_new,
    * within-batch dups collapsed to their first doc_id) append to
    * `corpusDir`; every screened doc is recorded in `auditDir` with its
    * flags — the lineage trail a training-data pipeline owes its audits.
    */
  def screeningSink(docs: DataFrame, corpusDir: String, auditDir: String,
                    checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        // within-batch exact dedup first: keep the min doc_id per content
        val fresh = Dedup.byFingerprint(batch).filter(!col("is_duplicate"))
          .drop("fp", "keeper_id", "is_duplicate")
        val flags =
          try {
            val corpus = s.read.parquet(corpusDir)
            Dedup.incrementalNew(corpus, fresh)
          } catch {
            case _: org.apache.spark.sql.AnalysisException =>
              // empty corpus: everything is new
              fresh.select(col("doc_id").as("id"), lit(true).as("exact_new"),
                lit(true).as("near_new"))
          }
        // ORDER MATTERS: the audit must be written BEFORE the corpus
        // append — appending to corpusDir invalidates every cached frame
        // over that path (Spark recache-by-path), so a lazy re-evaluation
        // of `flags` afterwards would screen the batch against a corpus
        // that already contains it and mark its own docs as duplicates
        val audited = flags.withColumn("batch_id", lit(batchId))
        audited.write.mode(SaveMode.Append).parquet(auditDir)
        val admitted = fresh.join(
          s.read.parquet(auditDir)
            .filter(col("batch_id") === batchId &&
              col("exact_new") && col("near_new"))
            .select(col("id").as("doc_id")), Seq("doc_id"), "left_semi")
        admitted.write.mode(SaveMode.Append).parquet(corpusDir)
        Dedup.releaseCaches()
        ()
      }
      .start()
}
