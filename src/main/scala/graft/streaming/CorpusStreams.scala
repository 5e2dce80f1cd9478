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
        screenBatch(batch.toDF(), batchId, corpusDir, auditDir)
      }
      .start()

  /** One micro-batch of the screen, IDEMPOTENT under foreachBatch's
    * at-least-once redelivery — public so the retry contract is directly
    * testable outside a streaming query.
    */
  def screenBatch(batch: DataFrame, batchId: Long,
                  corpusDir: String, auditDir: String): Unit = {
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
        // IDEMPOTENCE: foreachBatch is at-least-once — a retried batch id
        // must not duplicate audit rows or corpus docs. The audit append
        // is skipped when this batch_id is already audited (the flags it
        // recorded then are authoritative: re-screening on retry would
        // see the batch's own first-attempt docs in the corpus and flag
        // them duplicates); the corpus append anti-joins away doc_ids a
        // partial first attempt already landed.
        val alreadyAudited =
          try !s.read.parquet(auditDir)
            .filter(col("batch_id") === batchId).isEmpty
          catch { case _: org.apache.spark.sql.AnalysisException => false }
        if (!alreadyAudited) {
          // ORDER MATTERS: the audit must be written BEFORE the corpus
          // append — appending to corpusDir invalidates every cached frame
          // over that path (Spark recache-by-path), so a lazy re-evaluation
          // of `flags` afterwards would screen the batch against a corpus
          // that already contains it and mark its own docs as duplicates
          flags.withColumn("batch_id", lit(batchId))
            .write.mode(SaveMode.Append).parquet(auditDir)
        }
        val passed = fresh.join(
          s.read.parquet(auditDir)
            .filter(col("batch_id") === batchId &&
              col("exact_new") && col("near_new"))
            .select(col("id").as("doc_id")), Seq("doc_id"), "left_semi")
        val admitted =
          try passed.join(s.read.parquet(corpusDir).select(col("doc_id")),
            Seq("doc_id"), "left_anti")
          catch { case _: org.apache.spark.sql.AnalysisException => passed }
        admitted.write.mode(SaveMode.Append).parquet(corpusDir)
        Dedup.releaseCaches()
        ()
  }
}
