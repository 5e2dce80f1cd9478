package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q276 harness invariants beyond the DuckDB hash gate: the restart must
  * CONTINUE the existing checkpoint (batchId sequence carries on — a
  * fresh write-ahead log would restart at 0), and the recovered
  * dropDuplicates state must absorb the phase-2 re-delivery (a
  * fresh-state restart would overcount by exactly the re-delivered
  * docs).
  */
class CheckpointResumeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("restart resumes the existing checkpoint and recovered state") {
    val (out, p1Last, p2Last) =
      graft.Queries.checkpointResumeRun(spark, sfDir)
    val got = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // batchId continuity: phase 2 ran at least one batch AND its ids
    // continue phase 1's sequence (recovered WAL, not a new one)
    assert(p1Last >= 0, "phase 1 must complete at least one micro-batch")
    assert(p2Last > p1Last,
      s"phase-2 batchIds must continue phase-1's (p1=$p1Last p2=$p2Last)")

    // state recovery: per-source uniques equal the batch distinct count
    // over the WHOLE corpus — the phase-2 re-delivery (doc_id % 10 == 0,
    // all consumed in phase 1) only collapses via recovered state
    val want = graft.Tables.table(spark, sfDir, "documents")
      .select(col("source"), md5(col("text").cast("binary")).as("fp"))
      .distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)

    // the re-delivery is non-trivial: there ARE doc_id % 10 == 0 docs,
    // so the gate genuinely distinguishes recovered from fresh state
    val redelivered = graft.Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id") % 10 === 0).count()
    assert(redelivered > 0)
  }
}
