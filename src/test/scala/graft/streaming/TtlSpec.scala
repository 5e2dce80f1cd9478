package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** q324 harness invariants beyond the DuckDB hash gate — the
  * StateEvolutionSpec-style accept matrix for state TTL:
  *
  * - WITH `TTLConfig(ttl)` and an inter-phase gap > ttl, the user's
  *   phase-1 ValueState is EXPIRED for every phase-2 read: totals
  *   RE-SEED from zero (the eviction the 100 TB long-lived stream
  *   needs).
  * - WITHOUT TTL (the twin, same two-phase restart machinery), state
  *   survives the same gap and totals CONTINUE — proving the re-seed
  *   comes from expiry, not from the restart.
  * - Writes within ONE batch never expire each other (a batch's reads
  *   and writes share a single processing-time timestamp), so phase-1
  *   output is identical across both variants.
  */
class TtlSpec extends SparkSpec {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Two phases on one checkpoint with a wall-clock gap between them;
    * returns all emitted (event_id, cum_n, cum_cents) rows.
    */
  private def runPhases(ttlMs: Long, gapMs: Long): Seq[(Long, Long, Long)] = {
    val src = Files.createTempDirectory("graft_ttl_spec_src")
    val ckpt = Files.createTempDirectory("graft_ttl_spec_ckpt")
    val out = Files.createTempDirectory("graft_ttl_spec_out")
    def slice(i: Int, rows: Seq[(Long, String, Long, String, Double)])
        : Unit = {
      val df = rows.toDF("event_id", "tss", "user_id", "event_type", "value")
        .select(col("event_id"), col("tss").cast("timestamp").as("ts"),
          col("user_id"), col("event_type"), col("value"))
      Staging.stageOne(df, i, src,
        Files.createTempDirectory("graft_ttl_spec_tmp"))
    }
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    try {
      // no maxFilesPerTrigger: one batch per phase (the q324 determinism
      // argument — every phase-1 write shares one batch timestamp)
      def stream = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
          "event_type STRING, value DOUBLE")
        .parquet(src.toString)
        .as[EventStreams.Event]
      def phase(): Unit = {
        val sq = EventStreams.runningTotalsTtl(stream, ttlMs)(spark).toDF()
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) =>
              b.write.mode("append").parquet(out.toString); ()
          }
          .trigger(Trigger.Once()).start() // not AvailableNow: see q324
        sq.awaitTermination()
      }
      slice(0, Seq((1L, "2024-01-01 00:00:01", 7L, "a", 100.0),
        (2L, "2024-01-01 00:00:02", 7L, "a", 300.0)))
      phase()
      Thread.sleep(gapMs)
      slice(1, Seq((3L, "2024-01-01 00:00:03", 7L, "a", 200.0),
        (4L, "2024-01-01 00:00:04", 7L, "a", 50.0)))
      phase()
      spark.read.parquet(out.toString)
        .select(col("event_id"), col("cum_n"), col("cum_cents"))
        .orderBy(col("event_id"))
        .as[(Long, Long, Long)].collect().toSeq
    } finally {
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("ttl: idle state past the horizon re-seeds; the no-TTL twin continues") {
    // gap (2.5 s) > ttl (1 s): phase-1 state expired for phase 2
    val ttl = runPhases(ttlMs = 1000L, gapMs = 2500L)
    assert(ttl == Seq((1L, 1L, 100L), (2L, 2L, 400L), // phase 1: seeds
      (3L, 1L, 200L), (4L, 2L, 250L)), // phase 2: RE-SEEDED from zero
      s"ttl variant: $ttl")
    // same machinery, TTL disabled: totals continue across the gap
    val noTtl = runPhases(ttlMs = 0L, gapMs = 2500L)
    assert(noTtl == Seq((1L, 1L, 100L), (2L, 2L, 400L),
      (3L, 3L, 600L), (4L, 4L, 650L)),
      s"no-ttl twin: $noTtl")
  }

  test("ttl: state written and read under a LONG horizon survives the gap") {
    // ttl (60 s) >> gap (0): totals continue — expiry is the horizon's
    // doing, not a side effect of attaching any TTLConfig at all
    val longTtl = runPhases(ttlMs = 60000L, gapMs = 0L)
    assert(longTtl == Seq((1L, 1L, 100L), (2L, 2L, 400L),
      (3L, 3L, 600L), (4L, 4L, 650L)),
      s"long-ttl variant: $longTtl")
  }
}
