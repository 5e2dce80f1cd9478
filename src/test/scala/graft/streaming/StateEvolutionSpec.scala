package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkSpec

/** q312 harness invariants beyond the DuckDB hash gate — and the
  * documentation the gate's scaladoc promises: WHICH state-schema
  * evolutions the RocksDB store accepts on restart.
  *
  * - Under the AVRO state encoding
  *   (`spark.sql.streaming.stateStore.encodingFormat=avro`), restarting
  *   a transformWithState checkpoint with a processor whose ValueState
  *   ADDS a nullable field succeeds: v1 records decode with the new
  *   field = None, and (n, cents) continue exactly (the recovery proof).
  * - Under the DEFAULT unsaferow encoding, the SAME restart is
  *   REJECTED at query start (state-schema incompatibility), proving
  *   the avro knob is load-bearing, not incidental.
  */
class StateEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val encodingKey = "spark.sql.streaming.stateStore.encodingFormat"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run v1 then (after appending a second slice) v2 on one checkpoint.
    * Returns the v2 phase's output rows. Two events per phase for one
    * user keep the arithmetic obvious.
    */
  private def runPhases(encoding: String): Seq[EventStreams.CumRowV2] = {
    val src = Files.createTempDirectory("graft_evo_spec_src")
    val ckpt = Files.createTempDirectory("graft_evo_spec_ckpt")
    val out1 = Files.createTempDirectory("graft_evo_spec_out1")
    val out = Files.createTempDirectory("graft_evo_spec_out")
    def slice(i: Int, rows: Seq[(Long, String, Long, String, Double)])
        : Unit = {
      val df = rows.toDF("event_id", "tss", "user_id", "event_type", "value")
        .select(col("event_id"), col("tss").cast("timestamp").as("ts"),
          col("user_id"), col("event_type"), col("value"))
      Staging.stageOne(df, i, src,
        Files.createTempDirectory("graft_evo_spec_tmp"))
    }
    val prevProvider = spark.conf.getOption(providerKey)
    val prevEncoding = spark.conf.getOption(encodingKey)
    spark.conf.set(providerKey, rocks)
    spark.conf.set(encodingKey, encoding)
    try {
      def stream = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
          "event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .as[EventStreams.Event]
      slice(0, Seq((1L, "2024-01-01 00:00:01", 7L, "a", 100.0),
        (2L, "2024-01-01 00:00:02", 7L, "a", 300.0)))
      val sq1 = EventStreams.runningTotals(stream)(spark).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch {
          // the batch MUST be consumed: an unexecuted batch never
          // commits its state-store partitions and the run fails
          // STATE_STORE_COMMIT_VALIDATION_FAILED
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           _: Long) =>
            b.write.mode("append").parquet(out1.toString); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      sq1.awaitTermination()
      slice(1, Seq((3L, "2024-01-01 00:00:03", 7L, "a", 200.0),
        (4L, "2024-01-01 00:00:04", 7L, "a", 50.0)))
      val sq2 = EventStreams.runningTotalsV2(stream)(spark).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           _: Long) =>
            b.write.mode("append").parquet(out.toString); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      sq2.awaitTermination()
      spark.read.parquet(out.toString)
        .orderBy(col("event_id"))
        .as[EventStreams.CumRowV2].collect().toSeq
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
      prevEncoding match {
        case Some(p) => spark.conf.set(encodingKey, p)
        case None    => spark.conf.unset(encodingKey)
      }
    }
  }

  test("avro encoding: added nullable state field evolves; totals continue") {
    val rows = runPhases("avro")
    assert(rows.map(_.event_id) === Seq(3L, 4L))
    // (n, cents) CONTINUE from the v1 state (2 events, 400 cents) —
    // a fresh-state restart would emit cum_n = 1, 2
    assert(rows.map(_.cum_n) === Seq(3L, 4L))
    assert(rows.map(_.cum_cents) === Seq(600L, 650L))
    // the NEW field starts from scratch (v1 records decode to None):
    // running max over post-evolution events only
    assert(rows.map(_.max_cents) === Seq(Some(200L), Some(200L)))
  }

  test("unsaferow encoding: the same evolution is rejected at restart") {
    val e = intercept[StreamingQueryException] { runPhases("unsaferow") }
    val msg = (e.getMessage + " " +
      Option(e.getCause).map(_.toString).getOrElse("")).toLowerCase
    assert(msg.contains("schema") || msg.contains("evolution"),
      s"expected a state-schema incompatibility, got: $msg")
  }
}
