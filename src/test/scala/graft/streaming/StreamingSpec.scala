package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  import EventStreams._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowedCounts over a MemoryStream: per-hour counts and sums") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = windowedCounts(input.toDF(), "1 hour", "2 hours")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      input.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(20), 2, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .orderBy("event_type")
        .select("event_type", "n_events", "total_value")
        .as[(String, Long, Double)].collect().toSeq
      assert(rows == Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("windowedCounts works identically on a batch frame") {
    val batch = Seq(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0)).toDF()
    val out = windowedCounts(batch).select("event_type", "n_events")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("click", 2L)))
  }

  test("CorpusStreams.screenBatch is idempotent under batch redelivery") {
    val root = java.nio.file.Files.createTempDirectory("graft_retry").toString
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val tB = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
    val batch0 = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
    CorpusStreams.screenBatch(batch0, 0L, s"$root/corpus", s"$root/audit")
    // redeliver the SAME batch id (foreachBatch at-least-once): neither
    // the audit rows nor the corpus docs may duplicate
    CorpusStreams.screenBatch(batch0, 0L, s"$root/corpus", s"$root/audit")
    val corpus = spark.read.parquet(s"$root/corpus")
      .select("doc_id").as[Long].collect().toSeq
    assert(corpus.sorted == Seq(1L, 2L), s"corpus duplicated: $corpus")
    val audit = spark.read.parquet(s"$root/audit")
      .select("id").as[Long].collect().toSeq
    assert(audit.sorted == Seq(1L, 2L), s"audit duplicated: $audit")
    // a genuinely new batch still flows through after the retry
    CorpusStreams.screenBatch(
      Seq((3L, "completely different content about ships and sealing " +
        "wax and cabbages and kings and why the sea is boiling hot"))
        .toDF("doc_id", "text"),
      1L, s"$root/corpus", s"$root/audit")
    val corpus2 = spark.read.parquet(s"$root/corpus")
      .select("doc_id").as[Long].collect().toSeq
    assert(corpus2.sorted == Seq(1L, 2L, 3L))
  }

  test("CorpusStreams.screeningSink: cross-batch exact and near dups rejected") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_screen").toString
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = CorpusStreams.screeningSink(docs, s"$root/corpus",
      s"$root/audit", s"$root/ck")
    try {
      val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
      val tB = "one two three four five six seven eight nine ten eleven " +
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
      input.addData((1L, tA), (2L, tB), (3L, tA)) // 3 = within-batch dup of 1
      q.processAllAvailable()
      input.addData(
        (4L, tA),                 // exact dup of corpus doc 1
        (5L, tB + " twenty"),     // near dup of corpus doc 2 (small edit)
        (6L, "completely different content about ships and sealing wax " +
          "and cabbages and kings and why the sea is boiling hot"))
      q.processAllAvailable()
      val corpus = spark.read.parquet(s"$root/corpus")
        .select("doc_id").as[Long].collect().toSet
      assert(corpus == Set(1L, 2L, 6L), s"admitted: $corpus")
      val audit = spark.read.parquet(s"$root/audit")
        .select("id", "exact_new", "near_new")
        .as[(Long, Boolean, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // doc 4: exact dup (and near, by implication); doc 5: exact-new but
      // near-seen; doc 6: fully new
      assert(audit(4L) == ((false, false)))
      assert(audit(5L) == ((true, false)))
      assert(audit(6L) == ((true, true)))
    } finally q.stop()
  }

  test("dedupedStream drops within-watermark duplicates, keeps distinct keys") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val out = EventStreams.dedupedStream(input.toDF(), Seq("user_id", "event_type"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 1, "click", 2.0), // dup key within watermark
        Event(3, ts(2), 1, "view", 3.0),
        Event(4, ts(3), 2, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_out")
        .select("user_id", "event_type").as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "click"), (1L, "view"), (2L, "click")))
      assert(spark.table("dedup_out").count() == 3)
    } finally q.stop()
  }

  test("stream-stream join within time band: bounded-state attribution") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val joined = EventStreams.joinWithinWindow(
      clicks.toDF(), buys.toDF(), joinWindow = "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("join_out").start()
    try {
      clicks.addData(Event(1, ts(0), 7, "click", 0.0),
        Event(2, ts(0), 8, "click", 0.0))
      buys.addData(
        Event(10, ts(5), 7, "buy", 9.5),   // within 10 min of click 1
        Event(11, ts(30), 7, "buy", 1.0),  // outside the band
        Event(12, ts(4), 9, "buy", 2.0))   // no matching click user
      q.processAllAvailable()
      val rows = spark.table("join_out")
        .select("user_id", "l_id", "r_id", "value")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(rows == Set((7L, 1L, 10L, 9.5)))
    } finally q.stop()
  }

  test("idempotentAppendSink: re-delivered ids never duplicate in the target") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("upsert").toString
    val input = MemoryStream[Event]
    val q = EventStreams.idempotentAppendSink(
      input.toDF(), s"$root/target", s"$root/ckpt")
    try {
      input.addData(Event(1, ts(1), 1, "a", 1.0), Event(2, ts(2), 1, "b", 2.0))
      q.processAllAvailable()
      // second batch re-delivers id 2 and adds id 3
      input.addData(Event(2, ts(2), 1, "b", 2.0), Event(3, ts(3), 2, "c", 3.0))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$root/target")
        .select("event_id").as[Long].collect().toSeq.sorted
      assert(got == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("file-source stream -> parquet sink with AvailableNow (production shape)") {
    val root = java.nio.file.Files.createTempDirectory("fstream").toString
    val in = Seq(
      Event(1, ts(1), 1, "a", 1.0), Event(2, ts(2), 1, "b", 2.0),
      Event(3, ts(3), 2, "c", 3.0))
    in.toDF().write.parquet(s"$root/in")
    val stream = spark.readStream
      .schema(in.toDF().schema)
      .parquet(s"$root/in")
    val q = stream
      .writeStream
      .format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(60000))
      val got = spark.read.parquet(s"$root/out")
        .select("event_id").as[Long].collect().toSeq.sorted
      assert(got == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionize closes a session after the inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = sessionize(input.toDS(), gapMs = 10 * 60 * 1000L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // burst at 10:00-10:05, then silence; late batch advances the
      // watermark past the timeout so the session closes.
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0))
      q.processAllAvailable()
      input.addData(Event(9, Timestamp.valueOf("2024-01-01 14:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(10, Timestamp.valueOf("2024-01-01 15:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .filter(col("user_id") === 1)
        .select("n_events", "total_value").as[(Long, Double)].collect().toSeq
      assert(rows == Seq((2L, 3.0)))
    } finally q.stop()
  }

  test("q293 left-outer stream-stream join: unmatched views flushed " +
    "by the watermark, matched gaps inside the 2h band") {
    val sfDir = "/root/testdata/sf0.001"
    val out = graft.Queries.all("q293_stream_outer_join")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    // outer semantics actually exercised: some view never converts
    assert(out.exists(_.getAs[Long]("n_unconverted") > 0L),
      "no unmatched views emitted — the gate degenerated to q208")
    out.foreach { r =>
      val pairs = r.getAs[Long]("n_pairs")
      if (pairs == 0L) assert(r.isNullAt(r.fieldIndex("sum_gap_us")))
      else {
        val g = r.getAs[Long]("sum_gap_us")
        assert(g > 0L && g <= pairs * 2L * 3600L * 1000000L,
          s"gap sum $g outside (0, pairs*2h] for $r")
      }
    }
    // completeness: per-user unmatched views == the batch count of
    // views with no purchase in (ts, ts+2h] — null emission lost nothing
    val ev = graft.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "purchase"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val want = v.join(p, col("user_id") === col("pu")
        && col("pts") > col("vts")
        && col("pts") <= col("vts") + expr("INTERVAL 2 HOURS"), "left_outer")
      .groupBy("user_id")
      .agg(sum(when(col("pts").isNull, 1L).otherwise(0L)).as("n"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n"))
      .toMap
    val got = out
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_unconverted"))
      .toMap
    assert(got === want)
  }
}
