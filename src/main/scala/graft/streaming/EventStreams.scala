package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured-Streaming surface (engine extension — the reference is batch
  * only, SURVEY.md §2.8; the `events` testdata table provides the schema).
  *
  * Each transform takes a DataFrame that may be batch OR streaming — the
  * same code path serves both, which is how the engine's batch operators
  * stay reusable in streaming pipelines.
  */
object EventStreams {

  /** Watermarked tumbling-window aggregate: count + value sum per
    * (window, event_type). State is bounded by the watermark.
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, n: Long, value: Double)
  final case class UserSession(user_id: Long, session_start: Timestamp,
                               session_end: Timestamp, n_events: Long,
                               total_value: Double)

  // µs-fidelity Timestamp bridge: java.sql.Timestamp.getTime is MILLIS —
  // session boundaries built from it would truncate the event-time µs the
  // batch oracle keeps. State therefore carries epoch MICROS throughout.
  private def tsToUs(t: Timestamp): Long = {
    val i = t.toInstant; i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
  private def usToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Sessionization with explicit state: a user's session closes after
    * `gapMs` of inactivity (event-time timeout). The canonical
    * `flatMapGroupsWithState` shape for custom streaming state. Session
    * boundaries are exact event-time MICROSECONDS (see tsToUs) so the
    * streamed sessions are value-identical to a batch gaps-and-islands
    * computation over the same events.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
                (implicit spark: SparkSession): Dataset[UserSession] = {
    import spark.implicits._
    val gapUs = gapMs * 1000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId, usToTs(s.start),
              usToTs(s.lastSeen), s.n, s.value))
          } else {
            val sorted = rows.toSeq.sortBy(e => tsToUs(e.ts))
            var closed = List.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = tsToUs(e.ts)
              cur match {
                case Some(s) if t - s.lastSeen <= gapUs =>
                  cur = Some(s.copy(lastSeen = t, n = s.n + 1, value = s.value + e.value))
                case Some(s) =>
                  closed ::= UserSession(userId, usToTs(s.start),
                    usToTs(s.lastSeen), s.n, s.value)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout API is millis; ceil so the µs deadline is never early
              state.setTimeoutTimestamp(Math.floorDiv(s.lastSeen + gapUs + 999L, 1000L))
            }
            closed.reverseIterator
          }
        })
  }

  /** Streaming deduplication with bounded state: duplicates of `keyCols`
    * arriving within the watermark window are dropped; state for keys
    * older than the watermark is evicted automatically — the streaming
    * half of the north-star dedup story (exact dedup at ingest time).
    */
  def dedupedStream(events: DataFrame, keyCols: Seq[String],
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Batch-equivalent of `windowedCounts` for oracle checking: the same
    * hourly bucketing expressed with date_trunc (window() start ==
    * date_trunc for aligned tumbling windows).
    */
  def hourlyCountsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

  /** Stream-stream inner join: right-side events of the same user within
    * `joinWindow` AFTER a left event (click-to-impression attribution
    * shape). Both sides are watermarked and the join condition bounds the
    * time band, so Spark can expire state on both sides — unbounded-state
    * stream joins never survive production.
    */
  def joinWithinWindow(left: DataFrame, right: DataFrame,
                       keyCol: String = "user_id",
                       joinWindow: String = "10 minutes",
                       watermark: String = "30 minutes",
                       joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(keyCol).as("k"), col("ts").as("l_ts"),
        col("event_id").as("l_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col(keyCol).as("rk"), col("ts").as("r_ts"),
        col("event_id").as("r_id"), col("value"))
    l.join(r, col("k") === col("rk") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $joinWindow"),
        joinType)
      // coalesce: under full_outer a right-unmatched row carries its key
      // only in rk (k is null); a no-op for inner/left_outer rows
      .select(coalesce(col("k"), col("rk")).as(keyCol), col("l_id"),
        col("r_id"), col("l_ts"), col("r_ts"), col("value"))
  }

  /** foreachBatch idempotent-append sink: per micro-batch, dedup the batch
    * on `idCol` and append only ids absent from the target — the portable
    * MERGE for streaming onto a plain parquet target (re-delivered batches
    * after a failure do not duplicate rows). At scale the existing-ids
    * read narrows to `idCol` only (column pruning) or a key index table.
    */
  def idempotentAppendSink(events: DataFrame, targetDir: String,
                           checkpointDir: String, idCol: String = "event_id",
                           availableNow: Boolean = false,
                           partitionBy: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val base = events.writeStream
      .option("checkpointLocation", checkpointDir)
    val withTrigger =
      if (availableNow)
        base.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      else base
    withTrigger
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession
        val deduped = batch.dropDuplicates(idCol)
        val fresh =
          try {
            // explicit schema (= the batch's own: the sink only ever
            // appends batch-shaped rows): footer inference re-read a
            // parquet footer on the driver EVERY micro-batch; partition
            // columns still resolve by name from the directory layout
            val existing = s.read.schema(batch.schema).parquet(targetDir)
              .select(col(idCol))
            deduped.join(existing, Seq(idCol), "left_anti")
          } catch { case _: org.apache.spark.sql.AnalysisException => deduped }
        if (partitionBy.nonEmpty) {
          // one task per partition value → exactly ONE file per
          // (micro-batch, partition value) that has fresh rows: the
          // deterministic small-file accretion model the q313 compaction
          // oracle counts (an unrepartitioned write would emit one file
          // per shuffle task per value — a nondeterministic count)
          fresh.repartition(partitionBy.map(col): _*)
            .write.mode(org.apache.spark.sql.SaveMode.Append)
            .partitionBy(partitionBy: _*).parquet(targetDir)
        } else {
          fresh.write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(targetDir)
        }
        ()
      }
      .start()
  }

  // ------------------------------------------------- transformWithState

  final case class CumRow(user_id: Long, event_id: Long, cum_n: Long,
                          cum_cents: Long)
  // NOT private: the ValueState encoder's generated code constructs it
  // reflectively — a private ctor forces the interpreted fallback
  final case class CumState(n: Long, cents: Long)

  /** Per-user running totals on the Spark 4 `transformWithState` API
    * (the StatefulProcessor/ValueState surface that replaces
    * flatMapGroupsWithState; requires the RocksDB state store): every
    * event emits the user's cumulative event count and cent total AFTER
    * that event. Batch rows are folded in exact (event-time µs,
    * event_id) order, so when arrival order is event-time order across
    * batches (the staged-file harness guarantees it) the output is
    * value-identical to a batch cumulative window — which is exactly
    * what the q263 gate hash-checks. `value` must already be WHOLE
    * CENTS (a whole double sums exactly in any order). State per user
    * is one (n, cents) pair — constant, TTL-free here; production
    * attaches a TTLConfig to expire idle users.
    */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, CumRow] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}
    @transient private var state: ValueState[CumState] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[CumState]("cum",
        org.apache.spark.sql.Encoders.product[CumState], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[CumRow] = {
      val sorted = rows.toArray.sortBy(e => (tsToUs(e.ts), e.event_id))
      var st = if (state.exists()) state.get() else CumState(0L, 0L)
      val out = sorted.map { e =>
        st = CumState(st.n + 1, st.cents + math.round(e.value))
        CumRow(key, e.event_id, st.n, st.cents)
      }
      state.update(st)
      out.iterator
    }
  }

  /** Wire [[RunningTotalsProcessor]] over a keyed event stream. */
  def runningTotals(events: Dataset[Event])
                   (implicit spark: SparkSession): Dataset[CumRow] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OM.Append())
  }

  // ----------------------------------------------------- state TTL

  /** [[RunningTotalsProcessor]] with a processing-time state TTL — the
    * one transformWithState state-management surface the other gates
    * leave unexercised (q324): `TTLConfig(ttlMs)` attaches an expiry to
    * every state WRITE, and a read whose batch timestamp has passed the
    * expiry sees no state at all — the user's totals RE-SEED from zero,
    * exactly as if the key had never been seen. This is how a
    * long-lived 100 TB ingest stream stays alive: without TTL,
    * per-key state grows monotonically with the key vocabulary (every
    * user ever seen, forever); with it, idle keys age out and the
    * state store's working set tracks ACTIVE keys only. TTL is
    * processing-time by definition (the knob is "how long since we
    * last wrote this key", not event time), so the q324 harness makes
    * it deterministic by construction: each phase runs as a single
    * micro-batch (one batch timestamp for every write), and the
    * inter-phase wall-clock sleep strictly exceeds the TTL — state
    * written in phase 1 is expired for every phase-2 read, and no
    * intra-phase expiry is possible (a batch's reads and writes share
    * one timestamp). `ttlMs <= 0` disables TTL (the no-TTL twin the
    * gate runs to prove the difference comes from expiry, not from the
    * restart machinery).
    */
  class RunningTotalsTtlProcessor(ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, CumRow] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}
    @transient private var state: ValueState[CumState] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      val ttl =
        if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs))
        else TTLConfig.NONE
      state = getHandle.getValueState[CumState]("cum",
        org.apache.spark.sql.Encoders.product[CumState], ttl)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[CumRow] = {
      val sorted = rows.toArray.sortBy(e => (tsToUs(e.ts), e.event_id))
      var st = if (state.exists()) state.get() else CumState(0L, 0L)
      val out = sorted.map { e =>
        st = CumState(st.n + 1, st.cents + math.round(e.value))
        CumRow(key, e.event_id, st.n, st.cents)
      }
      state.update(st)
      out.iterator
    }
  }

  /** Wire [[RunningTotalsTtlProcessor]] over a keyed event stream.
    * TimeMode.ProcessingTime — TTL needs a processing-time clock.
    */
  def runningTotalsTtl(events: Dataset[Event], ttlMs: Long)
                      (implicit spark: SparkSession): Dataset[CumRow] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsTtlProcessor(ttlMs),
        TimeMode.ProcessingTime(), OM.Append())
  }

  // ------------------------------- state-schema evolution (v2 processor)

  final case class CumRowV2(user_id: Long, event_id: Long, cum_n: Long,
                            cum_cents: Long, max_cents: Option[Long])
  // v2 of CumState: ADDS max_cents. The new field must be NULLABLE
  // (Option) — Avro state-schema evolution fills it with null when the
  // store holds a v1 record; a primitive Long would be rejected as an
  // incompatible evolution (no default).
  final case class CumStateV2(n: Long, cents: Long, maxCents: Option[Long])

  /** Day-2 version of [[RunningTotalsProcessor]]: the SAME state variable
    * ("cum") with an EVOLVED schema — (n, cents) grows a third field,
    * the running max of per-event cents. Restarted on a v1 checkpoint
    * with the Avro state encoding
    * (`spark.sql.streaming.stateStore.encodingFormat=avro`), the store
    * decodes each v1 record against the v2 schema and surfaces
    * maxCents = None; the fold keeps (n, cents) continuing EXACTLY where
    * v1 left off — which is what the q312 gate hash-checks — while
    * max_cents tracks only events seen since the field existed. The
    * default unsaferow encoding rejects this restart outright
    * (STATE_STORE_STATE_SCHEMA_FILES_THRESHOLD / invalid-change errors);
    * Avro encoding is the documented day-2 knob for long-lived streams.
    */
  class RunningTotalsProcessorV2
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, CumRowV2] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig, ValueState}
    @transient private var state: ValueState[CumStateV2] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[CumStateV2]("cum",
        org.apache.spark.sql.Encoders.product[CumStateV2], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[CumRowV2] = {
      val sorted = rows.toArray.sortBy(e => (tsToUs(e.ts), e.event_id))
      var st = if (state.exists()) state.get() else CumStateV2(0L, 0L, None)
      val out = sorted.map { e =>
        val c = math.round(e.value)
        st = CumStateV2(st.n + 1, st.cents + c,
          Some(st.maxCents.fold(c)(m => math.max(m, c))))
        CumRowV2(key, e.event_id, st.n, st.cents, st.maxCents)
      }
      state.update(st)
      out.iterator
    }
  }

  /** Wire [[RunningTotalsProcessorV2]] over a keyed event stream. */
  def runningTotalsV2(events: Dataset[Event])
                     (implicit spark: SparkSession): Dataset[CumRowV2] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessorV2,
        TimeMode.None(), OM.Append())
  }

  // --------------------------- batch-backfill initial-state handoff

  /** [[RunningTotalsProcessor]] that BOOTSTRAPS from batch-computed
    * state: `handleInitialState` seeds each user's (n, cents) from a
    * batch aggregate before the first micro-batch runs, so the stream
    * processes only post-cutover events yet emits totals continuous
    * with the backfilled history — the standard day-0 handoff when a
    * streaming pipeline takes over from a batch one (q315). Keys
    * present only in the initial state hold their seed silently; keys
    * arriving only in the stream start from zero.
    */
  class RunningTotalsFromInitial
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, Event, CumRow, CumState] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[CumState] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[CumState]("cum",
        org.apache.spark.sql.Encoders.product[CumState], TTLConfig.NONE)
    }

    override def handleInitialState(key: Long, initial: CumState,
        timerValues: TimerValues): Unit =
      state.update(initial)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[CumRow] = {
      val sorted = rows.toArray.sortBy(e => (tsToUs(e.ts), e.event_id))
      var st = if (state.exists()) state.get() else CumState(0L, 0L)
      val out = sorted.map { e =>
        st = CumState(st.n + 1, st.cents + math.round(e.value))
        CumRow(key, e.event_id, st.n, st.cents)
      }
      state.update(st)
      out.iterator
    }
  }

  /** Wire [[RunningTotalsFromInitial]] with a batch-computed seed. */
  def runningTotalsWithInitial(events: Dataset[Event],
      initial: org.apache.spark.sql.KeyValueGroupedDataset[Long, CumState])
      (implicit spark: SparkSession): Dataset[CumRow] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsFromInitial,
        TimeMode.None(), OM.Append(), initial)
  }

  // ----------------------------- event-time TIMER sessionization

  final case class TimerSessState(startUs: Long, lastUs: Long, n: Long,
                                  cents: Long)
  final case class SessRow(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long, total_cents: Long)

  /** Sessionization on transformWithState's EVENT-TIME TIMER surface
    * (TimeMode.EventTime + registerTimer/handleExpiredTimer — the new
    * API's replacement for flatMapGroupsWithState's timeouts, q209's
    * machinery): a session closes either when a later event exceeds the
    * gap (emitted inline) or when the watermark passes
    * lastSeen + gap and the registered timer fires (emitted in
    * handleExpiredTimer, state cleared). Stale timers are deleted on
    * every input batch, so a session extended across batches never
    * double-emits through its superseded timer. Event-time-ordered
    * arrival (the staged-file harness) makes a post-timer event for the
    * same user necessarily a NEW session: the watermark that fired the
    * timer trails every later event's time by the full delay, which
    * exceeds the gap. State: one small struct per ACTIVE user plus one
    * timer — both evicted at expiry.
    */
  class TimerSessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, SessRow] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[TimerSessState] = _
    private val gapUs = gapMs * 1000L

    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[TimerSessState]("sess",
        org.apache.spark.sql.Encoders.product[TimerSessState], TTLConfig.NONE)
    }

    private def emit(key: Long, st: TimerSessState): SessRow =
      SessRow(key, st.startUs, st.lastUs, st.n, st.cents)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SessRow] = {
      val sorted = rows.toArray.sortBy(e => (tsToUs(e.ts), e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[SessRow]
      var st: TimerSessState = if (state.exists()) state.get() else null
      sorted.foreach { e =>
        val us = tsToUs(e.ts); val c = math.round(e.value)
        if (st == null) st = TimerSessState(us, us, 1L, c)
        else if (us - st.lastUs > gapUs) {
          out += emit(key, st)
          st = TimerSessState(us, us, 1L, c)
        } else st = TimerSessState(st.startUs, us, st.n + 1, st.cents + c)
      }
      state.update(st)
      // one live timer per key: drop any stale expiry, register the
      // current session's (materialize before deleting — the iterator
      // reads the store being mutated)
      val stale = getHandle.listTimers().toArray
      stale.foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      // CEIL the µs→ms conversion (the sessionize timeout's +999
      // convention): a floored expiry can fire up to 999 µs before
      // lastUs + gapUs and split a session a tight watermark would
      // otherwise keep whole
      getHandle.registerTimer(Math.floorDiv(st.lastUs + gapUs + 999L, 1000L))
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessRow] = {
      if (state.exists()) {
        val st = state.get()
        state.clear()
        Iterator.single(emit(key, st))
      } else Iterator.empty
    }
  }

  /** Wire [[TimerSessionProcessor]] over a watermarked event stream. */
  def timerSessions(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
                   (implicit spark: SparkSession): Dataset[SessRow] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(gapMs),
        TimeMode.EventTime(), OM.Append())
  }

  // --------------------------- MapState + ListState surfaces

  final case class MapListRow(user_id: Long, event_id: Long, type_n: Long,
                              last3_cents: Long)

  /** The two transformWithState state variables the ValueState gates
    * (q263/q312/q315) don't touch: a MapState keyed by event type
    * (per-user per-type running count — the RocksDB layout keys each
    * map entry separately, so a 10⁶-type map never materializes whole)
    * and a ListState holding the user's last ≤3 cent values (a bounded
    * sliding window — appendValue + trim via put). Each event emits its
    * type's count-so-far and the trailing-3 cent sum, both exactly the
    * batch window functions the q321 oracle computes.
    */
  class MapListStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, MapListRow] {
    import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode => OM, TimeMode, TimerValues, TTLConfig}
    @transient private var typeCounts: MapState[String, Long] = _
    @transient private var recent: ListState[Long] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      typeCounts = getHandle.getMapState[String, Long]("types",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getListState[Long]("recent",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[MapListRow] = {
      val sorted = rows.toArray.sortBy(e => (tsToUs(e.ts), e.event_id))
      // materialize BEFORE returning: state mutations must not ride a
      // lazy iterator the framework may commit around
      sorted.map { e =>
        val n = (if (typeCounts.containsKey(e.event_type))
          typeCounts.getValue(e.event_type) else 0L) + 1L
        typeCounts.updateValue(e.event_type, n)
        val c = math.round(e.value)
        val window = (recent.get().toArray :+ c).takeRight(3)
        recent.put(window)
        MapListRow(key, e.event_id, n, window.sum)
      }.iterator
    }
  }

  /** Wire [[MapListStatsProcessor]] over a keyed event stream. */
  def mapListStats(events: Dataset[Event])
                  (implicit spark: SparkSession): Dataset[MapListRow] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new MapListStatsProcessor,
        TimeMode.None(), OM.Append())
  }

  /** [[MapListStatsProcessor]] with a processing-time TTL on BOTH
    * composite state variables (q330 — the [[RunningTotalsTtlProcessor]]
    * story extended to the state types whose expiry is per-ENTRY, not
    * per-record): each MapState entry carries its own expiration (an
    * idle event TYPE ages out independently of the user's other types)
    * and each ListState element does too (the trailing window forgets
    * expired elements without any explicit trim). Under the q324
    * harness (one batch per phase, inter-phase sleep > TTL) every
    * phase-1 entry/element is expired for phase-2 reads: per-type
    * counts and the trailing-3 sum both restart, exactly the batch
    * windows partitioned by (user, phase). `ttlMs <= 0` disables TTL
    * (the twin).
    */
  class MapListStatsTtlProcessor(ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, MapListRow] {
    import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode => OM, TimeMode, TimerValues, TTLConfig}
    @transient private var typeCounts: MapState[String, Long] = _
    @transient private var recent: ListState[Long] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      val ttl =
        if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs))
        else TTLConfig.NONE
      typeCounts = getHandle.getMapState[String, Long]("types",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, ttl)
      recent = getHandle.getListState[Long]("recent",
        org.apache.spark.sql.Encoders.scalaLong, ttl)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[MapListRow] = {
      val sorted = rows.toArray.sortBy(e => (tsToUs(e.ts), e.event_id))
      sorted.map { e =>
        val n = (if (typeCounts.containsKey(e.event_type))
          typeCounts.getValue(e.event_type) else 0L) + 1L
        typeCounts.updateValue(e.event_type, n)
        val c = math.round(e.value)
        val window = (recent.get().toArray :+ c).takeRight(3)
        recent.put(window)
        MapListRow(key, e.event_id, n, window.sum)
      }.iterator
    }
  }

  /** Wire [[MapListStatsTtlProcessor]]; ProcessingTime — TTL's clock. */
  def mapListStatsTtl(events: Dataset[Event], ttlMs: Long)
                     (implicit spark: SparkSession): Dataset[MapListRow] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new MapListStatsTtlProcessor(ttlMs),
        TimeMode.ProcessingTime(), OM.Append())
  }
}
