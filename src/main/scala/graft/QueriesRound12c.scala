package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-12 widening, third wave: codec coverage for the remaining
  * crawl-dominant media families — compressed AUDIO (IMA ADPCM, q337)
  * and the GIF/LZW image family (q338).
  */
trait QueriesRound12c extends QueriesRound12b {

  /** REAL compressed-audio decode round-trip — the audio modality gets
    * what q309/q326 gave images: an actual codec, not a RIFF header
    * parse (q280). Fixtures use the q326 lossless construction: each
    * document carries 4 IMA blocks (33 samples each) whose samples are
    * CONSTANT within a block at a value derived from the md5 generator
    * — at step index 0 the IMA magnitude term `7 >> 3` is zero and
    * `indexTable[0] = -1` clamps the index in place, so the whole
    * encode→decode chain is exactly lossless and the oracle recomputes
    * every block's decoded sample from the generator formula (the
    * adaptive general-content path is pinned against an independent
    * reference decoder in `AdpcmSpec`). Docs with doc_id % 9 == 0 ship
    * a payload truncated by 3 bytes — a partial final block, which the
    * block-structure validation must turn into NULL, never a throw or a
    * short read. Per (doc, block) the hash-checked row carries the
    * decoded sample value (recomputed by the oracle), an intra-block
    * constancy witness, and the byte-exact round-trip flag. Scale: both
    * directions are row-local codegen expressions fused into the scan —
    * compressed bytes never leave their partition, no shuffle.
    */
  val adpcmRoundtrip: Q = (s, dir) => {
    import graft.functions.AdpcmExpressions
    // per-block constant PCM16LE value from the md5 generator
    def vU(b: Int) =
      conv(substring(md5(concat(col("doc_id").cast("string"),
        lit("|" + b)).cast("binary")), 1, 4), 16, 10).cast("long")
    def blockHex(b: Int) = {
      val u = vU(b)
      val lo = lpad(hex(u.bitwiseAND(255)), 2, "0")
      val hi = lpad(hex(shiftrightunsigned(u, 8).bitwiseAND(255)), 2, "0")
      repeat(concat(lo, hi), AdpcmExpressions.SamplesPerBlock)
    }
    val pcm = unhex(concat((0 until 4).map(blockHex): _*))
    val base = t(s, dir, "documents")
      .select(col("doc_id").as("media_id"), pcm.as("pcm"))
      .withColumn("enc", AdpcmExpressions.adpcm_encode(col("pcm")))
      .withColumn("blob",
        when(col("media_id") % 9 === 0,
          expr("substring(enc, 1, octet_length(enc) - 3)"))
          .otherwise(col("enc")))
      .withColumn("dec", AdpcmExpressions.adpcm_decode(col("blob")))
      .select(col("media_id"), col("pcm"), col("dec"),
        explode(sequence(lit(0), lit(3))).as("block"))
    def sampleAt(off: org.apache.spark.sql.Column) = {
      val lo = conv(hex(col("dec").substr(off, lit(1))), 16, 10).cast("long")
      val hi = conv(hex(col("dec").substr(off + 1, lit(1))), 16, 10)
        .cast("long")
      val u = lo + hi * 256
      when(u >= 32768, u - 65536).otherwise(u)
    }
    val off0 = col("block") * (AdpcmExpressions.SamplesPerBlock * 2) + 1
    base.select(col("media_id"), col("block"),
      col("dec").isNotNull.as("decoded"),
      when(col("dec").isNotNull, (length(col("dec")) / 2).cast("int"))
        .as("n_samples"),
      sampleAt(off0).as("sample_val"),
      // non-nullable on purpose: a nullable BOOLEAN round-trips as
      // NaN-object from DuckDB but None-object from parquet and the
      // comparator (rightly) refuses to pair them
      (col("dec").isNotNull &&
        (sampleAt(off0 + 32) <=> sampleAt(off0))).as("constant_ok"),
      (col("dec") <=> col("pcm")).as("roundtrip_exact"))
      .orderBy(col("media_id"), col("block"))
  }

  /** HISTORICAL state-store read (state TIME TRAVEL — the streaming
    * twin of q332's storage verb): the q263 totals stream runs as FOUR
    * staged micro-batches against a checkpoint, then the state data
    * source reads the per-user state AS OF batch 0 and as of the final
    * batch — `option("batchId", b)` resolves the checkpoint's retained
    * per-batch state files, no replay, no running query. The oracle
    * recomputes batch 0's state as the totals over slice 0 of the
    * SAME integer slice arithmetic `stageSlices` stages
    * (us < lo + span/4) and the final state as the full aggregate — a
    * reader that served the LATEST state for a historical batchId, or
    * off-by-one slice boundaries on either side, mismatches. This is
    * the incident-debugging verb: "what did user X's state look like
    * BEFORE the bad deploy's batch" answered from checkpoint files.
    * Scale: cost is a parallel read of one batch's state files —
    * retention (`minBatchesToRetain`) is the knob that bounds it.
    */
  val stateTimeTravel: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val srcDir = scratch("graft_state_tt_src")
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("double").as("value"))
    val bounds = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0L, 4L)
      else (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(hi - lo, 4L)
    graft.streaming.Staging.stageSlices(ev, unix_micros(col("ts")), 4, lo,
      span, srcDir, scratch("graft_state_tt_stage"), Seq(col("event_id")))
    val ckpt = scratch("graft_state_tt_ckpt").toString
    withConfs(s, "spark.sql.streaming.stateStore.providerClass" ->
      ("org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")) {
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
        .as[graft.streaming.EventStreams.Event]
      val totals = graft.streaming.EventStreams.runningTotals(stream)(s)
      val sq = totals.toDF().writeStream.outputMode("append").format("memory")
        .queryName("graft_state_tt_sink")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      sq.awaitTermination()
      def stateAt(b: Int): DataFrame = s.read.format("statestore")
        .option("stateVarName", "cum").option("batchId", b).load(ckpt)
        .select(col("key.value").as("user_id"), lit(b).as("batch_id"),
          col("value.n").as("n_events"), col("value.cents").as("total_cents"))
      stateAt(0).unionAll(stateAt(3))
        .orderBy(col("batch_id"), col("user_id"))
    }
  }

  val stateTimeTravelSql: String =
    """WITH e AS (SELECT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |b AS (SELECT min(us) AS lo,
      |    greatest(max(us) - min(us), 4) AS span FROM e),
      |s0 AS (SELECT user_id, 0 AS batch_id, count(*) AS n_events,
      |    CAST(sum(cents) AS BIGINT) AS total_cents
      |  FROM e WHERE us < (SELECT lo + span // 4 FROM b) GROUP BY user_id),
      |s3 AS (SELECT user_id, 3 AS batch_id, count(*) AS n_events,
      |    CAST(sum(cents) AS BIGINT) AS total_cents
      |  FROM e GROUP BY user_id)
      |SELECT * FROM s0 UNION ALL SELECT * FROM s3
      |ORDER BY batch_id, user_id""".stripMargin

  /** GIF/LZW decode round-trip — the THIRD real image codec family
    * (PNG = DEFLATE q309, JPEG = DCT q326/q331, GIF = LZW): a crawl's
    * meme/animation inventory is GIF, and LZW is a genuinely different
    * decompression algorithm (variable-width dictionary codes, KwKwK,
    * CLEAR/EOI protocol), so none of the earlier codec machinery covers
    * it. Because GIF is LOSSLESS, the oracle checks the decode on
    * ARBITRARY planted content — the same q277 288-byte md5 buffers as
    * q309, giving byte-identical proof obligations (block0 hex = the
    * md5 generator, dHash recomputed from the pixel formula) with zero
    * constructed-fixture caveats. Docs with doc_id % 17 == 0 ship a
    * payload truncated by 20 bytes (trailer + LZW tail): the GIF header
    * still sniffs (container_fmt/w/h stay 'gif'/18/16 — header
    * inspection cannot catch it) but the decode must yield NULL (the
    * missing-trailer check), never a throw. The bit-width boundaries,
    * mid-stream CLEAR, and BOTH ImageIO interop directions are pinned
    * in `GifSpec`. Scale: both directions are row-local codegen
    * expressions fused into the scan — no shuffle, bytes stay put.
    */
  val gifRoundtrip: Q = (s, dir) => {
    import graft.functions.{GifExpressions, ImageExpressions}
    t(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        plantedImagePixels(col("doc_id"), variant = false).as("px"))
      .withColumn("gif", GifExpressions.gif_encode_gray(col("px"), 18, 16))
      .withColumn("blob",
        when(col("media_id") % 17 === 0,
          expr("substring(gif, 1, octet_length(gif) - 20)"))
          .otherwise(col("gif")))
      .withColumn("dec", GifExpressions.gif_decode_gray(col("blob")))
      .select(col("media_id"),
        ImageExpressions.image_format(col("blob")).as("container_fmt"),
        ImageExpressions.image_width(col("blob")).as("w"),
        ImageExpressions.image_height(col("blob")).as("h"),
        col("dec").isNotNull.as("decoded"),
        length(col("dec")).as("n_px"),
        lower(hex(substring(col("dec"), 1, 16))).as("block0_hex"),
        lpad(lower(hex(
          ImageExpressions.gray_dhash64(col("dec"), 18, 16))), 16, "0")
          .as("dhash_hex"),
        (col("dec") <=> col("px")).as("roundtrip_exact"))
      .orderBy(col("media_id"))
  }

  val gifRoundtripSql: String =
    """WITH px AS (SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS s,
      |    list_transform(generate_series(0, 287), k ->
      |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
      |          CAST(k // 16 AS VARCHAR)), (k % 16) * 2 + 1, 2))::BIGINT)
      |      AS p
      |  FROM documents),
      |cells AS (SELECT media_id, s, list_transform(generate_series(0, 71),
      |    g -> (p[(g // 9) * 2 * 18 + (g % 9) * 2 + 1]
      |     + p[(g // 9) * 2 * 18 + (g % 9) * 2 + 2]
      |     + p[((g // 9) * 2 + 1) * 18 + (g % 9) * 2 + 1]
      |     + p[((g // 9) * 2 + 1) * 18 + (g % 9) * 2 + 2]) // 4) AS dcell
      |  FROM px),
      |bits AS (SELECT media_id, s, list_transform(generate_series(0, 63),
      |    b -> dcell[(b // 8) * 9 + (b % 8) + 2]
      |       > dcell[(b // 8) * 9 + (b % 8) + 1]) AS dbit
      |  FROM cells)
      |SELECT media_id, 'gif' AS container_fmt,
      |  CAST(18 AS INTEGER) AS w, CAST(16 AS INTEGER) AS h,
      |  media_id % 17 <> 0 AS decoded,
      |  CASE WHEN media_id % 17 <> 0 THEN CAST(288 AS INTEGER) END AS n_px,
      |  CASE WHEN media_id % 17 <> 0 THEN md5(s || '|0') END AS block0_hex,
      |  CASE WHEN media_id % 17 <> 0 THEN
      |    array_to_string(list_transform(generate_series(1, 16), j ->
      |      substr('0123456789abcdef',
      |        (CASE WHEN dbit[4 * (16 - j) + 1] THEN 1 ELSE 0 END)
      |        + (CASE WHEN dbit[4 * (16 - j) + 2] THEN 2 ELSE 0 END)
      |        + (CASE WHEN dbit[4 * (16 - j) + 3] THEN 4 ELSE 0 END)
      |        + (CASE WHEN dbit[4 * (16 - j) + 4] THEN 8 ELSE 0 END) + 1,
      |        1)), '') END AS dhash_hex,
      |  media_id % 17 <> 0 AS roundtrip_exact
      |FROM bits ORDER BY media_id""".stripMargin

  val adpcmRoundtripSql: String =
    """WITH b AS (SELECT unnest(generate_series(0, 3)) AS block),
      |v AS (SELECT doc_id AS media_id, block,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
      |      || CAST(block AS VARCHAR)), 1, 4))::BIGINT AS u
      |  FROM documents CROSS JOIN b)
      |SELECT media_id, CAST(block AS INTEGER) AS block,
      |  media_id % 9 <> 0 AS decoded,
      |  CASE WHEN media_id % 9 <> 0 THEN CAST(132 AS INTEGER) END
      |    AS n_samples,
      |  CASE WHEN media_id % 9 <> 0 THEN
      |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END END AS sample_val,
      |  media_id % 9 <> 0 AS constant_ok,
      |  media_id % 9 <> 0 AS roundtrip_exact
      |FROM v ORDER BY media_id, block""".stripMargin
}
