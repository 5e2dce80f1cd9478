package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{Readers, Writers}
import graft.ops.{Dedup, Layout, Ranks}
import graft.streaming.{EventStreams, Staging}

/** Round-11 gates: the two extension gaps the r10 verdict named —
  * REAL compressed-payload decode (PNG zlib for images, gzip for text)
  * and the composed IVF-PQ ADC serving path.
  */
trait QueriesRound11 extends QueriesSeriesOpt {

  // ---------------- shared IVF-PQ building blocks (q311 / q317) ----------

  /** m×sub-grid PQ codes for `vec`: per subspace, the argmin codeword by
    * squared integer grid distance, ties to the smaller code (the q175
    * convention). Native codegen expression
    * ([[graft.functions.VectorExpressions.PqCodes]]) — the round-14
    * fusion of the former `transform/array_min/zip_with/slice` tree,
    * whose interpreted higher-order lambdas and per-(codeword, subspace)
    * slice allocations were the hottest single job of every IVF-PQ gate
    * (guide §1.2 step 2; value-identical by construction, and every
    * gate's oracle recomputes the codes in SQL).
    */
  protected def pqCodes(codebook: Array[Array[Long]], vec: Column,
                        m: Int, sub: Int): Column =
    graft.functions.VectorExpressions.pq_codes(vec, codebook, m, sub)

  /** Asymmetric distance: Σ over subspaces of ‖q_m − cb_m[code_m]‖² —
    * the query's exact (sub)vector against each candidate's
    * RECONSTRUCTED codeword, all integer-exact on the grid. Native
    * codegen ([[graft.functions.VectorExpressions.AdcDist]]) — the
    * per-candidate-pair hot loop of every serve path, fused for the
    * same reason as [[pqCodes]].
    */
  protected def adcDist(codebook: Array[Array[Long]], q: Column,
                        codes: Column, m: Int, sub: Int): Column =
    graft.functions.VectorExpressions.adc_dist(q, codes, codebook, m, sub)

  /** Write the coded corpus hive-partitioned by cell and read it back
    * pruned to `q`'s probe cells (≤ k distinct by construction —
    * bounded by the codebook, never the corpus); returns the filtered
    * read plus the PartitionFilters pruning proof that rides in the
    * gate's hash-checked row.
    */
  protected def cellServe(s: SparkSession, assigned: DataFrame, prefix: String,
                        q: DataFrame): (DataFrame, Boolean) = {
    val tmp = scratch(prefix).toString
    Writers.parquet(assigned, s"$tmp/codes", partitionBy = Seq("cell"))
    val probeCells = q.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted
    val probe = if (probeCells.isEmpty) lit(false)
      else col("cell").isin(probeCells: _*)
    val rd = Readers.parquetWithSchema(s, s"$tmp/codes", assigned.schema)
      .filter(probe)
    val pruned = "PartitionFilters: \\[[^\\]]*(IN|INSET)[^\\]]*".r
      .findFirstIn(rd.queryExecution.executedPlan.toString).isDefined
    (rd, pruned)
  }

  /** REAL compressed-image decode round-trip (r10 verdict "what's
    * missing" #1 — the last distance between "multimodal columns" and
    * what a crawl pipeline ingests): every earlier image gate operated
    * on planted RAW buffers or container *headers*; this gate runs an
    * actual codec. Each document's 288-byte planted grayscale buffer
    * (the q277 fixture) is ENCODED as a spec-valid PNG —
    * zlib-DEFLATEd IDAT via java.util.zip.Deflater, per-chunk CRC-32s,
    * filter type cycling `row mod 5` so all five PNG filters
    * (None/Sub/Up/Average/Paeth) are on the wire — then DECODED by
    * [[graft.functions.PngExpressions.png_decode_gray]]: chunk-CRC
    * verification, multi-IDAT concatenation, zlib inflate (Adler-32
    * checked), full unfiltering. Docs with doc_id % 13 == 0 ship a
    * TRUNCATED payload (last 24 bytes cut: IEND plus the IDAT tail) —
    * the header still parses (container_fmt/w/h stay 'png'/18/16,
    * proving header-only inspection cannot catch it) but the decode
    * must yield NULL, never a throw. The hash-checked row carries the
    * decode's proof: pixel count, the first 16 decoded bytes as hex
    * (== md5(id||'|0') by the fixture's construction), the dHash of
    * the DECODED buffer (the q277 bit arithmetic recomputed by the
    * oracle from the pixel formula — if any unfilter branch were
    * wrong, gradient signs flip), and a Spark-side byte-exact
    * `decode(encode(px)) == px` flag the oracle pins TRUE. Encoder
    * BYTES are never hashed — DEFLATE output is implementation-
    * defined; the spec pins only what the decoder recovers. Scale:
    * both codec directions are row-local codegen expressions fused
    * into the scan — one narrow pass, no shuffle, compressed bytes
    * never leave their partition.
    */
  val pngRoundtrip: Q = (s, dir) => {
    import graft.functions.{ImageExpressions, PngExpressions}
    val base = t(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        plantedImagePixels(col("doc_id"), variant = false).as("px"))
      .withColumn("png", PngExpressions.png_encode_gray(col("px"), 18, 16))
    base
      .withColumn("blob",
        when(col("media_id") % 13 === 0,
          expr("substring(png, 1, octet_length(png) - 24)"))
          .otherwise(col("png")))
      .withColumn("dec", PngExpressions.png_decode_gray(col("blob")))
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

  val pngRoundtripSql: String =
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
      |SELECT media_id, 'png' AS container_fmt,
      |  CAST(18 AS INTEGER) AS w, CAST(16 AS INTEGER) AS h,
      |  media_id % 13 <> 0 AS decoded,
      |  CASE WHEN media_id % 13 <> 0 THEN CAST(288 AS INTEGER) END AS n_px,
      |  CASE WHEN media_id % 13 <> 0 THEN md5(s || '|0') END AS block0_hex,
      |  CASE WHEN media_id % 13 <> 0 THEN
      |    array_to_string(list_transform(generate_series(1, 16), j ->
      |      substr('0123456789abcdef',
      |        (CASE WHEN dbit[4 * (16 - j) + 1] THEN 1 ELSE 0 END)
      |        + (CASE WHEN dbit[4 * (16 - j) + 2] THEN 2 ELSE 0 END)
      |        + (CASE WHEN dbit[4 * (16 - j) + 3] THEN 4 ELSE 0 END)
      |        + (CASE WHEN dbit[4 * (16 - j) + 4] THEN 8 ELSE 0 END) + 1,
      |        1)), '') END AS dhash_hex,
      |  media_id % 13 <> 0 AS roundtrip_exact
      |FROM bits ORDER BY media_id""".stripMargin

  /** REAL gzip ingest for the TEXT modality — crawl corpora (WARC/WET)
    * arrive as per-record gzip members, so "ingest crawl data" means
    * inflating real RFC 1952 bytes, not reading pre-extracted text.
    * Each document's text is encoded as a spec-valid gzip member
    * (deterministic header, raw-DEFLATE body, CRC-32 + ISIZE trailer)
    * and decoded by [[graft.functions.CompressExpressions.gzip_decode]]
    * — header FLG handling, raw inflate, BOTH trailer fields verified
    * against the recovered bytes. Docs with doc_id % 11 == 0 ship a
    * payload truncated by ONE byte (the trailer's last ISIZE byte):
    * the DEFLATE body still inflates completely, so only the trailer
    * length check can catch it — decode must yield NULL. The row
    * carries the recovered byte count, md5 of the recovered bytes
    * (== md5 of the document text — the oracle computes it from the
    * plaintext it never compressed), and a byte-exact round-trip flag.
    * NULL-text docs are gz_ok = false on both sides (nothing was
    * encodable). Scale: row-local codegen, fuses into the scan; at
    * 100 TB this is the WET-record inflate running inside the same
    * whole-stage pipeline as the quality filters downstream of it.
    */
  val gzipTextIngest: Q = (s, dir) => {
    import graft.functions.CompressExpressions
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        CompressExpressions.gzip_encode(col("text").cast("binary")).as("gz"))
      .withColumn("blob",
        when(col("doc_id") % 11 === 0,
          expr("substring(gz, 1, octet_length(gz) - 1)"))
          .otherwise(col("gz")))
      .withColumn("dec", CompressExpressions.gzip_decode(col("blob")))
      .select(col("doc_id"),
        col("dec").isNotNull.as("gz_ok"),
        length(col("dec")).as("n_bytes"),
        md5(col("dec")).as("raw_md5"),
        coalesce(col("dec") === col("text").cast("binary"), lit(false))
          .as("text_match"))
      .orderBy(col("doc_id"))
  }

  val gzipTextIngestSql: String =
    """SELECT doc_id,
      |  text IS NOT NULL AND doc_id % 11 <> 0 AS gz_ok,
      |  CASE WHEN text IS NOT NULL AND doc_id % 11 <> 0
      |    THEN CAST(octet_length(encode(text)) AS INTEGER) END AS n_bytes,
      |  CASE WHEN text IS NOT NULL AND doc_id % 11 <> 0
      |    THEN md5(text) END AS raw_md5,
      |  text IS NOT NULL AND doc_id % 11 <> 0 AS text_match
      |FROM documents ORDER BY doc_id""".stripMargin

  /** IVF-PQ composed serving (r10 verdict "what's missing" #2): q175
    * builds PQ codebooks and q301 serves from a cell-partitioned IVF —
    * this gate composes them into the actual 100 TB ANN residency
    * story: the corpus is stored as (cell, 4 PQ codes) — four BYTES of
    * payload per vector instead of 256 float bytes (the Jégou/Douze/
    * Schmid '11 IVFADC layout, sans residuals so every distance stays
    * int-exact) — written hive-partitioned by coarse cell; a query
    * probes its nprobe=2 cells (directory pruning proven by the
    * PartitionFilters flag riding IN the hash-checked row, the q301
    * pattern) and ranks candidates by ASYMMETRIC distance: the exact
    * uncompressed query subvector against each candidate's RECONSTRUCTED
    * codeword, Σ_m ‖q_m − cb_m[code_m]‖² on the 1e3 integer grid —
    * bit-identical cross-engine, no floats anywhere past the one grid
    * round. Conventions are the proven ones: centroids = the 4
    * lowest-id vectors (q301), PQ codebook = the 16 lowest-id grid
    * vectors, m=4 × 16-dim subspaces (q175), argmin ties to the
    * smaller code via struct-min. The oracle re-derives cells, codes,
    * and every ADC distance through the composed q175+q301 CTE chain.
    * Scale: the driver holds only k×dim codebook literals; encoding is
    * one narrow projection (4×16 codegen'd integer distances per
    * vector); the serve path reads nprobe directories of 4-byte codes
    * — the part that must stay RAM-resident at 100 TB — and never
    * touches a full embedding except the query's own.
    */
  val ivfpqAdc: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExpressions
    val M = 4; val SUB = 16; val K = 16
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val qv = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val cents: Array[(Long, Array[Float])] = emb.filter(col("vec_id") < 4)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val codebook: Array[Array[Long]] = emb.orderBy(col("vec_id")).limit(K)
      .select(qv.as("qv")).collect().map(_.getSeq[Long](0).toArray)
    if (cents.isEmpty || codebook.isEmpty) {
      emb.select(col("vec_id").as("query_id"), lit(1).as("rank"),
        col("vec_id").as("neighbor_id"), lit(0L).as("adc_dist"),
        lit(true).as("pruned")).filter(lit(false))
    } else {
      val cellIds = cents.map(_._1)
      val cvs = cents.map(_._2)
      val assigned = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id"), qv.as("qvv"),
          VectorExpressions.nearest_cells(col("embedding"), cellIds, cvs, 1)
            .getItem(0).as("cell"))
        .select(col("vec_id"), pqCodes(codebook, col("qvv"), M, SUB).as("codes"),
          col("cell"))
      val q = Dedup.pin(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), qv.as("qq"),
          explode(VectorExpressions.nearest_cells(col("embedding"), cellIds,
            cvs, 2)).as("cell")))
      val (rd, pruned) = cellServe(s, assigned, "graft_ivfpq", q)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("adc_dist"), col("neighbor_id"))
      rd.select(col("vec_id").as("neighbor_id"), col("codes"), col("cell"))
        .join(broadcast(q), Seq("cell"))
        .withColumn("adc_dist", adcDist(codebook, col("qq"), col("codes"), M, SUB))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("adc_dist"), lit(pruned).as("pruned"))
        .orderBy(col("query_id"), col("rank"))
    }
  }

  /** Streaming STATE-SCHEMA-EVOLUTION restart — the FOURTEENTH streaming
    * gate (r10 verdict next-round #4): q276 proves a restart recovers
    * state; no prior gate proves state survives an OPERATOR-SCHEMA
    * change — the day-2 reality of any long-lived 100 TB ingest stream,
    * where the processor that runs in month 2 is never byte-identical
    * to the one that wrote month 1's checkpoint. Harness: the q263
    * running-totals pipeline runs phase 1 (first two event-time slices)
    * with the v1 processor — ValueState schema (n, cents) — under the
    * RocksDB provider with the AVRO state encoding
    * (`spark.sql.streaming.stateStore.encodingFormat=avro`, the
    * documented evolution knob; the default unsaferow encoding REJECTS
    * any schema change), stops, then restarts on the SAME checkpoint
    * with [[graft.streaming.EventStreams.RunningTotalsProcessorV2]],
    * whose state ADDS a nullable field (running max cents). Avro decode
    * fills the missing field with null for every v1 record, so
    * (cum_n, cum_cents) must CONTINUE exactly where phase 1 left off —
    * a fresh-state restart would restart the counts, an incompatible-
    * evolution failure would abort the query — while max_cents tracks
    * only events seen since the field existed. The batch oracle
    * recomputes all three: the cumulative window over ALL events for
    * (cum_n, cum_cents) — continuity across the restart is what makes
    * equality a recovery proof — and, for phase-2 rows only (slice
    * boundary us >= lo + 2*span/4, the staging arithmetic verbatim),
    * the running max over phase-2 events. Phase-1 output rows carry
    * max_cents = NULL (the v1 processor has no such column), pinning
    * WHICH rows each processor version produced. Scale: evolution cost
    * is zero at restart (records re-encode lazily on next write);
    * state stays one small record per user.
    */
  val stateSchemaEvolution: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.{Files, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    import s.implicits._
    val holdDir = scratch("graft_tws_evo_hold")
    val srcDir = scratch("graft_tws_evo_src")
    val ckptDir = scratch("graft_tws_evo_ckpt")
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("double").as("value"))
    val bounds = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0L, 4L)
      else (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(hi - lo, 4L)
    Staging.stageSlices(ev, unix_micros(col("ts")), 4, lo, span, holdDir,
      scratch("graft_tws_evo_stage"), Seq(col("event_id")))
    // promote slice i from the holding dir into the live source dir,
    // preserving the staging mtime convention (ascending mtimes are what
    // order AvailableNow's file batches)
    def promote(i: Int): Unit = {
      val dst = srcDir.resolve(f"part-$i%02d.parquet")
      Files.copy(holdDir.resolve(f"part-$i%02d.parquet"), dst,
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(1000000000000L + i * 10000L))
      ()
    }
    withConfs(s,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.encodingFormat" -> "avro") {
      def stream = s.readStream
        .schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString)
        .as[graft.streaming.EventStreams.Event]
      // foreachBatch parquet-append sinks: the memory sink cannot
      // RESUME from a checkpoint in append mode (exactly the machinery
      // under test), foreachBatch can — each phase lands in its own
      // directory so the final frame also pins WHICH processor version
      // emitted each row
      val out1 = scratch("graft_tws_evo_out1")
      val out2 = scratch("graft_tws_evo_out2")
      promote(0); promote(1)
      val sq1 = EventStreams.runningTotals(stream)(s).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckptDir.toString)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           _: Long) =>
            b.write.mode("append").parquet(out1.toString); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      sq1.awaitTermination()
      promote(2); promote(3)
      val sq2 = EventStreams.runningTotalsV2(stream)(s).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckptDir.toString)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           _: Long) =>
            b.write.mode("append").parquet(out2.toString); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      sq2.awaitTermination()
      val p1Schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cum_n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cum_cents",
          org.apache.spark.sql.types.LongType)))
      val p2Schema = p1Schema.add("max_cents",
        org.apache.spark.sql.types.LongType)
      Readers.parquetWithSchema(s, out1.toString, p1Schema)
        .withColumn("max_cents", lit(null).cast("long"))
        .unionByName(Readers.parquetWithSchema(s, out2.toString, p2Schema))
        .orderBy(col("user_id"), col("event_id"))
    }
  }

  /** Batch-backfill → streaming HANDOFF — the FIFTEENTH streaming gate,
    * on the transformWithState INITIAL-STATE surface
    * ([[graft.streaming.EventStreams.RunningTotalsFromInitial]]): every
    * real streaming pipeline is born from a batch one, and the cutover
    * day the stream must pick up EXACTLY where the backfill stopped —
    * without replaying history through the stream. Harness: events
    * split at the event-time midpoint (the q312 slice arithmetic);
    * the BACKFILL half is aggregated in one batch job to per-user
    * (n, cents) seeds; the streaming query starts with that
    * KeyValueGroupedDataset as initialState (`handleInitialState` seeds
    * each user's ValueState before batch 0) and consumes ONLY the live
    * half's staged micro-batches. The emitted totals must be
    * value-identical to the whole-corpus batch cumulative window
    * RESTRICTED to live-half rows — continuity across the handoff is
    * the proof: a lost seed restarts a user's count at 1, a
    * double-counted backfill doubles cents, a stream that replayed
    * history would emit backfill rows the oracle excludes. Users first
    * seen live start from zero (no seed); users only in the backfill
    * hold their seed silently. Scale: the backfill agg is one keyed
    * shuffle of the HISTORY (run once, at cutover); the stream carries
    * one small record per user — this is how a 100 TB corpus's years of
    * history enter a streaming ingest without a years-long replay.
    */
  val streamBackfillHandoff: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.{Files, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    import s.implicits._
    val holdDir = scratch("graft_tws_bf_hold")
    val srcDir = scratch("graft_tws_bf_src")
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("double").as("value"))
    val bounds = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0L, 4L)
      else (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(hi - lo, 4L)
    val cut = lo + 2L * span / 4
    Staging.stageSlices(ev, unix_micros(col("ts")), 4, lo, span, holdDir,
      scratch("graft_tws_bf_stage"), Seq(col("event_id")))
    // only the LIVE half reaches the source dir — the stream never sees
    // backfill rows (mtime convention as staged)
    Seq(2, 3).foreach { i =>
      val dst = srcDir.resolve(f"part-$i%02d.parquet")
      Files.copy(holdDir.resolve(f"part-$i%02d.parquet"), dst,
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(1000000000000L + i * 10000L))
    }
    // batch backfill: per-user seeds from pre-cutover history (cents are
    // whole doubles — the decimal hop keeps the long exact)
    val seeds = ev.filter(unix_micros(col("ts")) < cut)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,0)")).cast("long").as("cents"))
      .as[(Long, Long, Long)]
      .map { case (u, n, c) =>
        (u, graft.streaming.EventStreams.CumState(n, c))
      }
      .groupByKey(_._1).mapValues(_._2)
    withConfs(s, "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val stream = s.readStream
        .schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString)
        .as[graft.streaming.EventStreams.Event]
      val qname = "graft_tws_bf_sink"
      val sq = graft.streaming.EventStreams
        .runningTotalsWithInitial(stream, seeds)(s).toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName(qname).trigger(Trigger.AvailableNow()).start()
      sq.awaitTermination()
      s.table(qname)
        .select(col("user_id"), col("event_id"), col("cum_n"),
          col("cum_cents"))
        .orderBy(col("user_id"), col("event_id"))
    }
  }

  val streamBackfillHandoffSql: String =
    """WITH e AS (SELECT user_id, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |b AS (SELECT min(us) AS lo,
      |    greatest(max(us) - min(us), 4) AS span FROM e),
      |p AS (SELECT user_id, event_id, us, cents,
      |    us >= lo + 2 * span // 4 AS live FROM e CROSS JOIN b),
      |w AS (SELECT user_id, event_id, live,
      |    CAST(row_number() OVER w AS BIGINT) AS cum_n,
      |    CAST(sum(cents) OVER w AS BIGINT) AS cum_cents
      |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS UNBOUNDED PRECEDING))
      |SELECT user_id, event_id, cum_n, cum_cents FROM w WHERE live
      |ORDER BY user_id, event_id""".stripMargin

  /** Compressed-payload near-dup pairing — the decode→fingerprint
    * composition the r10 verdict named: q277 pairs near-duplicate
    * images given RAW pixels; q309 proves the PNG codec recovers pixels
    * byte-exactly; this gate runs the pipeline a crawl actually runs —
    * the stored column is PNG BINARIES (every image zlib-compressed,
    * per-row filter variety as q309), and the near-dup join operates on
    * dHashes of DECODED pixels, all inside one scan-fused projection
    * (encode and decode are row-local codegen; only the 8-byte
    * fingerprint reaches the pigeonhole bucket join). The oracle is
    * q277's, verbatim BY CONSTRUCTION: the codec is lossless, so the
    * compressed path must produce the identical pair set — any
    * unfilter/inflate defect surfaces as a dHash bit flip and a
    * hash-mismatched pair list. Scale: compressed bytes never leave
    * their partition; the pair join sees only fingerprints — the q277
    * cost model unchanged at 100 TB of stored PNGs.
    */
  val pngDedupPairs: Q = (s, dir) => {
    import graft.functions.{ImageExpressions, PngExpressions}
    val docs = t(s, dir, "documents")
    val basePngs = docs.select(col("doc_id").as("id"),
      PngExpressions.png_encode_gray(
        plantedImagePixels(col("doc_id"), variant = false), 18, 16)
        .as("png"))
    val varPngs = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 10000000L).as("id"),
        PngExpressions.png_encode_gray(
          plantedImagePixels(col("doc_id"), variant = true), 18, 16)
          .as("png"))
    val withFp = basePngs.unionByName(varPngs)
      .select(col("id"),
        ImageExpressions.gray_dhash64(
          PngExpressions.png_decode_gray(col("png")), 18, 16).as("fp"))
    Dedup.simhashPairs(withFp, maxHammingDistance = 6)
      .orderBy(col("id1"), col("id2"))
  }

  /** Same text as q277's oracle: the lossless codec makes "identical
    * pair set" the claim under test.
    */
  val pngDedupPairsSql: String = imageDhashPairsSql

  /** Streaming-sink COMPACTION composition (r10 verdict next-round #5 —
    * the operational failure mode of streaming parquet sinks at scale):
    * q214 proves the exactly-once append sink, q112 proves compaction;
    * this gate composes them into the maintain-while-live contract.
    * Events stage into 6 event-time micro-batches and stream through
    * [[EventStreams.idempotentAppendSink]] into a target HIVE-PARTITIONED
    * by event_type — each micro-batch appends exactly ONE file per
    * partition value it carries (the sink repartitions fresh rows by the
    * partition column), so the accreted small-file count is
    * DETERMINISTIC and the DuckDB oracle recomputes it as the number of
    * distinct staging slices containing each type (the q300 slice
    * arithmetic, 6-way). Then every partition directory is compacted
    * ([[Writers.compact]], single-file target at gate scale) and the
    * stream REPLAYS from a fresh checkpoint — worst-case full
    * re-delivery against the rewritten target. The hash-checked row
    * carries, per event_type: exact row fidelity (n_events,
    * total_cents — integer cents, unchanged through accrete → compact →
    * replay), the before file count (files_streamed = slices carrying
    * the type), the after count (files_compacted = 1), and the
    * post-replay count (files_replay = 1 — the anti-join absorbed every
    * re-delivered row, so compaction did not break sink idempotence:
    * dedup keys live in the DATA, not in file names or mtimes the
    * rewrite destroyed). Driver-side file listing is bounded by the
    * event-type vocabulary. Scale: this is the nightly OPTIMIZE loop of
    * a 100 TB streaming lakehouse — compaction cost is one read+write of
    * the partition, replay safety is what lets it run without pausing
    * ingest.
    */
  val streamCompact: Q = (s, dir) => withShufflePartitions(s, 8) {
    val srcDir = scratch("graft_stream_cmp_src")
    val tgtDir = scratch("graft_stream_cmp_tgt")
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val bounds = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0L, 6L)
      else (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(hi - lo, 6L)
    Staging.stageSlices(ev, unix_micros(col("ts")), 6, lo, span, srcDir,
      scratch("graft_stream_cmp_stage"), Seq(col("event_id")))
    def deliver(cpName: String): Unit = {
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      val sq = EventStreams.idempotentAppendSink(stream, tgtDir.toString,
        scratch(cpName).toString, "event_id", availableNow = true,
        partitionBy = Seq("event_type"))
      sq.awaitTermination()
    }
    deliver("graft_stream_cmp_cp1")
    // partition dirs: bounded by the event-type vocabulary (a handful)
    def partDirs: Seq[java.io.File] = {
      val kids = tgtDir.toFile.listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids).toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
        .sortBy(_.getName)
    }
    def fileCounts: Map[String, Long] = partDirs.map { d =>
      d.getName.stripPrefix("event_type=") ->
        Writers.listParquetFiles(d.toString).size.toLong
    }.toMap
    val before = fileCounts
    // single-file target: deterministic at gate scale (the 128 MB
    // default would also yield 1 here, but pinning the target makes the
    // oracle's files_compacted = 1 hold at ANY sf). Per-partition
    // compactions are independent read+rewrite jobs over disjoint
    // directories — run them concurrently (guide §2.6; round 15): the
    // sequential loop paid one job tail per event type.
    inParallelAll(partDirs.map(d => () =>
      Writers.compact(s, d.toString, targetBytesPerFile = 1L << 40)))
    val after = fileCounts
    deliver("graft_stream_cmp_cp2") // fresh checkpoint: full re-delivery
    val replay = fileCounts
    import s.implicits._
    val countsDf = before.keys.toSeq.sorted
      .map(k => (k, before(k), after(k), replay(k)))
      .toDF("event_type", "files_streamed", "files_compacted", "files_replay")
    // explicit schema: an all-empty stream leaves the target with no
    // footers to infer from (the empty-corpus contract), and the
    // partition column resolves by name from the directory structure
    s.read.schema(ev.schema).parquet(tgtDir.toString)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("total_cents"))
      .join(broadcast(countsDf), Seq("event_type"))
      .select(col("event_type"), col("n_events"), col("total_cents"),
        col("files_streamed"), col("files_compacted"), col("files_replay"))
      .orderBy(col("event_type"))
  }

  val streamCompactSql: String =
    """WITH e AS (SELECT event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |b AS (SELECT min(us) AS lo,
      |    greatest(max(us) - min(us), 6) AS span FROM e),
      |sl AS (SELECT event_type, cents,
      |    CAST(list_sum(list_transform(generate_series(1, 5), j ->
      |      CASE WHEN us >= lo + j * span // 6 THEN 1 ELSE 0 END))
      |      AS INTEGER) AS slice
      |  FROM e CROSS JOIN b)
      |SELECT event_type, count(*) AS n_events,
      |  CAST(sum(cents) AS BIGINT) AS total_cents,
      |  CAST(count(DISTINCT slice) AS BIGINT) AS files_streamed,
      |  CAST(1 AS BIGINT) AS files_compacted,
      |  CAST(1 AS BIGINT) AS files_replay
      |FROM sl GROUP BY event_type ORDER BY event_type""".stripMargin

  /** 3-D Morton layout (r10 verdict next-round #7): [[Layout.zkey3]]
    * extends the gated 2-D interleave to three dimensions — bit i of
    * each dim at positions 3i/3i+1/3i+2, 21 bits per dim — because real
    * corpus layouts cluster THREE dimensions at once (date × source ×
    * length), and a 2-D key leaves the third unserved exactly the way a
    * lexicographic sort leaves the second unserved. This gate MEASURES
    * both degenerations with the q302 analytic file model: documents
    * bucketized on length (a), an md5 source bucket (b), and an md5
    * doc_id bucket (c) are written z3-clustered; rows are assigned to 16
    * equal-count files in layout-key order for each of THREE layouts —
    * z3, 2-D z(a,b), lexicographic a-major — per-file (min,max) of all
    * three dims stand in for parquet footer stats, and `files_*` counts
    * stats-box intersections for a four-shape box workload (narrow in
    * each single dim, narrow in all three). The hash pins the measured
    * trade-off surface: z3 is STRICTLY BEST on the all-three shape
    * (4 < 6 ≤ 6 files at sf0.01) and the ONLY layout bounded on both b
    * and c (8/16 each), where z2 full-scans narrow_c (c is uniform
    * inside every z2 file) and a-major full-scans narrow_b AND
    * narrow_c; the price is the leading-dim advantage — narrow_a
    * full-scans under z3 because the length bucket's values never reach
    * bits 6–7, so with 16 files the curve's top bits are ALL b/c bits
    * (the classic bit-budget effect: interleaving serves the dimensions
    * whose values fill their bit range — production layouts scale each
    * dim to its quantile grid first). `pushed` pins phase-1 of the
    * two-phase read: the all-three box's z3-window ([[Layout.zWindow3]],
    * a superset interval by componentwise monotonicity) reaches the scan
    * as PushedFilters on the stored key. File ranks come from the
    * two-phase [[Ranks]] rank — one range shuffle per layout, no
    * corpus-global window.
    */
  val zorder3Layout: Q = (s, dir) => {
    val base = t(s, dir, "documents")
      .select(col("doc_id"),
        Layout.bucket(col("n_chars"), 4).as("a"),
        (conv(substring(md5(col("source")), 1, 15), 16, 10).cast("long")
          % 256).as("b"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 256).as("c"))
    val tmp = scratch("graft_zorder3").toString
    Layout.zorderWrite3(base, col("a"), col("b"), col("c"), s"$tmp/docs",
      numPartitions = 8)
    val schema = base
      .withColumn("z", Layout.zkey3(col("a"), col("b"), col("c"))).schema
    val rdAll = Readers.parquetWithSchema(s, s"$tmp/docs", schema)
    val (zlo, zhi) = Layout.zWindow3(8, 64, 32, 15, 127, 95)
    val pushed = "PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(z,".r
      .findFirstIn(rdAll.filter(col("z").between(zlo, zhi))
        .queryExecution.executedPlan.toString).isDefined
    val keyed = Dedup.pin(rdAll
      .withColumn("z2", Layout.zkey(col("a"), col("b")))
      .withColumn("rm", (col("a") * 256 + col("b")) * 256 + col("c")))
    val n1 = keyed.agg(count(lit(1)).as("nn"))
    def fileStats(key: String): DataFrame =
      Ranks.globalRowNumber(keyed, Seq(col(key), col("doc_id")), "rn",
          numPartitions = 8)
        .crossJoin(broadcast(n1))
        .select(expr("((rn - 1) * 16) div nn").as("f"), col("a"), col("b"),
          col("c"))
        .groupBy(col("f"))
        .agg(min(col("a")).as("amn"), max(col("a")).as("amx"),
          min(col("b")).as("bmn"), max(col("b")).as("bmx"),
          min(col("c")).as("cmn"), max(col("c")).as("cmx"))
    val shapes = s.range(1).select(explode(array(
        struct(lit("narrow_a").as("shape"), lit(8L).as("alo"),
          lit(15L).as("ahi"), lit(0L).as("blo"), lit(255L).as("bhi"),
          lit(0L).as("clo"), lit(255L).as("chi")),
        struct(lit("narrow_b").as("shape"), lit(0L).as("alo"),
          lit(255L).as("ahi"), lit(64L).as("blo"), lit(127L).as("bhi"),
          lit(0L).as("clo"), lit(255L).as("chi")),
        struct(lit("narrow_c").as("shape"), lit(0L).as("alo"),
          lit(255L).as("ahi"), lit(0L).as("blo"), lit(255L).as("bhi"),
          lit(32L).as("clo"), lit(95L).as("chi")),
        struct(lit("all3").as("shape"), lit(8L).as("alo"),
          lit(15L).as("ahi"), lit(64L).as("blo"), lit(127L).as("bhi"),
          lit(32L).as("clo"), lit(95L).as("chi"))))
        .as("q"))
      .select(col("q.*"))
    val hit = col("amn") <= col("ahi") && col("amx") >= col("alo") &&
      col("bmn") <= col("bhi") && col("bmx") >= col("blo") &&
      col("cmn") <= col("chi") && col("cmx") >= col("clo")
    def touched(stats: DataFrame, out: String): DataFrame =
      stats.crossJoin(broadcast(shapes)) // ≤16 files × 4 shapes
        .groupBy(col("shape"))
        .agg(coalesce(sum(when(hit, 1L)), lit(0L)).as(out))
    val nBox = keyed.crossJoin(broadcast(shapes))
      .groupBy(col("shape"))
      .agg(coalesce(sum(when(col("a").between(col("alo"), col("ahi"))
        && col("b").between(col("blo"), col("bhi"))
        && col("c").between(col("clo"), col("chi")), 1L)), lit(0L))
        .as("n_box"))
    nBox.join(touched(fileStats("z"), "files_z3"), Seq("shape"))
      .join(touched(fileStats("z2"), "files_z2"), Seq("shape"))
      .join(touched(fileStats("rm"), "files_amajor"), Seq("shape"))
      .select(col("shape"), col("n_box"), col("files_z3"), col("files_z2"),
        col("files_amajor"), lit(16L).as("n_files"),
        lit(pushed).as("pushed"))
      .orderBy(col("shape"))
  }

  val zorder3LayoutSql: String =
    """WITH d AS (SELECT doc_id,
      |    least(n_chars >> 4, 255) AS a,
      |    ('0x' || substr(md5(source), 1, 15))::BIGINT % 256 AS b,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |      % 256 AS c
      |  FROM documents),
      |k AS (SELECT doc_id, a, b, c,
      |    CAST(list_sum(list_transform(generate_series(0, 7),
      |      i -> ((a >> i) & 1) * (CAST(1 AS BIGINT) << (3*i))
      |         + ((b >> i) & 1) * (CAST(1 AS BIGINT) << (3*i + 1))
      |         + ((c >> i) & 1) * (CAST(1 AS BIGINT) << (3*i + 2))))
      |      AS BIGINT) AS z3,
      |    CAST(list_sum(list_transform(generate_series(0, 7),
      |      i -> ((a >> i) & 1) * (CAST(1 AS BIGINT) << (2*i))
      |         + ((b >> i) & 1) * (CAST(1 AS BIGINT) << (2*i + 1))))
      |      AS BIGINT) AS z2,
      |    (a * 256 + b) * 256 + c AS rm
      |  FROM d),
      |n AS (SELECT count(*) AS nn FROM k),
      |s3 AS (SELECT ((row_number() OVER (ORDER BY z3, doc_id)) - 1) * 16
      |      // nn AS f, a, b, c FROM k, n),
      |f3 AS (SELECT f, min(a) AS amn, max(a) AS amx, min(b) AS bmn,
      |    max(b) AS bmx, min(c) AS cmn, max(c) AS cmx FROM s3 GROUP BY f),
      |s2 AS (SELECT ((row_number() OVER (ORDER BY z2, doc_id)) - 1) * 16
      |      // nn AS f, a, b, c FROM k, n),
      |f2 AS (SELECT f, min(a) AS amn, max(a) AS amx, min(b) AS bmn,
      |    max(b) AS bmx, min(c) AS cmn, max(c) AS cmx FROM s2 GROUP BY f),
      |sr AS (SELECT ((row_number() OVER (ORDER BY rm, doc_id)) - 1) * 16
      |      // nn AS f, a, b, c FROM k, n),
      |fr AS (SELECT f, min(a) AS amn, max(a) AS amx, min(b) AS bmn,
      |    max(b) AS bmx, min(c) AS cmn, max(c) AS cmx FROM sr GROUP BY f),
      |shapes AS (SELECT * FROM (VALUES
      |    ('narrow_a', 8, 15, 0, 255, 0, 255),
      |    ('narrow_b', 0, 255, 64, 127, 0, 255),
      |    ('narrow_c', 0, 255, 0, 255, 32, 95),
      |    ('all3', 8, 15, 64, 127, 32, 95))
      |    t(shape, alo, ahi, blo, bhi, clo, chi)),
      |c3 AS (SELECT shape, CAST(coalesce(sum(CASE WHEN amn <= ahi
      |      AND amx >= alo AND bmn <= bhi AND bmx >= blo
      |      AND cmn <= chi AND cmx >= clo THEN 1 END), 0)
      |    AS BIGINT) AS files_z3
      |  FROM shapes CROSS JOIN f3 GROUP BY shape),
      |c2 AS (SELECT shape, CAST(coalesce(sum(CASE WHEN amn <= ahi
      |      AND amx >= alo AND bmn <= bhi AND bmx >= blo
      |      AND cmn <= chi AND cmx >= clo THEN 1 END), 0)
      |    AS BIGINT) AS files_z2
      |  FROM shapes CROSS JOIN f2 GROUP BY shape),
      |cr AS (SELECT shape, CAST(coalesce(sum(CASE WHEN amn <= ahi
      |      AND amx >= alo AND bmn <= bhi AND bmx >= blo
      |      AND cmn <= chi AND cmx >= clo THEN 1 END), 0)
      |    AS BIGINT) AS files_amajor
      |  FROM shapes CROSS JOIN fr GROUP BY shape),
      |bx AS (SELECT shape, CAST(coalesce(sum(CASE WHEN a BETWEEN alo
      |      AND ahi AND b BETWEEN blo AND bhi AND c BETWEEN clo AND chi
      |      THEN 1 END), 0) AS BIGINT) AS n_box
      |  FROM shapes CROSS JOIN k GROUP BY shape)
      |SELECT shape, n_box, files_z3, files_z2, files_amajor,
      |  CAST(16 AS BIGINT) AS n_files, TRUE AS pushed
      |FROM bx JOIN c3 USING (shape) JOIN c2 USING (shape)
      |JOIN cr USING (shape)
      |ORDER BY shape""".stripMargin

  /** IVF-PQ with RESIDUAL encoding and exact re-rank — the full IVFADC
    * of Jégou/Douze/Schmid '11, completing q311 (which quantized raw
    * vectors "sans residuals"): PQ codes are trained on and assigned to
    * residuals r = v − centroid(cell), which is what makes a SHARED
    * codebook work across cells (residual distributions cluster near
    * zero regardless of where the cell sits), and the serve path adds
    * the third stage production ANN always runs — EXACT re-rank of the
    * ADC top-k. Everything stays on the 1e3 integer grid: centroids'
    * grid twins are Spark-computed and collected (4×64 longs), the
    * codebook is the residuals of the 16 lowest-id vectors w.r.t. their
    * own Spark-assigned cells (collected, 16×64 longs — never driver
    * float math, so the round conventions can't drift), corpus codes
    * are argmin over integer residual distances, and a query probed
    * into cell c ranks candidates by ADC over ITS OWN residual vs that
    * cell — Σ_m ‖(q − c)_m − cb_m[code_m]‖² — then the ADC top-8 join
    * back to full grid vectors for exact ‖q − v‖² top-3. The oracle
    * re-derives centroids, assignments, residual codebook, codes, both
    * distances, and both ranks through the composed CTE chain; the
    * PartitionFilters pruning proof rides in the row (q301 pattern).
    * Scale: the re-rank join touches ≤ 8 full vectors per query — the
    * only full-vector reads in the serve path; everything else is
    * 4-byte codes in nprobe directories.
    */
  val ivfpqResidual: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExpressions
    val M = 4; val SUB = 16; val K = 16
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val qv = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val centRows = emb.filter(col("vec_id") < 4).orderBy(col("vec_id"))
      .select(col("vec_id"), col("embedding"), qv.as("cg")).collect()
    def emptyOut = emb.select(col("vec_id").as("query_id"),
      lit(1).as("rank"), col("vec_id").as("neighbor_id"),
      lit(0L).as("adc_dist"), lit(0L).as("exact_dist"),
      lit(true).as("pruned")).filter(lit(false))
    if (centRows.isEmpty) emptyOut
    else {
      val cellIds = centRows.map(_.getLong(0))
      val cvs = centRows.map(_.getSeq[Float](1).toArray)
      val cg: Array[Array[Long]] = centRows.map(_.getSeq[Long](2).toArray)
      // 16 lowest-id vectors, their grid twins and SPARK-assigned cells
      // (k×dim bounded collect — the codebook, not the corpus)
      val lows = emb.orderBy(col("vec_id")).limit(K)
        .select(qv.as("g"),
          VectorExpressions.nearest_cells(col("embedding"), cellIds, cvs, 1)
            .getItem(0).as("cell"))
        .collect()
      if (lows.isEmpty) emptyOut
      else {
        val cellIndex = cellIds.zipWithIndex.toMap
        val codebook: Array[Array[Long]] = lows.map { r =>
          val g = r.getSeq[Long](0).toArray
          val c = cg(cellIndex(r.getLong(1)))
          Array.tabulate(g.length)(i => g(i) - c(i))
        }
        val cgLit = typedLit(cg.map(_.toSeq).toSeq)
        val cellIdsLit = typedLit(cellIds.toSeq)
        def residual(vec: Column, cell: Column): Column =
          zip_with(vec,
            element_at(cgLit, array_position(cellIdsLit, cell).cast("int")),
            (a, b) => a - b)
        val assigned = emb.filter(col("vec_id") >= 10)
          .select(col("vec_id"), qv.as("qvv"),
            VectorExpressions.nearest_cells(col("embedding"), cellIds, cvs, 1)
              .getItem(0).as("cell"))
          .withColumn("rv", residual(col("qvv"), col("cell")))
          .select(col("vec_id"), pqCodes(codebook, col("rv"), M, SUB).as("codes"),
            col("cell"))
        val q = Dedup.pin(emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), qv.as("qq"),
            explode(VectorExpressions.nearest_cells(col("embedding"),
              cellIds, cvs, 2)).as("cell"))
          .withColumn("rq", residual(col("qq"), col("cell"))))
        val (rd, pruned) = cellServe(s, assigned, "graft_ivfpq_res", q)
        val wAdc = Window.partitionBy(col("query_id"))
          .orderBy(col("adc_dist"), col("neighbor_id"))
        val cand = rd
          .select(col("vec_id").as("neighbor_id"), col("codes"), col("cell"))
          .join(broadcast(q), Seq("cell"))
          .withColumn("adc_dist", adcDist(codebook, col("rq"), col("codes"), M, SUB))
          .withColumn("arank", row_number().over(wAdc))
          .filter(col("arank") <= 8)
          .select(col("query_id"), col("neighbor_id"), col("qq"),
            col("adc_dist"))
        // exact re-rank: the ONLY full-vector reads in the serve path —
        // ≤ 8 per query, fetched by key
        val corpusG = emb.filter(col("vec_id") >= 10)
          .select(col("vec_id").as("neighbor_id"), qv.as("nv"))
        // fused native L2² (round 14) — identical integer sum
        val exact = VectorExpressions.grid_l2sq(col("qq"), col("nv"))
        val wExact = Window.partitionBy(col("query_id"))
          .orderBy(col("exact_dist"), col("neighbor_id"))
        broadcast(cand).join(corpusG, Seq("neighbor_id"))
          .withColumn("exact_dist", exact)
          .withColumn("rank", row_number().over(wExact))
          .filter(col("rank") <= 3)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            col("adc_dist"), col("exact_dist"), lit(pruned).as("pruned"))
          .orderBy(col("query_id"), col("rank"))
      }
    }
  }

  val ivfpqResidualSql: String =
    """WITH emb AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |cents AS (SELECT vec_id AS cell, e AS ce, qv AS cg FROM emb
      |  WHERE vec_id < 4),
      |lows AS (SELECT vec_id, e, qv FROM emb ORDER BY vec_id LIMIT 16),
      |lowcell AS (SELECT vec_id, qv, cell, cg FROM (
      |  SELECT l.vec_id, l.qv, c.cell, c.cg, row_number() OVER (
      |      PARTITION BY l.vec_id ORDER BY
      |      list_dot_product(l.e, c.ce) /
      |        (sqrt(list_dot_product(l.e, l.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
      |  FROM lows l CROSS JOIN cents c) WHERE rn = 1),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
      |    list_transform(generate_series(1, 64),
      |      i -> qv[i] - cg[i]) AS rqv
      |  FROM lowcell),
      |corpus AS (SELECT vec_id, e, qv FROM emb WHERE vec_id >= 10),
      |qs AS (SELECT vec_id, e, qv FROM emb WHERE vec_id < 10),
      |cc AS (SELECT vec_id, qv, cell,
      |    list_transform(generate_series(1, 64), i -> qv[i] - cg[i]) AS rv
      |  FROM (
      |  SELECT r.vec_id, r.qv, c.cell, c.cg, row_number() OVER (
      |      PARTITION BY r.vec_id ORDER BY
      |      list_dot_product(r.e, c.ce) /
      |        (sqrt(list_dot_product(r.e, r.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
      |  FROM corpus r CROSS JOIN cents c) WHERE rn = 1),
      |pairs AS (SELECT v.vec_id, ss.s AS s, cb.code,
      |    CAST(list_sum(list_transform(generate_series(1, 16), i ->
      |      (v.rv[ss.s*16 + i] - cb.rqv[ss.s*16 + i])
      |      * (v.rv[ss.s*16 + i] - cb.rqv[ss.s*16 + i]))) AS BIGINT) AS d
      |  FROM cc v
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS s) ss
      |  CROSS JOIN cb),
      |codes AS (SELECT vec_id, s, min([d, code])[2] AS code
      |  FROM pairs GROUP BY vec_id, s),
      |qp AS (SELECT vec_id AS query_id, qv AS qq, cell,
      |    list_transform(generate_series(1, 64), i -> qv[i] - cg[i]) AS rq
      |  FROM (
      |  SELECT q.vec_id, q.qv, c.cell, c.cg, row_number() OVER (
      |      PARTITION BY q.vec_id ORDER BY
      |      list_dot_product(q.e, c.ce) /
      |        (sqrt(list_dot_product(q.e, q.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
      |  FROM qs q CROSS JOIN cents c) WHERE rn <= 2),
      |cand AS (SELECT qp.query_id, v.vec_id AS neighbor_id, qp.qq,
      |    CAST(sum(list_sum(list_transform(generate_series(1, 16), i ->
      |      (qp.rq[k.s*16 + i] - b.rqv[k.s*16 + i])
      |      * (qp.rq[k.s*16 + i] - b.rqv[k.s*16 + i])))) AS BIGINT)
      |      AS adc_dist
      |  FROM qp JOIN cc v USING (cell)
      |  JOIN codes k ON k.vec_id = v.vec_id
      |  JOIN cb b ON b.code = k.code
      |  GROUP BY qp.query_id, v.vec_id, qp.qq),
      |short AS (SELECT query_id, neighbor_id, qq, adc_dist FROM (
      |  SELECT cand.*, row_number() OVER (PARTITION BY query_id
      |      ORDER BY adc_dist, neighbor_id) AS arank FROM cand)
      |  WHERE arank <= 8),
      |rer AS (SELECT s.query_id, s.neighbor_id, s.adc_dist,
      |    CAST(list_sum(list_transform(generate_series(1, 64), i ->
      |      (s.qq[i] - r.qv[i]) * (s.qq[i] - r.qv[i]))) AS BIGINT)
      |      AS exact_dist
      |  FROM short s JOIN corpus r ON r.vec_id = s.neighbor_id),
      |ranked AS (SELECT query_id, neighbor_id, adc_dist, exact_dist,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY exact_dist, neighbor_id) AS rank
      |  FROM rer)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
      |  adc_dist, exact_dist, TRUE AS pruned
      |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** Runtime BLOOM-FILTER join pruning — the shuffle-side sibling of
    * q303's DPP, completing the runtime-optimization battery
    * (q303 partition pruning / q304 CBO / q306 AQE skew / HERE row-level
    * runtime filtering): when the fact side of a shuffled join is NOT
    * hive-partitioned on the join key, DPP has nothing to prune — but
    * Catalyst's InjectRuntimeFilter can still build a Bloom filter from
    * the FILTERED dim side's join keys and push a `might_contain`
    * predicate into the fact scan, discarding non-joining rows BEFORE
    * the shuffle instead of after it. At 100 TB that is the difference
    * between shuffling the table and shuffling the ~25% that survives
    * an URGENT-priority filter. Gate: lineitem⋈orders (merge-hinted so
    * broadcast doesn't preempt the rule) under a selective dim filter;
    * the application-side scan threshold is lowered to gate scale (and
    * RESTORED — the q306 conf discipline); the `might_contain`
    * expression's presence in the optimized plan is pinned IN the
    * hash-checked row, so a config or rule change that silently drops
    * the runtime filter is a hash mismatch, not a quiet full shuffle.
    * Bloom false positives cannot affect results — the join itself
    * re-checks equality; the filter only sheds rows early.
    */
  val bloomJoinFilter: Q = (s, dir) => withConfs(s,
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // default demands a >10 GB application-side scan; gate scale
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    // InjectRuntimeFilter only fires on PROBABLY-SHUFFLE joins — if
    // either side is broadcast-able by size there is no shuffle to
    // save. At gate scale the filtered dim fits under the 10 MB
    // default, so model the 100 TB reality (neither side broadcasts)
    "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
    val fact = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
    val dim = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val agg = fact.join(dim.hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("sum_cents"))
    // collect INSIDE the conf window (the q306 discipline): returning
    // the lazy frame would re-plan it AFTER the restore — bloom-free
    // full-shuffle execution under a bloom_pushed=true flag. Group
    // count is bounded by the returnflag vocabulary (3).
    val rows = agg.collect()
    val bloom = "might_contain".r.findFirstIn(
      agg.queryExecution.optimizedPlan.toString).isDefined
    import s.implicits._
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      .toDF("l_returnflag", "n_items", "sum_cents")
      .withColumn("bloom_pushed", lit(bloom))
      .orderBy(col("l_returnflag"))
  }

  val bloomJoinFilterSql: String =
    """SELECT l_returnflag, count(*) AS n_items,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |    AS BIGINT)) AS BIGINT) AS sum_cents,
      |  TRUE AS bloom_pushed
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Event-time TIMER sessionization — the SIXTEENTH streaming gate,
    * covering the one transformWithState surface q263/q312/q315 leave
    * ungated: TIMERS (TimeMode.EventTime + registerTimer /
    * handleExpiredTimer — the new API's replacement for
    * flatMapGroupsWithState's timeouts, whose old surface q209 gates).
    * Same contract as q209: 30-minute-gap user sessions over the 4+1
    * staged micro-batches, sessions closed mid-stream by gap-exceeding
    * events and at end-of-stream by the sentinel-driven watermark
    * firing every pending timer; the batch gaps-and-islands oracle is
    * IDENTICAL — the gate proves the new timer machinery reproduces the
    * old API's semantics exactly (the migration contract for every
    * production sessionizer moving to transformWithState).
    * [[graft.streaming.EventStreams.TimerSessionProcessor]] deletes
    * stale timers per input batch so a cross-batch-extended session
    * never double-emits through its superseded timer. Scale: one
    * struct + one timer per ACTIVE user, both evicted at expiry.
    */
  val streamTimerSessions: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val srcDir = scratch("graft_stream_tsess_src")
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("double").as("value"))
    val bounds = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0L, 4L)
      else (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(hi - lo, 4L)
    Staging.stageSlices(ev, unix_micros(col("ts")), 4, lo, span, srcDir,
      scratch("graft_stream_tsess_stage"), Seq(col("event_id")))
    // sentinel: advances the watermark past every pending timer so the
    // trailing batch flushes all open sessions (the q209 idiom)
    Staging.stageOne(s.range(1).select(lit(-1L).as("event_id"),
      timestamp_micros(lit(hi + 30L * 86400L * 1000000L)).as("ts"),
      lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
      lit(0.0).as("value")), 4, srcDir, scratch("graft_stream_tsess_sent"))
    withConfs(s, "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val stream = s.readStream
        .schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString)
        .as[graft.streaming.EventStreams.Event]
      val sessions = graft.streaming.EventStreams.timerSessions(stream)(s)
      val qname = "graft_stream_tsess_sink"
      val sq = sessions.toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName(qname).trigger(Trigger.AvailableNow()).start()
      sq.awaitTermination()
      s.table(qname)
        .filter(col("user_id") >= 0)
        .select(col("user_id"), col("start_us"), col("end_us"),
          col("n_events"), col("total_cents"))
        .orderBy(col("user_id"), col("start_us"))
    }
  }

  /** Same text as q209's oracle: the new-API sessionizer must
    * reproduce the old API's gaps-and-islands semantics exactly.
    */
  val streamTimerSessionsSql: String = streamSessionsSql

  /** ADC recall audit — the completeness critic over the IVF-PQ serve
    * path: q311 ranks by compressed-code distances, q317 re-ranks the
    * survivors exactly, but no gate MEASURES what the compression and
    * the nprobe=2 probe actually cost. This gate computes, per query,
    * recall@3 of the ADC ranking against the EXACT top-3 (brute
    * integer-grid L2 over the whole corpus — the oracle-twin
    * formulation: |queries| is fixed at ≤10, so the brute side is
    * bounded by construction, never corpus×corpus). The hash pins the
    * measured number: a codebook regression, a probe-set change, or an
    * ADC arithmetic drift all move recall and mismatch. This is the
    * audit loop a production ANN service runs continuously — serve
    * from codes, sample queries, recall-check against exact — here as
    * a standing gate. The measured number at sf0.01 — mean recall@3
    * ≈ 0.27 under this gate's deliberately tiny configuration (4
    * untrained cells, 16-entry codebook, no residuals) — is the
    * honest cost of serving from codes alone, and the quantitative
    * justification for q317's exact re-rank stage (which recovers the
    * true top-k from a widened ADC shortlist). Scale: the exact side
    * is the audit's sampled cost (k queries × one corpus scan), not
    * the serve path.
    */
  val adcRecall: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExpressions
    val M = 4; val SUB = 16; val K = 16
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val qv = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val cents: Array[(Long, Array[Float])] = emb.filter(col("vec_id") < 4)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val codebook: Array[Array[Long]] = emb.orderBy(col("vec_id")).limit(K)
      .select(qv.as("qv")).collect().map(_.getSeq[Long](0).toArray)
    if (cents.isEmpty || codebook.isEmpty) {
      emb.select(col("vec_id").as("query_id"), lit(0L).as("n_hits"),
        lit(0.0).as("recall")).filter(lit(false))
    } else {
      val cellIds = cents.map(_._1)
      val cvs = cents.map(_._2)
      val assigned = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id"), qv.as("qvv"),
          VectorExpressions.nearest_cells(col("embedding"), cellIds, cvs, 1)
            .getItem(0).as("cell"))
        .select(col("vec_id"), pqCodes(codebook, col("qvv"), M, SUB).as("codes"),
          col("cell"))
      val q = Dedup.pin(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), qv.as("qq"),
          explode(VectorExpressions.nearest_cells(col("embedding"), cellIds,
            cvs, 2)).as("cell")))
      val (rd, _) = cellServe(s, assigned, "graft_adc_recall", q)
      val wAdc = Window.partitionBy(col("query_id"))
        .orderBy(col("adc_dist"), col("neighbor_id"))
      val adcTop = rd
        .select(col("vec_id").as("neighbor_id"), col("codes"), col("cell"))
        .join(broadcast(q), Seq("cell"))
        .withColumn("adc_dist", adcDist(codebook, col("qq"), col("codes"), M, SUB))
        .withColumn("rank", row_number().over(wAdc))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"))
      // exact side: |queries| ≤ 10 by construction × one corpus scan
      val queries = Dedup.pin(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), qv.as("qq")))
      // fused native L2² (round 14) — identical integer sum
      val exact = VectorExpressions.grid_l2sq(col("qq"), col("nv"))
      val wEx = Window.partitionBy(col("query_id"))
        .orderBy(col("exact_dist"), col("neighbor_id"))
      val exactTop = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("neighbor_id"), qv.as("nv"))
        .crossJoin(broadcast(queries))
        .withColumn("exact_dist", exact)
        .withColumn("rank", row_number().over(wEx))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"))
      val hits = adcTop.join(exactTop, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      queries.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / 3.0, 6)
            .as("recall"))
        .orderBy(col("query_id"))
    }
  }

  val adcRecallSql: String =
    """WITH emb AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, qv
      |  FROM emb ORDER BY vec_id LIMIT 16),
      |cents AS (SELECT vec_id AS cell, e AS ce FROM emb WHERE vec_id < 4),
      |corpus AS (SELECT vec_id, e, qv FROM emb WHERE vec_id >= 10),
      |qs AS (SELECT vec_id, e, qv FROM emb WHERE vec_id < 10),
      |cc AS (SELECT vec_id, qv, cell FROM (
      |  SELECT r.vec_id, r.qv, c.cell, row_number() OVER (
      |      PARTITION BY r.vec_id ORDER BY
      |      list_dot_product(r.e, c.ce) /
      |        (sqrt(list_dot_product(r.e, r.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
      |  FROM corpus r CROSS JOIN cents c) WHERE rn = 1),
      |pairs AS (SELECT v.vec_id, ss.s AS s, cb.code,
      |    CAST(list_sum(list_transform(generate_series(1, 16), i ->
      |      (v.qv[ss.s*16 + i] - cb.qv[ss.s*16 + i])
      |      * (v.qv[ss.s*16 + i] - cb.qv[ss.s*16 + i]))) AS BIGINT) AS d
      |  FROM cc v
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS s) ss
      |  CROSS JOIN cb),
      |codes AS (SELECT vec_id, s, min([d, code])[2] AS code
      |  FROM pairs GROUP BY vec_id, s),
      |qp AS (SELECT vec_id AS query_id, qv AS qq, cell FROM (
      |  SELECT q.vec_id, q.qv, c.cell, row_number() OVER (
      |      PARTITION BY q.vec_id ORDER BY
      |      list_dot_product(q.e, c.ce) /
      |        (sqrt(list_dot_product(q.e, q.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
      |  FROM qs q CROSS JOIN cents c) WHERE rn <= 2),
      |cand AS (SELECT qp.query_id, v.vec_id AS neighbor_id,
      |    CAST(sum(list_sum(list_transform(generate_series(1, 16), i ->
      |      (qp.qq[k.s*16 + i] - b.qv[k.s*16 + i])
      |      * (qp.qq[k.s*16 + i] - b.qv[k.s*16 + i])))) AS BIGINT)
      |      AS adc_dist
      |  FROM qp JOIN cc v USING (cell)
      |  JOIN codes k ON k.vec_id = v.vec_id
      |  JOIN cb b ON b.code = k.code
      |  GROUP BY qp.query_id, v.vec_id),
      |adctop AS (SELECT query_id, neighbor_id FROM (
      |  SELECT cand.*, row_number() OVER (PARTITION BY query_id
      |      ORDER BY adc_dist, neighbor_id) AS rank FROM cand)
      |  WHERE rank <= 3),
      |extop AS (SELECT query_id, neighbor_id FROM (
      |  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |      CAST(list_sum(list_transform(generate_series(1, 64), i ->
      |        (q.qv[i] - r.qv[i]) * (q.qv[i] - r.qv[i]))) AS BIGINT),
      |      r.vec_id) AS rank
      |  FROM qs q CROSS JOIN corpus r) WHERE rank <= 3),
      |hits AS (SELECT a.query_id, count(*) AS n_hits
      |  FROM adctop a JOIN extop x USING (query_id, neighbor_id)
      |  GROUP BY a.query_id)
      |SELECT q.vec_id AS query_id,
      |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
      |  round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 3.0, 6) AS recall
      |FROM qs q LEFT JOIN hits h ON h.query_id = q.vec_id
      |ORDER BY query_id""".stripMargin

  /** MapState + ListState — the SEVENTEENTH streaming gate, completing
    * the transformWithState state-variable surface (ValueState q263,
    * evolution q312, initial state q315, timers q319, map+list HERE):
    * per event, a MapState keyed by event type emits the user's
    * count-so-far for that type (RocksDB keys each map entry
    * separately — a wide type vocabulary never materializes as one
    * blob) and a ListState holding the user's trailing ≤3 cent values
    * emits their sum (the bounded sliding window every rate-limiter /
    * rolling-average keeps per key). Both are exactly batch window
    * functions — partitioned row_number and a ROWS 2 PRECEDING sum —
    * so the oracle is total. Scale: state per user is |types seen| map
    * entries + ≤3 longs.
    */
  val streamMapListState: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val srcDir = scratch("graft_stream_ml_src")
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("double").as("value"))
    val bounds = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0L, 4L)
      else (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(hi - lo, 4L)
    Staging.stageSlices(ev, unix_micros(col("ts")), 4, lo, span, srcDir,
      scratch("graft_stream_ml_stage"), Seq(col("event_id")))
    withConfs(s, "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val stream = s.readStream
        .schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString)
        .as[graft.streaming.EventStreams.Event]
      val stats = graft.streaming.EventStreams.mapListStats(stream)(s)
      val qname = "graft_stream_ml_sink"
      val sq = stats.toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName(qname).trigger(Trigger.AvailableNow()).start()
      sq.awaitTermination()
      s.table(qname)
        .select(col("user_id"), col("event_id"), col("type_n"),
          col("last3_cents"))
        .orderBy(col("user_id"), col("event_id"))
    }
  }

  val streamMapListStateSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events)
      |SELECT user_id, event_id,
      |  CAST(row_number() OVER (PARTITION BY user_id, event_type
      |    ORDER BY us, event_id) AS BIGINT) AS type_n,
      |  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS 2 PRECEDING) AS BIGINT) AS last3_cents
      |FROM e ORDER BY user_id, event_id""".stripMargin

  /** Day-2 INCREMENTAL IVF-PQ index maintenance — the IVM story for the
    * code store, completing the family (q117 exact / q265 MinHash /
    * q299 semantic — and now the serving INDEX itself): at 100 TB the
    * ANN index is never rebuilt, it is APPENDED — day-2 vectors are
    * assigned and PQ-encoded against the FROZEN codebook (only the Δ
    * frame ever enters the encoder — structural, the q299 discipline)
    * and their 4-byte codes land as NEW files in the existing
    * hive-partitioned cell directories; day-1 files are never touched.
    * The serve path then answers from the two-generation union. Two
    * proofs ride in every hash-checked row: `pruned` (directory pruning
    * still works across both file generations) and `n_store_files` —
    * with one file per (write, cell), the append leaves
    * |cells(day1)| + |cells(Δ)| files where a REBUILD would collapse to
    * |cells(all)|; the oracle recomputes both distinct-cell counts from
    * the assignment CTEs, so a silent rebuild (or a day-2 job that
    * rewrote day-1 data) is a hash mismatch. Ranking must equal q311's
    * single-shot index exactly — the incremental store serves the same
    * answers.
    */
  val ivfpqIncremental: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExpressions
    val M = 4; val SUB = 16; val K = 16
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val qv = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val cents: Array[(Long, Array[Float])] = emb.filter(col("vec_id") < 4)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val codebook: Array[Array[Long]] = emb.orderBy(col("vec_id")).limit(K)
      .select(qv.as("qv")).collect().map(_.getSeq[Long](0).toArray)
    if (cents.isEmpty || codebook.isEmpty) {
      emb.select(col("vec_id").as("query_id"), lit(1).as("rank"),
        col("vec_id").as("neighbor_id"), lit(0L).as("adc_dist"),
        lit(0L).as("n_store_files"), lit(true).as("pruned"))
        .filter(lit(false))
    } else {
      val cellIds = cents.map(_._1)
      val cvs = cents.map(_._2)
      def encode(src: DataFrame): DataFrame = src
        .select(col("vec_id"), qv.as("qvv"),
          VectorExpressions.nearest_cells(col("embedding"), cellIds, cvs, 1)
            .getItem(0).as("cell"))
        .select(col("vec_id"), pqCodes(codebook, col("qvv"), M, SUB).as("codes"),
          col("cell"))
      val day1 = encode(emb.filter(col("vec_id") >= 10
        && col("vec_id") % 10 =!= 0))
      val day2 = encode(emb.filter(col("vec_id") >= 10
        && col("vec_id") % 10 === 0))
      val tmp = scratch("graft_ivfpq_inc").toString
      // one file per (write, cell): the repartition makes the append's
      // file arithmetic deterministic (the q313 idiom)
      day1.repartition(col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(s"$tmp/codes")
      day2.repartition(col("cell")).write.mode("append")
        .partitionBy("cell").parquet(s"$tmp/codes")
      // bounded: ≤ |cells| directories
      val nStoreFiles = {
        val kids = new java.io.File(s"$tmp/codes").listFiles()
        (if (kids == null) Array.empty[java.io.File] else kids)
          .filter(f => f.isDirectory && f.getName.startsWith("cell="))
          .map(d => Writers.listParquetFiles(d.toString).size.toLong).sum
      }
      val q = Dedup.pin(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), qv.as("qq"),
          explode(VectorExpressions.nearest_cells(col("embedding"), cellIds,
            cvs, 2)).as("cell")))
      val probeCells = q.select(col("cell")).distinct()
        .collect().map(_.getLong(0)).sorted
      val probe = if (probeCells.isEmpty) lit(false)
        else col("cell").isin(probeCells: _*)
      val rd = Readers.parquetWithSchema(s, s"$tmp/codes", day1.schema)
        .filter(probe)
      val pruned = "PartitionFilters: \\[[^\\]]*(IN|INSET)[^\\]]*".r
        .findFirstIn(rd.queryExecution.executedPlan.toString).isDefined
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("adc_dist"), col("neighbor_id"))
      rd.select(col("vec_id").as("neighbor_id"), col("codes"), col("cell"))
        .join(broadcast(q), Seq("cell"))
        .withColumn("adc_dist", adcDist(codebook, col("qq"), col("codes"), M, SUB))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("adc_dist"), lit(nStoreFiles).as("n_store_files"),
          lit(pruned).as("pruned"))
        .orderBy(col("query_id"), col("rank"))
    }
  }

  val ivfpqIncrementalSql: String =
    """WITH emb AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, qv
      |  FROM emb ORDER BY vec_id LIMIT 16),
      |cents AS (SELECT vec_id AS cell, e AS ce FROM emb WHERE vec_id < 4),
      |corpus AS (SELECT vec_id, e, qv FROM emb WHERE vec_id >= 10),
      |qs AS (SELECT vec_id, e, qv FROM emb WHERE vec_id < 10),
      |cc AS (SELECT vec_id, qv, cell FROM (
      |  SELECT r.vec_id, r.qv, c.cell, row_number() OVER (
      |      PARTITION BY r.vec_id ORDER BY
      |      list_dot_product(r.e, c.ce) /
      |        (sqrt(list_dot_product(r.e, r.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
      |  FROM corpus r CROSS JOIN cents c) WHERE rn = 1),
      |nf AS (SELECT
      |    (SELECT count(DISTINCT cell) FROM cc WHERE vec_id % 10 <> 0)
      |  + (SELECT count(DISTINCT cell) FROM cc WHERE vec_id % 10 = 0)
      |    AS n_store_files),
      |pairs AS (SELECT v.vec_id, ss.s AS s, cb.code,
      |    CAST(list_sum(list_transform(generate_series(1, 16), i ->
      |      (v.qv[ss.s*16 + i] - cb.qv[ss.s*16 + i])
      |      * (v.qv[ss.s*16 + i] - cb.qv[ss.s*16 + i]))) AS BIGINT) AS d
      |  FROM cc v
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS s) ss
      |  CROSS JOIN cb),
      |codes AS (SELECT vec_id, s, min([d, code])[2] AS code
      |  FROM pairs GROUP BY vec_id, s),
      |qp AS (SELECT vec_id AS query_id, qv AS qq, cell FROM (
      |  SELECT q.vec_id, q.qv, c.cell, row_number() OVER (
      |      PARTITION BY q.vec_id ORDER BY
      |      list_dot_product(q.e, c.ce) /
      |        (sqrt(list_dot_product(q.e, q.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
      |  FROM qs q CROSS JOIN cents c) WHERE rn <= 2),
      |cand AS (SELECT qp.query_id, v.vec_id AS neighbor_id,
      |    CAST(sum(list_sum(list_transform(generate_series(1, 16), i ->
      |      (qp.qq[k.s*16 + i] - b.qv[k.s*16 + i])
      |      * (qp.qq[k.s*16 + i] - b.qv[k.s*16 + i])))) AS BIGINT)
      |      AS adc_dist
      |  FROM qp JOIN cc v USING (cell)
      |  JOIN codes k ON k.vec_id = v.vec_id
      |  JOIN cb b ON b.code = k.code
      |  GROUP BY qp.query_id, v.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, adc_dist, row_number()
      |    OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id)
      |    AS rank
      |  FROM cand)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
      |  adc_dist, (SELECT CAST(n_store_files AS BIGINT) FROM nf)
      |    AS n_store_files, TRUE AS pruned
      |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  val stateSchemaEvolutionSql: String =
    """WITH e AS (SELECT user_id, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |b AS (SELECT min(us) AS lo,
      |    greatest(max(us) - min(us), 4) AS span FROM e),
      |p AS (SELECT user_id, event_id, us, cents,
      |    us >= lo + 2 * span // 4 AS ph2 FROM e CROSS JOIN b)
      |SELECT user_id, event_id,
      |  CAST(row_number() OVER w AS BIGINT) AS cum_n,
      |  CAST(sum(cents) OVER w AS BIGINT) AS cum_cents,
      |  CASE WHEN ph2 THEN
      |    CAST(max(CASE WHEN ph2 THEN cents END) OVER w AS BIGINT)
      |  END AS max_cents
      |FROM p WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
      |  ROWS UNBOUNDED PRECEDING)
      |ORDER BY user_id, event_id""".stripMargin

  val ivfpqAdcSql: String =
    """WITH emb AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, qv
      |  FROM emb ORDER BY vec_id LIMIT 16),
      |cents AS (SELECT vec_id AS cell, e AS ce FROM emb WHERE vec_id < 4),
      |corpus AS (SELECT vec_id, e, qv FROM emb WHERE vec_id >= 10),
      |qs AS (SELECT vec_id, e, qv FROM emb WHERE vec_id < 10),
      |cc AS (SELECT vec_id, qv, cell FROM (
      |  SELECT r.vec_id, r.qv, c.cell, row_number() OVER (
      |      PARTITION BY r.vec_id ORDER BY
      |      list_dot_product(r.e, c.ce) /
      |        (sqrt(list_dot_product(r.e, r.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
      |  FROM corpus r CROSS JOIN cents c) WHERE rn = 1),
      |pairs AS (SELECT v.vec_id, ss.s AS s, cb.code,
      |    CAST(list_sum(list_transform(generate_series(1, 16), i ->
      |      (v.qv[ss.s*16 + i] - cb.qv[ss.s*16 + i])
      |      * (v.qv[ss.s*16 + i] - cb.qv[ss.s*16 + i]))) AS BIGINT) AS d
      |  FROM cc v
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS s) ss
      |  CROSS JOIN cb),
      |codes AS (SELECT vec_id, s, min([d, code])[2] AS code
      |  FROM pairs GROUP BY vec_id, s),
      |qp AS (SELECT vec_id AS query_id, qv AS qq, cell FROM (
      |  SELECT q.vec_id, q.qv, c.cell, row_number() OVER (
      |      PARTITION BY q.vec_id ORDER BY
      |      list_dot_product(q.e, c.ce) /
      |        (sqrt(list_dot_product(q.e, q.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
      |  FROM qs q CROSS JOIN cents c) WHERE rn <= 2),
      |cand AS (SELECT qp.query_id, v.vec_id AS neighbor_id,
      |    CAST(sum(list_sum(list_transform(generate_series(1, 16), i ->
      |      (qp.qq[k.s*16 + i] - b.qv[k.s*16 + i])
      |      * (qp.qq[k.s*16 + i] - b.qv[k.s*16 + i])))) AS BIGINT)
      |      AS adc_dist
      |  FROM qp JOIN cc v USING (cell)
      |  JOIN codes k ON k.vec_id = v.vec_id
      |  JOIN cb b ON b.code = k.code
      |  GROUP BY qp.query_id, v.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, adc_dist, row_number()
      |    OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id)
      |    AS rank
      |  FROM cand)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
      |  adc_dist, TRUE AS pruned
      |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
}
