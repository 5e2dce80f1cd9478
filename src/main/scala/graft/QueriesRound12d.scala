package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.io.{SnapshotLog, Writers}

/** Round-12 widening, fourth wave: the remaining DML/maintenance verbs
  * on the manifest-committed store — MERGE (upsert), optimistic
  * concurrency, and OPTIMIZE-as-a-commit.
  */
trait QueriesRound12d extends QueriesRound12c {

  private val flatSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_chars", LongType)))

  private def readFlat(s: SparkSession, store: String,
                       files: Seq[String]): DataFrame =
    if (files.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], flatSchema)
    else s.read.option("basePath", store).schema(flatSchema)
      .parquet(files: _*)

  /** MERGE (upsert) as a copy-on-write commit — the DML verb the
    * snapshot family still lacked (q332 covers insert-append and
    * delete; MERGE is both at once, keyed by a SOURCE relation): a
    * broadcast source of updates (doc_id % 6 == 0 → n_chars + 1000)
    * and inserts (doc_id % 97 == 0 → a new id at +1,000,000 with
    * n_chars 7) is FULL-OUTER-joined against exactly the touched
    * buckets' v3 slice — matched rows take the source value, unmatched
    * slice rows carry over, source-only rows insert — and the merged
    * slice replaces the touched buckets' files in the v4 manifest.
    * Both snapshots ride in the hash: v4 must serve the merged table
    * while v3, read AFTER the merge, still serves every pre-merge
    * value (snapshot isolation across DML, the q332 discipline), and
    * `n_files` is recomputed by the oracle from the full four-commit
    * bucket arithmetic — an eager full rewrite, a merge that missed a
    * bucket, or one that rewrote untouched buckets all mismatch.
    * Scale: merge cost is O(touched buckets' slice) + a broadcast of
    * the source Δ — never a corpus rewrite; the source join is
    * broadcast so the slice never shuffles.
    */
  val snapshotMerge: Q = (s, dir) => {
    val store = buildDocSnapshotStore(s, dir)
    val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val src = d.filter(pmod(col("doc_id"), lit(6)) === 0)
      .select(col("doc_id"), (col("n_chars") + 1000).as("new_chars"))
      .unionAll(d.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          lit(7L).as("new_chars")))
    // touched buckets = the source's bucket footprint (+1,000,000 is
    // ≡ 0 mod 8, so insert rows land in their origin's bucket)
    val tbm = src.select(pmod(col("doc_id"), lit(8)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val m3 = SnapshotLog.files(store, 3)
    def inTbm(path: String): Boolean =
      tbm.exists(b => path.contains(s"/bucket=$b/"))
    def listAll(): Seq[String] = {
      val kids = new java.io.File(store).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids).toIndexedSeq
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .flatMap(dd => Writers.listParquetFiles(dd.toString))
        .sorted
    }
    val before = listAll()
    if (tbm.nonEmpty) {
      val slice = readFiles(s, store, m3.filter(inTbm))
        .select(col("doc_id"), col("n_chars"))
      slice.join(broadcast(src), Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("new_chars"), col("n_chars")).as("n_chars"),
          pmod(col("doc_id"), lit(8)).cast("int").as("bucket"))
        .repartition(col("bucket")).write.mode("append")
        .partitionBy("bucket").parquet(store)
    }
    val newFiles = listAll().filterNot(before.contains)
    val v4 = SnapshotLog.commit(store, m3.filterNot(inTbm) ++ newFiles)
    def snapAgg(v: Int): DataFrame = {
      val files = SnapshotLog.files(store, v)
      readFiles(s, store, files)
        .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"))
        .select(lit(v).as("snap"), col("n_rows"), col("sum_chars"),
          lit(files.size.toLong).as("n_files"))
    }
    snapAgg(3).unionAll(snapAgg(v4)).orderBy(col("snap"))
  }

  val snapshotMergeSql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |base AS (SELECT * FROM d WHERE doc_id % 10 <> 0),
      |delta AS (SELECT * FROM d WHERE doc_id % 10 = 0),
      |tb AS (SELECT DISTINCT doc_id % 8 AS b FROM d WHERE doc_id % 20 = 5),
      |f1 AS (SELECT count(DISTINCT doc_id % 8) AS nf FROM base),
      |f2 AS (SELECT count(DISTINCT doc_id % 8) AS nf FROM delta),
      |tf AS (SELECT
      |    (SELECT count(DISTINCT doc_id % 8) FROM base
      |      WHERE doc_id % 8 IN (SELECT b FROM tb))
      |  + (SELECT count(DISTINCT doc_id % 8) FROM delta
      |      WHERE doc_id % 8 IN (SELECT b FROM tb)) AS nf),
      |rw AS (SELECT count(DISTINCT doc_id % 8) AS nf FROM d
      |  WHERE doc_id % 8 IN (SELECT b FROM tb) AND doc_id % 20 <> 5),
      |v3 AS (SELECT doc_id, n_chars FROM d WHERE doc_id % 20 <> 5),
      |tbm AS (SELECT DISTINCT doc_id % 8 AS b FROM d
      |  WHERE doc_id % 6 = 0 OR doc_id % 97 = 0),
      |-- v3's per-bucket file count over the merge-touched buckets:
      |-- delete-touched buckets were compacted to 1 file; others carry
      |-- their (base, delta) generations
      |tfm AS (SELECT
      |    (SELECT count(*) FROM tbm WHERE b IN (SELECT b FROM tb))
      |  + (SELECT count(DISTINCT doc_id % 8) FROM base
      |      WHERE doc_id % 8 IN (SELECT b FROM tbm)
      |      AND doc_id % 8 NOT IN (SELECT b FROM tb))
      |  + (SELECT count(DISTINCT doc_id % 8) FROM delta
      |      WHERE doc_id % 8 IN (SELECT b FROM tbm)
      |      AND doc_id % 8 NOT IN (SELECT b FROM tb)) AS nf),
      |nf3 AS (SELECT (SELECT nf FROM f1) + (SELECT nf FROM f2)
      |  - (SELECT nf FROM tf) + (SELECT nf FROM rw) AS nf),
      |v4 AS (SELECT doc_id,
      |    CASE WHEN doc_id % 6 = 0 THEN n_chars + 1000 ELSE n_chars END
      |      AS n_chars
      |  FROM v3
      |  UNION ALL
      |  SELECT doc_id + 1000000, 7 FROM d WHERE doc_id % 97 = 0),
      |s3 AS (SELECT 3 AS snap, count(*) AS n_rows,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |    CAST((SELECT nf FROM nf3) AS BIGINT) AS n_files FROM v3),
      |s4 AS (SELECT 4 AS snap, count(*) AS n_rows,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |    CAST((SELECT nf FROM nf3) - (SELECT nf FROM tfm)
      |      + (SELECT count(*) FROM tbm) AS BIGINT) AS n_files FROM v4)
      |SELECT * FROM s3 UNION ALL SELECT * FROM s4 ORDER BY snap""".stripMargin

  /** Optimistic-concurrency commit conflict — the multi-writer half of
    * the snapshot contract: two writers build Δ-appends against the
    * SAME base version; both write their data files first (data files
    * are cheap and unreferenced until committed — the real protocol),
    * then race the manifest. Writer A's commit-if-base(v1) wins v2;
    * writer B's commit-if-base(v1) must FAIL (the CREATE_NEW of the
    * v2 manifest is the whole lock — no coordinator), and B REBASES:
    * re-reads the current version, rebuilds its file set as
    * current ∪ its own Δ files, and lands v3. The final table must
    * contain BOTH writers' rows exactly once — a lost update (B's
    * retry stomping A's files) or a double-commit (B's first attempt
    * succeeding) both mismatch the oracle's row arithmetic.
    * `conflict_detected` pins that the race actually happened. Scale:
    * conflict cost is one manifest re-read + re-commit; data files are
    * never rewritten on rebase (append-only Δs commute).
    */
  val snapshotOcc: Q = (s, dir) => {
    val store = scratch("graft_snapocc").toString + "/docs"
    val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    d.repartition(4).write.mode("overwrite").parquet(store)
    def files(): Seq[String] = Writers.listParquetFiles(store)
    val m1 = files()
    val base = SnapshotLog.commit(store, m1)
    // both writers stage their data files against base v1
    d.filter(pmod(col("doc_id"), lit(11)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("n_chars"))
      .coalesce(1).write.mode("append").parquet(store)
    val aFiles = files().filterNot(m1.contains)
    d.filter(pmod(col("doc_id"), lit(13)) === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("n_chars"))
      .coalesce(1).write.mode("append").parquet(store)
    val bFiles = files().filterNot(m1.contains).filterNot(aFiles.contains)
    // A commits first and wins
    val aVer = SnapshotLog.commitIfBase(store, m1 ++ aFiles, base)
    // B's stale-base attempt must conflict; B rebases onto the current
    // version (its Δ files are untouched — append-only Δs commute)
    val bFirst = SnapshotLog.commitIfBase(store, m1 ++ bFiles, base)
    val cur = SnapshotLog.latest(store)
    val bVer = SnapshotLog.commitIfBase(store,
      SnapshotLog.files(store, cur) ++ bFiles, cur)
    val fin = readFlat(s, store, SnapshotLog.files(store, SnapshotLog.latest(store)))
    fin.agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"))
      .select(lit(base).as("base_version"),
        lit(aVer.getOrElse(-1)).as("a_version"),
        lit(bFirst.isEmpty).as("conflict_detected"),
        lit(bVer.getOrElse(-1)).as("b_version"),
        col("n_rows"), col("sum_chars"),
        lit(SnapshotLog.files(store, SnapshotLog.latest(store)).size.toLong)
          .as("n_files"))
  }

  val snapshotOccSql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |fin AS (SELECT doc_id, n_chars FROM d
      |  UNION ALL SELECT doc_id + 1000000, n_chars FROM d WHERE doc_id % 11 = 0
      |  UNION ALL SELECT doc_id + 2000000, n_chars FROM d WHERE doc_id % 13 = 0)
      |SELECT 1 AS base_version, 2 AS a_version, TRUE AS conflict_detected,
      |  3 AS b_version, count(*) AS n_rows,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(least(4, (SELECT count(*) FROM d))
      |    + (SELECT CASE WHEN count(*) > 0 THEN 1 ELSE 0 END FROM d
      |       WHERE doc_id % 11 = 0)
      |    + (SELECT CASE WHEN count(*) > 0 THEN 1 ELSE 0 END FROM d
      |       WHERE doc_id % 13 = 0) AS BIGINT) AS n_files
      |FROM fin""".stripMargin

  /** Schema EVOLUTION on the snapshot store — the add-a-column verb: v1
    * lands (doc_id, n_chars) for the even ids; v2 appends the odd ids
    * WITH a new `lang` column (files of two different physical schemas
    * now coexist under one log). A v2 read merges the schemas — old
    * rows take NULL lang, new rows carry theirs — while a v1 read,
    * resolved from ITS manifest, still has exactly the old two-column
    * shape (`n_cols_v1`/`n_cols_v2` are read from the actual frames and
    * ride in the hash). The oracle recomputes the per-lang counts with
    * the NULL bucket from the id arithmetic. The 100 TB story: crawl
    * schemas grow monthly; a store that requires rewriting history to
    * add a column rewrites petabytes, and a reader pinned to an old
    * snapshot must keep seeing the old shape. Scale: evolution cost is
    * zero data movement — only new files carry the new column.
    */
  val snapshotEvolve: Q = (s, dir) => {
    val store = scratch("graft_snapevo").toString + "/docs"
    val d = t(s, dir, "documents")
    d.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id"), col("n_chars"))
      .repartition(2).write.mode("overwrite").parquet(store)
    def files(): Seq[String] = Writers.listParquetFiles(store)
    val m1 = files()
    SnapshotLog.commit(store, m1)
    d.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), col("n_chars"), col("lang"))
      .repartition(2).write.mode("append").parquet(store)
    SnapshotLog.commit(store, files())
    val v1 = if (m1.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], flatSchema)
    else s.read.option("mergeSchema", "true")
      .parquet(SnapshotLog.files(store, 1): _*)
    val m2 = SnapshotLog.files(store, 2)
    val v2 = if (m2.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], flatSchema)
        .withColumn("lang", lit(null).cast("string"))
    else s.read.option("mergeSchema", "true").parquet(m2: _*)
    val v2l = if (v2.columns.contains("lang")) v2
    else v2.withColumn("lang", lit(null).cast("string"))
    v2l.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .select(col("lang"), col("n_docs"), col("sum_chars"),
        lit(v1.columns.length).as("n_cols_v1"),
        lit(v2.columns.length).as("n_cols_v2"))
      .orderBy(col("lang").asc_nulls_first)
  }

  val snapshotEvolveSql: String =
    """WITH d AS (SELECT doc_id, n_chars, lang FROM documents),
      |v2 AS (SELECT doc_id, n_chars, NULL AS lang FROM d
      |    WHERE doc_id % 2 = 0
      |  UNION ALL SELECT doc_id, n_chars, lang FROM d WHERE doc_id % 2 = 1)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  2 AS n_cols_v1, 3 AS n_cols_v2
      |FROM v2 GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin

  /** TRANSACTIONAL streaming sink — exactly-once delivery into the
    * snapshot store by making the COMMIT carry the batch identity: each
    * micro-batch's foreachBatch writes its data files, then commits
    * manifest version batchId+1 — and a batch whose version ALREADY
    * EXISTS skips its write entirely (the txnVersion protocol; the
    * CREATE_NEW manifest is the dedup ledger, not file names or sink
    * state). The gate runs the 4-slice stream, then REPLAYS it from a
    * FRESH checkpoint against the same store: every replayed batch
    * finds its version committed and adds NOTHING — `n_versions` stays
    * 4 and `replay_added_nothing` pins file-set identity, both in the
    * hash next to the content the oracle recomputes from the events
    * table. Composes q313 (replay-idempotent sink) with the log: there
    * the dedup lived in data keys, here delivery itself is
    * transactional — the shape a 100 TB ingest needs when downstream
    * can't dedup. Scale: the idempotence check is one manifest stat per
    * batch, O(1), no data read.
    */
  val snapshotTxnSink: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = scratch("graft_txnsink_src")
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
      span, srcDir, scratch("graft_txnsink_stage"), Seq(col("event_id")))
    val store = scratch("graft_txnsink_store").toString + "/events"
    new java.io.File(store).mkdirs()
    def runOnce(): Unit = {
      val ckpt = scratch("graft_txnsink_ckpt").toString
      val sq = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          val version = batchId.toInt + 1
          if (SnapshotLog.versions(store).contains(version)) {
            // already committed by a prior attempt: consume WITHOUT
            // writing (the batch must still be executed — r11 gotcha)
            df.count()
            ()
          } else {
            val before = Writers.listParquetFiles(store)
            df.select(col("event_id"), col("user_id"), col("value"))
              .coalesce(1).write.mode("append").parquet(store)
            val now = Writers.listParquetFiles(store)
            val prev = if (version == 1) Seq.empty[String]
              else SnapshotLog.files(store, version - 1)
            // loud on conflict (VERDICT r13 #6): single-writer sink, so
            // a lost race means external corruption — never advance past
            // it and silently drop the batch
            SnapshotLog.commitStrict(store,
              prev ++ now.filterNot(before.contains), version - 1)
            ()
          }
        }
        .start()
      sq.awaitTermination()
    }
    runOnce()
    val versionsAfter1 = SnapshotLog.versions(store)
    val filesAfter1 = SnapshotLog.files(store, versionsAfter1.last)
    runOnce() // fresh checkpoint, same store: every batch must skip
    val versionsAfter2 = SnapshotLog.versions(store)
    val filesAfter2 = SnapshotLog.files(store, versionsAfter2.last)
    val schema2 = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", org.apache.spark.sql.types.DoubleType)))
    val fin = if (filesAfter2.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], schema2)
    else s.read.schema(schema2).parquet(filesAfter2: _*)
    fin.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("long")
          .as("total_cents"))
      .select(col("user_id"), col("n_events"), col("total_cents"),
        lit(versionsAfter2.size.toLong).as("n_versions"),
        lit(versionsAfter1 == versionsAfter2 && filesAfter1 == filesAfter2)
          .as("replay_added_nothing"))
      .orderBy(col("user_id"))
  }

  val snapshotTxnSinkSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS total_cents,
      |  CAST(4 AS BIGINT) AS n_versions, TRUE AS replay_added_nothing
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** G.711 µ-law decode — the FULLY-GENERAL codec oracle: µ-law
    * expansion is a pure per-byte integer formula (sign/segment/
    * mantissa, the public g711.c chain), so unlike PNG/JPEG/GIF/ADPCM —
    * whose oracles need lossless constructions — the oracle here
    * recomputes the decode of ARBITRARY planted bytes directly in SQL.
    * Every md5 byte is a valid code; the gate decodes 16 codes per
    * document and hash-checks the first 8 samples against the formula,
    * plus the requantization fixed point (decode∘encode∘decode ≡
    * decode — re-encoding a decoded stream is lossless, the property
    * that makes µ-law transcoding pipelines idempotent;
    * `MulawSpec` pins it over all 256 codes and against the JDK's own
    * µ-law converter). Telephony/speech corpora ship µ-law in WAV
    * format-7 and .au constantly. Scale: row-local codegen, fuses into
    * the scan.
    */
  val mulawRoundtrip: Q = (s, dir) => {
    import graft.functions.MulawExpressions
    val codes = unhex(md5(concat(col("doc_id").cast("string"),
      lit("|ulaw")).cast("binary")))
    val base = t(s, dir, "documents")
      .select(col("doc_id").as("media_id"), codes.as("codes"))
      .withColumn("dec", MulawExpressions.mulaw_decode(col("codes")))
      .withColumn("dec2", MulawExpressions.mulaw_decode(
        MulawExpressions.mulaw_encode(col("dec"))))
      .select(col("media_id"), col("dec"),
        (col("dec2") <=> col("dec")).as("requant_fixedpoint"),
        explode(sequence(lit(0), lit(7))).as("k"))
    val off = col("k") * 2 + 1
    val lo = conv(hex(col("dec").substr(off, lit(1))), 16, 10).cast("long")
    val hi = conv(hex(col("dec").substr(off + 1, lit(1))), 16, 10)
      .cast("long")
    val u = lo + hi * 256
    base.select(col("media_id"), col("k"),
      when(u >= 32768, u - 65536).otherwise(u).as("sample_val"),
      col("requant_fixedpoint"))
      .orderBy(col("media_id"), col("k"))
  }

  val mulawRoundtripSql: String =
    """WITH ks AS (SELECT unnest(generate_series(0, 7)) AS k),
      |c AS (SELECT doc_id AS media_id, k,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|ulaw'),
      |      k * 2 + 1, 2))::BIGINT AS code
      |  FROM documents CROSS JOIN ks),
      |e AS (SELECT media_id, k, 255 - code AS u,
      |    ((((255 - code) % 16) * 8 + 132)
      |      << (((255 - code) // 16) % 8)) AS t
      |  FROM c)
      |SELECT media_id, CAST(k AS INTEGER) AS k,
      |  CAST(CASE WHEN u >= 128 THEN 132 - t ELSE t - 132 END AS BIGINT)
      |    AS sample_val,
      |  TRUE AS requant_fixedpoint
      |FROM e ORDER BY media_id, k""".stripMargin

  /** OPTIMIZE as a commit — small-file compaction that readers can
    * never half-see: v1 lands the table as 16 small files (the
    * streaming-sink accretion shape); OPTIMIZE reads v1 BY MANIFEST,
    * re-lays it as 2 id-range-clustered files written ALONGSIDE the
    * old ones, and commits v2 referencing only the new files. The
    * hash-checked row pins: identical table content across the rewrite
    * (rows/sum), the 16→2 file-count arithmetic, v1 STILL readable
    * after the optimize (an in-place rewrite — the q112 `compact`
    * without a log — would have destroyed it), and only then does
    * vacuum reclaim exactly the 16 old files with the current read
    * unchanged. This is the maintenance loop every streaming-ingested
    * 100 TB table runs daily: compaction, snapshot-isolated, then
    * retention. Scale: one read + one clustered write of the live set;
    * the commit itself is O(1).
    */
  val snapshotOptimize: Q = (s, dir) => {
    val store = scratch("graft_snapopt").toString + "/docs"
    val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    d.repartition(16).write.mode("overwrite").parquet(store)
    def files(): Seq[String] = Writers.listParquetFiles(store)
    val m1 = files()
    SnapshotLog.commit(store, m1)
    // OPTIMIZE: manifest-resolved read, range-clustered rewrite, commit
    readFlat(s, store, m1)
      .repartitionByRange(2, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("append").parquet(store)
    val m2 = files().filterNot(m1.contains)
    SnapshotLog.commit(store, m2)
    def agg(fs: Seq[String]): (Long, Long) = {
      val r = readFlat(s, store, fs)
        .agg(count(lit(1)), sum(col("n_chars"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val (r2, s2c) = agg(m2)
    val v1Readable = scala.util.Try(agg(SnapshotLog.files(store, 1))).toOption
    val removed = SnapshotLog.vacuum(store, retainLast = 1)
    val (r2b, s2b) = agg(SnapshotLog.files(store, 2))
    s.range(1).select(
      lit(m1.size.toLong).as("n_files_v1"),
      lit(m2.size.toLong).as("n_files_v2"),
      lit(r2).as("n_rows"), lit(s2c).as("sum_chars"),
      lit(v1Readable.exists(_ == (r2, s2c))).as("v1_readable_pre_vacuum"),
      lit(removed.size.toLong).as("n_orphans_removed"),
      lit(r2b == r2 && s2b == s2c).as("current_unchanged"))
  }

  val snapshotOptimizeSql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents)
      |SELECT
      |  CAST(least(16, (SELECT count(*) FROM d)) AS BIGINT) AS n_files_v1,
      |  CAST(CASE WHEN (SELECT count(*) FROM d) > 0 THEN 2 ELSE 0 END
      |    AS BIGINT) AS n_files_v2,
      |  (SELECT count(*) FROM d) AS n_rows,
      |  CAST((SELECT sum(n_chars) FROM d) AS BIGINT) AS sum_chars,
      |  TRUE AS v1_readable_pre_vacuum,
      |  CAST(least(16, (SELECT count(*) FROM d)) AS BIGINT)
      |    AS n_orphans_removed,
      |  TRUE AS current_unchanged""".stripMargin
}
