package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{SnapshotLog, Writers}
import graft.io.SnapshotLog.FileEntry

/** Round-14 widening, third wave: the A-law half of G.711 (the
  * European-trunk / WAV format-6 codec) and heterogeneous-container
  * ingest — one corpus carrying BOTH G.711 encodings, decoder picked
  * per row by the container's fmt code.
  */
trait QueriesRound14c extends QueriesRound14b {

  /** G.711 A-law decode — the second FULLY-GENERAL codec oracle
    * (q345's µ-law twin): A-law expansion is also a pure per-byte
    * integer formula (XOR 0x55, segment/mantissa — the public g711.c
    * chain), so the oracle recomputes the decode of ARBITRARY planted
    * bytes in SQL, no lossless construction needed. The gate decodes
    * 16 md5 codes per document, hash-checks the first 8 samples
    * against the formula, and pins the requantization fixed point
    * (decode∘encode∘decode ≡ decode; `AlawSpec` pins the full 256-code
    * involution — A-law is a TOTAL involution, with no µ-law-style
    * double-zero — plus the JDK interop). Scale: row-local codegen,
    * fuses into the scan.
    */
  val alawRoundtrip: Q = (s, dir) => {
    import graft.functions.AlawExpressions
    val codes = unhex(md5(concat(col("doc_id").cast("string"),
      lit("|alaw")).cast("binary")))
    val base = t(s, dir, "documents")
      .select(col("doc_id").as("media_id"), codes.as("codes"))
      .withColumn("dec", AlawExpressions.alaw_decode(col("codes")))
      .withColumn("dec2", AlawExpressions.alaw_decode(
        AlawExpressions.alaw_encode(col("dec"))))
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

  val alawRoundtripSql: String =
    """WITH ks AS (SELECT unnest(generate_series(0, 7)) AS k),
      |c AS (SELECT doc_id AS media_id, k,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|alaw'),
      |      k * 2 + 1, 2))::BIGINT AS code
      |  FROM documents CROSS JOIN ks),
      |e AS (SELECT media_id, k, xor(code, 85) AS a,
      |    (xor(code, 85) // 16) % 8 AS seg
      |  FROM c),
      |f AS (SELECT media_id, k, a,
      |    CASE WHEN seg = 0 THEN (a % 16) * 16 + 8
      |      WHEN seg = 1 THEN (a % 16) * 16 + 264
      |      ELSE ((a % 16) * 16 + 264) << (seg - 1) END AS t
      |  FROM e)
      |SELECT media_id, CAST(k AS INTEGER) AS k,
      |  CAST(CASE WHEN a >= 128 THEN t ELSE -t END AS BIGINT)
      |    AS sample_val,
      |  TRUE AS requant_fixedpoint
      |FROM f ORDER BY media_id, k""".stripMargin

  /** HETEROGENEOUS WAV ingest — the shape a real speech corpus has:
    * one binary column, MIXED encodings (even docs carry format-7
    * µ-law wires, odd docs format-6 A-law — same RIFF layout, one
    * fmt-code u16 apart), and the decoder is picked PER ROW by
    * `wav_format_code` dispatch. A single-codec reader (q359) silently
    * mis-decodes half this corpus; the dispatch is what makes the
    * ingest correct, and every emitted sample is oracle-recomputed
    * through the RIGHT formula for its row (both G.711 halves are pure
    * per-byte integer formulas, so the oracle is fully general).
    * `dispatch_total` pins that both branches actually fired. Scale:
    * row-local codegen; the fmt-code read touches 2 header bytes,
    * never the payload.
    */
  val wavMixedIngest: Q = (s, dir) => {
    import graft.functions.{AlawExpressions, AudioExpressions, MulawExpressions}
    def header(fmtCode: Int): Array[Byte] = Array[Int](
      'R', 'I', 'F', 'F', 52, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      fmtCode, 0, // audioFormat: 6 = A-law, 7 = µ-law
      1, 0, // channels
      0x40, 0x1F, 0, 0, // sample rate 8000
      0x40, 0x1F, 0, 0, // byte rate
      1, 0, // block align
      8, 0, // bits
      'd', 'a', 't', 'a', 16, 0, 0, 0).map(_.toByte)
    val codes = unhex(md5(concat(col("doc_id").cast("string"),
      lit("|g711")).cast("binary")))
    val wire = concat(
      when(pmod(col("doc_id"), lit(2)) === 0, lit(header(7)))
        .otherwise(lit(header(6))), codes)
    val base = t(s, dir, "documents")
      .select(col("doc_id").as("media_id"), wire.as("wav"))
      .withColumn("fmt_code", AudioExpressions.wav_format_code(col("wav")))
      .withColumn("payload", AudioExpressions.wav_data(col("wav")))
      .withColumn("dec",
        when(col("fmt_code") === 7,
          MulawExpressions.mulaw_decode(col("payload")))
          .when(col("fmt_code") === 6,
            AlawExpressions.alaw_decode(col("payload"))))
      .select(col("media_id"), col("fmt_code"), col("dec"),
        explode(sequence(lit(0), lit(7))).as("k"))
    val off = col("k") * 2 + 1
    val lo = conv(hex(col("dec").substr(off, lit(1))), 16, 10).cast("long")
    val hi = conv(hex(col("dec").substr(off + 1, lit(1))), 16, 10)
      .cast("long")
    val u = lo + hi * 256
    val perRow = base.select(col("media_id"), col("k"), col("fmt_code"),
      when(u >= 32768, u - 65536).otherwise(u).as("sample_val"))
    val dispatched = perRow.groupBy()
      .agg(count_distinct(col("fmt_code")).as("n"))
      .head().getLong(0)
    perRow
      .withColumn("dispatch_total", lit(dispatched))
      .orderBy(col("media_id"), col("k"))
  }

  /** The COMPOSED reader stack: manifest-stats pruning (q347) over a
    * store that also carries delete vectors (q346) — the read every
    * production range query actually runs: resolve the manifest, pick
    * files by min/max overlap (zero data/footer reads), open only
    * those, anti-join their DVs, then apply the residual predicate.
    * Either half alone is wrong: pruning without the DV serves deleted
    * rows (`victims_visible` pins 0), DV without pruning opens the
    * whole table (`n_files_opened` vs `n_files_total` pins the skip).
    * The metadata row count of the PRE-delete version rides along
    * (Σ manifest stats rows — zero reads, the q362 verb). All numbers
    * oracle-recomputed from the dense-id file-range arithmetic.
    * Scale: query cost = manifest resolution + O(overlapping files).
    */
  val statsDvPrunedRead: Q = (s, dir) => {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val store = scratch("graft_statsdv").toString + "/docs"
    val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val mx = d.agg(max(col("doc_id"))).head()
    val maxId = if (mx.isNullAt(0)) 0L else mx.getLong(0)
    val w = maxId / 16 + 1
    d.withColumn("fb", expr(s"doc_id div ${w}L"))
      .repartition(col("fb")).write.mode("overwrite")
      .partitionBy("fb").parquet(store)
    val zSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType),
      StructField("fb", LongType)))
    val files = {
      val kids = new java.io.File(store).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids).toIndexedSeq
        .filter(f => f.isDirectory && f.getName.startsWith("fb="))
        .flatMap(dd => Writers.listParquetFiles(dd.toString))
    }
    def plain(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    def readZ(fs: Seq[String]): DataFrame =
      if (fs.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[Row], zSchema)
      else s.read.option("basePath", store).schema(zSchema)
        .parquet(fs: _*)
    val stats =
      if (files.isEmpty) Map.empty[String, SnapshotLog.FileStats]
      else readZ(files)
        .select(col("_metadata.file_path").as("f"), col("doc_id"))
        .groupBy(col("f"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => plain(r.getString(0)) ->
          SnapshotLog.FileStats(r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    SnapshotLog.commitEntries(store,
      files.map(f => FileEntry(f, stats = stats.get(plain(f)))))
    val v2 = dvDeleteCommit(s, store, 1, pmod(col("doc_id"), lit(25)) === 3)
    // --- the composed read: manifest prune → DV anti-join → residual
    val es = SnapshotLog.entries(store, v2)
    val lo = 3 * w + w / 3
    val hi = 5 * w - w / 3
    val chosen = es.filter(_.stats.exists(st => st.max >= lo && st.min <= hi))
    val dvPairs = chosen.flatMap(e => e.dv.toSeq.flatMap { dvf =>
      val f = new java.io.File(e.path)
      SnapshotLog.readDeleteVector(dvf)
        .map(p => (f.getParentFile.getName + "/" + f.getName, p))
    })
    val base = readZ(chosen.map(_.path))
    val live = if (dvPairs.isEmpty) base
      else {
        import s.implicits._
        base
          .withColumn("fkey", concat_ws("/",
            slice(split(col("_metadata.file_path"), "/"), -2, 2)))
          .withColumn("pos", col("_metadata.row_index"))
          .join(broadcast(dvPairs.toDF("fkey", "pos")),
            Seq("fkey", "pos"), "left_anti")
      }
    live.filter(col("doc_id").between(lo, hi))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"),
        coalesce(sum(when(pmod(col("doc_id"), lit(25)) === 3, 1L)
          .otherwise(0L)), lit(0L)).as("victims_visible"))
      .select(lit(es.size.toLong).as("n_files_total"),
        lit(chosen.size.toLong).as("n_files_opened"),
        col("n_rows"), col("sum_chars"), col("victims_visible"),
        lit(es.flatMap(_.stats).map(_.rows).sum).as("v1_rows_manifest"))
  }

  val statsDvPrunedReadSql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |mx AS (SELECT max(doc_id) // 16 + 1 AS w FROM d),
      |rng AS (SELECT 3 * w + w // 3 AS lo, 5 * w - w // 3 AS hi, w
      |  FROM mx),
      |sel AS (SELECT doc_id, n_chars FROM d, rng
      |  WHERE doc_id BETWEEN lo AND hi),
      |liv AS (SELECT doc_id, n_chars FROM sel WHERE doc_id % 25 <> 3)
      |SELECT
      |  (SELECT CAST(count(DISTINCT doc_id // w) AS BIGINT) FROM d, rng)
      |    AS n_files_total,
      |  (SELECT CAST(count(DISTINCT doc_id // w) AS BIGINT) FROM sel, rng)
      |    AS n_files_opened,
      |  (SELECT count(*) FROM liv) AS n_rows,
      |  (SELECT CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM liv)
      |    AS sum_chars,
      |  CAST(0 AS BIGINT) AS victims_visible,
      |  (SELECT count(*) FROM d) AS v1_rows_manifest""".stripMargin

  /** Commit-time CONSTRAINTS — write-path data quality integrated with
    * the log (the Delta CHECK-constraint / Iceberg write-validation
    * verb, and the transactional upgrade of q352's read-side audit):
    * a staged Δ is validated BEFORE its manifest is written, so a
    * violating batch never becomes a version at all — readers cannot
    * see it even transiently, there is nothing to roll back, and the
    * staged files are crash-debris reclaimable by the q353 janitor.
    * The gate commits a clean Δ (passes not-null + non-negative
    * checks), then attempts a poisoned Δ (planted negative n_chars) —
    * the attempt must throw, the log head must not move, and
    * `removeOrphans` must reclaim exactly the poisoned staging.
    * Scale: the check reads ONLY the staged files; acceptance is the
    * usual O(1) manifest write.
    */
  val commitConstraints: Q = (s, dir) => {
    val store = scratch("graft_constraints").toString + "/docs"
    val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    d.withColumn("bucket", pmod(col("doc_id"), lit(8)).cast("int"))
      .repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(store)
    SnapshotLog.commit(store, listBucketFiles(store))
    // the constraint suite: key present, measure non-negative (the
    // q08/q99 expectation shapes, enforced at the write boundary)
    def passes(staged: DataFrame): Boolean = {
      val r = staged.agg(count(lit(1)),
        sum(when(col("doc_id").isNull, 1L).otherwise(0L)),
        min(col("n_chars"))).head()
      r.getLong(0) > 0 && r.getLong(1) == 0 &&
        !r.isNullAt(2) && r.getLong(2) >= 0
    }
    def tryCommit(delta: DataFrame): (Boolean, Seq[String]) = {
      val before = listBucketFiles(store)
      delta.withColumn("bucket", pmod(col("doc_id"), lit(8)).cast("int"))
        .repartition(col("bucket")).write.mode("append")
        .partitionBy("bucket").parquet(store)
      val fresh = listBucketFiles(store).filterNot(before.contains)
      if (passes(readFiles(s, store, fresh))) {
        SnapshotLog.commit(store,
          SnapshotLog.files(store, SnapshotLog.latest(store)) ++ fresh)
        (true, fresh)
      } else (false, fresh) // staged files stay orphaned, never committed
    }
    val good = t(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(31)) === 1)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        pmod(col("doc_id"), lit(500)).cast("long").as("n_chars"))
    val (goodOk, _) = tryCommit(good)
    val headAfterGood = SnapshotLog.latest(store)
    val bad = t(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(97)) === 0)
      .select((col("doc_id") + 6000000L).as("doc_id"),
        lit(-7L).as("n_chars"))
    val (badOk, badFresh) = tryCommit(bad)
    val headAfterBad = SnapshotLog.latest(store)
    val removed = SnapshotLog.removeOrphans(store,
      olderThanMs = System.currentTimeMillis() + 60000L)
    def plain(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    val reclaimedExactly =
      removed.toSet == badFresh.map(plain).toSet
    readFiles(s, store, SnapshotLog.files(store, headAfterBad))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
      .select(lit(goodOk).as("good_accepted"),
        lit(!badOk).as("bad_rejected"),
        lit(headAfterGood == headAfterBad).as("head_unmoved_by_bad"),
        lit(removed.size.toLong).as("n_orphans_removed"),
        lit(reclaimedExactly).as("reclaimed_exactly_staging"),
        col("n_rows"), col("sum_chars"))
  }

  val commitConstraintsSql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |g AS (SELECT doc_id + 3000000 AS doc_id, doc_id % 500 AS n_chars
      |  FROM d WHERE doc_id % 31 = 1),
      |bad AS (SELECT doc_id FROM d WHERE doc_id % 97 = 0),
      |fin AS (SELECT doc_id, n_chars FROM d
      |  UNION ALL SELECT doc_id, n_chars FROM g)
      |SELECT TRUE AS good_accepted, TRUE AS bad_rejected,
      |  TRUE AS head_unmoved_by_bad,
      |  (SELECT CAST(count(DISTINCT doc_id % 8) AS BIGINT) FROM bad)
      |    AS n_orphans_removed,
      |  TRUE AS reclaimed_exactly_staging,
      |  (SELECT count(*) FROM fin) AS n_rows,
      |  (SELECT CAST(sum(n_chars) AS BIGINT) FROM fin) AS sum_chars""".stripMargin

  /** PARTITION-SPEC EVOLUTION — the lake verb that makes layout
    * changes affordable: q361 re-clusters by REWRITING the table; real
    * tables at 100 TB change their partitioning going FORWARD only
    * (the Iceberg spec-evolution contract) — old data keeps the old
    * layout (id-bucketed), new data lands in the new one
    * (lang-partitioned), and ONE manifest references files across both
    * subtrees (relative paths don't care which dir scheme a file lives
    * under; a directory-listing reader sees an unreadable mixed root —
    * the manifest is what makes this table well-defined at all). A
    * lang='en' query prunes the NEW spec's slice to one directory and
    * must open ALL old-spec files (lang isn't in their paths — exactly
    * the cost asymmetry that motivates the evolution); `opened_old` /
    * `opened_new` / `n_files_total` pin the arithmetic, rows and sums
    * oracle-recomputed. Scale: no rewrite ever happens; the query
    * cost converges to the new spec's pruned cost as new data
    * accumulates.
    */
  val partitionEvolution: Q = (s, dir) => {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    val store = scratch("graft_partevo").toString + "/docs"
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), col("lang"))
    d.withColumn("bucket", pmod(col("doc_id"), lit(4)).cast("int"))
      .repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(store)
    def listDirs(prefix: String): Seq[String] = {
      val kids = new java.io.File(store).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids).toIndexedSeq
        .filter(f => f.isDirectory && f.getName.startsWith(prefix))
        .flatMap(dd => Writers.listParquetFiles(dd.toString)).sorted
    }
    val oldFiles = listDirs("bucket=")
    SnapshotLog.commit(store, oldFiles)
    // spec change: the Δ lands lang-partitioned ALONGSIDE the old dirs
    val delta = d.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("n_chars"),
        col("lang"))
    delta.repartition(col("lang")).write.mode("append")
      .partitionBy("lang").parquet(store)
    val newFiles = listDirs("lang=")
    SnapshotLog.commit(store, oldFiles ++ newFiles)
    // --- lang='en' through v2: per-spec resolution
    val es = SnapshotLog.files(store, 2)
    val oldSel = es.filter(_.contains("/bucket="))
    val newSel = es.filter(_.contains("/lang=en/"))
    val oldSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType),
      StructField("lang", StringType), StructField("bucket", IntegerType)))
    val newSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType),
      StructField("lang", StringType)))
    def rd(fs: Seq[String], schema: StructType): DataFrame =
      if (fs.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
      else s.read.option("basePath", store).schema(schema).parquet(fs: _*)
    val en = rd(oldSel, oldSchema).filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
      .unionAll(rd(newSel, newSchema)
        .select(col("doc_id"), col("n_chars")))
    en.agg(count(lit(1)).as("n_rows_en"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars_en"))
      .select(col("n_rows_en"), col("sum_chars_en"),
        lit(es.size.toLong).as("n_files_total"),
        lit(oldSel.size.toLong).as("opened_old"),
        lit(newSel.size.toLong).as("opened_new"))
  }

  /** METADATA EXACTNESS THROUGH MoR UPSERTS — q362's metadata-only
    * COUNT composed over q363's write path: because every upsert
    * commit annotates its appended files with write-time stats AND its
    * DV positions, `Σ stats.rows − Σ |DV|` stays EXACTLY the live row
    * count at EVERY version — no data read ever needed for COUNT(*),
    * even on a table that has only ever been mutated by
    * merge-on-read. (A store that appended without stats, or DV'd
    * without subtracting, drifts silently — `stats_complete` and the
    * per-version exactness bools pin both failure modes.) All counts
    * oracle-recomputed from the q363 modular arithmetic. Scale: the
    * metadata answer is one manifest read at any table size; the
    * per-upsert stats pass reads only the appended files.
    */
  val morMetadataExact: Q = (s, dir) => {
    val store = scratch("graft_mormeta").toString + "/docs"
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        pmod(col("doc_id"), lit(8)).cast("int").as("bucket"))
    d.repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(store)
    val files = listBucketFiles(store)
    def plain(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    val stats =
      if (files.isEmpty) Map.empty[String, SnapshotLog.FileStats]
      else readFiles(s, store, files)
        .select(col("_metadata.file_path").as("f"), col("doc_id"))
        .groupBy(col("f"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => plain(r.getString(0)) ->
          SnapshotLog.FileStats(r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    SnapshotLog.commitEntries(store,
      files.map(f => FileEntry(f, stats = stats.get(plain(f)))))
    val docs = t(s, dir, "documents")
    val ins2 = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        pmod(col("doc_id"), lit(1000)).cast("long").as("n_chars"))
    val v2 = morUpsertCommit(s, store, 1,
      pmod(col("doc_id"), lit(5)) === 2, 1000L, ins2)
    val ins3 = docs.filter(pmod(col("doc_id"), lit(60)) === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        pmod(col("doc_id"), lit(900)).cast("long").as("n_chars"))
    val v3 = morUpsertCommit(s, store, v2,
      pmod(col("doc_id"), lit(7)) === 3, 5000L, ins3)
    def snapRow(v: Int): DataFrame = {
      val es = SnapshotLog.entries(store, v)
      val meta = es.flatMap(_.stats).map(_.rows).sum -
        es.flatMap(_.dv).map(SnapshotLog.readDeleteVector(_).size.toLong).sum
      val live = readDv(s, store, es).count()
      s.range(1).select(lit(v).as("snap"),
        lit(meta).as("meta_count"),
        lit(meta == live).as("meta_exact"),
        lit(es.forall(_.stats.isDefined)).as("stats_complete"))
    }
    snapRow(1).unionAll(snapRow(v2)).unionAll(snapRow(v3))
      .orderBy(col("snap"))
  }

  val morMetadataExactSql: String =
    """WITH d AS (SELECT doc_id FROM documents),
      |i2 AS (SELECT doc_id + 1000000 AS doc_id FROM d
      |  WHERE doc_id % 50 = 0),
      |v2 AS (SELECT doc_id FROM d UNION ALL SELECT doc_id FROM i2),
      |i3 AS (SELECT doc_id + 2000000 AS doc_id FROM d
      |  WHERE doc_id % 60 = 0),
      |v3 AS (SELECT doc_id FROM v2 UNION ALL SELECT doc_id FROM i3)
      |SELECT * FROM (
      |  SELECT 1 AS snap, (SELECT count(*) FROM d) AS meta_count,
      |    TRUE AS meta_exact, TRUE AS stats_complete
      |  UNION ALL
      |  SELECT 2, (SELECT count(*) FROM v2), TRUE, TRUE
      |  UNION ALL
      |  SELECT 3, (SELECT count(*) FROM v3), TRUE, TRUE
      |) ORDER BY snap""".stripMargin

  val partitionEvolutionSql: String =
    """WITH d AS (SELECT doc_id, n_chars, lang FROM documents),
      |dl AS (SELECT doc_id + 1000000 AS doc_id, n_chars, lang FROM d
      |  WHERE doc_id % 3 = 0),
      |en AS (SELECT doc_id, n_chars FROM d WHERE lang = 'en'
      |  UNION ALL SELECT doc_id, n_chars FROM dl WHERE lang = 'en')
      |SELECT (SELECT count(*) FROM en) AS n_rows_en,
      |  (SELECT CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM en)
      |    AS sum_chars_en,
      |  (SELECT CAST(count(DISTINCT doc_id % 4) AS BIGINT) FROM d)
      |    + (SELECT CAST(count(DISTINCT lang) AS BIGINT) FROM dl)
      |    AS n_files_total,
      |  (SELECT CAST(count(DISTINCT doc_id % 4) AS BIGINT) FROM d)
      |    AS opened_old,
      |  (SELECT CAST(count(DISTINCT lang) AS BIGINT) FROM dl
      |    WHERE lang = 'en') AS opened_new""".stripMargin

  val wavMixedIngestSql: String =
    """WITH ks AS (SELECT unnest(generate_series(0, 7)) AS k),
      |c AS (SELECT doc_id AS media_id, k, doc_id % 2 = 0 AS is_ulaw,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|g711'),
      |      k * 2 + 1, 2))::BIGINT AS code
      |  FROM documents CROSS JOIN ks),
      |u AS (SELECT media_id, k, is_ulaw, 255 - code AS uu,
      |    ((((255 - code) % 16) * 8 + 132)
      |      << (((255 - code) // 16) % 8)) AS ut,
      |    xor(code, 85) AS a, (xor(code, 85) // 16) % 8 AS seg
      |  FROM c),
      |f AS (SELECT media_id, k, is_ulaw, uu, ut, a,
      |    CASE WHEN seg = 0 THEN (a % 16) * 16 + 8
      |      WHEN seg = 1 THEN (a % 16) * 16 + 264
      |      ELSE ((a % 16) * 16 + 264) << (seg - 1) END AS at
      |  FROM u),
      |nd AS (SELECT count(DISTINCT CASE WHEN is_ulaw THEN 7 ELSE 6 END)
      |    AS n FROM c)
      |SELECT media_id, CAST(k AS INTEGER) AS k,
      |  CASE WHEN is_ulaw THEN 7 ELSE 6 END AS fmt_code,
      |  CAST(CASE WHEN is_ulaw THEN
      |      CASE WHEN uu >= 128 THEN 132 - ut ELSE ut - 132 END
      |    ELSE CASE WHEN a >= 128 THEN at ELSE -at END
      |  END AS BIGINT) AS sample_val,
      |  (SELECT CAST(n AS BIGINT) FROM nd) AS dispatch_total
      |FROM f ORDER BY media_id, k""".stripMargin
}
