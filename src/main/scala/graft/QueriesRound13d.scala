package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.io.{SnapshotLog, Writers}

/** Round-13 widening, fourth wave: container+codec composition (WAV
  * ingest dispatching on the fmt code), deep table CLONE with
  * independent evolution, and layout re-clustering as a commit.
  */
trait QueriesRound13d extends QueriesRound13c {

  /** WAV (RIFF) µ-law ingest — container and codec COMPOSED, the shape
    * telephony/speech corpora actually arrive in (format-7 WAV): the
    * wire is a complete RIFF/WAVE container (fmt chunk: audioFormat 7,
    * mono, 8 kHz, 8-bit; data chunk carrying the µ-law payload) built
    * per document around the q345 md5 code stream; ingest walks the
    * container with the header expressions (`audio_format`,
    * `audio_sample_rate`, `audio_duration_ms`), DISPATCHES on the new
    * `wav_format_code` (the fmt audioFormat u16 — the key that picks
    * the decoder), extracts the payload with `wav_data` (bounded by
    * declared size AND available bytes — a truncated file is NULL,
    * never a silent short read; `truncated_null` pins it in-row), and
    * µ-law-decodes it. Everything the gate emits is oracle-recomputed:
    * samples by the pure per-byte integer formula (the q345 oracle —
    * fully general, no lossless construction needed), the container
    * facts as constants the parse must reproduce. Scale: row-local
    * codegen end to end; container walk reads headers, never the
    * payload, until `wav_data` is actually asked for.
    */
  val wavMulawIngest: Q = (s, dir) => {
    import graft.functions.{AudioExpressions, MulawExpressions}
    // fixed header for a 16-byte format-7 payload: RIFF size 52 =
    // "WAVE" + (8+16 fmt) + (8+16 data)
    val header: Array[Byte] = Array[Int](
      'R', 'I', 'F', 'F', 52, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      7, 0, // audioFormat 7 = µ-law
      1, 0, // channels
      0x40, 0x1F, 0, 0, // sample rate 8000
      0x40, 0x1F, 0, 0, // byte rate
      1, 0, // block align
      8, 0, // bits
      'd', 'a', 't', 'a', 16, 0, 0, 0).map(_.toByte)
    val codes = unhex(md5(concat(col("doc_id").cast("string"),
      lit("|ulaw")).cast("binary")))
    val wire = concat(lit(header), codes)
    val base = t(s, dir, "documents")
      .select(col("doc_id").as("media_id"), wire.as("wav"))
      .withColumn("fmt", AudioExpressions.audio_format(col("wav")))
      .withColumn("fmt_code", AudioExpressions.wav_format_code(col("wav")))
      .withColumn("rate", AudioExpressions.audio_sample_rate(col("wav")))
      .withColumn("dur_ms", AudioExpressions.audio_duration_ms(col("wav")))
      .withColumn("dec", when(col("fmt_code") === 7,
        MulawExpressions.mulaw_decode(
          AudioExpressions.wav_data(col("wav")))))
      .withColumn("truncated_null", AudioExpressions.wav_data(
        col("wav").substr(lit(1), lit(header.length + 12))).isNull)
      .select(col("media_id"), col("fmt"), col("fmt_code"), col("rate"),
        col("dur_ms"), col("dec"), col("truncated_null"),
        explode(sequence(lit(0), lit(7))).as("k"))
    val off = col("k") * 2 + 1
    val lo = conv(hex(col("dec").substr(off, lit(1))), 16, 10).cast("long")
    val hi = conv(hex(col("dec").substr(off + 1, lit(1))), 16, 10)
      .cast("long")
    val u = lo + hi * 256
    base.select(col("media_id"), col("k"),
        when(u >= 32768, u - 65536).otherwise(u).as("sample_val"),
        col("fmt"), col("fmt_code"), col("rate"), col("dur_ms"),
        col("truncated_null"))
      .orderBy(col("media_id"), col("k"))
  }

  val wavMulawIngestSql: String =
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
      |  'wav' AS fmt, 7 AS fmt_code, 8000 AS rate,
      |  CAST(2 AS BIGINT) AS dur_ms, TRUE AS truncated_null
      |FROM e ORDER BY media_id, k""".stripMargin

  /** Deep CLONE + independent evolution — the dev/test verb (clone prod,
    * experiment, throw away) and the proof of the scaladoc's
    * "self-contained store" claim: manifests hold store-RELATIVE paths,
    * so one recursive copy of the directory IS a fully functional table
    * with its whole history. The gate clones the 3-commit store, pins
    * fork-point equality (clone@3 ≡ source@3 read through the CLONE's
    * own log), then DIVERGES both sides — the clone takes a DV delete
    * (doc_id%9==2), the source appends a Δ — and pins independence in
    * both directions: the clone's delete must not leak into the source
    * (`src_niners` counts the clone's victims still alive in source@4)
    * and the source's append must not appear in the clone. All row
    * arithmetic oracle-recomputed. Scale: clone cost is the copy
    * itself (object-store server-side copy in production); everything
    * after is ordinary per-store commit work.
    */
  val snapshotClone: Q = (s, dir) => {
    val src = buildDocSnapshotStore(s, dir)
    val clone = scratch("graft_clone").toString + "/docs"
    Writers.copyRecursive(src, clone)
    def agg(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("n_chars"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val forkEq =
      agg(readFiles(s, src, SnapshotLog.files(src, 3))) ==
        agg(readFiles(s, clone, SnapshotLog.files(clone, 3)))
    // clone evolves: DV delete of doc_id%9==2
    val v4c = dvDeleteCommit(s, clone, 3, pmod(col("doc_id"), lit(9)) === 2)
    // source evolves: Δ append of remapped ids
    val d = t(s, dir, "documents")
    def bucketFiles(root: String): Seq[String] = {
      val kids = new java.io.File(root).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids).toIndexedSeq
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .flatMap(dd => Writers.listParquetFiles(dd.toString)).sorted
    }
    val all = bucketFiles(src)
    d.filter(pmod(col("doc_id"), lit(13)) === 0)
      .select((col("doc_id") + 7000000L).as("doc_id"), col("n_chars"),
        pmod(col("doc_id"), lit(8)).cast("int").as("bucket"))
      .repartition(col("bucket")).write.mode("append")
      .partitionBy("bucket").parquet(src)
    val v4s = SnapshotLog.commit(src,
      SnapshotLog.files(src, 3) ++ bucketFiles(src).filterNot(all.contains))
    val (cloneRows, cloneSum) =
      agg(readDv(s, clone, SnapshotLog.entries(clone, v4c)))
    val srcV4 = readFiles(s, src, SnapshotLog.files(src, v4s))
    val r = srcV4.agg(count(lit(1)),
      sum(when(pmod(col("doc_id"), lit(9)) === 2, 1L).otherwise(0L))).head()
    val srcRows = r.getLong(0)
    val srcNiners = if (r.isNullAt(1)) 0L else r.getLong(1)
    s.range(1).select(
      lit(forkEq).as("fork_matches"),
      lit(cloneRows).as("clone_rows"), lit(cloneSum).as("clone_sum_chars"),
      lit(srcRows).as("src_rows"), lit(srcNiners).as("src_niners"),
      lit(SnapshotLog.latest(src)).as("src_versions"),
      lit(SnapshotLog.latest(clone)).as("clone_versions"))
  }

  val snapshotCloneSql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |live AS (SELECT * FROM d WHERE doc_id % 20 <> 5),
      |app AS (SELECT doc_id + 7000000 AS doc_id, n_chars FROM d
      |  WHERE doc_id % 13 = 0),
      |srcv4 AS (SELECT * FROM live UNION ALL SELECT * FROM app),
      |clonev4 AS (SELECT * FROM live WHERE doc_id % 9 <> 2)
      |SELECT TRUE AS fork_matches,
      |  (SELECT count(*) FROM clonev4) AS clone_rows,
      |  CAST((SELECT sum(n_chars) FROM clonev4) AS BIGINT)
      |    AS clone_sum_chars,
      |  (SELECT count(*) FROM srcv4) AS src_rows,
      |  CAST((SELECT sum(CASE WHEN doc_id % 9 = 2 THEN 1 ELSE 0 END)
      |    FROM srcv4) AS BIGINT) AS src_niners,
      |  4 AS src_versions, 4 AS clone_versions""".stripMargin

  /** RE-CLUSTERING as a commit — layout evolution under snapshot
    * isolation: v1 lands bucketed by doc_id%8 (join-friendly), v2
    * re-lays the SAME rows partitioned by lang (filter-friendly) in a
    * separate subtree, and the manifest swap makes the re-layout
    * atomic — v1 stays readable through ITS manifest while a
    * lang-predicate query against v2 opens exactly one of the
    * lang-partitioned files (`n_files_read_en` = 1 rides in the hash
    * next to `n_langs`, the oracle-recomputed file total — the same
    * table answering the same query from 1/|langs| of the bytes purely
    * because the LAYOUT changed). `v1_equals_v2` pins the re-layout
    * lossless. This is q302's clustering lesson joined with the q332
    * commit discipline: at 100 TB, re-clustering runs for hours — the
    * swap is what lets readers keep serving v1 the whole time. Scale:
    * the rewrite is one full pass (inherent to re-layout); everything
    * else is manifest work.
    */
  val reclusterCommit: Q = (s, dir) => {
    val store = scratch("graft_recluster").toString + "/docs"
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), col("lang"))
    def partFiles(root: String, prefix: String): Seq[String] = {
      val kids = new java.io.File(root).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids).toIndexedSeq
        .filter(f => f.isDirectory && f.getName.startsWith(prefix))
        .flatMap(dd => Writers.listParquetFiles(dd.toString))
        .map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath).sorted
    }
    d.withColumn("bucket", pmod(col("doc_id"), lit(8)).cast("int"))
      .repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(store + "/by_id")
    SnapshotLog.commit(store, partFiles(store + "/by_id", "bucket="))
    // each layout's read schema carries ITS partition column (explicit
    // schemas on manifest reads — the q332 lesson)
    val v1Schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType),
      StructField("lang", StringType),
      StructField("bucket", org.apache.spark.sql.types.IntegerType)))
    val v2Schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType),
      StructField("lang", StringType)))
    def readV(fs: Seq[String], basePath: String,
              schema: StructType): DataFrame =
      if (fs.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[Row], v2Schema)
      else s.read.option("basePath", basePath).schema(schema)
        .parquet(fs: _*)
        .select(col("doc_id"), col("n_chars"), col("lang"))
    readV(SnapshotLog.files(store, 1), store + "/by_id", v1Schema)
      .repartition(col("lang")).write.mode("overwrite")
      .partitionBy("lang").parquet(store + "/by_lang")
    SnapshotLog.commit(store, partFiles(store + "/by_lang", "lang="))
    val v2Files = SnapshotLog.files(store, 2)
    val enFiles = v2Files.filter(_.contains("/lang=en/"))
    def agg3(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("n_chars"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val v1a = agg3(readV(SnapshotLog.files(store, 1), store + "/by_id",
      v1Schema))
    val v2a = agg3(readV(v2Files, store + "/by_lang", v2Schema))
    val (enRows, enSum) = agg3(
      readV(enFiles, store + "/by_lang", v2Schema)
        .filter(col("lang") === "en"))
    s.range(1).select(
      lit(v1a == v2a).as("v1_equals_v2"),
      lit(v1a._1).as("n_rows"),
      lit(SnapshotLog.files(store, 1).size.toLong).as("n_files_v1"),
      lit(v2Files.size.toLong).as("n_langs"),
      lit(enFiles.size.toLong).as("n_files_read_en"),
      lit(enRows).as("en_rows"), lit(enSum).as("en_sum_chars"))
  }

  val reclusterCommitSql: String =
    """WITH d AS (SELECT doc_id, n_chars, lang FROM documents)
      |SELECT TRUE AS v1_equals_v2,
      |  (SELECT count(*) FROM d) AS n_rows,
      |  CAST((SELECT count(DISTINCT doc_id % 8) FROM d) AS BIGINT)
      |    AS n_files_v1,
      |  CAST((SELECT count(DISTINCT lang) +
      |    max(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) FROM d)
      |    AS BIGINT) AS n_langs,
      |  CAST((SELECT CASE WHEN count(*) > 0 THEN 1 ELSE 0 END FROM d
      |    WHERE lang = 'en') AS BIGINT) AS n_files_read_en,
      |  (SELECT count(*) FROM d WHERE lang = 'en') AS en_rows,
      |  CAST((SELECT sum(n_chars) FROM d WHERE lang = 'en') AS BIGINT)
      |    AS en_sum_chars""".stripMargin
}
