package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import graft.io.{SnapshotLog, Writers}
import graft.io.SnapshotLog.{FileEntry, FileStats}

/** Round-13 widening: the remaining lake-format contracts on the
  * manifest-committed store ([[graft.io.SnapshotLog]]) — position
  * delete vectors (the third delete strategy, for sparse deletes over
  * large files), stats-carrying manifests (zone-map skipping resolved
  * from the log with zero query-time data reads), the log consumed AS A
  * STREAM (the table→stream→table loop), and timestamp-resolved time
  * travel with time-based retention.
  */
trait QueriesRound13 extends QueriesRound12d {

  /** Position-delete vectors (merge-on-read, the Iceberg v2 / Delta DV
    * strategy) — completes the delete triad the store supports:
    * copy-on-write (q323/q332: rewrite the touched slice — right when
    * deletes cluster), id-set tombstones (q329: read-time anti-join on
    * KEYS — right when the table has a join key but no stable physical
    * address), and now per-FILE row-position vectors: O(deleted rows)
    * state attached to the manifest, no rewrite AND no unbounded
    * tombstone-set join — the default real lake formats pick when
    * deletes are SPARSE across many LARGE files (rewriting 8 files to
    * drop 4% of their rows writes 24× the deleted data; a key-tombstone
    * set grows without bound across delete generations; a DV is exactly
    * the deleted positions and compacts away at the next rewrite).
    *
    * Protocol under test, all three snapshots read AFTER everything:
    *   v1  base load, one file per bucket (doc_id % 8)
    *   v2  DELETE doc_id % 25 == 3 as a DV-ONLY commit: victims'
    *       (file, row-position) pairs — found by one predicate scan,
    *       grouped by file and written as `_dv/` sidecars FROM THE
    *       EXECUTORS (DeleteVectors.writeSidecars) — annotate the SAME
    *       data files with `dv=`; `v2_rewrote_files` pins ZERO data
    *       files written
    *   v3  OPTIMIZE folds the DVs: touched files (only) are rewritten
    *       without their deleted positions, DV annotations drop
    * The serving read anti-joins (file name, row position) against the
    * broadcast DV set — positions, not keys: it never consults doc_id.
    * Pins riding in the hash, all oracle-recomputed from the modular
    * arithmetic: per-snapshot rows/victims/sum/files/DV count (v1 must
    * still SERVE the victims after both the delete and the optimize;
    * v2 ≡ v3 content with n_dvs 3→0), `dv_positions` (= victim count —
    * delete state tracks deleted rows, not table size), and
    * `v2_rewrote_files` = 0. Scale: the DV write is one pushed-filter
    * scan + one victims-sized shuffle, sidecars written executor-side,
    * O(|touched files|) driver state; the serving overhead is a
    * broadcast anti-join that disappears entirely at the next OPTIMIZE.
    */
  val dvDelete: Q = (s, dir) => {
    val store = scratch("graft_dvstore").toString + "/docs"
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        pmod(col("doc_id"), lit(8)).cast("int").as("bucket"))
    d.repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(store)
    def listAll(): Seq[String] = {
      val kids = new java.io.File(store).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids).toIndexedSeq
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .flatMap(dd => Writers.listParquetFiles(dd.toString))
        .sorted
    }
    val m1 = listAll()
    SnapshotLog.commit(store, m1)
    // --- v2: DV-only delete. One predicate scan finds the victims'
    // physical addresses; sidecars are written EXECUTOR-SIDE
    // (DeleteVectors.writeSidecars — VERDICT r13 #3), so the driver
    // holds only the |touched files| manifest annotations, never the
    // position sets
    val beforeV2 = listAll()
    dvDeleteCommit(s, store, 1, pmod(col("doc_id"), lit(25)) === 3)
    val v2Rewrote = listAll().filterNot(beforeV2.contains).size.toLong
    val dvPositions = SnapshotLog.entries(store, 2).flatMap(_.dv)
      .map(SnapshotLog.readDeleteVector(_).size.toLong).sum
    // --- v3: OPTIMIZE folds each DV'd file into a rewrite (touched
    // files only; untouched generations keep their identity)
    val v2 = SnapshotLog.entries(store, 2)
    val folded = v2.filter(_.dv.isDefined).map { e =>
      val bucketDir = new java.io.File(e.path).getParent
      val before = Writers.listParquetFiles(bucketDir)
      readDv(s, store, Seq(e)).select(col("doc_id"), col("n_chars"))
        .coalesce(1).write.mode("append").parquet(bucketDir)
      FileEntry(Writers.listParquetFiles(bucketDir)
        .filterNot(before.contains).head)
    }
    SnapshotLog.commitEntries(store, v2.filter(_.dv.isEmpty) ++ folded)
    def snapAgg(v: Int): DataFrame = {
      val es = SnapshotLog.entries(store, v)
      readDv(s, store, es)
        .agg(count(lit(1)).as("n_rows"),
          sum(when(pmod(col("doc_id"), lit(25)) === 3, 1L).otherwise(0L))
            .as("n_victims_visible"),
          sum(col("n_chars")).as("sum_chars"))
        .select(lit(v).as("snap"), col("n_rows"), col("n_victims_visible"),
          col("sum_chars"), lit(es.size.toLong).as("n_files"),
          lit(es.count(_.dv.isDefined).toLong).as("n_dvs"))
    }
    snapAgg(1).unionAll(snapAgg(2)).unionAll(snapAgg(3))
      .withColumn("dv_positions", lit(dvPositions))
      .withColumn("v2_rewrote_files", lit(v2Rewrote))
      .orderBy(col("snap"))
  }

  protected def plainP(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** A DV delete commit: victims' physical addresses found by one
    * pushed-predicate scan, sidecars written EXECUTOR-SIDE via
    * [[graft.io.DeleteVectors.writeSidecars]] (VERDICT r13 #3 — the
    * old driver-collect of every (file,pos) pair was O(victims) driver
    * state; this is O(touched files)), positions UNIONED into any
    * existing per-file sidecar — re-deleting from a file that already
    * carries a DV must merge, not replace.
    */
  protected def dvDeleteCommit(s: SparkSession, store: String, prevV: Int,
      predicate: org.apache.spark.sql.Column): Int = {
    val prev = SnapshotLog.entries(store, prevV)
    if (prev.isEmpty) return SnapshotLog.commitEntries(store, prev)
    val victims = readFiles(s, store, prev.map(_.path))
      .select(col("_metadata.file_path").as("file"),
        col("_metadata.row_index").as("pos"), col("doc_id"))
      .filter(predicate)
      .select(col("file"), col("pos"))
    val existing = prev.flatMap(e => e.dv.map(plainP(e.path) -> _)).toMap
    val sidecars = graft.io.DeleteVectors.writeSidecars(victims, store,
      existing)
    val next = prev.map { e =>
      sidecars.get(plainP(e.path)) match {
        case Some(dv) => e.copy(dv = Some(dv))
        case None => e
      }
    }
    SnapshotLog.commitEntries(store, next)
  }

  /** Manifest-resolved DV read: data files anti-joined against their
    * delete vectors on (dir/name, row position). The join key is the
    * LAST TWO path segments, not the base name alone — part-file names
    * repeat across partition dirs (the same task writing two bucket
    * dirs stamps both files `part-<task>-<jobUUID>`), so a name-only
    * key would delete the same positions from every same-named file.
    * The DV side is O(deleted rows) and broadcast; files without DVs
    * pay nothing but the (pruned-away) metadata columns. Empty
    * manifests return an empty frame (explicit schema — the q332
    * lesson).
    */
  protected def readDv(s: SparkSession, store: String,
                       es: Seq[FileEntry]): DataFrame = {
    val base = readFiles(s, store, es.map(_.path))
    def key(p: String): String = {
      val f = new java.io.File(p)
      f.getParentFile.getName + "/" + f.getName
    }
    val dvs = es.flatMap(e => e.dv.toSeq.flatMap { d =>
      SnapshotLog.readDeleteVector(d).map(p => (key(e.path), p))
    })
    if (dvs.isEmpty) base
    else {
      import s.implicits._
      val dvDf = dvs.toDF("fkey", "pos")
      base
        .withColumn("fkey",
          concat_ws("/", slice(split(col("_metadata.file_path"), "/"), -2, 2)))
        .withColumn("pos", col("_metadata.row_index"))
        .join(broadcast(dvDf), Seq("fkey", "pos"), "left_anti")
        .drop("fkey", "pos")
    }
  }

  val dvDeleteSql: String =
    """WITH d AS (SELECT doc_id, n_chars, doc_id % 8 AS b FROM documents),
      |vic AS (SELECT * FROM d WHERE doc_id % 25 = 3),
      |nf AS (SELECT count(DISTINCT b) AS n FROM d),
      |ndv AS (SELECT count(DISTINCT b) AS n FROM vic),
      |nv AS (SELECT count(*) AS n FROM vic),
      |s1 AS (SELECT 1 AS snap, count(*) AS n_rows,
      |    CAST(sum(CASE WHEN doc_id % 25 = 3 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_victims_visible,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |    CAST((SELECT n FROM nf) AS BIGINT) AS n_files,
      |    CAST(0 AS BIGINT) AS n_dvs FROM d),
      |s2 AS (SELECT 2 AS snap, count(*) AS n_rows,
      |    CAST(sum(0) AS BIGINT) AS n_victims_visible,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |    CAST((SELECT n FROM nf) AS BIGINT) AS n_files,
      |    CAST((SELECT n FROM ndv) AS BIGINT) AS n_dvs
      |  FROM d WHERE doc_id % 25 <> 3),
      |s3 AS (SELECT 3 AS snap, count(*) AS n_rows,
      |    CAST(sum(0) AS BIGINT) AS n_victims_visible,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |    CAST((SELECT n FROM nf) AS BIGINT) AS n_files,
      |    CAST(0 AS BIGINT) AS n_dvs
      |  FROM d WHERE doc_id % 25 <> 3)
      |SELECT *, CAST((SELECT n FROM nv) AS BIGINT) AS dv_positions,
      |  CAST(0 AS BIGINT) AS v2_rewrote_files
      |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
      |      UNION ALL SELECT * FROM s3) ORDER BY snap""".stripMargin

  /** Stats-carrying manifests — zone-map skipping resolved FROM THE LOG:
    * per-file (min, max, rows) of the clustering key are collected at
    * WRITE time (one map-side pass over data the writer just produced —
    * where real formats compute them) and persisted into the commit
    * line; the range query then prunes by manifest stats alone — ZERO
    * data or footer reads before the pruned scan. Upgrades q334, which
    * recollects per-file min/max with a stats pass at every query: at
    * 100 TB the query-time stats pass IS a table scan, and
    * stats-in-manifest is what makes skipping O(manifest). Pins:
    * `n_files_read`/`n_files_total` (oracle-recomputed from the range
    * arithmetic — reading a non-overlapping file or re-scanning for
    * stats mismatches), `n_rows_manifest` (Σ per-file `rows` stats ≡
    * table count: stats round-trip the commit intact), and the range
    * aggregate itself. Scale: query-time pruning cost is a manifest
    * read, O(|files|) driver work, independent of table bytes.
    */
  val manifestStatsSkip: Q = (s, dir) => {
    val store = scratch("graft_manstats").toString + "/events"
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val mx = ev.agg(max(col("event_id"))).head()
    val maxId = if (mx.isNullAt(0)) 0L else mx.getLong(0)
    val w = maxId / 16 + 1
    ev.withColumn("fb", expr(s"event_id div ${w}L"))
      .repartition(col("fb")).write.mode("overwrite")
      .partitionBy("fb").parquet(store)
    val zSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("fb", LongType)))
    // write-time stats collection (≤ |files| rows) persisted into the
    // commit — the ONLY stats pass this store ever runs
    val files = {
      val kids = new java.io.File(store).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids).toIndexedSeq
        .filter(f => f.isDirectory && f.getName.startsWith("fb="))
        .flatMap(dd => Writers.listParquetFiles(dd.toString))
    }
    def plain(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    val stats =
      if (files.isEmpty) Map.empty[String, FileStats]
      else s.read.option("basePath", store).schema(zSchema)
        .parquet(files: _*)
        .select(col("_metadata.file_path").as("f"), col("event_id"))
        .groupBy(col("f"))
        .agg(min(col("event_id")).as("mn"), max(col("event_id")).as("mx"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => plain(r.getString(0)) ->
          FileStats(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    SnapshotLog.commitEntries(store,
      files.map(f => FileEntry(f, stats = stats.get(plain(f)))))
    // --- query time: pruning is a pure manifest resolution
    val es = SnapshotLog.entries(store, 1)
    val lo = 3 * w + w / 3
    val hi = 5 * w - w / 3
    val chosen = es.filter(_.stats.exists(st => st.max >= lo && st.min <= hi))
    val pruned =
      if (chosen.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[Row], zSchema)
      else s.read.option("basePath", store).schema(zSchema)
        .parquet(chosen.map(_.path): _*)
    pruned
      .filter(col("event_id").between(lo, hi))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(decSum(col("value"), 2), 2).as("total_value"))
      .select(col("event_type"), col("n_events"), col("total_value"),
        lit(chosen.size.toLong).as("n_files_read"),
        lit(es.size.toLong).as("n_files_total"),
        lit(es.flatMap(_.stats).map(_.rows).sum).as("n_rows_manifest"))
      .orderBy(col("event_type"))
  }

  val manifestStatsSkipSql: String =
    """WITH w AS (SELECT max(event_id) // 16 + 1 AS w FROM events),
      |b AS (SELECT 3 * w + w // 3 AS lo, 5 * w - w // 3 AS hi FROM w),
      |z AS (SELECT event_id // (SELECT w FROM w) AS fb,
      |    min(event_id) AS mn, max(event_id) AS mx
      |  FROM events GROUP BY 1),
      |zr AS (SELECT count(*) AS nr FROM z
      |  WHERE mx >= (SELECT lo FROM b) AND mn <= (SELECT hi FROM b)),
      |zt AS (SELECT count(*) AS nt FROM z),
      |tot AS (SELECT count(*) AS n FROM events)
      |SELECT event_type, count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
      |    AS total_value,
      |  CAST((SELECT nr FROM zr) AS BIGINT) AS n_files_read,
      |  CAST((SELECT nt FROM zt) AS BIGINT) AS n_files_total,
      |  CAST((SELECT n FROM tot) AS BIGINT) AS n_rows_manifest
      |FROM events
      |WHERE event_id BETWEEN (SELECT lo FROM b) AND (SELECT hi FROM b)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The snapshot log consumed AS A STREAM (TWENTY-FIRST streaming
    * gate) — the missing edge between the streaming and storage
    * subsystems, and the Delta/Iceberg "table as a streaming source"
    * verb: commits become micro-batches. The `_log` directory IS the
    * stream — manifests are immutable, created in version order, and
    * self-describing (`#v=`), so a Structured Streaming FILE SOURCE over
    * `_log` (checkpointed offsets = processed manifests) turns every
    * commit into exactly one trigger. Each batch advances a
    * transactional CDC sink: for every source version past the sink's
    * own log head, the manifest DIFF vs the previous version is read
    * (added∖removed rows as 'I', removed∖added as 'D' — the q335
    * cancellation discipline, so the v3 copy-on-write delete's survivor
    * MOVES don't poison consumers) and committed to the sink store at
    * SINK VERSION = SOURCE VERSION — delivery identity lives in the
    * sink's CREATE_NEW manifest (the q344 protocol), so crash-retries
    * and replays add nothing.
    *
    * The gate runs the full table→stream→table loop and pins it:
    * run 1 streams commits v1–v2 (checkpoint C), THEN v3 (CoW delete)
    * and v4 (append) land, and run 2 RESUMES C mid-log — the file
    * source's offset log replays nothing, `run1_versions` = 2 pins the
    * mid-log handoff; a third run from a FRESH checkpoint re-emits all
    * four manifests and every batch must skip (`replay_added_nothing`
    * pins sink-file-set identity). The CDC content itself — exactly the
    * base ids, Δ ids, victim ids, late-append ids, each at its source
    * version — is recomputed by the oracle from the modular arithmetic.
    * Scale: per-commit cost is O(changed files) reads + an O(1)
    * manifest stat for idempotence; the stream never reads a snapshot,
    * only diffs — what makes continuous downstream refresh affordable
    * when the table is 100 TB and a commit touches 8 buckets.
    */
  val logStreamCdc: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    val store = scratch("graft_logstream").toString + "/docs"
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        pmod(col("doc_id"), lit(8)).cast("int").as("bucket"))
    def listAll(): Seq[String] = {
      val kids = new java.io.File(store).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids).toIndexedSeq
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .flatMap(dd => Writers.listParquetFiles(dd.toString))
        .sorted
    }
    // v1 base, v2 append-Δ (the stream's first two commits)
    d.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(store)
    val m1 = listAll()
    SnapshotLog.commit(store, m1)
    d.filter(pmod(col("doc_id"), lit(10)) === 0)
      .repartition(col("bucket")).write.mode("append")
      .partitionBy("bucket").parquet(store)
    val m2 = listAll()
    SnapshotLog.commit(store, m2)

    val sink = scratch("graft_logstream_sink").toString + "/cdc"
    new java.io.File(sink).mkdirs()
    val cdcSchema = StructType(Seq(
      StructField("op", StringType), StructField("doc_id", LongType),
      StructField("src_version", IntegerType)))
    def diffRows(v: Int): DataFrame = {
      val cur = SnapshotLog.files(store, v).toSet
      val prev = if (v <= 1) Set.empty[String]
        else SnapshotLog.files(store, v - 1).toSet
      def rd(fs: Seq[String]): DataFrame =
        readFiles(s, store, fs.sorted).select(col("doc_id"))
      val added = rd((cur -- prev).toSeq)
      val removed = rd((prev -- cur).toSeq)
      added.except(removed).select(lit("I").as("op"), col("doc_id"))
        .unionAll(removed.except(added)
          .select(lit("D").as("op"), col("doc_id")))
        .withColumn("src_version", lit(v))
    }
    def runStream(ckpt: String): Unit = {
      val sq = s.readStream.option("maxFilesPerTrigger", 1)
        .text(store + "/_log")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          // the batch content is the version WATERMARK (manifests are
          // self-describing); the diff reads the log directly. Catching
          // up to the max seen version makes processing order-proof:
          // manifest modification times can tie at millisecond
          // granularity and the file source breaks ties arbitrarily
          val seen = df.filter(col("value").startsWith("#v="))
            .select(col("value")).collect()
            .map(_.getString(0).stripPrefix("#v=").toInt)
          val target = if (seen.isEmpty) 0 else seen.max
          var v = SnapshotLog.latest(sink) + 1
          while (v <= target) {
            // sink version v already present ⇒ a prior attempt (crash
            // retry / fresh-checkpoint replay) delivered it: skip
            val before = Writers.listParquetFiles(sink)
            diffRows(v).coalesce(1).write.mode("append").parquet(sink)
            val fresh = Writers.listParquetFiles(sink)
              .filterNot(before.contains)
            val prev = if (v == 1) Seq.empty[String]
              else SnapshotLog.files(sink, v - 1)
            // loud on conflict (VERDICT r13 #6): a silently-lost race
            // here drops feed slice v from the sink forever
            SnapshotLog.commitStrict(sink, prev ++ fresh, v - 1)
            v += 1
          }
          ()
        }
        .start()
      sq.awaitTermination()
    }
    val ckpt = scratch("graft_logstream_ckpt").toString
    runStream(ckpt)
    val run1Versions = SnapshotLog.latest(sink).toLong
    // v3: copy-on-write delete (doc_id % 20 == 5) — survivor moves must
    // CANCEL in the feed; v4: late append of remapped ids
    val touched = d.filter(pmod(col("doc_id"), lit(20)) === 5)
      .select(col("bucket")).distinct().collect().map(_.getInt(0)).toSet
    def inTouched(path: String): Boolean =
      touched.exists(b => path.contains(s"/bucket=$b/"))
    if (touched.nonEmpty) {
      readFiles(s, store, m2.filter(inTouched))
        .filter(pmod(col("doc_id"), lit(20)) =!= 5)
        .repartition(col("bucket")).write.mode("append")
        .partitionBy("bucket").parquet(store)
    }
    val rewrites = listAll().filterNot(m2.contains)
    SnapshotLog.commit(store, m2.filterNot(inTouched) ++ rewrites)
    val beforeV4 = listAll()
    d.filter(pmod(col("doc_id"), lit(9)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("n_chars"),
        col("bucket"))
      .repartition(col("bucket")).write.mode("append")
      .partitionBy("bucket").parquet(store)
    SnapshotLog.commit(store,
      SnapshotLog.files(store, 3) ++ listAll().filterNot(beforeV4.contains))
    // run 2: RESUME the same checkpoint mid-log — only v3/v4 manifests
    // are new to the file source
    runStream(ckpt)
    val sinkVersions = SnapshotLog.latest(sink)
    val sinkFiles = SnapshotLog.files(sink, sinkVersions)
    // run 3: fresh checkpoint, same sink — every batch must skip
    runStream(scratch("graft_logstream_ckpt2").toString)
    val sinkVersions2 = SnapshotLog.latest(sink)
    val sinkFiles2 = SnapshotLog.files(sink, sinkVersions2)
    val fin =
      if (sinkFiles2.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[Row], cdcSchema)
      else s.read.schema(cdcSchema).parquet(sinkFiles2: _*)
    fin.select(col("op"), col("doc_id"), col("src_version"),
        lit(run1Versions).as("run1_versions"),
        lit(sinkVersions2.toLong).as("n_sink_versions"),
        lit(sinkVersions == sinkVersions2 && sinkFiles == sinkFiles2)
          .as("replay_added_nothing"))
      .orderBy(col("src_version"), col("op"), col("doc_id"))
  }

  val logStreamCdcSql: String =
    """WITH d AS (SELECT doc_id FROM documents),
      |feed AS (
      |  SELECT 'I' AS op, doc_id, 1 AS src_version FROM d
      |    WHERE doc_id % 10 <> 0
      |  UNION ALL
      |  SELECT 'I', doc_id, 2 FROM d WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT 'D', doc_id, 3 FROM d WHERE doc_id % 20 = 5
      |  UNION ALL
      |  SELECT 'I', doc_id + 1000000, 4 FROM d WHERE doc_id % 9 = 0)
      |SELECT op, doc_id, src_version,
      |  CAST(2 AS BIGINT) AS run1_versions,
      |  CAST(4 AS BIGINT) AS n_sink_versions,
      |  TRUE AS replay_added_nothing
      |FROM feed ORDER BY src_version, op, doc_id""".stripMargin

  /** Timestamp time travel + time-based retention — the form operators
    * actually use ("the table as of yesterday 14:00", "expire snapshots
    * older than 7 days"): commits carry a `#ts=` wall-time in the
    * manifest header. Clock injection keeps the gate deterministic (the
    * q198 no-wall-clock discipline): commit v is stamped v hours past
    * epoch. AS-OF resolution picks the LARGEST version committed at or
    * before t — the mid-window probe (t = v1 + 30 min) must resolve v1,
    * not v2, and must still serve the victims v3 later deleted;
    * `vacuumOlderThan` then expires by time (cutoff just past v2,
    * always retaining the latest) and the SAME mid-window probe now
    * FAILS LOUDLY (`expired_asof_fails`) — retention changed what
    * history means, and a resolver that silently snapped forward to a
    * surviving version would serve the wrong table. `n_orphans_removed`
    * and the current read ride in the hash, oracle-recomputed from the
    * q333 bucket arithmetic. Scale: AS-OF resolution is O(versions)
    * header reads — no data, no footers.
    */
  val timeTravelTs: Q = (s, dir) => {
    val hour = 3600L * 1000L
    val store = buildDocSnapshotStore(s, dir, v => Some(v * hour))
    def agg(v: Int): (Long, Long) = {
      val r = readFiles(s, store, SnapshotLog.files(store, v))
        .agg(count(lit(1)),
          sum(when(pmod(col("doc_id"), lit(20)) === 5, 1L).otherwise(0L)))
        .head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val tMid = hour + hour / 2 // 30 min past v1's commit
    val vMid = SnapshotLog.versionAsOf(store, tMid)
    val (midRows, midVictims) = agg(vMid)
    val vEnd = SnapshotLog.versionAsOf(store, 10 * hour)
    val (endRows, endVictims) = agg(vEnd)
    // retention: expire everything committed before 2h30 (v1, v2)
    val removed = SnapshotLog.vacuumOlderThan(store, 2 * hour + hour / 2)
    val (endRows2, _) = agg(SnapshotLog.latest(store))
    val expiredFails =
      scala.util.Try(SnapshotLog.versionAsOf(store, tMid)).isFailure
    s.range(1).select(
      lit(vMid).as("asof_mid_version"),
      lit(midRows).as("asof_mid_rows"),
      lit(midVictims).as("asof_mid_victims"),
      lit(vEnd).as("asof_end_version"),
      lit(endRows).as("asof_end_rows"),
      lit(endVictims).as("asof_end_victims"),
      lit(removed.size.toLong).as("n_orphans_removed"),
      lit(endRows == endRows2).as("current_unchanged"),
      lit(expiredFails).as("expired_asof_fails"))
  }

  /** General-content JPEG decode, hash-gated — closes the codec
    * boundary q326/q331 parked: those gates' fixtures are exactly
    * lossless CONSTANT blocks (the AC path never runs), because a
    * float IDCT cannot be recomputed in SQL. The r13 decoder swaps the
    * general path to the INTEGER islow transform
    * ([[graft.functions.JpegExpressions]] — 13-bit fixed point, every
    * op an integer multiply/add/arithmetic-shift), so the oracle can
    * REPLAY the full 2-D IDCT in SQL: two pivot → butterfly → unpivot
    * passes over the coefficient block, bit-identical to the JVM
    * (DuckDB `>>` is an arithmetic shift; the `<< 13` is expressed as
    * ·8192 because DuckDB refuses to left-shift negatives). Fixtures:
    * per document, 64 md5-derived driving bytes choose a QUANTIZED
    * coefficient block (DC = b₀ mod 120 − 60, AC = bᵢ mod 9 − 4 — AC
    * energy everywhere, the path q326 never exercises);
    * `jpeg_block_fixture` entropy-encodes it into a REAL single-block
    * JFIF wire (ImageIO-accepted, pinned ±1 in JpegSpec), the
    * expression decodes the wire, and all 64 pixels ride the hash.
    * Scale: row-local codegen end to end — fixture construction,
    * decode, and pixel extraction fuse into the scan; 64 rows out per
    * document is output-linear.
    */
  val jpegIdctIslow: Q = (s, dir) => {
    import graft.functions.JpegExpressions
    val bytes = concat((0 to 3).map(j =>
      unhex(md5(concat(col("doc_id").cast("string"),
        lit(s"|idct$j")).cast("binary")))): _*)
    t(s, dir, "documents")
      .select(col("doc_id").as("media_id"), bytes.as("bs"))
      .withColumn("px", JpegExpressions.jpeg_decode_gray(
        JpegExpressions.jpeg_block_fixture(col("bs"))))
      .select(col("media_id"), col("px"),
        explode(sequence(lit(0), lit(63))).as("k"))
      .select(col("media_id"), col("k"),
        conv(hex(col("px").substr(col("k") + 1, lit(1))), 16, 10)
          .cast("long").as("pixel"))
      .orderBy(col("media_id"), col("k"))
  }

  val jpegIdctIslowSql: String =
    """WITH ks AS (SELECT unnest(generate_series(0, 63)) AS i),
      |raw AS (SELECT doc_id AS media_id, i,
      |   ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|idct' ||
      |     CAST(i // 16 AS VARCHAR)), (i % 16) * 2 + 1, 2))::BIGINT AS b
      |  FROM documents CROSS JOIN ks),
      |coef AS (SELECT media_id, i,
      |   CAST(CASE WHEN i = 0 THEN (b % 120 - 60) * 8
      |        ELSE (b % 9 - 4) * 16 END AS BIGINT) AS s
      |  FROM raw),
      |p1 AS (SELECT media_id, i % 8 AS x,
      |   max(CASE WHEN i // 8 = 0 THEN s END) AS s0,
      |   max(CASE WHEN i // 8 = 1 THEN s END) AS s1,
      |   max(CASE WHEN i // 8 = 2 THEN s END) AS s2,
      |   max(CASE WHEN i // 8 = 3 THEN s END) AS s3,
      |   max(CASE WHEN i // 8 = 4 THEN s END) AS s4,
      |   max(CASE WHEN i // 8 = 5 THEN s END) AS s5,
      |   max(CASE WHEN i // 8 = 6 THEN s END) AS s6,
      |   max(CASE WHEN i // 8 = 7 THEN s END) AS s7
      |  FROM coef GROUP BY media_id, i % 8),
      |p1c AS (SELECT media_id, x,
      |   (s2 + s6) * 4433 AS z1e,
      |   z1e - s6 * 15137 AS u2, z1e + s2 * 6270 AS u3,
      |   (s0 + s4) * 8192 AS u0, (s0 - s4) * 8192 AS u1,
      |   u0 + u3 AS t10, u0 - u3 AS t13, u1 + u2 AS t11, u1 - u2 AS t12,
      |   s7 + s1 AS z1, s5 + s3 AS z2, s7 + s3 AS z3, s5 + s1 AS z4,
      |   (z3 + z4) * 9633 AS z5,
      |   s7 * 2446 - z1 * 7373 - z3 * 16069 + z5 AS t0,
      |   s5 * 16819 - z2 * 20995 - z4 * 3196 + z5 AS t1,
      |   s3 * 25172 - z2 * 20995 - z3 * 16069 + z5 AS t2,
      |   s1 * 12299 - z1 * 7373 - z4 * 3196 + z5 AS t3
      |  FROM p1),
      |ws AS (
      |  SELECT media_id, x, 0 AS v, (t10 + t3 + 1024) >> 11 AS w FROM p1c
      |  UNION ALL SELECT media_id, x, 7, (t10 - t3 + 1024) >> 11 FROM p1c
      |  UNION ALL SELECT media_id, x, 1, (t11 + t2 + 1024) >> 11 FROM p1c
      |  UNION ALL SELECT media_id, x, 6, (t11 - t2 + 1024) >> 11 FROM p1c
      |  UNION ALL SELECT media_id, x, 2, (t12 + t1 + 1024) >> 11 FROM p1c
      |  UNION ALL SELECT media_id, x, 5, (t12 - t1 + 1024) >> 11 FROM p1c
      |  UNION ALL SELECT media_id, x, 3, (t13 + t0 + 1024) >> 11 FROM p1c
      |  UNION ALL SELECT media_id, x, 4, (t13 - t0 + 1024) >> 11 FROM p1c),
      |p2 AS (SELECT media_id, v AS y,
      |   max(CASE WHEN x = 0 THEN w END) AS s0,
      |   max(CASE WHEN x = 1 THEN w END) AS s1,
      |   max(CASE WHEN x = 2 THEN w END) AS s2,
      |   max(CASE WHEN x = 3 THEN w END) AS s3,
      |   max(CASE WHEN x = 4 THEN w END) AS s4,
      |   max(CASE WHEN x = 5 THEN w END) AS s5,
      |   max(CASE WHEN x = 6 THEN w END) AS s6,
      |   max(CASE WHEN x = 7 THEN w END) AS s7
      |  FROM ws GROUP BY media_id, v),
      |p2c AS (SELECT media_id, y,
      |   (s2 + s6) * 4433 AS z1e,
      |   z1e - s6 * 15137 AS u2, z1e + s2 * 6270 AS u3,
      |   (s0 + s4) * 8192 AS u0, (s0 - s4) * 8192 AS u1,
      |   u0 + u3 AS t10, u0 - u3 AS t13, u1 + u2 AS t11, u1 - u2 AS t12,
      |   s7 + s1 AS z1, s5 + s3 AS z2, s7 + s3 AS z3, s5 + s1 AS z4,
      |   (z3 + z4) * 9633 AS z5,
      |   s7 * 2446 - z1 * 7373 - z3 * 16069 + z5 AS t0,
      |   s5 * 16819 - z2 * 20995 - z4 * 3196 + z5 AS t1,
      |   s3 * 25172 - z2 * 20995 - z3 * 16069 + z5 AS t2,
      |   s1 * 12299 - z1 * 7373 - z4 * 3196 + z5 AS t3
      |  FROM p2),
      |px AS (
      |  SELECT media_id, y, 0 AS x, (t10 + t3 + 131072) >> 18 AS o FROM p2c
      |  UNION ALL SELECT media_id, y, 7, (t10 - t3 + 131072) >> 18 FROM p2c
      |  UNION ALL SELECT media_id, y, 1, (t11 + t2 + 131072) >> 18 FROM p2c
      |  UNION ALL SELECT media_id, y, 6, (t11 - t2 + 131072) >> 18 FROM p2c
      |  UNION ALL SELECT media_id, y, 2, (t12 + t1 + 131072) >> 18 FROM p2c
      |  UNION ALL SELECT media_id, y, 5, (t12 - t1 + 131072) >> 18 FROM p2c
      |  UNION ALL SELECT media_id, y, 3, (t13 + t0 + 131072) >> 18 FROM p2c
      |  UNION ALL SELECT media_id, y, 4, (t13 - t0 + 131072) >> 18 FROM p2c)
      |SELECT media_id, CAST(y * 8 + x AS INTEGER) AS k,
      |  CAST(least(255, greatest(0, o + 128)) AS BIGINT) AS pixel
      |FROM px ORDER BY media_id, k""".stripMargin

  val timeTravelTsSql: String =
    """WITH d AS (SELECT doc_id FROM documents),
      |base AS (SELECT * FROM d WHERE doc_id % 10 <> 0),
      |delta AS (SELECT * FROM d WHERE doc_id % 10 = 0),
      |tb AS (SELECT DISTINCT doc_id % 8 AS b FROM d WHERE doc_id % 20 = 5),
      |tf AS (SELECT
      |    (SELECT count(DISTINCT doc_id % 8) FROM base
      |      WHERE doc_id % 8 IN (SELECT b FROM tb))
      |  + (SELECT count(DISTINCT doc_id % 8) FROM delta
      |      WHERE doc_id % 8 IN (SELECT b FROM tb)) AS nf)
      |SELECT 1 AS asof_mid_version,
      |  (SELECT count(*) FROM base) AS asof_mid_rows,
      |  CAST((SELECT sum(CASE WHEN doc_id % 20 = 5 THEN 1 ELSE 0 END)
      |    FROM base) AS BIGINT) AS asof_mid_victims,
      |  3 AS asof_end_version,
      |  (SELECT count(*) FROM d WHERE doc_id % 20 <> 5) AS asof_end_rows,
      |  CAST(0 AS BIGINT) AS asof_end_victims,
      |  CAST((SELECT nf FROM tf) AS BIGINT) AS n_orphans_removed,
      |  TRUE AS current_unchanged,
      |  TRUE AS expired_asof_fails""".stripMargin
}
