package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import graft.io.{SnapshotLog, Writers}
import graft.io.SnapshotLog.FileEntry

/** Round-13 widening, second wave: the recovery/publication verbs on
  * the snapshot store — RESTORE (rollback as a manifest-only commit),
  * write-audit-publish via branch refs, crashed-writer orphan cleanup,
  * and the change feed extended to delete-vector commits.
  */
trait QueriesRound13b extends QueriesRound13 {

  /** RESTORE (rollback) as a commit — the Delta RESTORE / Iceberg
    * rollback verb, and the recovery story snapshot isolation exists
    * for: after the copy-on-write delete (v3), the table is rolled
    * back to v2 by committing v4 WITH V2'S FILE LIST — a manifest-only
    * commit, zero data files written (`n_data_files_written` = 0 rides
    * in the hash, captured by listing the store before/after). The
    * pins make the semantics precise: v4 serves exactly the pre-delete
    * table (the victims are VISIBLE again — restore un-does DML by
    * reference, not by re-writing data), while v3, read AFTER the
    * restore, still serves the post-delete table — rollback adds
    * history, it never rewrites it (an implementation that restored by
    * copying files or by mutating v3 mismatches the file arithmetic).
    * Scale: RESTORE is O(|manifest|) driver work at any table size —
    * the operational property that makes "undo the bad delete on the
    * 100 TB table" a seconds-level action.
    */
  val snapshotRestore: Q = (s, dir) => {
    val store = buildDocSnapshotStore(s, dir)
    def listAll(): Set[String] = {
      val kids = new java.io.File(store).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids).toIndexedSeq
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .flatMap(dd => Writers.listParquetFiles(dd.toString)).toSet
    }
    val before = listAll()
    val v4 = SnapshotLog.commit(store, SnapshotLog.files(store, 2))
    val written = (listAll() -- before).size.toLong
    def snapAgg(v: Int): DataFrame = {
      val files = SnapshotLog.files(store, v)
      readFiles(s, store, files)
        .agg(count(lit(1)).as("n_rows"),
          sum(when(pmod(col("doc_id"), lit(20)) === 5, 1L).otherwise(0L))
            .as("n_victims_visible"),
          sum(col("n_chars")).as("sum_chars"))
        .select(lit(v).as("snap"), col("n_rows"), col("n_victims_visible"),
          col("sum_chars"), lit(files.size.toLong).as("n_files"))
    }
    snapAgg(3).unionAll(snapAgg(v4))
      .withColumn("restored_from", lit(2))
      .withColumn("n_data_files_written", lit(written))
      .orderBy(col("snap"))
  }

  val snapshotRestoreSql: String =
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
      |s3 AS (SELECT 3 AS snap, count(*) AS n_rows,
      |    CAST(sum(0) AS BIGINT) AS n_victims_visible,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |    CAST((SELECT nf FROM f1) + (SELECT nf FROM f2)
      |      - (SELECT nf FROM tf) + (SELECT nf FROM rw) AS BIGINT)
      |      AS n_files
      |  FROM d WHERE doc_id % 20 <> 5),
      |s4 AS (SELECT 4 AS snap, count(*) AS n_rows,
      |    CAST(sum(CASE WHEN doc_id % 20 = 5 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_victims_visible,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |    CAST((SELECT nf FROM f1) + (SELECT nf FROM f2) AS BIGINT)
      |      AS n_files FROM d)
      |SELECT *, 2 AS restored_from, CAST(0 AS BIGINT)
      |  AS n_data_files_written
      |FROM (SELECT * FROM s3 UNION ALL SELECT * FROM s4)
      |ORDER BY snap""".stripMargin

  /** Write-audit-publish (WAP) via branch refs — the staging contract
    * behind every production lake ingest: consumers resolve the
    * PUBLISHED ref (`main`), writers commit versions freely and point
    * a staging ref (`audit`) at them, a quality audit runs against the
    * staged snapshot, and publication is ONE ref write — no data
    * movement, no reader disruption, and a failed audit simply never
    * moves `main` (the bad version stays in the log, unreferenced,
    * reclaimable). The gate runs both outcomes: a clean Δ (odd ids)
    * stages as v2, passes the audit (non-empty, no NULL keys,
    * non-negative n_chars — the q08/q99 expectation shapes), and
    * publishes; a poisoned Δ (planted negative n_chars) stages as v3,
    * FAILS the audit, and `main` must still serve v2 — the final read
    * goes through `getRef("main")`, so a publish that leaked the bad
    * commit, or an audit that read the published ref instead of the
    * staged one, mismatches the oracle's row arithmetic. Scale: the
    * audit reads only the staged Δ slice's files; publish/rollback are
    * O(1) ref writes.
    */
  val snapshotWap: Q = (s, dir) => {
    val store = scratch("graft_wap").toString + "/docs"
    val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    d.filter(pmod(col("doc_id"), lit(2)) === 0)
      .repartition(2).write.mode("overwrite").parquet(store)
    def files(): Seq[String] = Writers.listParquetFiles(store)
    val m1 = files()
    SnapshotLog.commit(store, m1)
    SnapshotLog.setRef(store, "main", 1)
    def audit(v: Int): Boolean = {
      val df = readFlat2(s, store, SnapshotLog.files(store, v))
      val r = df.agg(count(lit(1)),
        sum(when(col("doc_id").isNull, 1L).otherwise(0L)),
        min(col("n_chars"))).head()
      r.getLong(0) > 0 && r.getLong(1) == 0 &&
        !r.isNullAt(2) && r.getLong(2) >= 0
    }
    // --- good Δ: stage, audit, publish
    d.filter(pmod(col("doc_id"), lit(2)) === 1)
      .coalesce(1).write.mode("append").parquet(store)
    val m2 = files()
    SnapshotLog.commit(store, m2)
    SnapshotLog.setRef(store, "audit", 2)
    val audit1 = audit(SnapshotLog.getRef(store, "audit").getOrElse(0))
    if (audit1) SnapshotLog.setRef(store, "main", 2)
    // --- poisoned Δ: stage, audit FAILS, main must not move
    d.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        lit(-1L).as("n_chars"))
      .coalesce(1).write.mode("append").parquet(store)
    SnapshotLog.commit(store, files())
    SnapshotLog.setRef(store, "audit", 3)
    val audit2 = audit(SnapshotLog.getRef(store, "audit").getOrElse(0))
    if (audit2) SnapshotLog.setRef(store, "main", 3)
    val published = SnapshotLog.getRef(store, "main").getOrElse(0)
    readFlat2(s, store, SnapshotLog.files(store, published))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"))
      .select(lit(published).as("published_version"),
        lit(audit1).as("audit1_passed"), lit(audit2).as("audit2_passed"),
        col("n_rows"), col("sum_chars"),
        lit(SnapshotLog.latest(store)).as("n_staged_versions"))
  }

  protected def readFlat2(s: SparkSession, store: String,
                          fs: Seq[String]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType)))
    if (fs.isEmpty) s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else s.read.schema(schema).parquet(fs: _*)
  }

  val snapshotWapSql: String =
    """SELECT 2 AS published_version, TRUE AS audit1_passed,
      |  FALSE AS audit2_passed, count(*) AS n_rows,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  3 AS n_staged_versions
      |FROM documents""".stripMargin

  /** Crashed-writer orphan cleanup — the reclamation verb [[graft.io
    * .SnapshotLog.vacuum]] does NOT cover: a writer that staged data
    * files (and even delete-vector sidecars) and died before its
    * commit leaves debris no manifest references — invisible to every
    * reader, but accumulating storage cost forever at ingest rates
    * where writers crash weekly. `removeOrphans` deletes exactly the
    * never-committed files; the pins draw the line that makes it safe:
    * `n_orphans_removed` is the planted-debris file count (oracle-
    * recomputed from the staged slice's bucket footprint), the CURRENT
    * read is bit-unchanged, and — the contrast with vacuum — v1 is
    * STILL READABLE WITH ITS VICTIMS (`v1_rows`/`v1_victims` ride in
    * the hash): orphan cleanup touches no committed generation, where
    * vacuum deliberately expires them. Scale: one recursive listing +
    * manifest reads, O(files), zero data reads.
    */
  val snapshotOrphans: Q = (s, dir) => {
    val store = buildDocSnapshotStore(s, dir)
    val d = t(s, dir, "documents")
    // crashed writer: a bucketed Δ staged into the store, never committed
    d.filter(pmod(col("doc_id"), lit(7)) === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("n_chars"),
        pmod(col("doc_id"), lit(8)).cast("int").as("bucket"))
      .repartition(col("bucket")).write.mode("append")
      .partitionBy("bucket").parquet(store)
    // explicit future cutoff: this gate IS the crashed writer's janitor
    // and no concurrent writer exists — production keeps the 3-day
    // default grace so a live writer's just-staged files survive
    val removed = SnapshotLog.removeOrphans(store,
      olderThanMs = System.currentTimeMillis() + 60000L)
    def agg(v: Int): Row =
      readFiles(s, store, SnapshotLog.files(store, v))
        .agg(count(lit(1)),
          sum(when(pmod(col("doc_id"), lit(20)) === 5, 1L).otherwise(0L)),
          sum(col("n_chars"))).head()
    val cur = agg(3)
    val v1 = agg(1)
    def nz(r: Row, i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    s.range(1).select(
      lit(removed.size.toLong).as("n_orphans_removed"),
      lit(cur.getLong(0)).as("current_rows"),
      lit(nz(cur, 2)).as("current_sum_chars"),
      lit(v1.getLong(0)).as("v1_rows"),
      lit(nz(v1, 1)).as("v1_victims"))
  }

  val snapshotOrphansSql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents)
      |SELECT
      |  CAST((SELECT count(DISTINCT doc_id % 8) FROM d WHERE doc_id % 7 = 0)
      |    AS BIGINT) AS n_orphans_removed,
      |  (SELECT count(*) FROM d WHERE doc_id % 20 <> 5) AS current_rows,
      |  CAST((SELECT sum(n_chars) FROM d WHERE doc_id % 20 <> 5) AS BIGINT)
      |    AS current_sum_chars,
      |  (SELECT count(*) FROM d WHERE doc_id % 10 <> 0) AS v1_rows,
      |  CAST((SELECT sum(CASE WHEN doc_id % 20 = 5 THEN 1 ELSE 0 END)
      |    FROM d WHERE doc_id % 10 <> 0) AS BIGINT) AS v1_victims""".stripMargin

  /** Change feed across DELETE-VECTOR commits — the q335 CDC verb
    * extended to the delete strategy where NOTHING in the file set
    * changes: a DV commit re-references the same data files and only
    * the `dv=` annotations move, so a manifest-diff feed (q335) sees
    * an empty diff and silently drops the deletes. The DV-aware feed
    * diffs the POSITION SETS per file: newly-deleted positions are
    * read back as rows (open ONLY the touched files, semi-join the
    * O(Δ-positions) broadcast), emitted as 'D'. Three commits: v1 full
    * load ('I' rows — the initial snapshot IS the table), v2 a DV
    * delete (doc_id % 25 == 3), v3 a SECOND DV delete (doc_id % 40 ==
    * 7) whose sidecars must MERGE with v2's per-file positions — the
    * feed emits only the NEW victims (an implementation that diffed
    * whole sidecars against empty, or re-emitted v2's positions,
    * mismatches). `n_files_opened` rides per step (oracle-recomputed
    * from each victim set's bucket footprint): step-2/3 cost is
    * O(touched files + Δ positions), never O(table) — what keeps
    * downstream refresh affordable when a 100 TB table takes sparse
    * daily takedowns. Composes q346 (DV store) with q335 (cancelled
    * feed); the log-as-stream gate (q348) can drive this incrementally.
    */
  val dvChangeFeed: Q = (s, dir) => {
    val store = scratch("graft_dvcdc").toString + "/docs"
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        pmod(col("doc_id"), lit(8)).cast("int").as("bucket"))
    d.repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(store)
    def listAll(): Seq[String] = {
      val kids = new java.io.File(store).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids).toIndexedSeq
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .flatMap(dd => Writers.listParquetFiles(dd.toString)).sorted
    }
    val m1 = listAll()
    SnapshotLog.commit(store, m1)
    val v2 = dvDeleteCommit(s, store, 1, pmod(col("doc_id"), lit(25)) === 3)
    val v3 = dvDeleteCommit(s, store, v2, pmod(col("doc_id"), lit(40)) === 7)
    dvFeedStep(s, store, 1).unionAll(dvFeedStep(s, store, v2))
      .unionAll(dvFeedStep(s, store, v3))
      .orderBy(col("src_version"), col("op"), col("doc_id"))
  }

  /** One change-feed step (version v-1 → v) that understands BOTH
    * change carriers: file-set diffs (q335's except-cancellation) and
    * delete-vector deltas (newly-added positions on files present on
    * both sides, read back by a touched-files-only semi-join).
    */
  protected def dvFeedStep(s: SparkSession, store: String,
                           v: Int): DataFrame = {
    def dvPos(es: Seq[FileEntry]): Map[String, Set[Long]] =
      es.flatMap(e => e.dv.map(dv =>
        plainP(e.path) -> SnapshotLog.readDeleteVector(dv).toSet)).toMap
    val cur = SnapshotLog.entries(store, v)
    val prev = if (v <= 1) Seq.empty[FileEntry]
      else SnapshotLog.entries(store, v - 1)
    val curP = cur.map(_.path).toSet
    val prevP = prev.map(_.path).toSet
    val added = (curP -- prevP).toSeq.sorted
    val removed = (prevP -- curP).toSeq.sorted
    val ins = readFiles(s, store, added).select(col("doc_id"))
      .except(readFiles(s, store, removed).select(col("doc_id")))
    val delFiles = readFiles(s, store, removed).select(col("doc_id"))
      .except(readFiles(s, store, added).select(col("doc_id")))
    // DV delta on files present on BOTH sides
    val prevDv = dvPos(prev)
    val delta = dvPos(cur).toSeq.flatMap { case (p, pos) =>
      if (!prevP.contains(p)) Seq.empty
      else {
        val fresh = pos -- prevDv.getOrElse(p, Set.empty)
        val key = { val f = new java.io.File(p)
          f.getParentFile.getName + "/" + f.getName }
        fresh.toSeq.map(x => (key, x))
      }
    }
    val dvTouched = delta.map(_._1).distinct
    val delDv = if (delta.isEmpty)
      readFiles(s, store, Seq.empty).select(col("doc_id"))
    else {
      import s.implicits._
      val dvDf = delta.toDF("fkey", "pos")
      readFiles(s, store,
        cur.map(_.path).filter(p => dvTouched.contains({
          val f = new java.io.File(p)
          f.getParentFile.getName + "/" + f.getName })))
        .withColumn("fkey", concat_ws("/",
          slice(split(col("_metadata.file_path"), "/"), -2, 2)))
        .withColumn("pos", col("_metadata.row_index"))
        .join(broadcast(dvDf), Seq("fkey", "pos"), "left_semi")
        .select(col("doc_id"))
    }
    val opened = (added.size + removed.size + dvTouched.size).toLong
    ins.select(lit("I").as("op"), col("doc_id"))
      .unionAll(delFiles.select(lit("D").as("op"), col("doc_id")))
      .unionAll(delDv.select(lit("D").as("op"), col("doc_id")))
      .withColumn("src_version", lit(v))
      .withColumn("n_files_opened", lit(opened))
  }

  val dvChangeFeedSql: String =
    """WITH d AS (SELECT doc_id FROM documents),
      |a AS (SELECT doc_id FROM d WHERE doc_id % 25 = 3),
      |b AS (SELECT doc_id FROM d WHERE doc_id % 40 = 7),
      |nf1 AS (SELECT count(DISTINCT doc_id % 8) AS n FROM d),
      |nfa AS (SELECT count(DISTINCT doc_id % 8) AS n FROM a),
      |nfb AS (SELECT count(DISTINCT doc_id % 8) AS n FROM b),
      |feed AS (
      |  SELECT 'I' AS op, doc_id, 1 AS src_version,
      |    (SELECT n FROM nf1) AS nf FROM d
      |  UNION ALL SELECT 'D', doc_id, 2, (SELECT n FROM nfa) FROM a
      |  UNION ALL SELECT 'D', doc_id, 3, (SELECT n FROM nfb) FROM b)
      |SELECT op, doc_id, src_version,
      |  CAST(nf AS BIGINT) AS n_files_opened
      |FROM feed ORDER BY src_version, op, doc_id""".stripMargin
}
