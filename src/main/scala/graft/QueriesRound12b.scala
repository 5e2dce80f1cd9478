package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import graft.io.{SnapshotLog, Writers}

/** Round-12 widening, second wave: the snapshot-isolation storage verbs
  * (time travel, vacuum, zone-map skipping, change feed) over a
  * manifest-committed store ([[graft.io.SnapshotLog]]) — the operational
  * contracts a 100 TB table needs once it is MAINTAINED (deleted from,
  * compacted, re-clustered) while being read.
  */
trait QueriesRound12b extends QueriesRound12 {

  /** Three-commit manifest-committed store over the documents table —
    * the shared harness for the snapshot gates (q332/q333/q335):
    *
    *   v1  base load      — doc_id % 10 != 0, one file per bucket
    *                        (bucket = doc_id % 8, the q322 idiom:
    *                        repartition(bucket) + partitionBy(bucket)
    *                        gives exactly one file per (commit, bucket))
    *   v2  append Δ       — doc_id % 10 == 0, new files into the same
    *                        bucket dirs
    *   v3  GDPR delete    — doc_id % 20 == 5 removed COPY-ON-WRITE:
    *                        touched buckets' v2 slice is read once,
    *                        victims filtered, survivors appended as new
    *                        files; v3's manifest swaps the touched
    *                        buckets' old files for the new ones. The old
    *                        files STAY on disk — that is what keeps v1/v2
    *                        readable after the delete.
    *
    * Driver-side cost: three bounded directory listings (≤ 8 bucket
    * dirs × ≤ 3 files) and the victims'-bucket collect (≤ 8 rows) — at
    * any corpus size the log work is O(|buckets|), and the delete reads
    * only the touched buckets' slice, never the store.
    */
  protected def buildDocSnapshotStore(s: SparkSession, dir: String,
      tsOf: Int => Option[Long] = _ => None): String = {
    val store = scratch("graft_snapstore").toString + "/docs"
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
    d.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(store)
    val m1 = listAll()
    SnapshotLog.commit(store, m1, tsOf(1))
    d.filter(pmod(col("doc_id"), lit(10)) === 0)
      .repartition(col("bucket")).write.mode("append")
      .partitionBy("bucket").parquet(store)
    val m2 = listAll()
    SnapshotLog.commit(store, m2, tsOf(2))
    // copy-on-write delete: victims' bucket footprint only (≤ 8 ids)
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
    SnapshotLog.commit(store, m2.filterNot(inTouched) ++ rewrites, tsOf(3))
    store
  }

  protected val snapSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_chars", LongType),
    StructField("bucket", IntegerType)))

  /** Manifest-resolved read with an EXPLICIT schema: an empty manifest
    * (empty source table) must return an empty frame, and a schema
    * inferred from footers would throw on zero files.
    */
  protected def readFiles(s: SparkSession, store: String,
                          files: Seq[String]): DataFrame =
    if (files.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], snapSchema)
    else s.read.option("basePath", store).schema(snapSchema)
      .parquet(files: _*)

  private def readSnap(s: SparkSession, store: String, v: Int): DataFrame =
    readFiles(s, store, SnapshotLog.files(store, v))

  /** Time-travel snapshot reads — the snapshot-isolation verb itself:
    * ALL THREE versions of the store are read AFTER the delete commit,
    * and v1/v2 must still serve the deleted rows (`n_victims_visible`
    * pins it: full victim count at v1/v2, zero at v3) while v3 serves
    * the post-delete table. `n_files` rides in the hash with the oracle
    * recomputing the whole manifest arithmetic from the bucket CTEs —
    * a reader that fell back to a directory listing (seeing v3's
    * rewrites alongside v2's originals, double-counting survivors) or a
    * delete that rewrote UNtouched buckets both mismatch. Extension
    * beyond the reference's bare-directory reads (E1:79-97); the
    * 100 TB story is in [[graft.io.SnapshotLog]]'s scaladoc.
    */
  val snapshotTimeTravel: Q = (s, dir) => {
    val store = buildDocSnapshotStore(s, dir)
    def snapAgg(v: Int): DataFrame = {
      val files = SnapshotLog.files(store, v)
      readSnap(s, store, v)
        .agg(count(lit(1)).as("n_rows"),
          sum(when(pmod(col("doc_id"), lit(20)) === 5, 1L).otherwise(0L))
            .as("n_victims_visible"),
          sum(col("n_chars")).as("sum_chars"))
        .select(lit(v).as("snap"), col("n_rows"), col("n_victims_visible"),
          col("sum_chars"), lit(files.size.toLong).as("n_files"))
    }
    snapAgg(1).unionAll(snapAgg(2)).unionAll(snapAgg(3))
      .orderBy(col("snap"))
  }

  val snapshotTimeTravelSql: String =
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
      |s1 AS (SELECT 1 AS snap, count(*) AS n_rows,
      |    CAST(sum(CASE WHEN doc_id % 20 = 5 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_victims_visible,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |    CAST((SELECT nf FROM f1) AS BIGINT) AS n_files FROM base),
      |s2 AS (SELECT 2 AS snap, count(*) AS n_rows,
      |    CAST(sum(CASE WHEN doc_id % 20 = 5 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_victims_visible,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |    CAST((SELECT nf FROM f1) + (SELECT nf FROM f2) AS BIGINT)
      |      AS n_files FROM d),
      |s3 AS (SELECT 3 AS snap, count(*) AS n_rows,
      |    CAST(0 AS BIGINT) AS n_victims_visible,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |    CAST((SELECT nf FROM f1) + (SELECT nf FROM f2)
      |      - (SELECT nf FROM tf) + (SELECT nf FROM rw) AS BIGINT)
      |      AS n_files
      |  FROM d WHERE doc_id % 20 <> 5)
      |SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL
      |SELECT * FROM s3 ORDER BY snap""".stripMargin

  /** Vacuum with retention — the reclamation half of the snapshot
    * contract: after the copy-on-write delete, the touched buckets' old
    * files are referenced only by v1/v2; vacuum(retainLast=1) deletes
    * exactly those orphans and drops the expired manifests. Pins, all
    * oracle-recomputed from the bucket arithmetic: `n_orphans_removed`
    * (= the touched buckets' v2 file count — a vacuum that chased the
    * directory listing instead of the manifests would also delete v3's
    * live rewrites and mismatch `current_*`), `n_files_before/after`,
    * `current_unchanged` (the v3 read is bit-identical across the
    * vacuum), and `old_snap_unreadable` (time travel to v1 now FAILS
    * LOUDLY — the manifest is gone — instead of silently reading holes).
    * Scale: vacuum is O(files in the log) driver work, zero data reads.
    */
  val snapshotVacuum: Q = (s, dir) => {
    val store = buildDocSnapshotStore(s, dir)
    def cur(): (Long, Long) = {
      val r = readSnap(s, store, 3)
        .agg(count(lit(1)), sum(col("n_chars"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val allFiles = SnapshotLog.versions(store)
      .flatMap(SnapshotLog.files(store, _)).distinct
    val nBefore = allFiles.size.toLong
    val (curN, curSum) = cur()
    val removed = SnapshotLog.vacuum(store, retainLast = 1)
    val nAfter = SnapshotLog.files(store, 3).size.toLong
    val (curN2, curSum2) = cur()
    // the expired manifests are gone from the log: a v1 read must fail
    // loudly, never return a partial table
    val oldUnreadable =
      scala.util.Try(readSnap(s, store, 1).count()).isFailure
    s.range(1)
      .select(lit(nBefore).as("n_files_before"),
        lit(removed.size.toLong).as("n_orphans_removed"),
        lit(nAfter).as("n_files_after"),
        lit(curN2).as("current_rows"), lit(curSum2).as("current_sum_chars"),
        lit(curN == curN2 && curSum == curSum2).as("current_unchanged"),
        lit(oldUnreadable).as("old_snap_unreadable"))
  }

  val snapshotVacuumSql: String =
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
      |  WHERE doc_id % 8 IN (SELECT b FROM tb) AND doc_id % 20 <> 5)
      |SELECT
      |  CAST((SELECT nf FROM f1) + (SELECT nf FROM f2)
      |    + (SELECT nf FROM rw) AS BIGINT) AS n_files_before,
      |  CAST((SELECT nf FROM tf) AS BIGINT) AS n_orphans_removed,
      |  CAST((SELECT nf FROM f1) + (SELECT nf FROM f2)
      |    - (SELECT nf FROM tf) + (SELECT nf FROM rw) AS BIGINT)
      |    AS n_files_after,
      |  (SELECT count(*) FROM d WHERE doc_id % 20 <> 5) AS current_rows,
      |  CAST((SELECT sum(n_chars) FROM d WHERE doc_id % 20 <> 5) AS BIGINT)
      |    AS current_sum_chars,
      |  TRUE AS current_unchanged,
      |  TRUE AS old_snap_unreadable""".stripMargin

  /** Change feed (CDC) between snapshots by MANIFEST DIFF — incremental
    * consumption without reading either snapshot: the v1→v3 feed opens
    * only the files ADDED (v3 ∖ v1: the Δ commit's untouched-bucket
    * files + the delete's rewrites) and REMOVED (v1 ∖ v3: the touched
    * buckets' base files), then cancels rows present on both sides —
    * copy-on-write rewrites MOVE survivors to new files, and a feed
    * that reported those moves as inserts+deletes would poison every
    * downstream incremental consumer. Net feed = exactly the Δ ids as
    * 'I' and the victim ids as 'D'; `n_files_opened` rides in the hash
    * (oracle-recomputed), so a lazy implementation that diffed full
    * snapshot reads mismatches. Scale: feed cost is O(changed files),
    * never O(table) — the property that makes daily downstream refresh
    * affordable at 100 TB.
    */
  val snapshotChangeFeed: Q = (s, dir) => {
    val store = buildDocSnapshotStore(s, dir)
    val m1 = SnapshotLog.files(store, 1).toSet
    val m3 = SnapshotLog.files(store, 3).toSet
    val added = (m3 -- m1).toSeq.sorted
    val removed = (m1 -- m3).toSeq.sorted
    def rd(fs: Seq[String]): DataFrame =
      readFiles(s, store, fs).select(col("doc_id"))
    val ins = rd(added).except(rd(removed))
    val del = rd(removed).except(rd(added))
    ins.select(lit("I").as("op"), col("doc_id"))
      .unionAll(del.select(lit("D").as("op"), col("doc_id")))
      .withColumn("n_files_opened",
        lit((added.size + removed.size).toLong))
      .orderBy(col("op"), col("doc_id"))
  }

  val snapshotChangeFeedSql: String =
    """WITH d AS (SELECT doc_id FROM documents),
      |tb AS (SELECT DISTINCT doc_id % 8 AS b FROM d WHERE doc_id % 20 = 5),
      |fa AS (SELECT
      |    (SELECT count(DISTINCT doc_id % 8) FROM d WHERE doc_id % 10 = 0
      |      AND doc_id % 8 NOT IN (SELECT b FROM tb))
      |  + (SELECT count(DISTINCT doc_id % 8) FROM d
      |      WHERE doc_id % 8 IN (SELECT b FROM tb) AND doc_id % 20 <> 5)
      |  + (SELECT count(DISTINCT doc_id % 8) FROM d WHERE doc_id % 10 <> 0
      |      AND doc_id % 8 IN (SELECT b FROM tb)) AS nf)
      |SELECT 'I' AS op, doc_id,
      |  CAST((SELECT nf FROM fa) AS BIGINT) AS n_files_opened
      |FROM d WHERE doc_id % 10 = 0
      |UNION ALL
      |SELECT 'D' AS op, doc_id,
      |  CAST((SELECT nf FROM fa) AS BIGINT) AS n_files_opened
      |FROM d WHERE doc_id % 20 = 5
      |ORDER BY op, doc_id""".stripMargin

  /** Offline state-store read (TWENTIETH streaming gate) — the engine's
    * own checkpointed state read back AS A TABLE, with no stream
    * running: the q263 running-totals processor is drained over the
    * events table, then the state data source (`format("statestore")`,
    * `stateVarName=cum`) projects every user's final ValueState and the
    * `state-metadata` source identifies the operator that owns it (the
    * pinned `operator_name`). The oracle recomputes the totals from the
    * events table directly — the state the stream left behind must
    * equal the batch aggregate, row for row. This is the operational
    * verb the 19 run-the-stream gates don't cover: debugging/auditing a
    * live 100 TB pipeline means inspecting WHAT THE STATE IS without
    * replaying the stream or attaching to the job; cost is a parallel
    * scan of the state files, never a replay of the input. Scale note:
    * the read is partition-parallel (one task per state-store
    * partition) and the result is |active keys|, not |events|.
    */
  val stateStoreRead: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val srcDir = scratch("graft_state_read_src")
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("double").as("value"))
    ev.coalesce(1).write.mode("overwrite").parquet(srcDir.toString)
    val ckpt = scratch("graft_state_read_ckpt").toString
    withConfs(s, "spark.sql.streaming.stateStore.providerClass" ->
      ("org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")) {
      val stream = s.readStream.schema(ev.schema).parquet(srcDir.toString)
        .as[graft.streaming.EventStreams.Event]
      val totals = graft.streaming.EventStreams.runningTotals(stream)(s)
      val sq = totals.toDF().writeStream.outputMode("append").format("memory")
        .queryName("graft_state_read_sink")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      sq.awaitTermination()
      // one metadata row per stateful operator in the checkpoint (here: 1)
      val opName = s.read.format("state-metadata").load(ckpt)
        .select(col("operatorName")).collect()
        .map(_.getString(0)).sorted.headOption.getOrElse("")
      s.read.format("statestore").option("stateVarName", "cum").load(ckpt)
        .select(col("key.value").as("user_id"),
          col("value.n").as("n_events"),
          col("value.cents").as("total_cents"),
          lit(opName).as("operator_name"))
        .orderBy(col("user_id"))
    }
  }

  val stateStoreReadSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS total_cents,
      |  'transformWithStateExec' AS operator_name
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Zone-map (per-file min/max) data skipping — file-level pruning by
    * COLLECTED COLUMN STATS, the Delta/Iceberg "data skipping" verb and
    * the complement of the catalog-partition pruning q107/q303 already
    * gate: here nothing about the predicate column is encoded in the
    * directory layout; the skipping decision comes from a one-pass
    * stats collection (min/max event_id per physical file via the
    * `_metadata.file_path` column) held in a ≤ |files| manifest. The
    * range query consults the zone map, reads ONLY overlapping files,
    * and must equal the oracle's full-table answer; `n_files_read` /
    * `n_files_total` ride in the hash with the oracle recomputing the
    * same overlap test (files are id-range-clustered, so per-file
    * min/max ≡ per-zone min/max). Scale: the zone map is what turns a
    * point/range query on a 100 TB sorted-ish table from a full scan
    * into O(overlapping files); stats collection is one map-side pass.
    */
  val zoneMapSkip: Q = (s, dir) => {
    val store = scratch("graft_zonemap").toString + "/events"
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val mx = ev.agg(max(col("event_id"))).head()
    val maxId = if (mx.isNullAt(0)) 0L else mx.getLong(0)
    val w = maxId / 16 + 1
    // integer division (NOT floor of a double quotient: near 2^53 the
    // double rounds and can disagree with the oracle's `//` — ADVICE r12)
    ev.withColumn("fb", expr(s"event_id div ${w}L"))
      .repartition(col("fb")).write.mode("overwrite")
      .partitionBy("fb").parquet(store)
    // zone-map collection: one pass, ≤ |files| rows collected. Explicit
    // schema: an empty source writes a data-file-less store and footer
    // inference would throw
    val zSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("fb", LongType)))
    val zones = s.read.schema(zSchema).parquet(store)
      .select(col("_metadata.file_path").as("f"), col("event_id"))
      .groupBy(col("f"))
      .agg(min(col("event_id")).as("mn"), max(col("event_id")).as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val lo = 3 * w + w / 3
    val hi = 5 * w - w / 3
    val chosen = zones.collect {
      case (f, mn, mxv) if mxv >= lo && mn <= hi => f
    }.sorted
    val pruned =
      if (chosen.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[Row], zSchema)
      else s.read.option("basePath", store).schema(zSchema)
        .parquet(chosen.toIndexedSeq: _*)
    pruned
      .filter(col("event_id").between(lo, hi))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(decSum(col("value"), 2), 2).as("total_value"))
      .select(col("event_type"), col("n_events"), col("total_value"),
        lit(chosen.length.toLong).as("n_files_read"),
        lit(zones.length.toLong).as("n_files_total"))
      .orderBy(col("event_type"))
  }

  val zoneMapSkipSql: String =
    """WITH w AS (SELECT max(event_id) // 16 + 1 AS w FROM events),
      |b AS (SELECT 3 * w + w // 3 AS lo, 5 * w - w // 3 AS hi FROM w),
      |z AS (SELECT event_id // (SELECT w FROM w) AS fb,
      |    min(event_id) AS mn, max(event_id) AS mx
      |  FROM events GROUP BY 1),
      |zr AS (SELECT count(*) AS nr FROM z
      |  WHERE mx >= (SELECT lo FROM b) AND mn <= (SELECT hi FROM b)),
      |zt AS (SELECT count(*) AS nt FROM z)
      |SELECT event_type, count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
      |    AS total_value,
      |  CAST((SELECT nr FROM zr) AS BIGINT) AS n_files_read,
      |  CAST((SELECT nt FROM zt) AS BIGINT) AS n_files_total
      |FROM events
      |WHERE event_id BETWEEN (SELECT lo FROM b) AND (SELECT hi FROM b)
      |GROUP BY event_type ORDER BY event_type""".stripMargin
}
