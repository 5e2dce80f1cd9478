package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.io.{DeleteVectors, SnapshotLog, Writers}
import graft.io.SnapshotLog.{FileEntry, FileStats}

/** Round-14 widening, second wave: the MoR write path under streaming
  * exactly-once (the 24th streaming gate), delete-pressure-driven
  * compaction (the OPTIMIZE policy real lake engines run), and
  * net-change range scans (the Iceberg changelog-scan semantics, with
  * re-insert cancellation).
  */
trait QueriesRound14b extends QueriesRound14 {

  /** Apply one upsert batch (doc_id, n_chars — updates carry the NEW
    * value) to the store as a MoR commit: DV-kill the live copies of
    * the batch's ids, append the batch as bucket-routed files, commit
    * base-checked and LOUD ([[SnapshotLog.commitEntriesStrict]]) —
    * a streaming sink must never advance past a lost race.
    */
  protected def morApplyBatch(s: SparkSession, store: String,
                              batch: DataFrame, expectedBase: Int): Int = {
    import s.implicits._
    val prev =
      if (expectedBase == 0) Seq.empty[FileEntry]
      else SnapshotLog.entries(store, expectedBase)
    val before = listBucketFiles(store)
    batch.select(col("doc_id"), col("n_chars"))
      .withColumn("bucket", pmod(col("doc_id"), lit(8)).cast("int"))
      .repartition(col("bucket")).write.mode("append")
      .partitionBy("bucket").parquet(store)
    val fresh = listBucketFiles(store).filterNot(before.contains)
    if (prev.isEmpty)
      return SnapshotLog.commitEntriesStrict(store,
        fresh.map(FileEntry(_)), expectedBase)
    val dvPairs = prev.flatMap(e => e.dv.toSeq.flatMap { d =>
      val f = new java.io.File(e.path)
      val key = f.getParentFile.getName + "/" + f.getName
      SnapshotLog.readDeleteVector(d).map(p => (key, p))
    })
    // victims: LIVE copies of the batch's ids — appended files of this
    // very batch are excluded (not in prev), so a batch never kills its
    // own rows
    val base = readFiles(s, store, prev.map(_.path))
      .withColumn("file", col("_metadata.file_path"))
      .withColumn("fkey",
        concat_ws("/", slice(split(col("_metadata.file_path"), "/"), -2, 2)))
      .withColumn("pos", col("_metadata.row_index"))
    val live = if (dvPairs.isEmpty) base
      else base.join(broadcast(dvPairs.toDF("fkey", "pos")),
        Seq("fkey", "pos"), "left_anti")
    val victims = live
      .join(broadcast(batch.select(col("doc_id"))), Seq("doc_id"),
        "left_semi")
      .select(col("file"), col("pos"))
    val existing = prev.flatMap(e => e.dv.map(plainP(e.path) -> _)).toMap
    val sidecars = DeleteVectors.writeSidecars(victims, store, existing)
    val next = prev.map { e =>
      sidecars.get(plainP(e.path)) match {
        case Some(dv) => e.copy(dv = Some(dv))
        case None => e
      }
    } ++ fresh.map(FileEntry(_))
    SnapshotLog.commitEntriesStrict(store, next, expectedBase)
  }

  /** Streaming MERGE-ON-READ upsert sink — the 24th streaming gate:
    * q356's exactly-once streaming MERGE rewrote every touched bucket
    * per batch (copy-on-write); here each micro-batch lands as ONE MoR
    * commit — DV positions on the old copies + an appended file — so
    * per-batch write cost is ∝ batch size, never bucket size (the
    * shape that keeps a hot streaming upsert affordable when buckets
    * are GB-sized). Batch k inserts doc_id % 4 == k and UPDATES batch
    * k−1's keys (+1000), so every update's victim lives in the
    * PREVIOUS batch's appended file. Exactly-once = the q356 version
    * ledger (batch re-delivery is consumed without re-applying, pinned
    * by the fresh-checkpoint replay adding nothing); commits are
    * base-checked and loud. Pins: the final merged table (same oracle
    * arithmetic as q356 — MoR and CoW must agree on CONTENT),
    * `n_versions`, `base_files_kept` (no file ever rewritten across
    * the whole run), and `dv_positions` (= number of updates applied —
    * delete state ∝ updates).
    */
  val streamMorUpsertSink: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val srcDir = scratch("graft_morsink_src")
    val slices = (0 to 3).map { k =>
      val ins = d.filter(pmod(col("doc_id"), lit(4)) === k)
        .select(col("doc_id"), col("n_chars"), lit(k.toLong).as("ord"))
      if (k == 0) ins
      else ins.unionAll(d.filter(pmod(col("doc_id"), lit(4)) === (k - 1))
        .select(col("doc_id"), (col("n_chars") + 1000).as("n_chars"),
          lit(k.toLong).as("ord")))
    }.reduce(_ unionAll _)
    graft.streaming.Staging.stageSlices(slices, col("ord"), 4, 0L, 4L,
      srcDir, scratch("graft_morsink_stage"), Seq(col("doc_id")))
    val store = scratch("graft_morsink_store").toString + "/docs"
    new java.io.File(store).mkdirs()
    val stagedSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType),
      StructField("ord", LongType)))
    def runOnce(): Unit = {
      val ckpt = scratch("graft_morsink_ckpt").toString
      val sq = s.readStream.schema(stagedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          val version = batchId.toInt + 1
          if (SnapshotLog.versions(store).contains(version)) {
            df.count() // already applied: consume WITHOUT re-applying
            ()
          } else {
            morApplyBatch(s, store,
              df.select(col("doc_id"), col("n_chars")), version - 1)
            ()
          }
        }
        .start()
      sq.awaitTermination()
    }
    runOnce()
    val versions1 = SnapshotLog.versions(store)
    val files1 = versions1.lastOption
      .map(SnapshotLog.files(store, _)).getOrElse(Seq.empty)
    runOnce() // fresh checkpoint, same store: every batch must skip
    val versions2 = SnapshotLog.versions(store)
    val files2 = versions2.lastOption
      .map(SnapshotLog.files(store, _)).getOrElse(Seq.empty)
    val head = SnapshotLog.entries(store, SnapshotLog.latest(store))
    val baseKept = versions2.sliding(2).forall {
      case Seq(a, b) =>
        val cur = SnapshotLog.files(store, b).toSet
        SnapshotLog.files(store, a).forall(cur.contains)
      case _ => true
    }
    val dvTotal = head.flatMap(_.dv)
      .map(SnapshotLog.readDeleteVector(_).size.toLong).sum
    readDv(s, store, head)
      .select(col("doc_id"), col("n_chars"),
        lit(versions2.size.toLong).as("n_versions"),
        lit(versions1 == versions2 && files1 == files2)
          .as("replay_added_nothing"),
        lit(baseKept).as("base_files_kept"),
        lit(dvTotal).as("dv_positions"))
      .orderBy(col("doc_id"))
  }

  val streamMorUpsertSinkSql: String =
    """SELECT doc_id,
      |  CAST(CASE WHEN doc_id % 4 = 3 THEN n_chars
      |       ELSE n_chars + 1000 END AS BIGINT) AS n_chars,
      |  CAST(4 AS BIGINT) AS n_versions, TRUE AS replay_added_nothing,
      |  TRUE AS base_files_kept,
      |  (SELECT CAST(count(*) AS BIGINT) FROM documents
      |   WHERE doc_id % 4 < 3) AS dv_positions
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Delete-pressure-driven OPTIMIZE — the compaction POLICY every DV
    * store needs (q357 picked victims by file-size stats; real engines
    * also fold files whose delete-vector ratio crosses a threshold,
    * because every read of such a file pays the anti-join for mostly-
    * dead rows): per file, rows come from the manifest stats (q347)
    * and dead positions from the DV sidecar — the WHOLE planning pass
    * is manifest-resolved, zero data reads. Two deletes set the scene:
    * a sparse one (doc_id % 25 == 3, ~4% everywhere — under
    * threshold) and a concentrated one (bucket 2, every third id —
    * pushing ONLY that file over 20%). OPTIMIZE rewrites exactly the
    * over-threshold files without their victims and drops their DVs;
    * under-threshold files keep file identity AND keep serving through
    * their DVs. Pins: per-bucket rows/dv/chosen (oracle-recomputed
    * from the modular arithmetic), live content identical before and
    * after the fold (`content_unchanged`), remaining DV positions =
    * exactly the under-threshold files' sum, untouched files kept by
    * path. Scale: planning O(|manifest|), rewrite O(chosen files).
    */
  val dvPressureOptimize: Q = (s, dir) => {
    val store = scratch("graft_dvpressure").toString + "/docs"
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        pmod(col("doc_id"), lit(8)).cast("int").as("bucket"))
    d.repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(store)
    val files = listBucketFiles(store)
    def plain(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    // write-time stats (the q347 discipline): rows per file ride in the
    // commit so the planner never opens a footer
    val stats =
      if (files.isEmpty) Map.empty[String, FileStats]
      else readFiles(s, store, files)
        .select(col("_metadata.file_path").as("f"), col("doc_id"))
        .groupBy(col("f"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => plain(r.getString(0)) ->
          FileStats(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    SnapshotLog.commitEntries(store,
      files.map(f => FileEntry(f, stats = stats.get(plain(f)))))
    val v2 = dvDeleteCommit(s, store, 1, pmod(col("doc_id"), lit(25)) === 3)
    val v3 = dvDeleteCommit(s, store, v2,
      pmod(col("doc_id"), lit(8)) === 2 && pmod(col("doc_id"), lit(3)) === 0)
    // ---- the planner: manifest-only (stats rows + DV cardinality)
    val entries3 = SnapshotLog.entries(store, v3)
    val pressure = entries3.map { e =>
      val rows = e.stats.map(_.rows).getOrElse(0L)
      val dv = e.dv.map(SnapshotLog.readDeleteVector(_).size.toLong)
        .getOrElse(0L)
      (e, rows, dv, rows > 0 && dv * 5 >= rows) // threshold: dv/rows >= 20%
    }
    val beforeAgg = readDv(s, store, entries3)
      .agg(count(lit(1)), coalesce(sum(col("n_chars")), lit(0L))).head()
    // ---- OPTIMIZE: fold ONLY the over-threshold files
    val folded = pressure.filter(_._4).map { case (e, _, _, _) =>
      val bucketDir = new java.io.File(e.path).getParent
      val before = Writers.listParquetFiles(bucketDir)
      readDv(s, store, Seq(e)).select(col("doc_id"), col("n_chars"))
        .coalesce(1).write.mode("append").parquet(bucketDir)
      FileEntry(Writers.listParquetFiles(bucketDir)
        .filterNot(before.contains).head)
    }
    val kept = pressure.filterNot(_._4).map(_._1)
    val v4 = SnapshotLog.commitEntries(store, kept ++ folded)
    val entries4 = SnapshotLog.entries(store, v4)
    val afterAgg = readDv(s, store, entries4)
      .agg(count(lit(1)), coalesce(sum(col("n_chars")), lit(0L))).head()
    val remainingDv = entries4.flatMap(_.dv)
      .map(SnapshotLog.readDeleteVector(_).size.toLong).sum
    val untouchedKept = kept.map(_.path)
      .forall(entries4.map(_.path).contains)
    val perBucket = pressure.map { case (e, rows, dv, chosen) =>
      val b = new java.io.File(e.path).getParentFile.getName
        .stripPrefix("bucket=").toInt
      (b, rows, dv, chosen)
    }.sortBy(_._1)
    import s.implicits._
    perBucket.toDF("bucket", "n_rows", "n_dv", "chosen")
      .withColumn("live_rows", lit(afterAgg.getLong(0)))
      .withColumn("content_unchanged",
        lit(beforeAgg.getLong(0) == afterAgg.getLong(0) &&
          beforeAgg.getLong(1) == afterAgg.getLong(1)))
      .withColumn("remaining_dv", lit(remainingDv))
      .withColumn("untouched_kept", lit(untouchedKept))
      .orderBy(col("bucket"))
  }

  val dvPressureOptimizeSql: String =
    """WITH d AS (SELECT doc_id, n_chars, doc_id % 8 AS b FROM documents),
      |vic AS (SELECT doc_id, b FROM d
      |  WHERE doc_id % 25 = 3 OR (doc_id % 8 = 2 AND doc_id % 3 = 0)),
      |pb AS (SELECT d.b AS bucket, count(*) AS n_rows,
      |    (SELECT count(*) FROM vic WHERE vic.b = d.b) AS n_dv
      |  FROM d GROUP BY d.b),
      |live AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(n_chars) AS BIGINT) AS s FROM d
      |  WHERE NOT (doc_id % 25 = 3 OR (doc_id % 8 = 2 AND doc_id % 3 = 0))),
      |rem AS (SELECT CAST(coalesce(sum(n_dv), 0) AS BIGINT) AS n
      |  FROM pb WHERE NOT (n_dv * 5 >= n_rows))
      |SELECT CAST(bucket AS INTEGER) AS bucket,
      |  CAST(n_rows AS BIGINT) AS n_rows, CAST(n_dv AS BIGINT) AS n_dv,
      |  n_dv * 5 >= n_rows AS chosen,
      |  (SELECT n FROM live) AS live_rows,
      |  TRUE AS content_unchanged,
      |  (SELECT n FROM rem) AS remaining_dv,
      |  TRUE AS untouched_kept
      |FROM pb ORDER BY bucket""".stripMargin

  /** NET-change range scan (the Iceberg changelog / Delta CDF "changes
    * between versions a..b" read, with CANCELLATION): a consumer that
    * replays every per-version event re-applies churn that the range
    * itself undid — the honest range contract is the NET difference
    * between the two live states, computed WITHOUT scanning the table:
    * files present in both manifests with IDENTICAL delete vectors
    * cancel wholesale and are never opened (`n_files_opened` pins it);
    * only added/removed/DV-changed files are read, and the row-level
    * EXCEPT inside that bounded set cancels the delete→identical-
    * re-insert churn (planted: doc_id % 50 == 3 rows are DV-deleted at
    * v2 and re-inserted verbatim at v3 — they must NOT appear in the
    * net feed). Range v1→v4 over: v2 DV-delete confined to buckets
    * 1/2, v3 append (new ids + the verbatim re-inserts), v4 DV-delete
    * confined to bucket 5 (CRT-picked ids). Scale: manifest diff is
    * O(|files|); data reads ∝ changed files only.
    */
  val netChangesRange: Q = (s, dir) => {
    val store = scratch("graft_netrange").toString + "/docs"
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        pmod(col("doc_id"), lit(8)).cast("int").as("bucket"))
    d.repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(store)
    SnapshotLog.commit(store, listBucketFiles(store))
    val docs = t(s, dir, "documents")
    // v2: delete confined to buckets 1 and 2
    val v2 = dvDeleteCommit(s, store, 1,
      pmod(col("doc_id"), lit(8)).isin(1, 2) &&
        pmod(col("doc_id"), lit(25)) === 3)
    // v3: append — genuinely new ids + verbatim re-inserts of a subset
    // of v2's victims (doc_id % 50 == 3 ⊂ % 25 == 3; % 8 ∈ {1,2} kept)
    val batch3 = docs.filter(pmod(col("doc_id"), lit(40)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        pmod(col("doc_id"), lit(777)).cast("long").as("n_chars"))
      .unionAll(docs.filter(pmod(col("doc_id"), lit(8)).isin(1, 2) &&
          pmod(col("doc_id"), lit(50)) === 3)
        .select(col("doc_id"), col("n_chars")))
    val before3 = listBucketFiles(store)
    batch3.withColumn("bucket", pmod(col("doc_id"), lit(8)).cast("int"))
      .repartition(col("bucket")).write.mode("append")
      .partitionBy("bucket").parquet(store)
    val fresh3 = listBucketFiles(store).filterNot(before3.contains)
    val v3 = SnapshotLog.commitEntries(store,
      SnapshotLog.entries(store, v2) ++ fresh3.map(FileEntry(_)))
    // v4: delete confined to bucket 5
    val v4 = dvDeleteCommit(s, store, v3,
      pmod(col("doc_id"), lit(8)) === 5 && pmod(col("doc_id"), lit(30)) === 7)
    // ---- the net range scan v1 → v4
    def dvOf(es: Seq[FileEntry]): Map[String, Set[Long]] =
      es.map(e => plainP(e.path) -> e.dv.map(
        SnapshotLog.readDeleteVector(_).toSet).getOrElse(Set.empty)).toMap
    val ea = SnapshotLog.entries(store, 1)
    val eb = SnapshotLog.entries(store, v4)
    val dvA = dvOf(ea); val dvB = dvOf(eb)
    val pa = ea.map(e => plainP(e.path)).toSet
    val pb = eb.map(e => plainP(e.path)).toSet
    val changedCommon = (pa intersect pb)
      .filter(p => dvA(p) != dvB(p))
    val fa = ea.filter(e => changedCommon.contains(plainP(e.path)) ||
      !pb.contains(plainP(e.path)))
    val fb = eb.filter(e => changedCommon.contains(plainP(e.path)) ||
      !pa.contains(plainP(e.path)))
    val opened = (fa.map(e => plainP(e.path)) ++
      fb.map(e => plainP(e.path))).distinct.size.toLong
    def liveRows(es: Seq[FileEntry]): DataFrame =
      readDv(s, store, es).select(col("doc_id"), col("n_chars"))
    val ins = liveRows(fb).except(liveRows(fa))
    val del = liveRows(fa).except(liveRows(fb))
    ins.select(lit("I").as("op"), col("doc_id"), col("n_chars"))
      .unionAll(del.select(lit("D").as("op"), col("doc_id"),
        col("n_chars")))
      .withColumn("n_files_opened", lit(opened))
      .orderBy(col("op"), col("doc_id"))
  }

  val netChangesRangeSql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |vic2 AS (SELECT doc_id, n_chars FROM d
      |  WHERE doc_id % 8 IN (1, 2) AND doc_id % 25 = 3),
      |re3 AS (SELECT doc_id, n_chars FROM d
      |  WHERE doc_id % 8 IN (1, 2) AND doc_id % 50 = 3),
      |new3 AS (SELECT doc_id + 1000000 AS doc_id,
      |    doc_id % 777 AS n_chars FROM d WHERE doc_id % 40 = 0),
      |live1 AS (SELECT doc_id, n_chars FROM d),
      |live4 AS (
      |  SELECT doc_id, n_chars FROM (
      |    SELECT doc_id, n_chars FROM (
      |      SELECT doc_id, n_chars FROM d
      |      EXCEPT SELECT doc_id, n_chars FROM vic2)
      |    UNION ALL SELECT doc_id, n_chars FROM re3
      |    UNION ALL SELECT doc_id, n_chars FROM new3)
      |  WHERE NOT (doc_id % 8 = 5 AND doc_id % 30 = 7)),
      |opened AS (
      |  -- changed base buckets (a DV at v2 or v4 landed on an original
      |  -- file) + one appended file per bucket touched by batch3
      |  SELECT (SELECT count(DISTINCT doc_id % 8) FROM (
      |      SELECT doc_id FROM vic2
      |      UNION SELECT doc_id FROM d
      |        WHERE doc_id % 8 = 5 AND doc_id % 30 = 7))
      |    + (SELECT count(DISTINCT doc_id % 8) FROM (
      |      SELECT doc_id FROM new3 UNION SELECT doc_id FROM re3)) AS n)
      |SELECT * FROM (
      |  SELECT 'I' AS op, doc_id, n_chars,
      |    (SELECT CAST(n AS BIGINT) FROM opened) AS n_files_opened
      |  FROM (SELECT * FROM live4 EXCEPT SELECT * FROM live1)
      |  UNION ALL
      |  SELECT 'D', doc_id, n_chars,
      |    (SELECT CAST(n AS BIGINT) FROM opened)
      |  FROM (SELECT * FROM live1 EXCEPT SELECT * FROM live4)
      |) ORDER BY op, doc_id""".stripMargin
}
