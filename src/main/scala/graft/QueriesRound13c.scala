package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import graft.io.{SnapshotLog, Writers}
import graft.io.SnapshotLog.{FileEntry, FileStats}

/** Round-13 widening, third wave: the CONSUMER side of the change-data
  * contracts — applying a feed to a replica, streaming MERGE into the
  * store, a stats-driven compaction planner, and the log-as-a-stream
  * reader extended to delete-vector commits.
  */
trait QueriesRound13c extends QueriesRound13b {

  /** CDC APPLY — logical replication, the consumer side no gate covered
    * yet (q335/q354 PRODUCE feeds; nothing applied one): each source
    * commit's change feed is applied to a REPLICA store that chooses
    * its OWN physical layout (doc_id % 4 buckets vs the source's % 8 —
    * replication is logical, the pin that distinguishes it from file
    * copying). Apply is the q340 merge shape: the feed's key footprint
    * names the touched replica buckets, ONLY their current slice is
    * read, delete keys anti-joined, insert rows unioned, and the
    * rewritten buckets swap into the replica's next manifest — cost
    * O(touched slice + feed), never O(replica). Pins riding the hash:
    * per-version replica ≡ source (rows, victims, sum — all three
    * versions compared AFTER all applies; a feed that leaked CoW
    * survivor moves or an apply that missed a bucket breaks v2/v3
    * equality), the final replica content, and the file arithmetic
    * (n_src_files from the q332 CTEs vs n_replica_files = 4 — same
    * table, independent layouts). The 100 TB story: this loop (table →
    * manifest-diff feed → merge apply) is how a lake table replicates
    * into a differently-clustered serving copy without ever shipping a
    * full snapshot.
    */
  val cdcApplyReplica: Q = (s, dir) => {
    val src = buildDocSnapshotStore(s, dir)
    val replica = scratch("graft_replica").toString + "/docs"
    new java.io.File(replica).mkdirs()
    val rSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType),
      StructField("rb", IntegerType)))
    def readReplica(fs: Seq[String]): DataFrame =
      if (fs.isEmpty) s.createDataFrame(s.sparkContext.emptyRDD[Row], rSchema)
      else s.read.option("basePath", replica).schema(rSchema)
        .parquet(fs: _*)
    def rList(): Seq[String] = {
      val kids = new java.io.File(replica).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids).toIndexedSeq
        .filter(f => f.isDirectory && f.getName.startsWith("rb="))
        .flatMap(dd => Writers.listParquetFiles(dd.toString)).sorted
    }
    (1 to 3).foreach { v =>
      // the producer side: q335's cancelled manifest-diff feed, with
      // insert rows carrying the full row (an apply needs values)
      val cur = SnapshotLog.files(src, v).toSet
      val prev = if (v == 1) Set.empty[String]
        else SnapshotLog.files(src, v - 1).toSet
      def rd(fs: Seq[String]): DataFrame =
        readFiles(s, src, fs.sorted).select(col("doc_id"), col("n_chars"))
      val ins = rd((cur -- prev).toSeq).except(rd((prev -- cur).toSeq))
      val del = rd((prev -- cur).toSeq).except(rd((cur -- prev).toSeq))
        .select(col("doc_id"))
      // the consumer side: merge into only the touched replica buckets
      val touched = ins.select(col("doc_id"))
        .unionAll(del.select(col("doc_id")))
        .select(pmod(col("doc_id"), lit(4)).cast("int").as("rb"))
        .distinct().collect().map(_.getInt(0)).toSet
      val prevR = if (v == 1) Seq.empty[String]
        else SnapshotLog.files(replica, v - 1)
      def inTouched(p: String): Boolean =
        touched.exists(b => p.contains(s"/rb=$b/"))
      if (touched.nonEmpty) {
        val before = rList()
        val feedKeys = ins.select(col("doc_id"))
          .unionAll(del.select(col("doc_id"))).distinct()
        readReplica(prevR.filter(inTouched))
          .select(col("doc_id"), col("n_chars"))
          .join(broadcast(feedKeys), Seq("doc_id"), "left_anti")
          .unionAll(ins)
          .withColumn("rb", pmod(col("doc_id"), lit(4)).cast("int"))
          .repartition(col("rb")).write.mode("append")
          .partitionBy("rb").parquet(replica)
        val fresh = rList().filterNot(before.contains)
        SnapshotLog.commit(replica, prevR.filterNot(inTouched) ++ fresh)
      } else SnapshotLog.commit(replica, prevR)
    }
    // all three versions compared AFTER every apply (snapshot isolation
    // on the replica too)
    def agg(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(when(pmod(col("doc_id"), lit(20)) === 5, 1L).otherwise(0L)),
        sum(col("n_chars"))).head()
      def nz(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
      (r.getLong(0), nz(1), nz(2))
    }
    // the six per-version aggregates are independent bounded actions —
    // run them concurrently (guide §2.6; round 15: the sequential loop
    // paid six job tails), and reuse the v3 replica aggregate for the
    // result row instead of recomputing it
    val srcAggs = new Array[(Long, Long, Long)](3)
    val repAggs = new Array[(Long, Long, Long)](3)
    inParallelAll((0 until 3).flatMap(i => Seq(
      () => srcAggs(i) = agg(readFiles(s, src, SnapshotLog.files(src, i + 1))),
      () => repAggs(i) =
        agg(readReplica(SnapshotLog.files(replica, i + 1))))))
    val eq = (0 until 3).map(i => srcAggs(i) == repAggs(i))
    val (fr, fv, fsum) = repAggs(2)
    s.range(1).select(
      lit(eq(0)).as("v1_matches"), lit(eq(1)).as("v2_matches"),
      lit(eq(2)).as("v3_matches"),
      lit(fr).as("replica_rows"), lit(fv).as("replica_victims"),
      lit(fsum).as("replica_sum_chars"),
      lit(SnapshotLog.files(src, 3).size.toLong).as("n_src_files"),
      lit(SnapshotLog.files(replica, 3).size.toLong).as("n_replica_files"))
  }

  val cdcApplyReplicaSql: String =
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
      |fin AS (SELECT * FROM d WHERE doc_id % 20 <> 5)
      |SELECT TRUE AS v1_matches, TRUE AS v2_matches, TRUE AS v3_matches,
      |  (SELECT count(*) FROM fin) AS replica_rows,
      |  CAST(0 AS BIGINT) AS replica_victims,
      |  CAST((SELECT sum(n_chars) FROM fin) AS BIGINT)
      |    AS replica_sum_chars,
      |  CAST((SELECT nf FROM f1) + (SELECT nf FROM f2)
      |    - (SELECT nf FROM tf) + (SELECT nf FROM rw) AS BIGINT)
      |    AS n_src_files,
      |  CAST((SELECT count(DISTINCT doc_id % 4) FROM fin) AS BIGINT)
      |    AS n_replica_files""".stripMargin

  /** STREAMING MERGE sink (TWENTY-SECOND streaming gate) — transactional
    * UPSERT per micro-batch, the verb that applies a keyed CDC stream
    * to a table: q344's sink appends (delivery-exactly-once), this one
    * MERGES — each batch's keys name the touched buckets, only their
    * slice is read, last-writer-wins by key (the q340 full-outer
    * shape), and the commit still carries the batch identity (version
    * = batchId+1, CREATE_NEW as the dedup ledger), so a full replay
    * from a fresh checkpoint re-applies NOTHING — exactly-once UPSERT,
    * not just exactly-once append. The staged stream is adversarial to
    * at-least-once sinks: batch k INSERTS the doc_id%4==k slice and
    * UPDATES batch k−1's keys (n_chars+1000), so any double-apply or
    * missed batch shifts final values the oracle recomputes
    * (%4==3 keeps its base value — inserted last, never updated; all
    * others carry +1000). Scale: per-batch cost is O(touched slice) +
    * a broadcast of the batch; the idempotence check is one manifest
    * stat.
    */
  val streamMergeSink: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val srcDir = scratch("graft_mergesink_src")
    val slices = (0 to 3).map { k =>
      val ins = d.filter(pmod(col("doc_id"), lit(4)) === k)
        .select(col("doc_id"), col("n_chars"), lit(k.toLong).as("ord"))
      if (k == 0) ins
      else ins.unionAll(d.filter(pmod(col("doc_id"), lit(4)) === (k - 1))
        .select(col("doc_id"), (col("n_chars") + 1000).as("n_chars"),
          lit(k.toLong).as("ord")))
    }.reduce(_ unionAll _)
    graft.streaming.Staging.stageSlices(slices, col("ord"), 4, 0L, 4L,
      srcDir, scratch("graft_mergesink_stage"), Seq(col("doc_id")))
    val store = scratch("graft_mergesink_store").toString + "/docs"
    new java.io.File(store).mkdirs()
    def listAll(): Seq[String] = {
      val kids = new java.io.File(store).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids).toIndexedSeq
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .flatMap(dd => Writers.listParquetFiles(dd.toString)).sorted
    }
    val stagedSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType),
      StructField("ord", LongType)))
    def runOnce(): Unit = {
      val ckpt = scratch("graft_mergesink_ckpt").toString
      val sq = s.readStream.schema(stagedSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          val version = batchId.toInt + 1
          if (SnapshotLog.versions(store).contains(version)) {
            df.count() // already merged: consume WITHOUT applying
            ()
          } else {
            val batch = df.select(col("doc_id"), col("n_chars"))
            val touched = batch
              .select(pmod(col("doc_id"), lit(8)).cast("int").as("b"))
              .distinct().collect().map(_.getInt(0)).toSet
            val prev = if (version == 1) Seq.empty[String]
              else SnapshotLog.files(store, version - 1)
            def inTouched(p: String): Boolean =
              touched.exists(b => p.contains(s"/bucket=$b/"))
            val before = listAll()
            if (touched.nonEmpty) {
              readFiles(s, store, prev.filter(inTouched))
                .select(col("doc_id"), col("n_chars").as("old_chars"))
                .join(broadcast(batch), Seq("doc_id"), "full_outer")
                .select(col("doc_id"),
                  coalesce(col("n_chars"), col("old_chars")).as("n_chars"),
                  pmod(col("doc_id"), lit(8)).cast("int").as("bucket"))
                .repartition(col("bucket")).write.mode("append")
                .partitionBy("bucket").parquet(store)
            }
            val fresh = listAll().filterNot(before.contains)
            // loud on conflict (VERDICT r13 #6): this sink is
            // single-writer, so losing the race means external
            // corruption — advancing past it would silently drop the
            // merge batch (recoverable writers rebase, q341)
            SnapshotLog.commitStrict(store,
              prev.filterNot(inTouched) ++ fresh, version - 1)
            ()
          }
        }
        .start()
      sq.awaitTermination()
    }
    def headFiles(vs: Seq[Int]): Seq[String] =
      vs.lastOption.map(SnapshotLog.files(store, _)).getOrElse(Seq.empty)
    runOnce()
    val versions1 = SnapshotLog.versions(store)
    val files1 = headFiles(versions1)
    runOnce() // fresh checkpoint, same store: every merge must skip
    val versions2 = SnapshotLog.versions(store)
    val files2 = headFiles(versions2)
    readFiles(s, store, files2)
      .select(col("doc_id"), col("n_chars"),
        lit(versions2.size.toLong).as("n_versions"),
        lit(versions1 == versions2 && files1 == files2)
          .as("replay_added_nothing"))
      .orderBy(col("doc_id"))
  }

  val streamMergeSinkSql: String =
    """SELECT doc_id,
      |  CAST(CASE WHEN doc_id % 4 = 3 THEN n_chars
      |       ELSE n_chars + 1000 END AS BIGINT) AS n_chars,
      |  CAST(4 AS BIGINT) AS n_versions, TRUE AS replay_added_nothing
      |FROM documents ORDER BY doc_id""".stripMargin

  /** STATS-DRIVEN compaction planner — OPTIMIZE that picks its victims
    * FROM THE MANIFEST: q342 compacted a store it already knew was
    * fragmented; a real maintenance daemon must first FIND the
    * fragments, and at 100 TB "find" must not read data. The store is
    * built mixed (one full file per id-range, but three ranges
    * accreted as four slivers each — the streaming-sink shape), stats
    * ride the commit (q347), and the planner selects files with
    * rows < total/24 from the manifest alone, compacts only GROUPS of
    * ≥2 slivers per range (a lone small file gains nothing from a
    * rewrite), and commits the swap. All the arithmetic rides the
    * hash, oracle-recomputed from the range/sliver row counts:
    * n_files_before/after, n_small, n_groups_compacted — a planner
    * that read footers instead of stats gives the same numbers, but
    * one that mis-grouped, compacted singletons, or touched a full
    * file mismatches; content equality pins the rewrite lossless.
    * Scale: planning is O(|manifest|) driver work; compaction reads
    * exactly the selected slivers.
    */
  val statsOptimizePlanner: Q = (s, dir) => {
    val store = scratch("graft_statsopt").toString + "/events"
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val mx = ev.agg(max(col("event_id")), count(lit(1))).head()
    val maxId = if (mx.isNullAt(0)) 0L else mx.getLong(0)
    val total = mx.getLong(1)
    val w = maxId / 16 + 1
    val evb = ev.withColumn("fb", expr(s"event_id div ${w}L"))
    val smalls = Set(3L, 7L, 11L)
    val smallCond = col("fb").isin(smalls.toSeq: _*)
    // full ranges: one file each; accreted ranges: four slivers each
    evb.filter(!smallCond).repartition(col("fb")).write.mode("overwrite")
      .partitionBy("fb").parquet(store)
    (0 to 3).foreach { sub =>
      evb.filter(smallCond &&
          pmod(col("event_id"), lit(4)) === sub)
        .repartition(col("fb")).write.mode("append")
        .partitionBy("fb").parquet(store)
    }
    val zSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("fb", LongType)))
    def listAll(): Seq[String] = {
      val kids = new java.io.File(store).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids).toIndexedSeq
        .filter(f => f.isDirectory && f.getName.startsWith("fb="))
        .flatMap(dd => Writers.listParquetFiles(dd.toString)).sorted
    }
    def plain(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    val files = listAll()
    val stats =
      if (files.isEmpty) Map.empty[String, FileStats]
      else s.read.option("basePath", store).schema(zSchema)
        .parquet(files: _*)
        .select(col("_metadata.file_path").as("f"), col("event_id"))
        .groupBy(col("f"))
        .agg(min(col("event_id")).as("mn"), max(col("event_id")).as("mxv"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => plain(r.getString(0)) ->
          FileStats(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    SnapshotLog.commitEntries(store,
      files.map(f => FileEntry(f, stats = stats.get(plain(f)))))
    // --- the planner: manifest-only selection
    val es = SnapshotLog.entries(store, 1)
    val threshold = total / 24
    def fbOf(p: String): String = {
      val f = new java.io.File(p); f.getParentFile.getName
    }
    val small = es.filter(_.stats.exists(_.rows < threshold))
    val groups = small.groupBy(e => fbOf(e.path)).filter(_._2.size >= 2)
    val compactPaths = groups.values.flatten.map(_.path).toSet
    groups.values.foreach { members =>
      // one compacted file per selected range, written into its own dir
      // (fb is the partition dir, so it is not physically stored)
      val dirPath = new java.io.File(members.head.path).getParent
      s.read.option("basePath", store).schema(zSchema)
        .parquet(members.map(_.path): _*)
        .drop("fb").coalesce(1).write.mode("append").parquet(dirPath)
    }
    val after = listAll()
    val freshFiles = after.filterNot(files.contains)
    SnapshotLog.commit(store,
      es.map(_.path).filterNot(compactPaths.contains) ++ freshFiles)
    val v2Files = SnapshotLog.files(store, 2)
    val content = readFiles2(s, store, v2Files, zSchema)
      .agg(count(lit(1)).as("n"),
        round(decSum(col("value"), 2), 2).as("tv")).head()
    s.range(1).select(
      lit(es.size.toLong).as("n_files_before"),
      lit(small.size.toLong).as("n_small"),
      lit(groups.size.toLong).as("n_groups_compacted"),
      lit(v2Files.size.toLong).as("n_files_after"),
      lit(content.getLong(0)).as("n_rows"),
      lit(if (content.isNullAt(1)) 0.0 else content.getDouble(1))
        .as("total_value"))
  }

  protected def readFiles2(s: SparkSession, store: String,
                           fs: Seq[String], schema: StructType): DataFrame =
    if (fs.isEmpty) s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else s.read.option("basePath", store).schema(schema).parquet(fs: _*)

  val statsOptimizePlannerSql: String =
    """WITH w AS (SELECT max(event_id) // 16 + 1 AS w,
      |    count(*) // 24 AS thr FROM events),
      |e AS (SELECT event_id, value, event_id // (SELECT w FROM w) AS fb
      |  FROM events),
      |-- file inventory: accreted ranges {3,7,11} hold 4 slivers each,
      |-- every other nonempty range holds 1 full file
      |fullf AS (SELECT fb, count(*) AS n FROM e
      |  WHERE fb NOT IN (3, 7, 11) GROUP BY fb),
      |sliver AS (SELECT fb, event_id % 4 AS sub, count(*) AS n FROM e
      |  WHERE fb IN (3, 7, 11) GROUP BY fb, event_id % 4),
      |allf AS (SELECT fb, n FROM fullf UNION ALL SELECT fb, n FROM sliver),
      |small AS (SELECT fb, n FROM allf WHERE n < (SELECT thr FROM w)),
      |grp AS (SELECT fb, count(*) AS k FROM small GROUP BY fb
      |  HAVING count(*) >= 2)
      |SELECT
      |  CAST((SELECT count(*) FROM allf) AS BIGINT) AS n_files_before,
      |  CAST((SELECT count(*) FROM small) AS BIGINT) AS n_small,
      |  CAST((SELECT count(*) FROM grp) AS BIGINT) AS n_groups_compacted,
      |  CAST((SELECT count(*) FROM allf) AS BIGINT)
      |    - CAST((SELECT coalesce(sum(k), 0) FROM grp) AS BIGINT)
      |    + CAST((SELECT count(*) FROM grp) AS BIGINT) AS n_files_after,
      |  (SELECT count(*) FROM e) AS n_rows,
      |  round(CAST((SELECT sum(CAST(value AS DECIMAL(18,2))) FROM e)
      |    AS DOUBLE), 2) AS total_value""".stripMargin

  /** Log-as-a-stream over DELETE-VECTOR commits (TWENTY-THIRD streaming
    * gate) — q348's reader composed with q354's feed: the two DV
    * commits change NOTHING in the file sets, so a streaming consumer
    * that diffed manifests by file list would emit empty batches and
    * silently lose the deletes; this reader's per-commit step
    * understands both carriers (file diffs AND per-file position-set
    * deltas), opens only the touched files, and lands each commit's
    * feed in the transactional sink (sink version = source version).
    * Run 1 streams the initial load (v1), the two DV deletes land
    * (%25==3, then %40==7 — the second MERGES sidecars with the
    * first's), run 2 RESUMES the checkpoint mid-log and must emit
    * exactly the two victim sets; a fresh-checkpoint replay adds
    * nothing. Content ≡ the q354 batch feed, oracle-recomputed.
    */
  val logStreamDv: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    val store = scratch("graft_logdv").toString + "/docs"
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
    SnapshotLog.commit(store, listAll())
    val sink = scratch("graft_logdv_sink").toString + "/cdc"
    new java.io.File(sink).mkdirs()
    val cdcSchema = StructType(Seq(
      StructField("op", StringType), StructField("doc_id", LongType),
      StructField("src_version", IntegerType)))
    def runStream(ckpt: String): Unit = {
      val sq = s.readStream.option("maxFilesPerTrigger", 1)
        .text(store + "/_log")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          val seen = df.filter(col("value").startsWith("#v="))
            .select(col("value")).collect()
            .map(_.getString(0).stripPrefix("#v=").toInt)
          val target = if (seen.isEmpty) 0 else seen.max
          var v = SnapshotLog.latest(sink) + 1
          while (v <= target) {
            val before = Writers.listParquetFiles(sink)
            dvFeedStep(s, store, v)
              .select(col("op"), col("doc_id"), col("src_version"))
              .coalesce(1).write.mode("append").parquet(sink)
            val fresh = Writers.listParquetFiles(sink)
              .filterNot(before.contains)
            val prev = if (v == 1) Seq.empty[String]
              else SnapshotLog.files(sink, v - 1)
            // loud on conflict (VERDICT r13 #6): a silent None here
            // would drop feed slice v from the replica forever
            SnapshotLog.commitStrict(sink, prev ++ fresh, v - 1)
            v += 1
          }
          ()
        }
        .start()
      sq.awaitTermination()
    }
    val ckpt = scratch("graft_logdv_ckpt").toString
    runStream(ckpt)
    val run1Versions = SnapshotLog.latest(sink).toLong
    val v2 = dvDeleteCommit(s, store, 1, pmod(col("doc_id"), lit(25)) === 3)
    dvDeleteCommit(s, store, v2, pmod(col("doc_id"), lit(40)) === 7)
    runStream(ckpt) // resume mid-log: only the DV commits are new
    val sinkV = SnapshotLog.latest(sink)
    val sinkF = SnapshotLog.files(sink, sinkV)
    runStream(scratch("graft_logdv_ckpt2").toString) // replay: no-op
    val sinkV2 = SnapshotLog.latest(sink)
    val sinkF2 = SnapshotLog.files(sink, sinkV2)
    val fin =
      if (sinkF2.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[Row], cdcSchema)
      else s.read.schema(cdcSchema).parquet(sinkF2: _*)
    fin.select(col("op"), col("doc_id"), col("src_version"),
        lit(run1Versions).as("run1_versions"),
        lit(sinkV2.toLong).as("n_sink_versions"),
        lit(sinkV == sinkV2 && sinkF == sinkF2).as("replay_added_nothing"))
      .orderBy(col("src_version"), col("op"), col("doc_id"))
  }

  val logStreamDvSql: String =
    """WITH d AS (SELECT doc_id FROM documents),
      |feed AS (
      |  SELECT 'I' AS op, doc_id, 1 AS src_version FROM d
      |  UNION ALL SELECT 'D', doc_id, 2 FROM d WHERE doc_id % 25 = 3
      |  UNION ALL SELECT 'D', doc_id, 3 FROM d WHERE doc_id % 40 = 7)
      |SELECT op, doc_id, src_version,
      |  CAST(1 AS BIGINT) AS run1_versions,
      |  CAST(3 AS BIGINT) AS n_sink_versions,
      |  TRUE AS replay_added_nothing
      |FROM feed ORDER BY src_version, op, doc_id""".stripMargin
}
