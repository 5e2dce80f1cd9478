package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{SnapshotLog, Writers}
import graft.io.SnapshotLog.{FileEntry, FileStats}

/** Round-13 widening, fifth wave: metadata-only query answering — the
  * manifest as an index good enough to answer aggregates without
  * opening a single data file.
  */
trait QueriesRound13e extends QueriesRound13d {

  /** Metadata-only aggregates — the "SELECT COUNT(*) answered from the
    * log" verb every lake engine ships: with stats in the commit
    * (q347) and delete vectors in the commit (q346), COUNT is exactly
    * Σ per-file `rows` − Σ per-file |DV| and needs ZERO data reads at
    * ANY table size; MIN/MAX come from the same stats — exact while no
    * DV touches the extremes, and never better than CONSERVATIVE
    * BOUNDS once one might (file-level stats can't see which rows a DV
    * removed — an engine that kept serving stale stats as exact
    * answers after a delete is wrong, and `bounds_conservative` pins
    * the honest contract instead). The gate builds a stats-carrying
    * store, DV-deletes doc_id % 25 == 3, and pins BOTH versions:
    * v1 metadata count/min/max ≡ the data answers (`v1_exact`), v2
    * metadata count ≡ the post-delete data count (`v2_count_exact` —
    * the DV-cardinality subtraction is what a file-count-only reader
    * gets wrong), v2 bounds bracket the post-delete extremes. Every
    * number is oracle-recomputed from the modular arithmetic. Scale:
    * the entire answer path is one manifest read — O(|files|) driver
    * work where the naive plan scans the table.
    */
  val metadataAggregates: Q = (s, dir) => {
    val store = scratch("graft_metaagg").toString + "/docs"
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
    def plain(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    val files = listAll()
    // write-time stats on doc_id (the q347 discipline)
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
    // --- metadata-only answers: one manifest read, zero data files
    def metaAgg(v: Int): (Long, Option[Long], Option[Long]) = {
      val es = SnapshotLog.entries(store, v)
      val rows = es.flatMap(_.stats).map(_.rows).sum -
        es.flatMap(_.dv).map(SnapshotLog.readDeleteVector(_).size.toLong).sum
      val mins = es.flatMap(_.stats).map(_.min)
      val maxs = es.flatMap(_.stats).map(_.max)
      (rows, mins.minOption, maxs.maxOption)
    }
    // --- the data answers the metadata must match / bracket
    def dataAgg(v: Int): (Long, Option[Long], Option[Long]) = {
      val r = readDv(s, store, SnapshotLog.entries(store, v))
        .agg(count(lit(1)), min(col("doc_id")), max(col("doc_id"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }
    val (m1, mn1, mx1) = metaAgg(1)
    val d1 = dataAgg(1)
    val (m2, mn2, mx2) = metaAgg(v2)
    val d2 = dataAgg(v2)
    val boundsOk = (for {
      lo <- mn2; hi <- mx2; alo <- d2._2; ahi <- d2._3
    } yield lo <= alo && hi >= ahi).getOrElse(mn2.isEmpty && d2._2.isEmpty)
    s.range(1).select(
      lit(m1).as("v1_meta_count"),
      lit((m1, mn1, mx1) == d1).as("v1_exact"),
      lit(m2).as("v2_meta_count"),
      lit(m2 == d2._1).as("v2_count_exact"),
      lit(boundsOk).as("bounds_conservative"),
      lit(d2._1).as("v2_data_count"),
      lit(d2._2.getOrElse(0L)).as("v2_data_min"),
      lit(d2._3.getOrElse(0L)).as("v2_data_max"))
  }

  val metadataAggregatesSql: String =
    """WITH d AS (SELECT doc_id FROM documents),
      |live AS (SELECT doc_id FROM d WHERE doc_id % 25 <> 3)
      |SELECT (SELECT count(*) FROM d) AS v1_meta_count,
      |  TRUE AS v1_exact,
      |  (SELECT count(*) FROM live) AS v2_meta_count,
      |  TRUE AS v2_count_exact,
      |  TRUE AS bounds_conservative,
      |  (SELECT count(*) FROM live) AS v2_data_count,
      |  CAST(coalesce((SELECT min(doc_id) FROM live), 0) AS BIGINT)
      |    AS v2_data_min,
      |  CAST(coalesce((SELECT max(doc_id) FROM live), 0) AS BIGINT)
      |    AS v2_data_max""".stripMargin
}
