package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{Readers, Writers}
import graft.ops.Dedup
import graft.streaming.{EventStreams, Staging}

/** Round-12 gates — the operational contracts the r11 verdict ranked:
  * DELETE propagation into the IVF-PQ serving index (#1), state TTL
  * (#2), the production-shape recall tuning curve (#3), baseline JPEG
  * decode (#4), and the RGB PNG extension (#6).
  */
trait QueriesRound12 extends QueriesRound11 {

  /** GDPR DELETE propagation into the IVF-PQ serving index — the one
    * verb missing from the otherwise-complete IVM family (q117 exact /
    * q265 MinHash / q299 semantic / q322 code-store INSERTS / relational
    * cascade q136): at 100 TB a takedown request must remove vectors
    * from the SERVING index without rebuilding it. Harness: the q322
    * two-generation store (day-1 overwrite + day-2 append, one file per
    * (write, cell)) over an 8-cell IVF; the tombstone set is each
    * query's CURRENT rank-1 neighbor (so the delete visibly changes
    * every query's served answer — the "next-best neighbor" contract)
    * plus the planted ids {10, 11} (one per file generation, so both
    * day-1 and day-2 files are touched). Compaction is cell-local: ONE
    * read of the touched cells' slice of the store (both generations),
    * tombstones anti-joined out, one fresh file per surviving touched
    * cell swapped in — untouched cell directories are never opened.
    * Four proofs ride in every hash-checked row: the served ranking
    * (oracle recomputes the post-delete ADC top-3 — the tombstoned
    * top-1s must be GONE and the next-best promoted), `n_store_files`
    * (touched cells collapse to 1 file; untouched cells keep their
    * 1-or-2-generation counts — the oracle recomputes the whole sum
    * from the assignment CTEs, so a lazy full rebuild OR a compaction
    * that skipped a touched cell both mismatch), `untouched_preserved`
    * (driver-checked: every untouched cell's file count is unchanged —
    * file generations survive), and `rebuild_match` (the post-delete
    * store serves BIT-IDENTICAL rankings to an index rebuilt from
    * scratch over the live vectors — ≤30 rows collected per side).
    * Scale: delete cost is |touched cells| directories read+written —
    * tracks the tombstone set's cell footprint, never the corpus; the
    * driver-side moves are bounded by |touched| (≤ |tombstones| ≤ 12).
    */
  val ivfpqDelete: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExpressions
    val M = 4; val SUB = 16; val K = 16
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val qv = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val cents: Array[(Long, Array[Float])] = emb.filter(col("vec_id") < 8)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val codebook: Array[Array[Long]] = emb.orderBy(col("vec_id")).limit(K)
      .select(qv.as("qv")).collect().map(_.getSeq[Long](0).toArray)
    if (cents.isEmpty || codebook.isEmpty) {
      emb.select(col("vec_id").as("query_id"), lit(1).as("rank"),
        col("vec_id").as("neighbor_id"), lit(0L).as("adc_dist"),
        lit(0L).as("n_store_files"), lit(true).as("untouched_preserved"),
        lit(true).as("rebuild_match"), lit(true).as("pruned"))
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
      val corpus = emb.filter(col("vec_id") >= 10)
      // ONE corpus encode, pinned; every generation filters it (encode is
      // row-local + deterministic, and the pin saves three re-encodes —
      // measured 13.6 -> single-encode at sf0.1)
      val all = Dedup.pin(encode(corpus))
      val day1 = all.filter(col("vec_id") % 10 =!= 0)
      val day2 = all.filter(col("vec_id") % 10 === 0)
      val store = scratch("graft_ivfpq_del").toString + "/codes"
      // one file per (write, cell): the q322 deterministic-append idiom
      day1.repartition(col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(store)
      day2.repartition(col("cell")).write.mode("append")
        .partitionBy("cell").parquet(store)
      val q = Dedup.pin(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), qv.as("qq"),
          explode(VectorExpressions.nearest_cells(col("embedding"), cellIds,
            cvs, 2)).as("cell")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("adc_dist"), col("neighbor_id"))
      def serve(codesDf: DataFrame): DataFrame = codesDf
        .select(col("vec_id").as("neighbor_id"), col("codes"), col("cell"))
        .join(broadcast(q), Seq("cell"))
        .withColumn("adc_dist", adcDist(codebook, col("qq"), col("codes"), M, SUB))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("adc_dist"))
      // the takedown set: every query's served rank-1 (bounded collect:
      // ≤ |queries| ids) plus one planted id per file generation
      val top1 = serve(all).filter(col("rank") === 1)
        .select(col("neighbor_id")).distinct()
        .collect().map(_.getLong(0))
      val tombstones = (top1 ++ Seq(10L, 11L)).distinct.sorted
      // touched cells: the tombstones' cell footprint (≤ |tombstones|)
      val touched = all.filter(col("vec_id").isin(tombstones: _*))
        .select(col("cell")).distinct().collect().map(_.getLong(0)).sorted
      def cellFiles(): Map[Long, Long] = {
        val kids = new java.io.File(store).listFiles()
        (if (kids == null) Array.empty[java.io.File] else kids)
          .filter(f => f.isDirectory && f.getName.startsWith("cell="))
          .map(d => d.getName.stripPrefix("cell=").toLong ->
            Writers.listParquetFiles(d.toString).size.toLong).toMap
      }
      val before = cellFiles()
      // cell-local compaction: one Spark job over the touched slice only,
      // then a driver-side generation swap bounded by |touched|
      if (touched.nonEmpty) {
        val tmp2 = scratch("graft_ivfpq_del_cmp").toString
        Readers.parquetWithSchema(s, store, day1.schema)
          .filter(col("cell").isin(touched: _*))
          .filter(!col("vec_id").isin(tombstones: _*))
          .repartition(col("cell")).write.mode("overwrite")
          .partitionBy("cell").parquet(tmp2)
        touched.foreach { c =>
          val dst = new java.io.File(store, s"cell=$c")
          def rm(f: java.io.File): Unit = {
            val k = f.listFiles(); if (k != null) k.foreach(rm)
            f.delete(); ()
          }
          rm(dst)
          val src = new java.io.File(tmp2, s"cell=$c")
          if (src.isDirectory) {
            dst.mkdirs()
            src.listFiles().filter(_.getName.endsWith(".parquet"))
              .foreach { f =>
                java.nio.file.Files.move(f.toPath,
                  new java.io.File(dst, f.getName).toPath)
                ()
              }
          }
        }
      }
      val after = cellFiles()
      val untouchedPreserved = before.keys.filterNot(touched.contains)
        .forall(c => after.get(c) == before.get(c))
      val nStoreFiles = after.values.sum
      // serve from the post-delete store (probe-pruned, q311 pattern)
      val probeCells = q.select(col("cell")).distinct()
        .collect().map(_.getLong(0)).sorted
      val probe = if (probeCells.isEmpty) lit(false)
        else col("cell").isin(probeCells: _*)
      val rd = Readers.parquetWithSchema(s, store, day1.schema).filter(probe)
      val pruned = "PartitionFilters: \\[[^\\]]*(IN|INSET)[^\\]]*".r
        .findFirstIn(rd.queryExecution.executedPlan.toString).isDefined
      val served = serve(rd)
      // rebuild twin: a from-scratch single-generation index over the
      // live vectors must rank identically (≤ 3·|queries| rows per side)
      val rebuildDir = scratch("graft_ivfpq_del_rb").toString
      all.filter(!col("vec_id").isin(tombstones: _*))
        .repartition(col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(rebuildDir)
      val rebuilt = serve(
        Readers.parquetWithSchema(s, rebuildDir, day1.schema).filter(probe))
      def key(df: DataFrame): Seq[(Long, Int, Long, Long)] =
        df.orderBy(col("query_id"), col("rank")).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
          .toSeq
      val rebuildMatch = key(served) == key(rebuilt)
      served
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("adc_dist"), lit(nStoreFiles).as("n_store_files"),
          lit(untouchedPreserved).as("untouched_preserved"),
          lit(rebuildMatch).as("rebuild_match"), lit(pruned).as("pruned"))
        .orderBy(col("query_id"), col("rank"))
    }
  }

  val ivfpqDeleteSql: String =
    """WITH emb AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, qv
      |  FROM emb ORDER BY vec_id LIMIT 16),
      |cents AS (SELECT vec_id AS cell, e AS ce FROM emb WHERE vec_id < 8),
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
      |tomb AS (SELECT neighbor_id AS vec_id FROM (
      |    SELECT query_id, neighbor_id, row_number() OVER (
      |        PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank
      |    FROM cand) WHERE rank = 1
      |  UNION SELECT 10 UNION SELECT 11),
      |touched AS (SELECT DISTINCT cell FROM cc
      |  WHERE vec_id IN (SELECT vec_id FROM tomb)),
      |nf AS (SELECT
      |    (SELECT count(DISTINCT cell) FROM cc WHERE vec_id % 10 <> 0
      |      AND cell NOT IN (SELECT cell FROM touched))
      |  + (SELECT count(DISTINCT cell) FROM cc WHERE vec_id % 10 = 0
      |      AND cell NOT IN (SELECT cell FROM touched))
      |  + (SELECT count(DISTINCT cell) FROM cc
      |      WHERE cell IN (SELECT cell FROM touched)
      |      AND vec_id NOT IN (SELECT vec_id FROM tomb))
      |    AS n_store_files),
      |ranked AS (SELECT query_id, neighbor_id, adc_dist, row_number()
      |    OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id)
      |    AS rank
      |  FROM cand WHERE neighbor_id NOT IN (SELECT vec_id FROM tomb))
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
      |  adc_dist, (SELECT CAST(n_store_files AS BIGINT) FROM nf)
      |    AS n_store_files, TRUE AS untouched_preserved,
      |  TRUE AS rebuild_match, TRUE AS pruned
      |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** DELETE → RE-INSERT (resurrection) on the IVF-PQ serving index —
    * composing q323's takedown with q322's day-2 append into the full
    * CRUD lifecycle a long-lived index actually runs: a user deletes
    * their data (tombstone + cell-local compaction), then re-uploads
    * some of it (day-3 Δ encoded against the frozen codebook, codes
    * APPENDED as a new file generation into the existing cell
    * directories — the compacted cells are never rewritten again).
    * Tombstones are q323's exactly (every query's pre-delete rank-1 +
    * the planted {10, 11}); the resurrected subset is the even-id
    * tombstones, so every query whose deleted top-1 was even must get
    * it BACK at rank 1 while odd-id deletions stay gone — the ranking
    * the oracle recomputes over (corpus ∖ tombstones) ∪ resurrected.
    * `n_store_files` extends q323's arithmetic by |cells(day-3 Δ)|
    * appended files (the oracle recomputes all four terms, so a
    * re-insert that rewrote compacted cells — or was silently dropped —
    * mismatches), and `rebuild_match` pins the three-generation store
    * ≡ a from-scratch index over the live set. Scale: the re-insert
    * costs one Δ-only encode + append, the q322 day-2 shape; nothing
    * about the delete is undone or rewritten.
    */
  val ivfpqResurrect: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExpressions
    val M = 4; val SUB = 16; val K = 16
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val qv = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val cents: Array[(Long, Array[Float])] = emb.filter(col("vec_id") < 8)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val codebook: Array[Array[Long]] = emb.orderBy(col("vec_id")).limit(K)
      .select(qv.as("qv")).collect().map(_.getSeq[Long](0).toArray)
    if (cents.isEmpty || codebook.isEmpty) {
      emb.select(col("vec_id").as("query_id"), lit(1).as("rank"),
        col("vec_id").as("neighbor_id"), lit(0L).as("adc_dist"),
        lit(0L).as("n_store_files"), lit(true).as("rebuild_match"),
        lit(true).as("pruned"))
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
      val corpus = emb.filter(col("vec_id") >= 10)
      // one pinned corpus encode feeds every generation (the q323 note)
      val all = Dedup.pin(encode(corpus))
      val day1 = all.filter(col("vec_id") % 10 =!= 0)
      val day2 = all.filter(col("vec_id") % 10 === 0)
      val store = scratch("graft_ivfpq_res2").toString + "/codes"
      day1.repartition(col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(store)
      day2.repartition(col("cell")).write.mode("append")
        .partitionBy("cell").parquet(store)
      val q = Dedup.pin(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), qv.as("qq"),
          explode(VectorExpressions.nearest_cells(col("embedding"), cellIds,
            cvs, 2)).as("cell")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("adc_dist"), col("neighbor_id"))
      def serve(codesDf: DataFrame): DataFrame = codesDf
        .select(col("vec_id").as("neighbor_id"), col("codes"), col("cell"))
        .join(broadcast(q), Seq("cell"))
        .withColumn("adc_dist", adcDist(codebook, col("qq"), col("codes"), M, SUB))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("adc_dist"))
      val top1 = serve(all).filter(col("rank") === 1)
        .select(col("neighbor_id")).distinct()
        .collect().map(_.getLong(0))
      val tombstones = (top1 ++ Seq(10L, 11L)).distinct.sorted
      val touched = all.filter(col("vec_id").isin(tombstones: _*))
        .select(col("cell")).distinct().collect().map(_.getLong(0)).sorted
      // q323's cell-local compaction, verbatim
      if (touched.nonEmpty) {
        val tmp2 = scratch("graft_ivfpq_res2_cmp").toString
        Readers.parquetWithSchema(s, store, day1.schema)
          .filter(col("cell").isin(touched: _*))
          .filter(!col("vec_id").isin(tombstones: _*))
          .repartition(col("cell")).write.mode("overwrite")
          .partitionBy("cell").parquet(tmp2)
        touched.foreach { c =>
          val dst = new java.io.File(store, s"cell=$c")
          def rm(f: java.io.File): Unit = {
            val k = f.listFiles(); if (k != null) k.foreach(rm)
            f.delete(); ()
          }
          rm(dst)
          val src = new java.io.File(tmp2, s"cell=$c")
          if (src.isDirectory) {
            dst.mkdirs()
            src.listFiles().filter(_.getName.endsWith(".parquet"))
              .foreach { f =>
                java.nio.file.Files.move(f.toPath,
                  new java.io.File(dst, f.getName).toPath)
                ()
              }
          }
        }
      }
      // day-3 resurrection: re-encode ONLY the re-uploaded subset (Δ)
      // against the frozen codebook, append as a new file generation
      val resurrected = tombstones.filter(_ % 2 == 0)
      if (resurrected.nonEmpty) {
        all.filter(col("vec_id").isin(resurrected: _*))
          .repartition(col("cell")).write.mode("append")
          .partitionBy("cell").parquet(store)
      }
      val nStoreFiles = {
        val kids = new java.io.File(store).listFiles()
        (if (kids == null) Array.empty[java.io.File] else kids)
          .filter(f => f.isDirectory && f.getName.startsWith("cell="))
          .map(d => Writers.listParquetFiles(d.toString).size.toLong).sum
      }
      val probeCells = q.select(col("cell")).distinct()
        .collect().map(_.getLong(0)).sorted
      val probe = if (probeCells.isEmpty) lit(false)
        else col("cell").isin(probeCells: _*)
      val rd = Readers.parquetWithSchema(s, store, day1.schema).filter(probe)
      val pruned = "PartitionFilters: \\[[^\\]]*(IN|INSET)[^\\]]*".r
        .findFirstIn(rd.queryExecution.executedPlan.toString).isDefined
      val served = serve(rd)
      val rebuildDir = scratch("graft_ivfpq_res2_rb").toString
      val gone = tombstones.filterNot(resurrected.contains)
      all.filter(!col("vec_id").isin(gone: _*))
        .repartition(col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(rebuildDir)
      val rebuilt = serve(
        Readers.parquetWithSchema(s, rebuildDir, day1.schema).filter(probe))
      def key(df: DataFrame): Seq[(Long, Int, Long, Long)] =
        df.orderBy(col("query_id"), col("rank")).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
          .toSeq
      val rebuildMatch = key(served) == key(rebuilt)
      served
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("adc_dist"), lit(nStoreFiles).as("n_store_files"),
          lit(rebuildMatch).as("rebuild_match"), lit(pruned).as("pruned"))
        .orderBy(col("query_id"), col("rank"))
    }
  }

  val ivfpqResurrectSql: String =
    """WITH emb AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, qv
      |  FROM emb ORDER BY vec_id LIMIT 16),
      |cents AS (SELECT vec_id AS cell, e AS ce FROM emb WHERE vec_id < 8),
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
      |tomb AS (SELECT neighbor_id AS vec_id FROM (
      |    SELECT query_id, neighbor_id, row_number() OVER (
      |        PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank
      |    FROM cand) WHERE rank = 1
      |  UNION SELECT 10 UNION SELECT 11),
      |res AS (SELECT vec_id FROM tomb WHERE vec_id % 2 = 0),
      |gone AS (SELECT vec_id FROM tomb WHERE vec_id % 2 <> 0),
      |touched AS (SELECT DISTINCT cell FROM cc
      |  WHERE vec_id IN (SELECT vec_id FROM tomb)),
      |nf AS (SELECT
      |    (SELECT count(DISTINCT cell) FROM cc WHERE vec_id % 10 <> 0
      |      AND cell NOT IN (SELECT cell FROM touched))
      |  + (SELECT count(DISTINCT cell) FROM cc WHERE vec_id % 10 = 0
      |      AND cell NOT IN (SELECT cell FROM touched))
      |  + (SELECT count(DISTINCT cell) FROM cc
      |      WHERE cell IN (SELECT cell FROM touched)
      |      AND vec_id NOT IN (SELECT vec_id FROM tomb))
      |  + (SELECT count(DISTINCT cell) FROM cc
      |      WHERE vec_id IN (SELECT vec_id FROM res))
      |    AS n_store_files),
      |ranked AS (SELECT query_id, neighbor_id, adc_dist, row_number()
      |    OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id)
      |    AS rank
      |  FROM cand WHERE neighbor_id NOT IN (SELECT vec_id FROM gone))
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
      |  adc_dist, (SELECT CAST(n_store_files AS BIGINT) FROM nf)
      |    AS n_store_files, TRUE AS rebuild_match, TRUE AS pruned
      |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** State TTL — the EIGHTEENTH streaming gate, closing the last
    * transformWithState state-management surface (value/map/list state,
    * initial state, timers, and schema evolution are q263/q321/q315/
    * q319/q312; EXPIRY is here): without TTL, a long-lived ingest
    * stream's per-key state grows with the key vocabulary — every user
    * ever seen, forever — which is THE slow death of a 100 TB streaming
    * pipeline; with `TTLConfig(ttl)`, a key idle past the horizon is
    * evicted and its totals RE-SEED from zero on next sight. TTL is
    * processing-time by definition, so the harness makes it
    * deterministic by construction: each phase (event-time slices 0–1,
    * then 2–3) runs as ONE micro-batch — every phase-1 write shares one
    * batch timestamp, and no intra-phase expiry is possible because a
    * batch's reads and writes share that timestamp — and the
    * inter-phase sleep (1.5 s, plus the full-twin run and phase-2
    * startup in between — measured ≥ 2.5 s of wall clock) strictly
    * exceeds the TTL (0.5 s) with a ≥ 5× margin, so every phase-1
    * record is expired for every phase-2 read. (r14 optimization: the
    * old 2 s TTL / 4.2 s sleep pair paid 4.2 s of pure wall-clock per
    * gate for a 2.1× margin; shrinking both raises the margin and
    * returns the sleep time.) The
    * oracle is then total: the TTL stream equals the batch cumulative
    * window PARTITIONED BY (user, phase) — totals restart at the phase
    * boundary — while the no-TTL TWIN (same restart machinery, same
    * checkpointing, TTLConfig.NONE) equals the window partitioned by
    * user alone; both ride in the same hash-checked row, so the gate
    * pins that the difference comes from EXPIRY, not from the
    * two-phase restart. Scale: TTL state cleanup is incremental in
    * RocksDB (a secondary min-expiry index), and the working set
    * tracks ACTIVE keys only.
    */
  val streamTtlReseed: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.{Files, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    import s.implicits._
    val TtlMs = 500L
    val SleepMs = 1500L
    val holdDir = scratch("graft_tws_ttl_hold")
    val srcDir = scratch("graft_tws_ttl_src")
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
      scratch("graft_tws_ttl_stage"), Seq(col("event_id")))
    def promote(i: Int): Unit = {
      val dst = srcDir.resolve(f"part-$i%02d.parquet")
      Files.copy(holdDir.resolve(f"part-$i%02d.parquet"), dst,
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(1000000000000L + i * 10000L))
      ()
    }
    withConfs(s, "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      // NO maxFilesPerTrigger: each phase's files land in ONE batch —
      // the single-batch-per-phase shape the TTL determinism argument
      // needs (handleInputRows sorts within the batch, so the fold
      // order is still exact event-time order)
      def stream = s.readStream
        .schema(ev.schema)
        .parquet(srcDir.toString)
        .as[graft.streaming.EventStreams.Event]
      // Trigger.Once, NOT AvailableNow: under TimeMode.ProcessingTime
      // the transformWithState operator's shouldRunAnotherBatch is
      // unconditionally true (processing-time timers/TTL could always
      // have work), so AvailableNow's MultiBatchExecutor never drains —
      // measured: 600+ empty micro-batches before this gate was killed.
      // Once's SingleBatchExecutor runs exactly one batch per phase,
      // which is also precisely the determinism shape documented above.
      val trigger: Trigger = Trigger.Once()
      val outT = scratch("graft_tws_ttl_outt")
      val outF = scratch("graft_tws_ttl_outf")
      val ckT = scratch("graft_tws_ttl_ckt")
      val ckF = scratch("graft_tws_ttl_ckf")
      def run(ttlMs: Long, out: java.nio.file.Path,
              ck: java.nio.file.Path): Unit = {
        val sq = EventStreams.runningTotalsTtl(stream, ttlMs)(s).toDF()
          .writeStream.outputMode("append")
          .option("checkpointLocation", ck.toString)
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) =>
              b.write.mode("append").parquet(out.toString); ()
          }
          .trigger(trigger).start()
        sq.awaitTermination()
      }
      promote(0); promote(1)
      // TTL stream and no-TTL control share no checkpoint/sink/state —
      // run each phase's pair concurrently (QBase.inParallel, r14): the
      // twin's query startup and batch overlap the gate's, and the TTL
      // argument is untouched (both phase-1 batches land at ~the same
      // wall clock, both phase-2 batches after the > TTL sleep)
      inParallel(run(TtlMs, outT, ckT), run(0L, outF, ckF))
      promote(2); promote(3)
      // the one wall-clock dependency, > TTL by construction; clocks
      // only move forward, so phase-2's batch timestamp exceeds every
      // phase-1 expiry deadline no matter how slow the box is
      Thread.sleep(SleepMs)
      inParallel(run(TtlMs, outT, ckT), run(0L, outF, ckF))
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cum_n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cum_cents",
          org.apache.spark.sql.types.LongType)))
      Readers.parquetWithSchema(s, outT.toString, sch)
        .select(col("user_id"), col("event_id"),
          col("cum_n").as("ttl_n"), col("cum_cents").as("ttl_cents"))
        .join(Readers.parquetWithSchema(s, outF.toString, sch)
          .select(col("user_id"), col("event_id"),
            col("cum_n").as("full_n"), col("cum_cents").as("full_cents")),
          Seq("user_id", "event_id"))
        .orderBy(col("user_id"), col("event_id"))
    }
  }

  val streamTtlReseedSql: String =
    """WITH e AS (SELECT user_id, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |b AS (SELECT min(us) AS lo,
      |    greatest(max(us) - min(us), 4) AS span FROM e),
      |p AS (SELECT user_id, event_id, us, cents,
      |    us >= lo + 2 * span // 4 AS ph2 FROM e CROSS JOIN b)
      |SELECT user_id, event_id,
      |  CAST(row_number() OVER wp AS BIGINT) AS ttl_n,
      |  CAST(sum(cents) OVER wp AS BIGINT) AS ttl_cents,
      |  CAST(row_number() OVER wf AS BIGINT) AS full_n,
      |  CAST(sum(cents) OVER wf AS BIGINT) AS full_cents
      |FROM p
      |WINDOW wp AS (PARTITION BY user_id, ph2 ORDER BY us, event_id
      |    ROWS UNBOUNDED PRECEDING),
      |  wf AS (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS UNBOUNDED PRECEDING)
      |ORDER BY user_id, event_id""".stripMargin

  /** MERGE-ON-READ tombstone deletes on the MinHash LSH band store —
    * the delete verb for the NEAR-DUP index family (q323/q328 cover the
    * ANN code store), and deliberately the OPPOSITE strategy: q323's
    * copy-on-write compaction was cheap because PQ codes are
    * cell-clustered (a tombstone touches its one cell directory), but
    * an LSH band table scatters every doc across ALL b=16 band
    * partitions — a takedown touches every directory, so rewriting at
    * delete time is a full-store rewrite. The production answer is
    * merge-on-read: deletes land as a TOMBSTONE FILE (ids only, a third
    * tiny generation), the serve path anti-joins it at read, and a
    * LAZY compaction rewrites the store (dropping tombstoned rows and
    * the tombstone file) on its own schedule. Harness: the q265 split
    * (index = id%10≠0 day-1 write, Δ = id%10=0 day-2 append, ONE file
    * per (write, band)); tombstones = the 8 smallest ODD index-side
    * ids that actually participate in a knee pair (so the delete
    * visibly changes the served pair set — the q323 "takedown names
    * real answers" discipline; bounded collect ≤8) plus the planted
    * never-pairing id%20==5 set; the
    * Δ-probe near-dup screen runs TWICE — merge-on-read against the
    * 2-generation store + tombstone anti-join, then again after
    * copy-on-write compaction — and the gate pins mor_equals_cow
    * (both serve paths rank identically), the file arithmetic
    * (files_before = 2·b two-generation files, files_after = b), and
    * n_suppressed (how many would-be pairs the tombstones removed —
    * the oracle recomputes it from the exact-Jaccard pair set, so a
    * tombstone filter that silently dropped out is a hash mismatch).
    * Pairs are exact-verified over LIVE docs at the j ≥ 0.85 S-curve
    * knee (the q265 scoping discipline). Scale: the delete itself is
    * O(|tombstone ids|) — one tiny file write; read-side cost is a
    * broadcast anti-join; compaction amortizes across takedowns.
    */
  val lshTombstoneDelete: Q = (s, dir) => {
    val B = 16; val R = 4; val H = 64; val SH = 3
    val docs = t(s, dir, "documents")
    val sigCol = graft.functions.WordShingleMinHash.word_shingle_minhash(
      col("text"), SH, H)
    def banded(df: DataFrame): DataFrame = df
      .select(col("doc_id").as("id"), sigCol.as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id"),
        posexplode(Dedup.bandHashes(col("sig"), B, R)).as(Seq("band", "bh")))
    val index = docs.filter(col("doc_id") % 10 =!= 0)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    val store = scratch("graft_lsh_tomb").toString + "/bands"
    banded(index).repartition(col("band")).write.mode("overwrite")
      .partitionBy("band").parquet(store)
    banded(fresh).repartition(col("band")).write.mode("append")
      .partitionBy("band").parquet(store)
    val tombDir = scratch("graft_lsh_tomb_ids").toString
    def bandFiles(): Long = {
      val kids = new java.io.File(store).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids)
        .filter(f => f.isDirectory && f.getName.startsWith("band="))
        .map(d => Writers.listParquetFiles(d.toString).size.toLong).sum
    }
    val filesBefore = bandFiles()
    val btSchema = banded(docs).schema
    // the probe side's minhash signatures are identical across all
    // three serve paths (full / merge-on-read / compacted) — pin them
    // once instead of re-hashing the Δ text per pairsFrom call (r13,
    // from the q329 quiet re-measure: the probe re-encode was a third
    // of the gate's cost)
    val bandedFresh = Dedup.pin(banded(fresh))
    // Δ-probe candidates (the q265 shape) from one serve path's band table
    def candFrom(bt: DataFrame): DataFrame = bandedFresh.as("l")
      .join(bt.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh")
          && col("l.id") =!= col("r.id"))
      .select(least(col("l.id"), col("r.id")).as("id1"),
        greatest(col("l.id"), col("r.id")).as("id2"))
      .distinct()
    val storeRead = Readers.parquetWithSchema(s, store, btSchema)
    // candidate shingles computed ONCE over the FULL store's candidate set
    // and reused by all three serve paths (r14 optimization, the same
    // pin-once discipline as the probe signatures above): the MoR and
    // compacted stores hold subsets of the full store's rows, so their
    // candidate pairs — and hence their candidate ids — are subsets of
    // the full path's; re-shingling per path tripled the gate's inherent
    // tokenize+shingle work.
    val candFull = Dedup.pin(candFrom(storeRead))
    val candIdsFull = candFull.select(col("id1").as("id"))
      .union(candFull.select(col("id2").as("id"))).distinct()
    val candDocs = Dedup.pin(docs
      .select(col("doc_id").as("id"), col("text"))
      .join(candIdsFull, Seq("id"), "left_semi")
      .select(col("id"),
        array_distinct(Dedup.wordShingles(col("text"), SH)).as("sh")))
    // exact verification over live docs, shingles served from the pin
    def verify(cand: DataFrame): DataFrame = cand
      .join(candDocs.select(col("id").as("id1"), col("sh").as("sh1")), "id1")
      .join(candDocs.select(col("id").as("id2"), col("sh").as("sh2")), "id2")
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("jaccard") >= 0.85)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
    def pairsFrom(bt: DataFrame): DataFrame = verify(candFrom(bt))
    val fullPairs = Dedup.pin(verify(candFull))
    // the takedown set: the 8 smallest odd index-side KNEE-PAIR
    // PARTICIPANTS (the delete must change served answers — bounded
    // collect ≤ 8) plus the planted never-pairing id%20==5 docs; it
    // lands as ONE tiny ids-only file — O(|tombstones|), no store
    // rewrite (every band dir contains every doc; rewriting eagerly
    // would be a full-store rewrite, the reason this gate is
    // merge-on-read)
    val participants = fullPairs.select(col("id1").as("id"))
      .union(fullPairs.select(col("id2").as("id")))
      .filter(col("id") % 10 =!= 0 && col("id") % 2 === 1)
      .distinct().orderBy(col("id")).limit(8)
    participants
      .unionByName(docs.filter(col("doc_id") % 20 === 5)
        .select(col("doc_id").as("id")))
      .distinct()
      .coalesce(1).write.mode("overwrite").parquet(tombDir)
    val tombRead = Dedup.pin(
      s.read.parquet(tombDir).select(col("id").as("tid")))
    def live(bt: DataFrame): DataFrame =
      bt.join(broadcast(tombRead), col("id") === col("tid"), "left_anti")
    // merge-on-read serve: 2-generation store + tombstone anti-join
    val morPairs = Dedup.pin(pairsFrom(live(storeRead)))
    // what the tombstones suppressed: the no-delete twin's extra pairs
    // (bounded: pair frames at the j>=0.85 knee)
    val nSuppressed = fullPairs
      .join(morPairs, Seq("id1", "id2"), "left_anti").count()
    // lazy copy-on-write compaction: rewrite the store dropping
    // tombstoned rows, one file per band, tombstone file retired
    val compactDir = scratch("graft_lsh_tomb_cmp").toString
    live(storeRead).repartition(col("band")).write.mode("overwrite")
      .partitionBy("band").parquet(compactDir)
    val filesAfter = {
      val kids = new java.io.File(compactDir).listFiles()
      (if (kids == null) Array.empty[java.io.File] else kids)
        .filter(f => f.isDirectory && f.getName.startsWith("band="))
        .map(d => Writers.listParquetFiles(d.toString).size.toLong).sum
    }
    val cowPairs = pairsFrom(
      Readers.parquetWithSchema(s, compactDir, btSchema))
    def key(df: DataFrame): Seq[(Long, Long, Double)] =
      df.orderBy(col("id1"), col("id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val morEqualsCow = key(morPairs) == key(cowPairs)
    morPairs
      .withColumn("files_before", lit(filesBefore))
      .withColumn("files_after", lit(filesAfter))
      .withColumn("n_suppressed", lit(nSuppressed))
      .withColumn("mor_equals_cow", lit(morEqualsCow))
      .orderBy(col("id1"), col("id2"))
  }

  val lshTombstoneDeleteSql: String =
    """WITH toks AS (SELECT doc_id,
      |    regexp_extract_all(lower(text), '\S+') AS tok FROM documents),
      |sh AS (SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, len(tok)-2),
      |      i -> tok[i]||' '||tok[i+1]||' '||tok[i+2])) AS sh
      |  FROM toks WHERE len(tok) >= 3),
      |g AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
      |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS cnt
      |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id),
      |p AS (SELECT i.id1, i.id2,
      |    CAST(i.cnt AS DOUBLE) / (len(l.sh) + len(r.sh) - i.cnt) AS j
      |  FROM inter i JOIN sh l ON i.id1 = l.doc_id
      |    JOIN sh r ON i.id2 = r.doc_id
      |  WHERE i.id1 % 10 = 0 OR i.id2 % 10 = 0),
      |knee AS (SELECT id1, id2, j FROM p WHERE j >= 0.85),
      |tomb AS (SELECT id FROM (
      |    SELECT DISTINCT id FROM (
      |      SELECT id1 AS id FROM knee UNION ALL SELECT id2 FROM knee)
      |    WHERE id % 10 <> 0 AND id % 2 = 1 ORDER BY id LIMIT 8)
      |  UNION SELECT doc_id FROM documents WHERE doc_id % 20 = 5),
      |suppressed AS (SELECT CAST(count(*) AS BIGINT) AS n FROM knee
      |  WHERE id1 IN (SELECT id FROM tomb)
      |     OR id2 IN (SELECT id FROM tomb))
      |SELECT id1, id2, round(j, 6) AS jaccard,
      |  CAST(32 AS BIGINT) AS files_before,
      |  CAST(16 AS BIGINT) AS files_after,
      |  (SELECT n FROM suppressed) AS n_suppressed,
      |  TRUE AS mor_equals_cow
      |FROM knee WHERE id1 NOT IN (SELECT id FROM tomb)
      |  AND id2 NOT IN (SELECT id FROM tomb)
      |ORDER BY id1, id2""".stripMargin

  /** TTL on MapState + ListState — the NINETEENTH streaming gate,
    * extending q324's expiry contract to the composite state types
    * (q321's per-type MapState counts and trailing-3 ListState window):
    * TTL on these is per-ENTRY — each map entry and each list element
    * carries its own expiration — which is what bounds a long-lived
    * stream whose per-key state is itself a collection (the type
    * vocabulary map can only grow; TTL is what shrinks it). Same
    * deterministic harness as q324 (one micro-batch per phase via
    * Trigger.Once, inter-phase sleep > TTL): every phase-1 entry and
    * element is expired for phase-2 reads, so per-type counts AND the
    * trailing-3 sum restart at the phase boundary — the batch windows
    * partitioned by (user, phase, type) and (user, phase) — while the
    * no-TTL twin in the same hash-checked row continues the q321
    * windows unbroken. Scale: expiry is per-entry in RocksDB (a
    * min-expiry secondary index), so an idle TYPE ages out without
    * touching the user's live entries.
    */
  val streamMapListTtl: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.{Files, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    import s.implicits._
    val TtlMs = 500L
    val SleepMs = 1500L
    val holdDir = scratch("graft_tws_mlttl_hold")
    val srcDir = scratch("graft_tws_mlttl_src")
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
      scratch("graft_tws_mlttl_stage"), Seq(col("event_id")))
    def promote(i: Int): Unit = {
      val dst = srcDir.resolve(f"part-$i%02d.parquet")
      Files.copy(holdDir.resolve(f"part-$i%02d.parquet"), dst,
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(1000000000000L + i * 10000L))
      ()
    }
    withConfs(s, "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      def stream = s.readStream
        .schema(ev.schema)
        .parquet(srcDir.toString)
        .as[graft.streaming.EventStreams.Event]
      val outT = scratch("graft_tws_mlttl_outt")
      val outF = scratch("graft_tws_mlttl_outf")
      val ckT = scratch("graft_tws_mlttl_ckt")
      val ckF = scratch("graft_tws_mlttl_ckf")
      def run(ttlMs: Long, out: java.nio.file.Path,
              ck: java.nio.file.Path): Unit = {
        val sq = EventStreams.mapListStatsTtl(stream, ttlMs)(s).toDF()
          .writeStream.outputMode("append")
          .option("checkpointLocation", ck.toString)
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) =>
              b.write.mode("append").parquet(out.toString); ()
          }
          .trigger(Trigger.Once()).start() // not AvailableNow: see q324
        sq.awaitTermination()
      }
      promote(0); promote(1)
      // twin pair concurrent per phase (QBase.inParallel — see q324)
      inParallel(run(TtlMs, outT, ckT), run(0L, outF, ckF))
      promote(2); promote(3)
      Thread.sleep(SleepMs)
      inParallel(run(TtlMs, outT, ckT), run(0L, outF, ckF))
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("type_n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("last3_cents",
          org.apache.spark.sql.types.LongType)))
      Readers.parquetWithSchema(s, outT.toString, sch)
        .select(col("user_id"), col("event_id"),
          col("type_n").as("ttl_type_n"),
          col("last3_cents").as("ttl_last3"))
        .join(Readers.parquetWithSchema(s, outF.toString, sch)
          .select(col("user_id"), col("event_id"),
            col("type_n").as("full_type_n"),
            col("last3_cents").as("full_last3")),
          Seq("user_id", "event_id"))
        .orderBy(col("user_id"), col("event_id"))
    }
  }

  val streamMapListTtlSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |b AS (SELECT min(us) AS lo,
      |    greatest(max(us) - min(us), 4) AS span FROM e),
      |p AS (SELECT user_id, event_id, event_type, us, cents,
      |    us >= lo + 2 * span // 4 AS ph2 FROM e CROSS JOIN b)
      |SELECT user_id, event_id,
      |  CAST(row_number() OVER (PARTITION BY user_id, ph2, event_type
      |    ORDER BY us, event_id) AS BIGINT) AS ttl_type_n,
      |  CAST(sum(cents) OVER (PARTITION BY user_id, ph2
      |    ORDER BY us, event_id ROWS 2 PRECEDING) AS BIGINT) AS ttl_last3,
      |  CAST(row_number() OVER (PARTITION BY user_id, event_type
      |    ORDER BY us, event_id) AS BIGINT) AS full_type_n,
      |  CAST(sum(cents) OVER (PARTITION BY user_id
      |    ORDER BY us, event_id ROWS 2 PRECEDING) AS BIGINT) AS full_last3
      |FROM p ORDER BY user_id, event_id""".stripMargin

  /** Recall-vs-nprobe TUNING CURVE at a production-shape configuration
    * (r11 verdict #3): q320 proved the audit machinery at a deliberately
    * tiny 4-cell config (recall ≈ 0.27); the table a real ANN service
    * READS is this one — recall@10 as a function of nprobe (how many
    * cell directories a query pays to scan) × ADC-shortlist width (how
    * many candidates reach the exact re-rank), at a config where cells
    * ≫ nprobe (16 cells, 64-entry codebook). Shape: the corpus is
    * assigned + PQ-coded ONCE; each query's top-4 cells are ranked
    * (posexplode keeps the probe rank); one candidate pass computes
    * both the ADC distance and — because this is the AUDIT, not the
    * serve path — the exact grid distance; the 6-point config grid
    * {1,2,4}×{1×,4×} is a broadcast cross join, so the whole curve
    * costs ONE corpus pass + window functions, not 6 reruns. Recall is
    * against the exact top-10 (brute side bounded by the fixed ≤10
    * query sample, the q320 discipline). The hash pins the measured
    * curve, and the curve carries the table's actual lesson: at a FIXED
    * shortlist, recall FALLS as nprobe grows (sf0.001, shortlist=10:
    * 0.40 → 0.34 → 0.31 across nprobe 1→2→4) — extra cells contribute
    * ADC-close-but-exactly-far candidates that push true neighbors out
    * of the fixed-width shortlist before the exact re-rank can see
    * them — while widening the shortlist recovers it (0.88 at
    * nprobe=1×40). This is why production ANN services scale the
    * re-rank shortlist WITH nprobe rather than tuning either knob
    * alone; a gate that only measured nprobe would have pointed the
    * wrong way.
    */
  val recallTuning: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExpressions
    import s.implicits._
    val M = 4; val SUB = 16; val K = 64; val NC = 16; val TOPK = 10
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val qv = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val cents: Array[(Long, Array[Float])] = emb.filter(col("vec_id") < NC)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val codebook: Array[Array[Long]] = emb.orderBy(col("vec_id")).limit(K)
      .select(qv.as("qv")).collect().map(_.getSeq[Long](0).toArray)
    if (cents.isEmpty || codebook.isEmpty) {
      emb.select(lit(0).as("nprobe"), lit(0).as("shortlist"),
        lit(0L).as("n_queries"), lit(0.0).as("mean_recall"))
        .filter(lit(false))
    } else {
      val cellIds = cents.map(_._1)
      val cvs = cents.map(_._2)
      val assigned = emb.filter(col("vec_id") >= NC)
        .select(col("vec_id").as("neighbor_id"), qv.as("nv"),
          VectorExpressions.nearest_cells(col("embedding"), cellIds, cvs, 1)
            .getItem(0).as("cell"))
        .withColumn("codes", pqCodes(codebook, col("nv"), M, SUB))
      val qprobe = Dedup.pin(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), qv.as("qq"),
          posexplode(VectorExpressions.nearest_cells(col("embedding"),
            cellIds, cvs, 4)))
        .select(col("query_id"), col("qq"), col("col").as("cell"),
          (col("pos") + 1).as("cell_rank")))
      // fused native L2² (round 14) — identical integer sum
      val exactD = VectorExpressions.grid_l2sq(col("qq"), col("nv"))
      val cand = assigned.join(broadcast(qprobe), Seq("cell"))
        .select(col("query_id"), col("cell_rank"), col("neighbor_id"),
          adcDist(codebook, col("qq"), col("codes"), M, SUB).as("adc_dist"),
          exactD.as("exact_dist"))
      val configs = Seq((1, 10), (1, 40), (2, 10), (2, 40), (4, 10), (4, 40))
        .toDF("nprobe", "shortlist")
      val candC = cand.join(broadcast(configs),
        col("cell_rank") <= col("nprobe"))
      val wA = Window.partitionBy(col("nprobe"), col("shortlist"),
        col("query_id")).orderBy(col("adc_dist"), col("neighbor_id"))
      val short = candC.withColumn("arank", row_number().over(wA))
        .filter(col("arank") <= col("shortlist"))
      val wE = Window.partitionBy(col("nprobe"), col("shortlist"),
        col("query_id")).orderBy(col("exact_dist"), col("neighbor_id"))
      val served = short.withColumn("rank", row_number().over(wE))
        .filter(col("rank") <= TOPK)
        .select(col("nprobe"), col("shortlist"), col("query_id"),
          col("neighbor_id"))
      val queries = Dedup.pin(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), qv.as("qq")))
      val wX = Window.partitionBy(col("query_id"))
        .orderBy(col("exact_dist"), col("neighbor_id"))
      val etop = emb.filter(col("vec_id") >= NC)
        .select(col("vec_id").as("neighbor_id"), qv.as("nv"))
        .crossJoin(broadcast(queries))
        .withColumn("exact_dist", exactD)
        .withColumn("rank", row_number().over(wX))
        .filter(col("rank") <= TOPK)
        .select(col("query_id"), col("neighbor_id"))
      val hits = served.join(etop, Seq("query_id", "neighbor_id"))
        .groupBy(col("nprobe"), col("shortlist"), col("query_id"))
        .agg(count(lit(1)).as("h"))
      configs.crossJoin(broadcast(queries.select(col("query_id"))))
        .join(hits, Seq("nprobe", "shortlist", "query_id"), "left")
        .groupBy(col("nprobe"), col("shortlist"))
        .agg(count(lit(1)).as("n_queries"),
          round(sum(coalesce(col("h"), lit(0L))).cast("double")
            / (lit(TOPK.toDouble) * count(lit(1))), 6).as("mean_recall"))
        .orderBy(col("nprobe"), col("shortlist"))
    }
  }

  val recallTuningSql: String =
    """WITH emb AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, qv
      |  FROM emb ORDER BY vec_id LIMIT 64),
      |cents AS (SELECT vec_id AS cell, e AS ce FROM emb WHERE vec_id < 16),
      |corpus AS (SELECT vec_id, e, qv FROM emb WHERE vec_id >= 16),
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
      |qp AS (SELECT vec_id AS query_id, qv AS qq, cell, rn AS cell_rank
      |  FROM (
      |  SELECT q.vec_id, q.qv, c.cell, row_number() OVER (
      |      PARTITION BY q.vec_id ORDER BY
      |      list_dot_product(q.e, c.ce) /
      |        (sqrt(list_dot_product(q.e, q.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
      |  FROM qs q CROSS JOIN cents c) WHERE rn <= 4),
      |xd AS (SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
      |    CAST(list_sum(list_transform(generate_series(1, 64), i ->
      |      (q.qv[i] - r.qv[i]) * (q.qv[i] - r.qv[i]))) AS BIGINT)
      |      AS exact_dist
      |  FROM qs q CROSS JOIN corpus r),
      |cand AS (SELECT qp.query_id, qp.cell_rank, v.vec_id AS neighbor_id,
      |    CAST(sum(list_sum(list_transform(generate_series(1, 16), i ->
      |      (qp.qq[k.s*16 + i] - b.qv[k.s*16 + i])
      |      * (qp.qq[k.s*16 + i] - b.qv[k.s*16 + i])))) AS BIGINT)
      |      AS adc_dist
      |  FROM qp JOIN cc v USING (cell)
      |  JOIN codes k ON k.vec_id = v.vec_id
      |  JOIN cb b ON b.code = k.code
      |  GROUP BY qp.query_id, qp.cell_rank, v.vec_id),
      |configs AS (SELECT * FROM (VALUES (1, 10), (1, 40), (2, 10),
      |    (2, 40), (4, 10), (4, 40)) t(nprobe, shortlist)),
      |short AS (SELECT nprobe, shortlist, query_id, neighbor_id,
      |    exact_dist FROM (
      |  SELECT c.nprobe, c.shortlist, d.query_id, d.neighbor_id,
      |    x.exact_dist, row_number() OVER (
      |      PARTITION BY c.nprobe, c.shortlist, d.query_id
      |      ORDER BY d.adc_dist, d.neighbor_id) AS arank
      |  FROM configs c JOIN cand d ON d.cell_rank <= c.nprobe
      |  JOIN xd x ON x.query_id = d.query_id
      |    AND x.neighbor_id = d.neighbor_id)
      |  WHERE arank <= shortlist),
      |served AS (SELECT nprobe, shortlist, query_id, neighbor_id FROM (
      |  SELECT short.*, row_number() OVER (
      |      PARTITION BY nprobe, shortlist, query_id
      |      ORDER BY exact_dist, neighbor_id) AS rank FROM short)
      |  WHERE rank <= 10),
      |etop AS (SELECT query_id, neighbor_id FROM (
      |  SELECT query_id, neighbor_id, row_number() OVER (
      |      PARTITION BY query_id ORDER BY exact_dist, neighbor_id) AS rk
      |  FROM xd) WHERE rk <= 10),
      |hits AS (SELECT s.nprobe, s.shortlist, s.query_id, count(*) AS h
      |  FROM served s JOIN etop e USING (query_id, neighbor_id)
      |  GROUP BY s.nprobe, s.shortlist, s.query_id),
      |grid AS (SELECT c.nprobe, c.shortlist, q.vec_id AS query_id
      |  FROM configs c CROSS JOIN qs q)
      |SELECT nprobe, shortlist, CAST(count(*) AS BIGINT) AS n_queries,
      |  round(CAST(coalesce(sum(h), 0) AS DOUBLE) / (10.0 * count(*)), 6)
      |    AS mean_recall
      |FROM grid LEFT JOIN hits USING (nprobe, shortlist, query_id)
      |GROUP BY nprobe, shortlist ORDER BY nprobe, shortlist""".stripMargin

  /** Baseline JPEG grayscale decode round-trip (r11 verdict #4 — JPEG
    * is what a crawl actually ingests; q30's header parse was the
    * documented stub): each document plants a 16×16 image of four
    * CONSTANT 8×8 blocks (block values from the md5 fixture), encoded
    * by [[graft.functions.JpegExpressions.jpeg_encode_gray]] as a
    * complete baseline JFIF — real FDCT, real quantization, real
    * canonical Huffman DC/AC coding with byte stuffing, DQT/DHT
    * written into the stream — and decoded by the full inverse
    * (marker walk, DHT-driven Huffman decode, DPCM, dequantization,
    * IDCT). The fixture choice is what makes the gate HASH-CHECKABLE:
    * with constant blocks and DC quant step 8 the whole pipeline is
    * exactly lossless (DC = 8·(v−128) quantizes to v−128 exactly; the
    * decoder's integer DC shortcut inverts it bit-for-bit), so the
    * DuckDB oracle recomputes every decoded pixel, the four block
    * values, and the first-row hex directly from the md5 formula —
    * while the wire format is a real entropy-coded scan whose DC
    * Huffman path carries varied categories (block-to-block DPCM
    * diffs span the full ±255 range across the corpus). Docs with
    * doc_id % 11 == 0 ship a 20-byte truncation: the SOF header still
    * parses (container_fmt/w/h intact — header inspection cannot
    * catch it) but the decode must yield NULL. AC-path coverage
    * (run-lengths, ZRL, extend, general IDCT) is pinned by JpegSpec —
    * see the codec's object doc for the documented oracle boundary.
    * Scale: row-local codegen both directions, fused into the scan;
    * the q309 cost shape.
    */
  val jpegRoundtrip: Q = (s, dir) => {
    import graft.functions.{ImageExpressions, JpegExpressions}
    def hx(i: Int): Column =
      substring(md5(concat(col("media_id").cast("string"), lit("|j" + i))),
        1, 2)
    val rowT = concat(repeat(hx(0), 8), repeat(hx(1), 8))
    val rowB = concat(repeat(hx(2), 8), repeat(hx(3), 8))
    def byteAt(bin: Column, pos: Int): Column =
      conv(hex(substring(bin, pos, 1)), 16, 10).cast("long")
    val base = t(s, dir, "documents")
      .select(col("doc_id").as("media_id"))
      .withColumn("px", unhex(concat(repeat(rowT, 8), repeat(rowB, 8))))
      .withColumn("jpg", JpegExpressions.jpeg_encode_gray(col("px"), 16, 16))
    base
      .withColumn("blob",
        when(col("media_id") % 11 === 0,
          expr("substring(jpg, 1, octet_length(jpg) - 20)"))
          .otherwise(col("jpg")))
      .withColumn("dec", JpegExpressions.jpeg_decode_gray(col("blob")))
      .select(col("media_id"),
        ImageExpressions.image_format(col("blob")).as("container_fmt"),
        ImageExpressions.image_width(col("blob")).as("w"),
        ImageExpressions.image_height(col("blob")).as("h"),
        col("dec").isNotNull.as("decoded"),
        length(col("dec")).as("n_px"),
        lower(hex(substring(col("dec"), 1, 16))).as("row0_hex"),
        byteAt(col("dec"), 1).as("v00"),
        byteAt(col("dec"), 9).as("v01"),
        byteAt(col("dec"), 129).as("v10"),
        byteAt(col("dec"), 137).as("v11"),
        (col("dec") <=> col("px")).as("roundtrip_exact"))
      .orderBy(col("media_id"))
  }

  val jpegRoundtripSql: String =
    """WITH v AS (SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS s
      |  FROM documents)
      |SELECT media_id, 'jpeg' AS container_fmt,
      |  CAST(16 AS INTEGER) AS w, CAST(16 AS INTEGER) AS h,
      |  media_id % 11 <> 0 AS decoded,
      |  CASE WHEN media_id % 11 <> 0 THEN CAST(256 AS INTEGER) END AS n_px,
      |  CASE WHEN media_id % 11 <> 0 THEN
      |    repeat(substr(md5(s || '|j0'), 1, 2), 8)
      |    || repeat(substr(md5(s || '|j1'), 1, 2), 8) END AS row0_hex,
      |  CASE WHEN media_id % 11 <> 0 THEN
      |    ('0x' || substr(md5(s || '|j0'), 1, 2))::BIGINT END AS v00,
      |  CASE WHEN media_id % 11 <> 0 THEN
      |    ('0x' || substr(md5(s || '|j1'), 1, 2))::BIGINT END AS v01,
      |  CASE WHEN media_id % 11 <> 0 THEN
      |    ('0x' || substr(md5(s || '|j2'), 1, 2))::BIGINT END AS v10,
      |  CASE WHEN media_id % 11 <> 0 THEN
      |    ('0x' || substr(md5(s || '|j3'), 1, 2))::BIGINT END AS v11,
      |  media_id % 11 <> 0 AS roundtrip_exact
      |FROM v ORDER BY media_id""".stripMargin

  /** Baseline COLOR JPEG (YCbCr 4:2:0) round-trip — q326's completion
    * to the shape a crawl actually ingests (nearly every web JPEG is
    * 3-component 4:2:0): the full interleaved-MCU machinery is on the
    * wire — per-16×16-MCU blocks in Y00 Y01 Y10 Y11 Cb Cr order,
    * PER-COMPONENT DC predictors, a second chroma DQT (id 1) and DHT
    * pair, 2×2 chroma subsampling at encode and nearest upsampling +
    * the JFIF YCbCr→RGB inverse at decode. The fixture is what makes
    * it hash-checkable: GRAY-VALUED RGB (each pixel (v,v,v), the q326
    * constant blocks tripled) — the JFIF transform's rows sum to
    * exactly 1 and 0, so Y = v and Cb = Cr = 128 EXACTLY, subsampled
    * constants stay constant, chroma blocks quantize to all-zero, the
    * DC-step-8 luma path is lossless (q326's argument), and the
    * inverse transform's chroma terms are exactly 0.0 — every decoded
    * byte is recomputable from the md5 formula while the Huffman
    * stream still carries three interleaved components with real DPCM.
    * Docs with doc_id % 7 == 0 ship a 20-byte truncation (SOF intact,
    * decode NULL); `gray_reject` pins that the single-component
    * decoder refuses the color frame. Non-gray color (lossy chroma)
    * and cross-encoder interop are JpegSpec's territory — see the
    * codec's object doc for the oracle boundary.
    */
  val jpegColorRoundtrip: Q = (s, dir) => {
    import graft.functions.{ImageExpressions, JpegExpressions}
    def hx(i: Int): Column =
      substring(md5(concat(col("media_id").cast("string"), lit("|j" + i))),
        1, 2)
    // 8 px of block value = 24 repeats of the hex pair (3 channels/px)
    val rowT = concat(repeat(hx(0), 24), repeat(hx(1), 24))
    val rowB = concat(repeat(hx(2), 24), repeat(hx(3), 24))
    val base = t(s, dir, "documents")
      .select(col("doc_id").as("media_id"))
      .withColumn("px", unhex(concat(repeat(rowT, 8), repeat(rowB, 8))))
      .withColumn("jpg", JpegExpressions.jpeg_encode_color(col("px"), 16, 16))
    base
      .withColumn("blob",
        when(col("media_id") % 7 === 0,
          expr("substring(jpg, 1, octet_length(jpg) - 20)"))
          .otherwise(col("jpg")))
      .withColumn("dec", JpegExpressions.jpeg_decode_rgb(col("blob")))
      .select(col("media_id"),
        ImageExpressions.image_format(col("blob")).as("container_fmt"),
        ImageExpressions.image_width(col("blob")).as("w"),
        ImageExpressions.image_height(col("blob")).as("h"),
        col("dec").isNotNull.as("decoded"),
        length(col("dec")).as("n_bytes"),
        lower(hex(substring(col("dec"), 1, 16))).as("row0_hex"),
        ImageExpressions.channel_sum(col("dec"), 3, 0).as("r_sum"),
        ImageExpressions.channel_sum(col("dec"), 3, 1).as("g_sum"),
        ImageExpressions.channel_sum(col("dec"), 3, 2).as("b_sum"),
        (col("dec") <=> col("px")).as("roundtrip_exact"),
        JpegExpressions.jpeg_decode_gray(col("blob")).isNull
          .as("gray_reject"))
      .orderBy(col("media_id"))
  }

  val jpegColorRoundtripSql: String =
    """WITH v AS (SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS s,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|j0'), 1, 2))
      |      ::BIGINT AS v0,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|j1'), 1, 2))
      |      ::BIGINT AS v1,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|j2'), 1, 2))
      |      ::BIGINT AS v2,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|j3'), 1, 2))
      |      ::BIGINT AS v3
      |  FROM documents)
      |SELECT media_id, 'jpeg' AS container_fmt,
      |  CAST(16 AS INTEGER) AS w, CAST(16 AS INTEGER) AS h,
      |  media_id % 7 <> 0 AS decoded,
      |  CASE WHEN media_id % 7 <> 0 THEN CAST(768 AS INTEGER) END
      |    AS n_bytes,
      |  CASE WHEN media_id % 7 <> 0 THEN
      |    repeat(substr(md5(s || '|j0'), 1, 2), 16) END AS row0_hex,
      |  CASE WHEN media_id % 7 <> 0 THEN
      |    CAST(64 * (v0 + v1 + v2 + v3) AS BIGINT) END AS r_sum,
      |  CASE WHEN media_id % 7 <> 0 THEN
      |    CAST(64 * (v0 + v1 + v2 + v3) AS BIGINT) END AS g_sum,
      |  CASE WHEN media_id % 7 <> 0 THEN
      |    CAST(64 * (v0 + v1 + v2 + v3) AS BIGINT) END AS b_sum,
      |  media_id % 7 <> 0 AS roundtrip_exact,
      |  TRUE AS gray_reject
      |FROM v ORDER BY media_id""".stripMargin

  /** RGB PNG round-trip (r11 verdict #6 — real crawl PNGs are color):
    * q309's codec covered the 8-bit grayscale subset; this gate runs
    * the same contract through the COLOR-TYPE-2 path — the q277
    * 288-byte planted buffer reinterpreted as an 8×12 interleaved RGB
    * image, encoded as a spec-valid truecolor PNG (bytewise filtering
    * with the left neighbor bpp=3 back, §9.2's "corresponding byte of
    * the previous pixel" — the part a grayscale-only unfilter gets
    * wrong) and decoded back. The hash-checked row carries the decoded
    * byte count (288 = w·h·3), the first 16 decoded bytes as hex
    * (== md5(id||'|0') by the fixture), the three per-CHANNEL byte
    * sums ([[graft.functions.ImageExpressions.channel_sum]] — the
    * channel-aware fingerprint: unlike a gray mean they distinguish
    * channel-swapped images; the oracle recomputes each from the pixel
    * formula's stride-3 slices), a byte-exact round-trip flag, and
    * `gray_reject` — the GRAYSCALE decoder applied to the color PNG
    * must return NULL (the color-type validation path, pinned TRUE on
    * every row). Docs with doc_id % 13 == 0 ship a 24-byte truncation:
    * header still parses (fmt/w/h intact), decode NULL. Scale: same
    * row-local codegen shape as q309 — one narrow pass, no shuffle.
    */
  val pngRgbRoundtrip: Q = (s, dir) => {
    import graft.functions.{ImageExpressions, PngExpressions}
    val base = t(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        plantedImagePixels(col("doc_id"), variant = false).as("px"))
      .withColumn("png", PngExpressions.png_encode_rgb(col("px"), 8, 12))
    base
      .withColumn("blob",
        when(col("media_id") % 13 === 0,
          expr("substring(png, 1, octet_length(png) - 24)"))
          .otherwise(col("png")))
      .withColumn("dec", PngExpressions.png_decode_rgb(col("blob")))
      .select(col("media_id"),
        ImageExpressions.image_format(col("blob")).as("container_fmt"),
        ImageExpressions.image_width(col("blob")).as("w"),
        ImageExpressions.image_height(col("blob")).as("h"),
        col("dec").isNotNull.as("decoded"),
        length(col("dec")).as("n_bytes"),
        lower(hex(substring(col("dec"), 1, 16))).as("block0_hex"),
        ImageExpressions.channel_sum(col("dec"), 3, 0).as("r_sum"),
        ImageExpressions.channel_sum(col("dec"), 3, 1).as("g_sum"),
        ImageExpressions.channel_sum(col("dec"), 3, 2).as("b_sum"),
        (col("dec") <=> col("px")).as("roundtrip_exact"),
        PngExpressions.png_decode_gray(col("blob")).isNull.as("gray_reject"))
      .orderBy(col("media_id"))
  }

  val pngRgbRoundtripSql: String =
    """WITH px AS (SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS s,
      |    list_transform(generate_series(0, 287), k ->
      |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
      |          CAST(k // 16 AS VARCHAR)), (k % 16) * 2 + 1, 2))::BIGINT)
      |      AS p
      |  FROM documents)
      |SELECT media_id, 'png' AS container_fmt,
      |  CAST(8 AS INTEGER) AS w, CAST(12 AS INTEGER) AS h,
      |  media_id % 13 <> 0 AS decoded,
      |  CASE WHEN media_id % 13 <> 0 THEN CAST(288 AS INTEGER) END
      |    AS n_bytes,
      |  CASE WHEN media_id % 13 <> 0 THEN md5(s || '|0') END AS block0_hex,
      |  CASE WHEN media_id % 13 <> 0 THEN CAST(list_sum(
      |    list_transform(generate_series(0, 95), j -> p[3*j + 1]))
      |    AS BIGINT) END AS r_sum,
      |  CASE WHEN media_id % 13 <> 0 THEN CAST(list_sum(
      |    list_transform(generate_series(0, 95), j -> p[3*j + 2]))
      |    AS BIGINT) END AS g_sum,
      |  CASE WHEN media_id % 13 <> 0 THEN CAST(list_sum(
      |    list_transform(generate_series(0, 95), j -> p[3*j + 3]))
      |    AS BIGINT) END AS b_sum,
      |  media_id % 13 <> 0 AS roundtrip_exact,
      |  TRUE AS gray_reject
      |FROM px ORDER BY media_id""".stripMargin
}
