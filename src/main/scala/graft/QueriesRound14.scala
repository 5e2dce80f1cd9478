package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{DeleteVectors, Readers, SnapshotLog, Writers}
import graft.io.SnapshotLog.FileEntry
import graft.ops.Dedup

/** Round-14 widening: the operational compositions the r13 verdict
  * named — merge-on-read UPSERT (updates as delete-vector + append in
  * ONE commit, the Iceberg v2 MoR write path), predicate-filtered ANN
  * serving (the q325 shortlist-dilution lesson extended to filters),
  * and arbitrary-alignment duplicated-substring dedup (the full
  * Lee '22 ExactSubstr discipline, retiring q118's fixed-window
  * alignment blindness).
  */
trait QueriesRound14 extends QueriesRound13e {

  /** Data files currently under the store's bucket=* layout. */
  protected def listBucketFiles(store: String): Seq[String] = {
    val kids = new java.io.File(store).listFiles()
    (if (kids == null) Array.empty[java.io.File] else kids).toIndexedSeq
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .flatMap(dd => Writers.listParquetFiles(dd.toString)).sorted
  }

  /** Merge-on-read UPSERT commit — the composition q346 (DV delete) and
    * q340 (CoW merge) left one step apart (VERDICT r13 missing #1): an
    * UPDATE lands as a delete-vector position on the file holding the
    * OLD row copy plus an appended file holding the NEW values; an
    * INSERT is append-only; no base file is ever rewritten. One
    * manifest commit carries both carriers, so readers atomically see
    * either the full upsert or none of it. Victim addressing is
    * DV-aware (matches LIVE rows only — a row upserted twice gets its
    * v2 copy killed at v3, never a double-kill of the v1 position) and
    * sidecars are written executor-side ([[DeleteVectors]]). Write
    * cost ∝ updated+inserted rows — never bucket size, never table
    * size — which is the whole point of MoR over CoW for hot sparse
    * updates at 100 TB.
    */
  protected def morUpsertCommit(s: SparkSession, store: String, prevV: Int,
      updPred: org.apache.spark.sql.Column, addChars: Long,
      inserts: DataFrame): Int = {
    import s.implicits._
    val prev = SnapshotLog.entries(store, prevV)
    if (prev.isEmpty) {
      // empty base: no victims possible (and no _metadata columns to
      // scan — the q332 empty-manifest lesson); the upsert degenerates
      // to an insert-only append commit
      val before = listBucketFiles(store)
      inserts.select(col("doc_id"), col("n_chars"))
        .withColumn("bucket", pmod(col("doc_id"), lit(8)).cast("int"))
        .repartition(col("bucket")).write.mode("append")
        .partitionBy("bucket").parquet(store)
      val fresh = listBucketFiles(store).filterNot(before.contains)
      return SnapshotLog.commitEntries(store, fresh.map(FileEntry(_)))
    }
    val dvPairs = prev.flatMap(e => e.dv.toSeq.flatMap { d =>
      val f = new java.io.File(e.path)
      val key = f.getParentFile.getName + "/" + f.getName
      SnapshotLog.readDeleteVector(d).map(p => (key, p))
    })
    val base = readFiles(s, store, prev.map(_.path))
      .withColumn("file", col("_metadata.file_path"))
      .withColumn("fkey",
        concat_ws("/", slice(split(col("_metadata.file_path"), "/"), -2, 2)))
      .withColumn("pos", col("_metadata.row_index"))
    val live = if (dvPairs.isEmpty) base
      else base.join(broadcast(dvPairs.toDF("fkey", "pos")),
        Seq("fkey", "pos"), "left_anti")
    val victims = live.filter(updPred)
    // 1. ONE append job: updated rows at their new values + inserts,
    //    bucket-routed so each touched bucket gains exactly one file
    val before = listBucketFiles(store)
    victims.select(col("doc_id"), (col("n_chars") + addChars).as("n_chars"))
      .unionAll(inserts.select(col("doc_id"), col("n_chars")))
      .withColumn("bucket", pmod(col("doc_id"), lit(8)).cast("int"))
      .repartition(col("bucket")).write.mode("append")
      .partitionBy("bucket").parquet(store)
    val fresh = listBucketFiles(store).filterNot(before.contains)
    // 2. DV the victims' OLD positions, executor-side, merging any
    //    sidecar the file already carries
    val existing = prev.flatMap(e => e.dv.map(plainP(e.path) -> _)).toMap
    val sidecars = DeleteVectors.writeSidecars(
      victims.select(col("file"), col("pos")), store, existing)
    // 3. ONE commit: every base file kept (dv-annotated where touched,
    //    existing stats preserved by copy) plus the appended files,
    //    which carry their own write-time stats (q347 discipline) so
    //    metadata-only answers (q362/q376) stay exact through upserts
    val freshStats =
      if (fresh.isEmpty) Map.empty[String, SnapshotLog.FileStats]
      else readFiles(s, store, fresh)
        .select(col("_metadata.file_path").as("f"), col("doc_id"))
        .groupBy(col("f"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => plainP(r.getString(0)) ->
          SnapshotLog.FileStats(r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    val next = prev.map { e =>
      sidecars.get(plainP(e.path)) match {
        case Some(dv) => e.copy(dv = Some(dv))
        case None => e
      }
    } ++ fresh.map(f => FileEntry(f, stats = freshStats.get(plainP(f))))
    SnapshotLog.commitEntries(store, next)
  }

  /** MoR UPSERT gate — two upsert batches over the snapshot store, all
    * three versions read AFTER everything:
    *   v1  base load, one file per bucket (doc_id % 8)
    *   v2  UPSERT: doc_id % 5 == 2 gets n_chars+1000 (update), plus
    *       inserts doc_id+1000000 for doc_id % 50 == 0
    *   v3  UPSERT over v2's LIVE state: doc_id % 7 == 3 (including
    *       rows inserted OR updated at v2 — the second update must
    *       kill the v2 copy, not the long-dead v1 position) gets
    *       +5000, plus inserts doc_id+2000000 for doc_id % 60 == 0
    * Pins, all oracle-recomputed from the modular arithmetic:
    * per-snapshot rows/sums (updates change values but NOT row counts,
    * despite every write being append-only — the DV kills the old
    * copy), `n_files` (= base buckets + one appended file per touched
    * bucket per batch — the rewrote-zero arithmetic), `dv_positions`
    * (= cumulative updated-row count: delete state ∝ updates, the MoR
    * contract), and `base_files_kept` (every prior data file is still
    * referenced by the next manifest — nothing was rewritten). Scale:
    * per batch one pushed-scan + one victims-sized shuffle + one
    * append job; driver state O(|touched files|).
    */
  val morUpsert: Q = (s, dir) => {
    val store = scratch("graft_morupsert").toString + "/docs"
    val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
      pmod(col("doc_id"), lit(8)).cast("int").as("bucket"))
    d.repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(store)
    SnapshotLog.commit(store, listBucketFiles(store))
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
    def snapAgg(v: Int): DataFrame = {
      val es = SnapshotLog.entries(store, v)
      val kept =
        if (v == 1) true
        else {
          val cur = es.map(_.path).toSet
          SnapshotLog.entries(store, v - 1).map(_.path).forall(cur.contains)
        }
      readDv(s, store, es)
        .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"))
        .select(lit(v).as("snap"), col("n_rows"), col("sum_chars"),
          lit(es.size.toLong).as("n_files"),
          lit(es.flatMap(_.dv)
            .map(SnapshotLog.readDeleteVector(_).size.toLong).sum)
            .as("dv_positions"),
          lit(kept).as("base_files_kept"))
    }
    snapAgg(1).unionAll(snapAgg(v2)).unionAll(snapAgg(v3))
      .orderBy(col("snap"))
  }

  val morUpsertSql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |i2 AS (SELECT doc_id + 1000000 AS doc_id, doc_id % 1000 AS n_chars
      |  FROM d WHERE doc_id % 50 = 0),
      |v2 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 2
      |    THEN n_chars + 1000 ELSE n_chars END AS n_chars FROM d
      |  UNION ALL SELECT doc_id, n_chars FROM i2),
      |i3 AS (SELECT doc_id + 2000000 AS doc_id, doc_id % 900 AS n_chars
      |  FROM d WHERE doc_id % 60 = 0),
      |v3 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 3
      |    THEN n_chars + 5000 ELSE n_chars END AS n_chars FROM v2
      |  UNION ALL SELECT doc_id, n_chars FROM i3),
      |b1 AS (SELECT count(DISTINCT doc_id % 8) AS n FROM d),
      |t2 AS (SELECT doc_id % 8 AS b FROM d WHERE doc_id % 5 = 2
      |  UNION SELECT doc_id % 8 FROM i2),
      |nb2 AS (SELECT count(DISTINCT b) AS n FROM t2),
      |t3 AS (SELECT doc_id % 8 AS b FROM v2 WHERE doc_id % 7 = 3
      |  UNION SELECT doc_id % 8 FROM i3),
      |nb3 AS (SELECT count(DISTINCT b) AS n FROM t3),
      |u2 AS (SELECT count(*) AS n FROM d WHERE doc_id % 5 = 2),
      |u3 AS (SELECT count(*) AS n FROM v2 WHERE doc_id % 7 = 3)
      |SELECT * FROM (
      |  SELECT 1 AS snap, (SELECT count(*) FROM d) AS n_rows,
      |    (SELECT CAST(sum(n_chars) AS BIGINT) FROM d) AS sum_chars,
      |    (SELECT CAST(n AS BIGINT) FROM b1) AS n_files,
      |    CAST(0 AS BIGINT) AS dv_positions, TRUE AS base_files_kept
      |  UNION ALL
      |  SELECT 2, (SELECT count(*) FROM v2),
      |    (SELECT CAST(sum(n_chars) AS BIGINT) FROM v2),
      |    (SELECT CAST(b1.n + nb2.n AS BIGINT) FROM b1, nb2),
      |    (SELECT CAST(n AS BIGINT) FROM u2), TRUE
      |  UNION ALL
      |  SELECT 3, (SELECT count(*) FROM v3),
      |    (SELECT CAST(sum(n_chars) AS BIGINT) FROM v3),
      |    (SELECT CAST(b1.n + nb2.n + nb3.n AS BIGINT) FROM b1, nb2, nb3),
      |    (SELECT CAST(u2.n + u3.n AS BIGINT) FROM u2, u3), TRUE
      |) ORDER BY snap""".stripMargin

  /** Arbitrary-alignment duplicated-substring dedup — the full Lee '22
    * ("Deduplicating Training Data Makes Language Models Better",
    * §ExactSubstr) removal discipline: any substring of length ≥ K
    * shared by two DISTINCT documents is removed from every document
    * carrying it, at WHATEVER offset it occurs. q118's passage dedup
    * hashes fixed windows, so a copy shifted by one character slips
    * every window; here a shared run of length L ≥ K is anchored by
    * its L−K+1 overlapping K-gram hashes regardless of alignment, and
    * the per-doc union of hit intervals [i, i+K−1] (merged while gaps
    * ≤ K — the bidirectional extension, done by one lag() instead of
    * a suffix array) yields the maximal spans to cut.
    *
    * The gate PLANTS arbitrary-offset overlaps: for doc_id % 23 == 5 a
    * synthetic doc (id+4000000) embeds substr(text, 2 + id%7,
    * 80 + id%13) between a unique id-bearing prefix and tail — the
    * duplicated run starts at offset 2..8 in the original and at a
    * varying id-length-dependent offset in the copy, so NO fixed
    * window alignment can catch it. Output per doc: span count,
    * removed/kept chars, and md5 OF THE TRIMMED TEXT — the oracle
    * reconstructs every surviving byte, so a one-off span boundary is
    * a hash mismatch. Scale: the position explode is the q218
    * winnowing cost (~n_chars rows/doc, text never shuffles — only
    * 8-byte gram hashes do); spans per doc are bounded by hits; the
    * trim is one HOF pass over each doc's span list. Output rows =
    * corpus size, linear in true-duplicate mass.
    */
  /** K-gram position hashes of `corpus(doc_id, text, len)` — one row
    * per (doc, start offset): (doc_id, i, h). The md5-prefix hash is
    * the q218 cross-engine discipline.
    */
  protected def substrGrams(corpus: DataFrame, K: Int): DataFrame =
    corpus.filter(col("len") >= K)
      .select(col("doc_id"),
        explode(sequence(lit(1), (col("len") - (K - 1)).cast("int")))
          .as("i"),
        col("text"))
      .select(col("doc_id"), col("i"),
        conv(substring(md5(col("text").substr(col("i"), lit(K))
          .cast("binary")), 1, 15), 16, 10).cast("long").as("h"))

  /** Span-union + trim over `hits(doc_id, i)` — the K-gram hit offsets
    * of `corpus(doc_id, text, len)`: merges hit intervals [i, i+K-1]
    * into maximal spans (gap > K breaks a span), cuts them from the
    * text, and returns one row per corpus doc:
    * (doc_id, n_spans, dup_chars, kept_chars, trimmed_md5).
    */
  protected def substrTrim(corpus: DataFrame, hits: DataFrame,
                           K: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val spans = hits
      .withColumn("prev", lag(col("i"), 1).over(w))
      .withColumn("ns",
        when(col("prev").isNull || col("i") - col("prev") > K, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("sid"))
      .agg(min(col("i")).cast("long").as("s"),
        (max(col("i")) + (K - 1)).cast("long").as("e"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e"))))
          .as("spans"),
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("dup_chars"))
    // trim: concatenate the uncovered segments (before each span, then
    // the tail) — index-based transform over the sorted span list
    // (prev span end looked up by position; spans are disjoint with
    // gaps > 0, so segment lengths are never negative)
    def prevE(i: org.apache.spark.sql.Column) =
      when(i === 0, lit(0L))
        .otherwise(element_at(col("spans"), i).getField("e"))
    val segs = transform(col("spans"), (sp, i) =>
      col("text").substr((prevE(i) + 1).cast("int"),
        (sp.getField("s") - prevE(i) - 1).cast("int")))
    val lastE = element_at(col("spans"), size(col("spans"))).getField("e")
    val trimmed = concat(concat_ws("", segs),
      col("text").substr((lastE + 1).cast("int"),
        (col("len") - lastE).cast("int")))
    corpus.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        (col("len") - coalesce(col("dup_chars"), lit(0L)))
          .as("kept_chars"),
        md5(when(col("n_spans").isNull, col("text"))
          .otherwise(trimmed).cast("binary")).as("trimmed_md5"))
      .orderBy(col("doc_id"))
  }

  val exactSubstrDedup: Q = (s, dir) => {
    val K = 40
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val planted = base.filter(pmod(col("doc_id"), lit(23)) === 5)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        concat(lit("P"), col("doc_id").cast("string"), lit(":"),
          col("text").substr((lit(2) + pmod(col("doc_id"), lit(7)))
            .cast("int"),
            (lit(80) + pmod(col("doc_id"), lit(13))).cast("int")),
          lit("#"), col("doc_id").cast("string")).as("text"))
    val corpus = Dedup.pin(base.unionAll(planted)
      .withColumn("len", length(col("text")).cast("long")))
    val pos = Dedup.pin(substrGrams(corpus, K))
    // cross-document grams only (q218 discipline): a doc's internal
    // repetition is not a duplication candidate
    val freq = pos.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
    val hits = pos.join(freq.select(col("h")), Seq("h"), "left_semi")
      .select(col("doc_id"), col("i"))
    substrTrim(corpus, hits, K)
  }

  /** Predicate-FILTERED ANN serving (VERDICT r13 missing #3):
    * production vector search is almost always "top-k among rows
    * matching a predicate", and the filter changes the recall math —
    * the q325 dilution lesson applied to predicates. On the
    * cell-partitioned IVF store (q301's layout; `pruned` pins the
    * PartitionFilters proof that each query opened only its 2 probe
    * cells), candidates are ranked by an APPROXIMATE distance (prefix-
    * 16 of the 64-dim quantized vector — the dimension-reduction
    * stand-in for ADC) into a shortlist, exact-re-ranked, then
    * filtered. Three strategies per predicate, at two selectivities
    * (label=2, sel≈0.1; vec_id%25==3, sel≈0.04):
    *   post_fixed   shortlist 10 over ALL candidates, filter after —
    *                the shortlist is ~90%/96% non-matching, so the
    *                matching survivors are few: recall starves
    *   post_scaled  shortlist 10/sel (100 / 250), filter after — the
    *                width buys back what the filter dilutes
    *   pre          filter BEFORE the shortlist (index stores the
    *                attribute): width 10 suffices again
    * plus the unfiltered baseline. Recall is micro-averaged against
    * the post-filtered exact top-10 over the FULL corpus (brute side
    * bounded by the ≤10-query sample, q320 discipline), so the curve
    * also carries the probe-miss term all strategies share. Scale:
    * one corpus pass assigns+writes cells; each query reads nprobe
    * directories; the strategy grid is a broadcast cross join over
    * ONE candidate pass, not 7 reruns.
    */
  val filteredAnn: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExpressions
    import s.implicits._
    val NC = 8; val TOPK = 10
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val qv = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val cents: Array[(Long, Array[Float])] = emb.filter(col("vec_id") < NC)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    if (cents.isEmpty) {
      emb.select(lit("").as("pred"), lit("").as("strategy"),
        lit(0).as("width"), lit(0L).as("n_queries"),
        lit(0L).as("sum_truth"), lit(0L).as("sum_hits"),
        lit(0.0).as("recall"), lit(true).as("pruned"))
        .filter(lit(false))
    } else {
      val cellIds = cents.map(_._1)
      val cvs = cents.map(_._2)
      val assigned = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("embedding"), col("label"),
          VectorExpressions.nearest_cells(col("embedding"), cellIds, cvs, 1)
            .getItem(0).as("cell"))
      val tmp = scratch("graft_filtered_ann").toString
      Writers.parquet(assigned, s"$tmp/corpus", partitionBy = Seq("cell"))
      val queries = Dedup.pin(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), qv.as("qq"),
          VectorExpressions.nearest_cells(col("embedding"), cellIds, cvs, 2)
            .as("cells")))
      val qprobe = queries.select(col("query_id"), col("qq"),
        explode(col("cells")).as("cell"))
      val probeCells = qprobe.select(col("cell")).distinct()
        .collect().map(_.getLong(0)).sorted
      val probe = if (probeCells.isEmpty) lit(false)
        else col("cell").isin(probeCells: _*)
      val rd = Readers.parquetWithSchema(s, s"$tmp/corpus", assigned.schema)
        .filter(probe)
      val pruned = "PartitionFilters: \\[[^\\]]*(IN|INSET)[^\\]]*".r
        .findFirstIn(rd.queryExecution.executedPlan.toString).isDefined
      // fused native L2² over the 16-dim prefix / full vector (round 14)
      // — identical integer sums to the former zip_with/aggregate trees
      val approxD = VectorExpressions.grid_l2sq(col("qq"), col("nv"), 16)
      val exactD = VectorExpressions.grid_l2sq(col("qq"), col("nv"))
      // predicate match flags ride with every candidate row
      def matches(pred: org.apache.spark.sql.Column) =
        pred === "none" ||
          (pred === "label2" && col("label") === 2) ||
          (pred === "rare" && pmod(col("neighbor_id"), lit(25)) === 3)
      val cand = Dedup.pin(rd
        .select(col("vec_id").as("neighbor_id"), qv.as("nv"),
          col("label"), col("cell"))
        .join(broadcast(qprobe), Seq("cell"))
        .select(col("query_id"), col("neighbor_id"), col("label"),
          approxD.as("approx_dist"), exactD.as("exact_dist")))
      val configs = Seq(
        ("none", "base", 10), ("label2", "post_fixed", 10),
        ("label2", "post_scaled", 100), ("label2", "pre", 10),
        ("rare", "post_fixed", 10), ("rare", "post_scaled", 250),
        ("rare", "pre", 10)).toDF("pred", "strategy", "width")
      val candC = cand.crossJoin(broadcast(configs))
        .withColumn("m", matches(col("pred")))
        // pre-filter strategies admit only matching rows INTO the
        // shortlist; post-filter strategies rank everything
        .filter(col("strategy") =!= "pre" || col("m"))
      val wA = Window.partitionBy(col("pred"), col("strategy"),
        col("query_id")).orderBy(col("approx_dist"), col("neighbor_id"))
      val wE = Window.partitionBy(col("pred"), col("strategy"),
        col("query_id")).orderBy(col("exact_dist"), col("neighbor_id"))
      val served = candC.withColumn("arank", row_number().over(wA))
        .filter(col("arank") <= col("width"))
        .filter(col("m")) // the predicate applies to every served row
        .withColumn("rank", row_number().over(wE))
        .filter(col("rank") <= TOPK)
        .select(col("pred"), col("strategy"), col("query_id"),
          col("neighbor_id"))
      // exact truth: post-filtered brute force over the FULL corpus,
      // per predicate — bounded by the ≤10-query sample
      val preds = Seq("none", "label2", "rare").toDF("pred")
      val wX = Window.partitionBy(col("pred"), col("query_id"))
        .orderBy(col("exact_dist"), col("neighbor_id"))
      val truth = Dedup.pin(emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("neighbor_id"), qv.as("nv"), col("label"))
        .crossJoin(broadcast(queries.select(col("query_id"), col("qq"))))
        .crossJoin(broadcast(preds))
        .filter(matches(col("pred")))
        .withColumn("exact_dist", exactD)
        .withColumn("rank", row_number().over(wX))
        .filter(col("rank") <= TOPK)
        .select(col("pred"), col("query_id"), col("neighbor_id")))
      val truthN = truth.groupBy(col("pred"), col("query_id"))
        .agg(count(lit(1)).as("n_truth"))
      val hits = served.join(truth, Seq("pred", "query_id", "neighbor_id"))
        .groupBy(col("pred"), col("strategy"), col("query_id"))
        .agg(count(lit(1)).as("h"))
      configs.join(truthN, Seq("pred"))
        .join(hits, Seq("pred", "strategy", "query_id"), "left")
        .groupBy(col("pred"), col("strategy"), col("width"))
        .agg(count(lit(1)).as("n_queries"),
          sum(col("n_truth")).as("sum_truth"),
          sum(coalesce(col("h"), lit(0L))).as("sum_hits"))
        .select(col("pred"), col("strategy"), col("width"),
          col("n_queries"), col("sum_truth"), col("sum_hits"),
          round(col("sum_hits").cast("double")
            / col("sum_truth").cast("double"), 6).as("recall"),
          lit(pruned).as("pruned"))
        .orderBy(col("pred"), col("strategy"))
    }
  }

  val filteredAnnSql: String =
    """WITH emb AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |cents AS (SELECT vec_id AS cell, e AS ce FROM emb WHERE vec_id < 8),
      |corpus AS (SELECT vec_id, label, e, qv FROM emb WHERE vec_id >= 10),
      |qs AS (SELECT vec_id, e, qv FROM emb WHERE vec_id < 10),
      |cc AS (SELECT vec_id, label, qv, cell FROM (
      |  SELECT r.vec_id, r.label, r.qv, c.cell, row_number() OVER (
      |      PARTITION BY r.vec_id ORDER BY
      |      list_dot_product(r.e, c.ce) /
      |        (sqrt(list_dot_product(r.e, r.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
      |  FROM corpus r CROSS JOIN cents c) WHERE rn = 1),
      |qp AS (SELECT vec_id AS query_id, qv AS qq, cell FROM (
      |  SELECT q.vec_id, q.qv, c.cell, row_number() OVER (
      |      PARTITION BY q.vec_id ORDER BY
      |      list_dot_product(q.e, c.ce) /
      |        (sqrt(list_dot_product(q.e, q.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
      |  FROM qs q CROSS JOIN cents c) WHERE rn <= 2),
      |cand AS (SELECT qp.query_id, v.vec_id AS neighbor_id, v.label,
      |    CAST(list_sum(list_transform(generate_series(1, 16), i ->
      |      (qp.qq[i] - v.qv[i]) * (qp.qq[i] - v.qv[i]))) AS BIGINT)
      |      AS approx_dist,
      |    CAST(list_sum(list_transform(generate_series(1, 64), i ->
      |      (qp.qq[i] - v.qv[i]) * (qp.qq[i] - v.qv[i]))) AS BIGINT)
      |      AS exact_dist
      |  FROM qp JOIN cc v USING (cell)),
      |cfg AS (SELECT * FROM (VALUES ('none', 'base', 10),
      |    ('label2', 'post_fixed', 10), ('label2', 'post_scaled', 100),
      |    ('label2', 'pre', 10), ('rare', 'post_fixed', 10),
      |    ('rare', 'post_scaled', 250), ('rare', 'pre', 10))
      |  t(pred, strategy, width)),
      |candc AS (SELECT cand.*, cfg.pred, cfg.strategy, cfg.width,
      |    (pred = 'none' OR (pred = 'label2' AND label = 2)
      |     OR (pred = 'rare' AND neighbor_id % 25 = 3)) AS m
      |  FROM cand CROSS JOIN cfg
      |  WHERE strategy <> 'pre'
      |    OR (pred = 'none' OR (pred = 'label2' AND label = 2)
      |        OR (pred = 'rare' AND neighbor_id % 25 = 3))),
      |short AS (SELECT * FROM (SELECT candc.*, row_number() OVER (
      |    PARTITION BY pred, strategy, query_id
      |    ORDER BY approx_dist, neighbor_id) AS arank FROM candc)
      |  WHERE arank <= width),
      |served AS (SELECT pred, strategy, query_id, neighbor_id
      |  FROM (SELECT short.*, row_number() OVER (
      |      PARTITION BY pred, strategy, query_id
      |      ORDER BY exact_dist, neighbor_id) AS rank
      |    FROM short WHERE m)
      |  WHERE rank <= 10),
      |preds AS (SELECT unnest(['none', 'label2', 'rare']) AS pred),
      |truth AS (SELECT pred, query_id, neighbor_id FROM (
      |  SELECT p.pred, q.vec_id AS query_id, r.vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY p.pred, q.vec_id ORDER BY
      |      CAST(list_sum(list_transform(generate_series(1, 64), i ->
      |        (q.qv[i] - r.qv[i]) * (q.qv[i] - r.qv[i]))) AS BIGINT),
      |      r.vec_id) AS rank
      |  FROM qs q CROSS JOIN corpus r CROSS JOIN preds p
      |  WHERE (p.pred = 'none' OR (p.pred = 'label2' AND r.label = 2)
      |    OR (p.pred = 'rare' AND r.vec_id % 25 = 3)))
      |  WHERE rank <= 10),
      |tn AS (SELECT pred, query_id, count(*) AS n_truth FROM truth
      |  GROUP BY 1, 2),
      |hits AS (SELECT s.pred, s.strategy, s.query_id, count(*) AS h
      |  FROM served s JOIN truth USING (pred, query_id, neighbor_id)
      |  GROUP BY 1, 2, 3)
      |SELECT cfg.pred, cfg.strategy, cfg.width,
      |  count(*) AS n_queries,
      |  CAST(sum(tn.n_truth) AS BIGINT) AS sum_truth,
      |  CAST(sum(coalesce(hits.h, 0)) AS BIGINT) AS sum_hits,
      |  round(CAST(sum(coalesce(hits.h, 0)) AS DOUBLE)
      |    / CAST(sum(tn.n_truth) AS DOUBLE), 6) AS recall,
      |  TRUE AS pruned
      |FROM cfg JOIN tn USING (pred)
      |LEFT JOIN hits ON hits.pred = cfg.pred
      |  AND hits.strategy = cfg.strategy AND hits.query_id = tn.query_id
      |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin

  /** UPSERT-aware change feed — q354's dual-carrier reader composed
    * over q363's MoR upsert commits: an UPDATE must surface as a
    * D(old)+I(new) pair AT THE SAME VERSION (the CDC
    * update_preimage/postimage contract), because the commit carries
    * it as a DV position (the D) plus an appended row (the I); an
    * INSERT surfaces as a bare I. A file-list-diffing consumer would
    * emit the I and silently miss the D — the replica would keep both
    * copies. `n_files_opened` pins the read bound per step: appended
    * files + DV-touched files, never the table. The v3 batch updates
    * rows that v2 itself inserted or updated, so the feed must find
    * those D-positions on v2's APPENDED files, not the base — the
    * generation arithmetic rides in the oracle.
    */
  val upsertChangeFeed: Q = (s, dir) => {
    val store = scratch("graft_upcdc").toString + "/docs"
    val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
      pmod(col("doc_id"), lit(8)).cast("int").as("bucket"))
    d.repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(store)
    SnapshotLog.commit(store, listBucketFiles(store))
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
    dvFeedStep(s, store, 1).unionAll(dvFeedStep(s, store, v2))
      .unionAll(dvFeedStep(s, store, v3))
      .orderBy(col("src_version"), col("op"), col("doc_id"))
  }

  val upsertChangeFeedSql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |i2 AS (SELECT doc_id + 1000000 AS doc_id FROM d
      |  WHERE doc_id % 50 = 0),
      |u2 AS (SELECT doc_id FROM d WHERE doc_id % 5 = 2),
      |b2 AS (SELECT doc_id FROM u2 UNION SELECT doc_id FROM i2),
      |v2 AS (SELECT doc_id FROM d UNION SELECT doc_id FROM i2),
      |i3 AS (SELECT doc_id + 2000000 AS doc_id FROM d
      |  WHERE doc_id % 60 = 0),
      |u3 AS (SELECT doc_id FROM v2 WHERE doc_id % 7 = 3),
      |b3 AS (SELECT doc_id FROM u3 UNION SELECT doc_id FROM i3),
      |nf1 AS (SELECT count(DISTINCT doc_id % 8) AS n FROM d),
      |nf2 AS (SELECT (SELECT count(DISTINCT doc_id % 8) FROM b2)
      |    + (SELECT count(DISTINCT doc_id % 8) FROM u2) AS n),
      |nf3 AS (SELECT (SELECT count(DISTINCT doc_id % 8) FROM b3)
      |    + (SELECT count(DISTINCT
      |        (CASE WHEN doc_id IN (SELECT doc_id FROM b2)
      |         THEN 8 ELSE 0 END) + doc_id % 8) FROM u3) AS n)
      |SELECT * FROM (
      |  SELECT 'I' AS op, doc_id, 1 AS src_version,
      |    (SELECT CAST(n AS BIGINT) FROM nf1) AS n_files_opened FROM d
      |  UNION ALL SELECT 'I', doc_id, 2,
      |    (SELECT CAST(n AS BIGINT) FROM nf2) FROM b2
      |  UNION ALL SELECT 'D', doc_id, 2,
      |    (SELECT CAST(n AS BIGINT) FROM nf2) FROM u2
      |  UNION ALL SELECT 'I', doc_id, 3,
      |    (SELECT CAST(n AS BIGINT) FROM nf3) FROM b3
      |  UNION ALL SELECT 'D', doc_id, 3,
      |    (SELECT CAST(n AS BIGINT) FROM nf3) FROM u3
      |) ORDER BY src_version, op, doc_id""".stripMargin

  /** INCREMENTAL exact-substring dedup — the day-2 form of q365 and
    * the operation a production ingest actually runs: trim INCOMING
    * documents of any ≥K-char substring already present in the
    * EXISTING corpus, without reprocessing the corpus. Day-2 arrivals
    * are planted fragments of day-1 docs at arbitrary offsets (the
    * q365 generator) plus genuinely-fresh docs (vowels digit-mapped —
    * deterministically novel text, mirrored by the oracle's
    * translate()); day-1's gram index is built once (the fixture's
    * linear term — in production it persists between days), and day-2
    * processing is gram-hashing of the Δ only + one semi-join against
    * the index. Day-2-internal duplication is deliberately out of
    * scope here (that is q365 run over the batch); the contract is
    * "nothing that already exists enters the training set twice".
    * Scale: day-2 cost ∝ Δ chars, never corpus size — the pin that
    * makes nightly crawls affordable at 100 TB.
    */
  val incrSubstrDedup: Q = (s, dir) => {
    val K = 40
    val day1 = t(s, dir, "documents").select(col("doc_id"), col("text"))
      .withColumn("len", length(col("text")).cast("long"))
    val planted = day1.filter(pmod(col("doc_id"), lit(23)) === 5)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        concat(lit("P"), col("doc_id").cast("string"), lit(":"),
          col("text").substr((lit(2) + pmod(col("doc_id"), lit(7)))
            .cast("int"),
            (lit(80) + pmod(col("doc_id"), lit(13))).cast("int")),
          lit("#"), col("doc_id").cast("string")).as("text"))
    val freshDocs = day1.filter(pmod(col("doc_id"), lit(29)) === 11)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat(lit("N"), col("doc_id").cast("string"), lit(":"),
          translate(col("text"), "aeiou", "01234")).as("text"))
    val day2 = Dedup.pin(planted.unionAll(freshDocs)
      .withColumn("len", length(col("text")).cast("long")))
    // the existing-corpus gram index: built once, persists across days
    val idx = substrGrams(day1, K).select(col("h")).distinct()
    val hits = substrGrams(day2, K)
      .join(idx, Seq("h"), "left_semi")
      .select(col("doc_id"), col("i"))
    substrTrim(day2, hits, K)
  }

  val incrSubstrDedupSql: String =
    """WITH d1 AS (SELECT doc_id, text FROM documents),
      |pl AS (SELECT doc_id + 4000000 AS doc_id,
      |    'P' || CAST(doc_id AS VARCHAR) || ':' ||
      |    substr(text, CAST(2 + doc_id % 7 AS INTEGER),
      |      CAST(80 + doc_id % 13 AS INTEGER)) ||
      |    '#' || CAST(doc_id AS VARCHAR) AS text
      |  FROM d1 WHERE doc_id % 23 = 5),
      |fr AS (SELECT doc_id + 5000000 AS doc_id,
      |    'N' || CAST(doc_id AS VARCHAR) || ':' ||
      |    translate(text, 'aeiou', '01234') AS text
      |  FROM d1 WHERE doc_id % 29 = 11),
      |c AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
      |  FROM (SELECT * FROM pl UNION ALL SELECT * FROM fr)),
      |idx AS (SELECT DISTINCT
      |    ('0x' || substr(md5(substr(text, i, 40)), 1, 15))::BIGINT AS h
      |  FROM d1, unnest(generate_series(1,
      |    CAST(length(text) - 39 AS INTEGER))) AS t(i)
      |  WHERE length(text) >= 40),
      |hit AS (SELECT doc_id, i FROM (
      |  SELECT doc_id, i,
      |    ('0x' || substr(md5(substr(text, i, 40)), 1, 15))::BIGINT AS h
      |  FROM c, unnest(generate_series(1, CAST(len - 39 AS INTEGER)))
      |    AS t(i)
      |  WHERE len >= 40)
      |  WHERE h IN (SELECT h FROM idx)),
      |sp0 AS (SELECT doc_id, i,
      |    CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
      |      OR i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 40
      |      THEN 1 ELSE 0 END AS ns
      |  FROM hit),
      |sp1 AS (SELECT doc_id, i,
      |    sum(ns) OVER (PARTITION BY doc_id ORDER BY i) AS sid FROM sp0),
      |spans AS (SELECT doc_id, sid, min(i) AS s, max(i) + 39 AS e
      |  FROM sp1 GROUP BY doc_id, sid),
      |seg AS (
      |  SELECT doc_id,
      |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1
      |      AS st,
      |    s - 1 AS en
      |  FROM spans
      |  UNION ALL
      |  SELECT sp.doc_id, max(sp.e) + 1, c.len
      |  FROM spans sp JOIN c USING (doc_id) GROUP BY sp.doc_id, c.len),
      |trm AS (SELECT c.doc_id,
      |    string_agg(substr(c.text, CAST(seg.st AS INTEGER),
      |      CAST(seg.en - seg.st + 1 AS INTEGER)), '' ORDER BY seg.st)
      |      AS trimmed
      |  FROM c JOIN seg USING (doc_id) WHERE seg.en >= seg.st
      |  GROUP BY c.doc_id),
      |cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      |    CAST(sum(e - s + 1) AS BIGINT) AS dup FROM spans
      |  GROUP BY doc_id)
      |SELECT c.doc_id, coalesce(cov.n_spans, 0) AS n_spans,
      |  coalesce(cov.dup, 0) AS dup_chars,
      |  c.len - coalesce(cov.dup, 0) AS kept_chars,
      |  md5(CASE WHEN cov.doc_id IS NULL THEN c.text
      |    ELSE coalesce(trm.trimmed, '') END) AS trimmed_md5
      |FROM c LEFT JOIN cov USING (doc_id) LEFT JOIN trm USING (doc_id)
      |ORDER BY c.doc_id""".stripMargin

  val exactSubstrDedupSql: String =
    """WITH b AS (SELECT doc_id, text FROM documents),
      |pl AS (SELECT doc_id + 4000000 AS doc_id,
      |    'P' || CAST(doc_id AS VARCHAR) || ':' ||
      |    substr(text, CAST(2 + doc_id % 7 AS INTEGER),
      |      CAST(80 + doc_id % 13 AS INTEGER)) ||
      |    '#' || CAST(doc_id AS VARCHAR) AS text
      |  FROM b WHERE doc_id % 23 = 5),
      |c AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
      |  FROM (SELECT * FROM b UNION ALL SELECT * FROM pl)),
      |pos AS (SELECT doc_id, i,
      |    ('0x' || substr(md5(substr(text, i, 40)), 1, 15))::BIGINT AS h
      |  FROM c, unnest(generate_series(1, CAST(len - 39 AS INTEGER)))
      |    AS t(i)
      |  WHERE len >= 40),
      |freq AS (SELECT h FROM (SELECT DISTINCT h, doc_id FROM pos)
      |  GROUP BY h HAVING count(*) >= 2),
      |hit AS (SELECT doc_id, i FROM pos WHERE h IN (SELECT h FROM freq)),
      |sp0 AS (SELECT doc_id, i,
      |    CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
      |      OR i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 40
      |      THEN 1 ELSE 0 END AS ns
      |  FROM hit),
      |sp1 AS (SELECT doc_id, i,
      |    sum(ns) OVER (PARTITION BY doc_id ORDER BY i) AS sid FROM sp0),
      |spans AS (SELECT doc_id, sid, min(i) AS s, max(i) + 39 AS e
      |  FROM sp1 GROUP BY doc_id, sid),
      |seg AS (
      |  SELECT doc_id,
      |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1
      |      AS st,
      |    s - 1 AS en
      |  FROM spans
      |  UNION ALL
      |  SELECT sp.doc_id, max(sp.e) + 1, c.len
      |  FROM spans sp JOIN c USING (doc_id) GROUP BY sp.doc_id, c.len),
      |trm AS (SELECT c.doc_id,
      |    string_agg(substr(c.text, CAST(seg.st AS INTEGER),
      |      CAST(seg.en - seg.st + 1 AS INTEGER)), '' ORDER BY seg.st)
      |      AS trimmed
      |  FROM c JOIN seg USING (doc_id) WHERE seg.en >= seg.st
      |  GROUP BY c.doc_id),
      |cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      |    CAST(sum(e - s + 1) AS BIGINT) AS dup FROM spans
      |  GROUP BY doc_id)
      |SELECT c.doc_id, coalesce(cov.n_spans, 0) AS n_spans,
      |  coalesce(cov.dup, 0) AS dup_chars,
      |  c.len - coalesce(cov.dup, 0) AS kept_chars,
      |  md5(CASE WHEN cov.doc_id IS NULL THEN c.text
      |    ELSE coalesce(trm.trimmed, '') END) AS trimmed_md5
      |FROM c LEFT JOIN cov USING (doc_id) LEFT JOIN trm USING (doc_id)
      |ORDER BY c.doc_id""".stripMargin
}
