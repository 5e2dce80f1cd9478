package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{Readers, Writers}
import graft.ops.{Dedup, Layout, Multimodal, Ranks, SimSearch, Skew, TextStats, TopK}
import graft.transform.{Canonicalize, Enrich, Harmonize, Normalize}
import graft.quality.Expectations._
import graft.streaming.{EventStreams, Staging}

/** Round-6/7 additions, part B: mergeable sketches (HLL, CMS, Misra–Gries), graph ops, heavy hitters.
  *
  * Mechanical split of the former single-file catalog (r10 verdict
  * hygiene note): one trait per family, linear chain, zero behavior
  * change. `Queries` mixes the chain in; entries register in
  * `Queries.all` / `Queries.oracles`.
  */
trait QueriesSketches extends QueriesCorpusStats {
  /** HyperLogLog distinct-token estimate per source (Flajolet et al. '07)
    * — the mergeable cardinality sketch every corpus dashboard runs
    * instead of count(DISTINCT): m=64 registers, register = low 6 bits of
    * a 60-bit md5 hash, rank = leading-zero count of the remaining 54
    * bits (+1). The whole sketch is DETERMINISTIC — register index and
    * rank are pure functions of the md5 hex string, and the MSB position
    * is computed with integer/string ops (`length(bin(w))`), never
    * floating log2, so the DuckDB oracle rebuilds register-identical
    * state and the gate hash-checks an approximate-cardinality pipeline
    * exactly (the q22 FNV-vs-md5 discipline applied to sketching).
    * Σ2^(−M_j) is carried as the EXACT integer Σ2^(55−M_j) (s_total), so
    * the raw estimate α·m²/Σ is one IEEE-exactly-rounded multiply chain
    * plus one divide. The small-range regime (raw ≤ 2.5m with empty
    * registers) applies Flajolet's linear-counting correction
    * m·ln(m/V) — cross-engine ln is already proven by the q126/q183
    * gates, and round(·,2) absorbs any last-ulp libm delta. Exact
    * distinct rides alongside for the error column. Scale: state is 64
    * registers per source — a groupBy whose frame is |sources|×64 rows
    * regardless of corpus size; the exact-distinct column is the gate's
    * ground truth and would be dropped at 100 TB (it IS the expensive
    * distinct the sketch replaces).
    */
  val hllDistinct: Q = (s, dir) => {
    val toks = t(s, dir, "documents")
      .select(col("source"), explode(TextStats.tokens(lower(col("text")))).as("tokn"))
    val h = conv(substring(md5(col("tokn")), 1, 15), 16, 10).cast("long")
    val w = shiftrightunsigned(h, 6)
    val regs = toks
      .select(col("source"), h.bitwiseAND(lit(63L)).as("reg"),
        when(w === 0, lit(55)).otherwise(lit(55) - length(bin(w))).as("rho"))
      .groupBy(col("source"), col("reg"))
      .agg(max(col("rho")).as("mj"))
    val per = regs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_regs"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mj AS INT))")).as("s_present"))
      .withColumn("s_total",
        col("s_present") + (lit(64L) - col("n_regs")) * lit(1L << 55))
      .withColumn("raw_est",
        lit(0.709) * lit(4096.0) * lit(math.pow(2, 55))
          / col("s_total").cast("double"))
      .withColumn("v_zero", lit(64L) - col("n_regs"))
      .withColumn("est_distinct",
        round(when(col("raw_est") <= 160.0 && col("v_zero") > 0,
          lit(64.0) * log(lit(64.0) / col("v_zero").cast("double")))
          .otherwise(col("raw_est")), 2))
    val exact = toks.groupBy(col("source"))
      .agg(countDistinct(col("tokn")).as("exact_distinct"))
    per.join(exact, Seq("source"))
      .select(col("source"), col("n_regs"), col("s_total"),
        col("est_distinct"), col("exact_distinct"),
        round((col("est_distinct") - col("exact_distinct"))
          / col("exact_distinct").cast("double") * 100, 2).as("err_pct"))
      .orderBy(col("source"))
  }

  val hllDistinctSql: String =
    """WITH tok AS (SELECT source,
      |    unnest(regexp_extract_all(lower(text), '\S+')) AS tokn
      |  FROM documents),
      |h AS (SELECT source, tokn,
      |    ('0x'||substr(md5(tokn),1,15))::BIGINT AS h FROM tok),
      |r AS (SELECT source, h & 63 AS reg,
      |    CASE WHEN (h >> 6) = 0 THEN 55
      |         ELSE 55 - length(bin(h >> 6)) END AS rho FROM h),
      |m AS (SELECT source, reg, max(rho) AS mj FROM r GROUP BY source, reg),
      |p AS (SELECT source, CAST(count(*) AS BIGINT) AS n_regs,
      |    CAST(sum(CAST(1 AS BIGINT) << (55 - mj)) AS BIGINT) AS s_present
      |  FROM m GROUP BY source),
      |p2 AS (SELECT source, n_regs,
      |    s_present + (64 - n_regs) * (CAST(1 AS BIGINT) << 55) AS s_total
      |  FROM p),
      |p3 AS (SELECT source, n_regs, s_total,
      |    round(CASE WHEN raw_est <= 160.0 AND (64 - n_regs) > 0
      |      THEN 64.0 * ln(CAST(64 AS DOUBLE) / (64 - n_regs))
      |      ELSE raw_est END, 2) AS est_distinct
      |  FROM (SELECT source, n_regs, s_total,
      |      CAST(0.709 AS DOUBLE) * 4096.0 * pow(2, 55)
      |        / CAST(s_total AS DOUBLE) AS raw_est FROM p2)),
      |e AS (SELECT source, CAST(count(DISTINCT tokn) AS BIGINT) AS exact_distinct
      |  FROM tok GROUP BY source)
      |SELECT p3.source, n_regs, s_total, est_distinct, exact_distinct,
      |  round((est_distinct - exact_distinct)
      |    / CAST(exact_distinct AS DOUBLE) * 100, 2) AS err_pct
      |FROM p3 JOIN e ON p3.source = e.source
      |ORDER BY p3.source""".stripMargin

  /** Asymmetric containment pairs — the quote/superset detector Jaccard
    * misses by construction: a short document wholly embedded in a long
    * one has tiny Jaccard (union is dominated by the long doc) but
    * containment |A∩B|/|A| ≈ 1. Profile = per-doc distinct char
    * 13-grams, DF-filtered to grams shared by ≤ 20 docs (a boilerplate
    * gram puts every pair of its holders into the candidate join while
    * carrying no evidence two specific docs overlap — the DF cap bounds
    * candidate fan-out per gram at 20², the q128 blocking discipline).
    * Candidates are collision-driven (explode → join on the gram), never
    * all-pairs; emission is ORDERED (id_a = the contained side), both
    * directions of an asymmetric pair surface independently. Scale: one
    * shuffle keyed on the gram, per-gram fan-out capped by the DF
    * filter, output bounded by genuinely-overlapping pairs.
    */
  val containmentPairs: Q = (s, dir) => {
    val docs = t(s, dir, "documents").filter(length(col("text")) >= 13)
    // grams md5-hashed to 8-byte longs BEFORE any shuffle (the q165
    // discipline): the DF agg, the rare semi-join, and the pair self-join
    // all key on a long instead of a 13-char string; the oracle applies
    // the identical hash, so any collision collides identically on both
    // engines and the gate stays exact. The hash set comes from the fused
    // Md5WinnowSet expression at w=1 (distinct md5 gram hashes in one
    // generated-code pass — r14: the explode+md5+conv tree plus a
    // frame-level distinct() shuffle paid ~10× around the inherent md5
    // work; per-doc distinct is now computed inside the expression, so no
    // post-hash shuffle is needed at all).
    val grams = docs.select(col("doc_id").as("id"),
        explode(graft.functions.WinnowFingerprints
          .md5_winnow_set(col("text"), 13, 1)).as("gram"))
    val rare = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 20).select(col("gram"))
    val g = Dedup.pin(grams.join(rare, Seq("gram")))
    val sizes = g.groupBy(col("id")).agg(count(lit(1)).as("n"))
    g.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .withColumn("containment", col("n_shared").cast("double") / col("n_a"))
      .filter(col("containment") >= 0.8)
      .select(col("id_a"), col("id_b"), col("n_shared"),
        round(col("containment"), 6).as("containment"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val containmentPairsSql: String =
    """WITH pos AS (SELECT doc_id, text,
      |    unnest(generate_series(1, length(text)-12)) AS i
      |  FROM documents WHERE length(text) >= 13),
      |gr AS (SELECT DISTINCT doc_id AS id,
      |    ('0x'||substr(md5(substr(text, CAST(i AS INTEGER), 13)),1,15))::BIGINT
      |      AS gram FROM pos),
      |rare AS (SELECT gram FROM gr GROUP BY gram HAVING count(*) <= 20),
      |g AS (SELECT id, gr.gram FROM gr JOIN rare ON gr.gram = rare.gram),
      |sz AS (SELECT id, count(*) AS n FROM g GROUP BY id),
      |sh AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
      |  FROM g a JOIN g b ON a.gram = b.gram AND a.id <> b.id
      |  GROUP BY a.id, b.id)
      |SELECT id_a, id_b, n_shared,
      |  round(CAST(n_shared AS DOUBLE) / n, 6) AS containment
      |FROM sh JOIN sz ON sh.id_a = sz.id
      |WHERE CAST(n_shared AS DOUBLE) / n >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  /** MinHash estimator calibration audit — the accuracy side of the q21
    * recall gate: for every co-shingle pair with true Jaccard ≥ 0.2, the
    * k=32 one-permutation-per-function MinHash estimate (fraction of
    * matching signature components) is compared against the exact
    * token-3-shingle Jaccard, and pairs are bucketed by signed estimator
    * error (width 1/8). The signature is md5-keyed per hash function
    * (`md5(i || '|' || shingle)`), so the DuckDB oracle recomputes every
    * signature component bit-for-bit — the estimator itself is under
    * hash-check, not just the candidate recall. E[est] = J and
    * Var = J(1−J)/k (Broder '97); the bucket histogram is the empirical
    * check a pipeline runs before trusting an LSH threshold transfer.
    * Scale: signatures are one projection per doc (k×|shingles| hashes,
    * map-side); the exact side is the same collision-driven sparse join
    * as q21 (gate-SF ground truth, not the production path); est sums
    * are exact multiples of 1/32 so the per-bucket averages go through
    * lossless DECIMAL(18,6) accumulation.
    */
  val minhashCalibration: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val base = Dedup.pin(docs.select(col("doc_id").as("id"),
        array_distinct(Dedup.wordShingles(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0))
    val g = Dedup.pin(base.select(col("id"), explode(col("sh")).as("gram")))
    val inter = g.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("cnt"))
    val sizes = base.select(col("id"), size(col("sh")).as("n"))
    val pairs0 = Dedup.pin(inter
      .join(sizes.select(col("id").as("id1"), col("n").as("n1")), "id1")
      .join(sizes.select(col("id").as("id2"), col("n").as("n2")), "id2")
      .withColumn("exact_j",
        col("cnt").cast("double") / (col("n1") + col("n2") - col("cnt")))
      .filter(col("exact_j") >= 0.2)
      .select(col("id1"), col("id2"), col("exact_j")))
    // signatures only for docs that SURVIVE the exact-j screen (r8
    // verdict #3 — the md5 signature build was the query's hot spot and
    // most of it hashed docs no calibration pair would ever read):
    // left-semi the gram table down to candidate ids first, then hash
    // each DISTINCT shingle once (32 md5s per distinct gram, not per
    // (doc, gram) instance — the r4 lambda-interior lesson applied
    // across rows); the per-doc signature is 32 element-wise min
    // aggregates over the joined hash arrays.
    val candIds = pairs0.select(col("id1").as("id"))
      .union(pairs0.select(col("id2").as("id"))).distinct()
    val gc = Dedup.pin(g.join(broadcast(candIds), Seq("id"), "left_semi"))
    // 32 md5-keyed hashes per DISTINCT gram via the fused native
    // expression (round 14; formerly a transform/md5/conv tree — 32
    // interpreted hex-string materializations + radix parses per gram):
    // identical values, the oracle recomputes each one in SQL
    val gramHash = gc.select(col("gram")).distinct()
      .withColumn("ha",
        graft.functions.VectorExpressions.md5_keyed_hashes(col("gram"), 32))
    val withSig = gc.join(gramHash, Seq("gram"))
      .groupBy(col("id"))
      .agg(min(col("ha")(0)).as("m0"),
        (1 until 32).map(i => min(col("ha")(i)).as(s"m$i")): _*)
      .select(col("id"),
        array((0 until 32).map(i => col(s"m$i")): _*).as("sig"))
    val pairs = pairs0
      .join(withSig.select(col("id").as("id1"), col("sig").as("sig1")), "id1")
      .join(withSig.select(col("id").as("id2"), col("sig").as("sig2")), "id2")
      .withColumn("est_j",
        expr("size(filter(zip_with(sig1, sig2, (x, y) -> x = y), b -> b))")
          / lit(32.0))
    pairs
      .withColumn("bucket", floor((col("est_j") - col("exact_j")) * 8).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(round(col("exact_j"), 6).cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("avg_exact"),
        round(sum(col("est_j").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("avg_est"))
      .orderBy(col("bucket"))
  }

  val minhashCalibrationSql: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tok
      |  FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tok)-2),
      |    i -> tok[i]||' '||tok[i+1]||' '||tok[i+2])) AS sh
      |  FROM toks WHERE len(tok) >= 3),
      |sig AS (SELECT doc_id, list_transform(generate_series(0, 31),
      |    i -> list_min(list_transform(sh, s ->
      |      ('0x'||substr(md5(CAST(i AS VARCHAR)||'|'||s),1,15))::BIGINT))) AS sig
      |  FROM sh),
      |g AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
      |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS cnt
      |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id),
      |p AS (SELECT i.id1, i.id2,
      |    CAST(i.cnt AS DOUBLE) / (len(l.sh) + len(r.sh) - i.cnt) AS exact_j
      |  FROM inter i JOIN sh l ON i.id1 = l.doc_id
      |               JOIN sh r ON i.id2 = r.doc_id),
      |q AS (SELECT p.id1, p.id2, exact_j,
      |    CAST(len(list_filter(generate_series(1, 32),
      |      i -> s1.sig[i] = s2.sig[i])) AS DOUBLE) / 32.0 AS est_j
      |  FROM p JOIN sig s1 ON p.id1 = s1.doc_id
      |         JOIN sig s2 ON p.id2 = s2.doc_id
      |  WHERE exact_j >= 0.2)
      |SELECT CAST(floor((est_j - exact_j) * 8) AS BIGINT) AS bucket,
      |  count(*) AS n_pairs,
      |  round(CAST(sum(CAST(round(exact_j, 6) AS DECIMAL(18,6))) AS DOUBLE)
      |    / count(*), 6) AS avg_exact,
      |  round(CAST(sum(CAST(est_j AS DECIMAL(18,6))) AS DOUBLE)
      |    / count(*), 6) AS avg_est
      |FROM q GROUP BY 1 ORDER BY 1""".stripMargin

  /** Near-dup cluster-size distribution — the shape diagnostic read off
    * q94's components before choosing a keeper policy: how much of the
    * corpus sits in singletons vs jumbo boilerplate clusters (dedup's
    * payoff curve is exactly this histogram's tail). Built ON the
    * cluster-native path (no pair materialization anywhere), then two
    * tiny aggregations: components → sizes → histogram. Oracle: the q94
    * recursive-CTE transitive closure, aggregated the same way — the
    * histogram gate composes with the component gate rather than
    * re-proving it. Scale: both aggregations are cluster-id/size keyed,
    * frames shrink monotonically (docs → clusters → distinct sizes).
    */
  val clusterSizeHistogram: Q = (s, dir) => {
    val withFp = t(s, dir, "documents")
      .select(col("doc_id").as("id"),
        graft.functions.VectorExpressions.md5_simhash60(
          TextStats.tokens(lower(col("text")))).as("fp"))
      .filter(col("fp").isNotNull)
    Dedup.simhashClusters(withFp, maxHammingDistance = 8)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"))
      .orderBy(col("cluster_size"))
  }

  val clusterSizeHistogramSql: String =
    s"""WITH RECURSIVE $md5SimhashCte,
      |edges AS (
      |  SELECT l.doc_id AS a, r.doc_id AS b FROM fps l JOIN fps r
      |  ON l.doc_id < r.doc_id AND bit_count(xor(l.fp, r.fp)) <= 8),
      |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      |reach AS (SELECT a, b FROM sym
      |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a),
      |cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
      |lab AS (SELECT f.doc_id, coalesce(cl.cluster_id, f.doc_id) AS cluster_id
      |  FROM fps f LEFT JOIN cl ON f.doc_id = cl.doc_id),
      |c AS (SELECT cluster_id, count(*) AS sz FROM lab GROUP BY cluster_id)
      |SELECT sz AS cluster_size, count(*) AS n_clusters,
      |  CAST(sum(sz) AS BIGINT) AS n_docs
      |FROM c GROUP BY sz ORDER BY sz""".stripMargin

  /** Count-Min sketch overcount audit (Cormode & Muthukrishnan '05) —
    * the mergeable frequency sketch that answers "how often does token X
    * appear" in O(d·w) state: d=4 rows × w=64 cells, row hash = 60-bit
    * md5 keyed by the row index, cell totals = plain sums (mergeable
    * across partitions/days by addition). The estimate min_d cms[d][h_d(x)]
    * NEVER undercounts; this audit reports the overcount against exact
    * counts for the exact top-10 tokens. INTEGER end-to-end — the only
    * arithmetic is modular indexing and sums — so the DuckDB oracle
    * rebuilds the sketch cell-for-cell (the q187 HLL discipline; together
    * with q173's exact Misra–Gries and q192's KMV this completes a
    * mergeable-sketch family: frequencies, heavy hitters, cardinality).
    * Scale: sketch state is 256 cells regardless of corpus size; the
    * exact side is gate-SF ground truth (it IS what the sketch replaces).
    */
  val cmsOvercount: Q = (s, dir) => {
    val depth = 4
    val toks = t(s, dir, "documents")
      .select(explode(TextStats.tokens(lower(col("text")))).as("tokn"))
    val counts = Dedup.pin(
      toks.groupBy(col("tokn")).agg(count(lit(1)).as("n")))
    def cell(d: Int) =
      expr(s"CAST(conv(substring(md5(concat('$d|', tokn)), 1, 15), 16, 10)" +
        " AS BIGINT) % 64")
    val cms = counts
      .select(col("n"), posexplode(array((0 until depth).map(cell): _*))
        .as(Seq("d", "cell")))
      .groupBy(col("d"), col("cell")).agg(sum(col("n")).as("cms_n"))
    val top = counts.orderBy(col("n").desc, col("tokn")).limit(10)
      .select(col("tokn"), col("n").as("exact_n"))
    top
      .select(col("tokn"), col("exact_n"),
        posexplode(array((0 until depth).map(cell): _*)).as(Seq("d", "cell")))
      .join(cms, Seq("d", "cell"))
      .groupBy(col("tokn"), col("exact_n"))
      .agg(min(col("cms_n")).as("est_n"))
      .select(col("tokn"), col("exact_n"), col("est_n"),
        (col("est_n") - col("exact_n")).as("overcount"))
      .orderBy(col("exact_n").desc, col("tokn"))
  }

  val cmsOvercountSql: String =
    """WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS tokn
      |  FROM documents),
      |c AS (SELECT tokn, count(*) AS n FROM tok GROUP BY tokn),
      |cells AS (SELECT tokn, n, d,
      |    ('0x'||substr(md5(CAST(d AS VARCHAR)||'|'||tokn),1,15))::BIGINT % 64
      |      AS cell
      |  FROM c CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS d) ds),
      |cms AS (SELECT d, cell, CAST(sum(n) AS BIGINT) AS cms_n
      |  FROM cells GROUP BY d, cell),
      |top AS (SELECT tokn, n AS exact_n FROM c
      |  ORDER BY n DESC, tokn LIMIT 10),
      |probe AS (SELECT t.tokn, t.exact_n, x.d,
      |    ('0x'||substr(md5(CAST(x.d AS VARCHAR)||'|'||t.tokn),1,15))::BIGINT % 64
      |      AS cell
      |  FROM top t CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS d) x)
      |SELECT p.tokn, p.exact_n, min(m.cms_n) AS est_n,
      |  min(m.cms_n) - p.exact_n AS overcount
      |FROM probe p JOIN cms m ON p.d = m.d AND p.cell = m.cell
      |GROUP BY p.tokn, p.exact_n
      |ORDER BY p.exact_n DESC, p.tokn""".stripMargin

  /** KMV (k-minimum-values) cardinality sketch per source + merged union
    * (Bar-Yossef '02; Beyer '07 unbiased estimator (k−1)·2^60/h_(k)) —
    * the third leg of the mergeable-sketch family (q173 heavy hitters,
    * q187 HLL, q191 CMS): a KMV sketch is just the k smallest distinct
    * hash values, merged by taking the k smallest of a union — which
    * this query demonstrates by estimating every source AND the merged
    * all-source union from the same per-source state. Integer until the
    * single final division; sources with < k distinct values carry the
    * whole value set, so their estimate IS the exact count (emitted via
    * the same CASE both engines evaluate identically). Scale: sketch
    * state is k values per source; the rank-k selection is a per-source
    * window over DISTINCT hashes (and at 100 TB a per-partition top-k
    * merge — the q170 heap discipline — replaces the window).
    */
  val kmvDistinct: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val k = 16
    val hashed = Dedup.pin(t(s, dir, "documents")
      .select(col("source"), explode(TextStats.tokens(lower(col("text")))).as("tokn"))
      .select(col("source"),
        conv(substring(md5(col("tokn")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct())
    val union = hashed.select(lit("__union__").as("source"), col("h")).distinct()
    val all = hashed.unionByName(union)
    val w = Window.partitionBy(col("source")).orderBy(col("h"))
    val sk = all.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("source"))
      .agg(max(col("h")).as("kth"), count(lit(1)).as("n_in_sketch"))
    val exact = all.groupBy(col("source"))
      .agg(count(lit(1)).as("exact_distinct"))
    sk.join(exact, Seq("source"))
      .select(col("source"), col("kth").as("kth_min_hash"),
        round(when(col("n_in_sketch") < k, col("exact_distinct").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60))
            / col("kth").cast("double")), 2).as("est_distinct"),
        col("exact_distinct"))
      .orderBy(col("source"))
  }

  val kmvDistinctSql: String =
    """WITH tok AS (SELECT source,
      |    unnest(regexp_extract_all(lower(text), '\S+')) AS tokn
      |  FROM documents),
      |hs AS (SELECT DISTINCT source,
      |    ('0x'||substr(md5(tokn),1,15))::BIGINT AS h FROM tok),
      |uni AS (SELECT DISTINCT '__union__' AS source, h FROM hs),
      |a AS (SELECT * FROM hs UNION ALL SELECT * FROM uni),
      |r AS (SELECT source, h,
      |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM a),
      |sk AS (SELECT source, CAST(max(h) AS BIGINT) AS kth,
      |    count(*) AS n_in_sketch FROM r WHERE rn <= 16 GROUP BY source),
      |e AS (SELECT source, count(*) AS exact_distinct FROM a GROUP BY source)
      |SELECT sk.source, kth AS kth_min_hash,
      |  round(CASE WHEN n_in_sketch < 16 THEN CAST(exact_distinct AS DOUBLE)
      |    ELSE CAST(15 AS DOUBLE) * pow(2, 60) / CAST(kth AS DOUBLE) END, 2)
      |    AS est_distinct,
      |  CAST(exact_distinct AS BIGINT) AS exact_distinct
      |FROM sk JOIN e ON sk.source = e.source
      |ORDER BY sk.source""".stripMargin

  /** Epoch water-filling planner (the budget-allocation step downstream
    * of q119's temperature weights; repetition thinking per Muennighoff
    * '23 "Scaling Data-Constrained Language Models": repeated epochs
    * beyond ~4 add sharply diminishing value): a token budget B = 4× the
    * corpus is allocated across sources by temperature share q_i ∝
    * tok_i^0.5; any source whose allocation exceeds the epoch cap C=4
    * is CLIPPED to 4·tok_i, and the freed budget is redistributed among
    * unclipped sources proportional to their shares (one redistribution
    * round — defined, deterministic semantics; a full water-fill
    * iterates to fixpoint, but one round is the cross-engine-checkable
    * contract, the q143 fixed-iteration lesson). Cross-row share sums go
    * through DECIMAL(20,12) (the q119 normalizer discipline). Output is
    * a \|sources\|-row plan: share, raw epochs, clipped flag, final
    * epochs, final token allocation. Scale: everything after the one
    * corpus scan operates on the \|sources\|-row aggregate.
    */
  val epochPlanner: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(lit(1))
    val base = t(s, dir, "documents")
      .groupBy(col("source"))
      .agg(sum(TextStats.tokenCount(col("text")).cast("long")).as("tok"))
      .withColumn("budget", lit(4L) * sum(col("tok")).over(w))
      .withColumn("pa", round(pow(col("tok").cast("double"), 0.5), 12)
        .cast("decimal(20,12)"))
      .withColumn("q", col("pa").cast("double")
        / sum(col("pa")).over(w).cast("double"))
      .withColumn("alloc_raw", col("budget").cast("double") * col("q"))
      .withColumn("epochs_raw", col("alloc_raw") / col("tok").cast("double"))
      .withColumn("clipped", col("epochs_raw") > 4.0)
    val redo = base
      .withColumn("spent_clipped",
        sum(when(col("clipped"), lit(4L) * col("tok")).otherwise(lit(0L)))
          .over(w))
      .withColumn("q_free",
        sum(when(col("clipped"), lit(0).cast("decimal(20,12)"))
          .otherwise(col("pa"))).over(w))
      .withColumn("alloc_final",
        when(col("clipped"), (lit(4L) * col("tok")).cast("double"))
          .otherwise((col("budget") - col("spent_clipped")).cast("double")
            * (col("pa").cast("double") / col("q_free").cast("double"))))
    redo.select(col("source"), col("tok").as("tok_avail"),
        round(col("q"), 6).as("share"),
        round(col("epochs_raw"), 4).as("epochs_raw"),
        col("clipped"),
        round(col("alloc_final") / col("tok").cast("double"), 4)
          .as("epochs_final"),
        round(col("alloc_final"), 2).as("tok_alloc"))
      .orderBy(col("source"))
  }

  val epochPlannerSql: String =
    """WITH l AS (SELECT source,
      |    CAST(sum(len(regexp_extract_all(lower(text), '\S+'))) AS BIGINT)
      |      AS tok
      |  FROM documents GROUP BY source),
      |b AS (SELECT *, 4 * CAST(sum(tok) OVER () AS BIGINT) AS budget,
      |    CAST(round(pow(CAST(tok AS DOUBLE), 0.5), 12) AS DECIMAL(20,12))
      |      AS pa
      |  FROM l),
      |n AS (SELECT *,
      |    CAST(pa AS DOUBLE) / CAST(sum(pa) OVER () AS DOUBLE) AS q
      |  FROM b),
      |r0 AS (SELECT *, CAST(budget AS DOUBLE) * q AS alloc_raw FROM n),
      |r1 AS (SELECT *, alloc_raw / CAST(tok AS DOUBLE) AS epochs_raw,
      |    alloc_raw / CAST(tok AS DOUBLE) > 4.0 AS clipped FROM r0),
      |r2 AS (SELECT *,
      |    CAST(sum(CASE WHEN clipped THEN 4 * tok ELSE 0 END) OVER ()
      |      AS BIGINT) AS spent_clipped,
      |    sum(CASE WHEN clipped THEN CAST(0 AS DECIMAL(20,12)) ELSE pa END)
      |      OVER () AS q_free
      |  FROM r1),
      |r3 AS (SELECT *,
      |    CASE WHEN clipped THEN CAST(4 * tok AS DOUBLE)
      |         ELSE CAST(budget - spent_clipped AS DOUBLE)
      |           * (CAST(pa AS DOUBLE) / CAST(q_free AS DOUBLE)) END
      |      AS alloc_final
      |  FROM r2)
      |SELECT source, tok AS tok_avail,
      | round(q, 6) AS share,
      | round(epochs_raw, 4) AS epochs_raw,
      | clipped,
      | round(alloc_final / CAST(tok AS DOUBLE), 4) AS epochs_final,
      | round(alloc_final, 2) AS tok_alloc
      |FROM r3 ORDER BY source""".stripMargin

  /** Streaming dedup-at-ingest parity gate — the second oracle-gated
    * Structured Streaming query (q177 proved windowed aggregation; this
    * proves STATEFUL STREAMING DEDUP, the shape an LLM-ingest front door
    * actually runs): documents stream through a file source throttled to
    * one file per micro-batch (maxFilesPerTrigger=1 over a 4-file
    * staging copy — state must survive ACROSS micro-batches for the
    * answer to be right), `dropDuplicates` on (source, content-md5)
    * holds the seen-fingerprint state, and the complete-mode per-source
    * distinct counts must hash-match the batch DuckDB oracle. Dedup on
    * (source, fp) — not fp alone — keeps the result order-independent:
    * WHICH duplicate row survives global fp-dedup depends on arrival
    * order, but per-source distinct counts are arrival-invariant (the
    * determinism contract). Scale: state is one fingerprint per distinct
    * (source, content) — 16 bytes per unique doc, the same state a
    * cluster ingest keeps in RocksDB; a 100 TB backfill drains through
    * the identical pipeline via AvailableNow.
    */
  val streamDedup: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val srcDir = scratch("graft_stream_dedup_src")
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .repartition(4)
      .write.mode("overwrite").parquet(srcDir.toString)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    val raw = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir.toString)
    val qname = "graft_stream_dedup_sink"
    val sq = raw
      .select(col("source"), md5(col("text").cast("binary")).as("fp"))
      .dropDuplicates("source", "fp")
      .groupBy(col("source")).agg(count(lit(1)).as("n_unique"))
      .writeStream.outputMode("complete").format("memory")
      .queryName(qname).trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    s.table(qname)
      .select(col("source"), col("n_unique"))
      .orderBy(col("source"))
  }

  val streamDedupSql: String =
    """SELECT source, count(DISTINCT md5(text)) AS n_unique
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Pairwise source-overlap matrix from KMV sketches (the q192 state
    * COMPOSED: Beyer '07 §4 — a KMV sketch supports union by "merge and
    * keep the k smallest", and intersection by inclusion–exclusion over
    * the union estimate). The whole sources×sources matrix derives from
    * per-source sketch STATE (k=16 values each), never from a second
    * corpus pass — the scale contrast to q165's exact gram-set overlap:
    * at 100 TB the exact column here is dropped and the matrix costs
    * |sources|²·k rows of work. Sketch-complete sides (< k distinct)
    * fall back to their exact member count through the same CASE both
    * engines evaluate; estimates subtract on ALREADY-ROUNDED columns so
    * the derived overlap is bit-identical by construction.
    */
  val kmvOverlapMatrix: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val k = 16
    val hashed = Dedup.pin(t(s, dir, "documents")
      .select(col("source"), explode(TextStats.tokens(lower(col("text")))).as("tokn"))
      .select(col("source"),
        conv(substring(md5(col("tokn")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct())
    val w = Window.partitionBy(col("source")).orderBy(col("h"))
    val sk = Dedup.pin(hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select(col("source"), col("h")))
    def estCol(kth: Column, n: Column): Column =
      round(when(n < k, n.cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60))
          / kth.cast("double")), 2)
    val per = sk.groupBy(col("source"))
      .agg(max(col("h")).as("kth"), count(lit(1)).as("n"))
      .select(col("source"), estCol(col("kth"), col("n")).as("est"))
    val srcs = per.select(col("source"))
    val pairs = srcs.as("a").crossJoin(srcs.as("b"))
      .filter(col("a.source") < col("b.source"))
      .select(col("a.source").as("sa"), col("b.source").as("sb"))
    val merged = pairs.join(sk,
        sk("source") === col("sa") || sk("source") === col("sb"))
      .select(col("sa"), col("sb"), col("h")).distinct()
    val wu = Window.partitionBy(col("sa"), col("sb")).orderBy(col("h"))
    val uni = merged.withColumn("rn", row_number().over(wu))
      .filter(col("rn") <= k)
      .groupBy(col("sa"), col("sb"))
      .agg(max(col("h")).as("kth"), count(lit(1)).as("n"))
      .select(col("sa"), col("sb"), estCol(col("kth"), col("n")).as("est_union"))
    val exact = hashed.as("x").join(hashed.as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("sa"), col("y.source").as("sb"))
      .agg(count(lit(1)).as("exact_overlap"))
    uni
      .join(per.select(col("source").as("sa"), col("est").as("est_a")), "sa")
      .join(per.select(col("source").as("sb"), col("est").as("est_b")), "sb")
      .join(exact, Seq("sa", "sb"), "left")
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("est_a"), col("est_b"), col("est_union"),
        greatest(lit(0.0),
          round(col("est_a") + col("est_b") - col("est_union"), 2))
          .as("est_overlap"),
        coalesce(col("exact_overlap"), lit(0L)).as("exact_overlap"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val kmvOverlapMatrixSql: String =
    """WITH tok AS (SELECT source,
      |    unnest(regexp_extract_all(lower(text), '\S+')) AS tokn
      |  FROM documents),
      |hs AS (SELECT DISTINCT source,
      |    ('0x'||substr(md5(tokn),1,15))::BIGINT AS h FROM tok),
      |sk AS (SELECT source, h FROM (
      |  SELECT source, h,
      |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hs)
      |  WHERE rn <= 16),
      |per AS (SELECT source,
      |    round(CASE WHEN count(*) < 16 THEN CAST(count(*) AS DOUBLE)
      |      ELSE CAST(15 AS DOUBLE) * pow(2, 60) / CAST(max(h) AS DOUBLE)
      |      END, 2) AS est
      |  FROM sk GROUP BY source),
      |pairs AS (SELECT a.source AS sa, b.source AS sb
      |  FROM per a CROSS JOIN per b WHERE a.source < b.source),
      |merged AS (SELECT DISTINCT sa, sb, h
      |  FROM pairs JOIN sk ON sk.source = sa OR sk.source = sb),
      |uni AS (SELECT sa, sb,
      |    round(CASE WHEN count(*) < 16 THEN CAST(count(*) AS DOUBLE)
      |      ELSE CAST(15 AS DOUBLE) * pow(2, 60) / CAST(max(h) AS DOUBLE)
      |      END, 2) AS est_union
      |  FROM (SELECT sa, sb, h FROM (
      |    SELECT sa, sb, h,
      |      row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
      |    FROM merged) WHERE rn <= 16)
      |  GROUP BY sa, sb),
      |ex AS (SELECT x.source AS sa, y.source AS sb, count(*) AS exact_overlap
      |  FROM hs x JOIN hs y ON x.h = y.h AND x.source < y.source
      |  GROUP BY x.source, y.source)
      |SELECT uni.sa AS source_a, uni.sb AS source_b,
      |  pa.est AS est_a, pb.est AS est_b, est_union,
      |  greatest(0.0, round(pa.est + pb.est - est_union, 2)) AS est_overlap,
      |  CAST(coalesce(exact_overlap, 0) AS BIGINT) AS exact_overlap
      |FROM uni
      |JOIN per pa ON pa.source = uni.sa
      |JOIN per pb ON pb.source = uni.sb
      |LEFT JOIN ex ON ex.sa = uni.sa AND ex.sb = uni.sb
      |ORDER BY source_a, source_b""".stripMargin

  /** Exponentially time-decayed engagement score per user (the recency
    * weighting every ranking/retention system applies — half-life ≈ 6.6
    * days at decay 0.9/day): weight = 0.9^(days before the corpus's last
    * active day), one weighted event count per user. Determinism: the
    * decay anchor is the DATA's max date (broadcast one-row frame, no
    * wall clock — the no-Date.now contract); day distances are exact
    * integer datediffs; each per-day term is a single pow() derivation
    * rounded to DECIMAL(18,8), and the per-user sum is decimal-exact
    * (the q126 cross-row float contract), so the top-50 rank order is an
    * exact-decimal sort. Scale: aggregates by (user, day) first — the
    * frame shrinks to user-days before any weighting — then one keyed
    * agg; TakeOrdered bounds the output.
    */
  val decayEngagement: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val anchor = ev.agg(max(col("d")).as("anchor"))
    val perDay = ev.groupBy(col("user_id"), col("d"))
      .agg(count(lit(1)).as("n_ev"))
    perDay.crossJoin(broadcast(anchor))
      .withColumn("term",
        round(col("n_ev") * pow(lit(0.9), datediff(col("anchor"), col("d"))), 8)
          .cast("decimal(18,8)"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"), sum(col("n_ev")).as("n_events"),
        sum(col("term")).as("score_dec"))
      .orderBy(col("score_dec").desc, col("user_id")).limit(50)
      .select(col("user_id"), col("n_days"), col("n_events"),
        col("score_dec").cast("double").as("score"))
  }

  val decayEngagementSql: String =
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      |an AS (SELECT max(d) AS anchor FROM ev),
      |pd AS (SELECT user_id, d, count(*) AS n_ev FROM ev GROUP BY user_id, d),
      |t AS (SELECT user_id, d, n_ev,
      |    CAST(round(n_ev * pow(0.9, datediff('day', d, anchor)), 8)
      |      AS DECIMAL(18,8)) AS term
      |  FROM pd CROSS JOIN an)
      |SELECT user_id, count(*) AS n_days,
      |  CAST(sum(n_ev) AS BIGINT) AS n_events,
      |  CAST(sum(term) AS DOUBLE) AS score
      |FROM t GROUP BY user_id
      |ORDER BY sum(term) DESC, user_id LIMIT 50""".stripMargin

  /** Stream-static enrichment join parity — the third oracle-gated
    * Structured Streaming query, covering the remaining core streaming
    * surface after q177 (windowed agg) and q194 (stateful dedup): a
    * STREAM-STATIC JOIN, the shape every live enrichment pipeline runs
    * (click stream ⋈ dimension table). Events stream through a 4-file
    * source one file per micro-batch; each batch joins the STATIC
    * customer dimension (user_id → nation key, a broadcast hash join
    * re-planned per batch — the Spark contract for stream-static), and
    * the complete-mode (nation, event_type) counts must hash-match the
    * batch SQL oracle. The join key maps users onto customers by
    * modulus so every SF binds. Scale: the static side is a broadcast
    * dim; stream state is the |nations×types| aggregate, bounded.
    */
  val streamEnrich: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StructField, StructType, StringType}
    val srcDir = scratch("graft_stream_enrich_src")
    Tables.events(s, dir).select(col("event_id"), col("user_id"), col("event_type"))
      .repartition(4)
      .write.mode("overwrite").parquet(srcDir.toString)
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    // max() is NULL on an empty dimension; fall back to 1 so the modulus
    // is defined (the join then simply matches nothing).
    val nCustRow = cust.agg(max(col("c_custkey"))).head()
    val nCust = if (nCustRow.isNullAt(0)) 1L else nCustRow.getLong(0)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType)))
    val raw = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir.toString)
    val qname = "graft_stream_enrich_sink"
    val sq = raw
      .withColumn("c_custkey", col("user_id") % nCust + 1)
      .join(broadcast(cust), Seq("c_custkey"))
      .groupBy(col("c_nationkey"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream.outputMode("complete").format("memory")
      .queryName(qname).trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    s.table(qname)
      .select(col("c_nationkey"), col("event_type"), col("n_events"))
      .orderBy(col("c_nationkey"), col("event_type"))
  }

  val streamEnrichSql: String =
    """WITH nc AS (SELECT max(c_custkey) AS n FROM customer)
      |SELECT c.c_nationkey, e.event_type, count(*) AS n_events
      |FROM events e CROSS JOIN nc
      |JOIN customer c ON c.c_custkey = e.user_id % nc.n + 1
      |GROUP BY c.c_nationkey, e.event_type
      |ORDER BY c.c_nationkey, e.event_type""".stripMargin

  /** Event-type co-occurrence lift matrix (market-basket lift over the
    * per-user event-type SET — the set-membership complement of q162's
    * sequential transition census and q169's token-pair PMI): lift(a,b)
    * = P(a,b ⊆ user's types) / (P(a)·P(b)), computed from distinct
    * (user, type) memberships. Everything shrinks before any pair work:
    * users×types memberships first, then a types²-bounded self-join on
    * the USER key with map-side partial agg. The ratio is one exact
    * integer cross-multiply rendered as a single double division
    * (n_ab·n_users)/(n_a·n_b) — cross-engine-safe single op. Scale: the
    * membership frame is |users|×|types|; pair output is types².
    */
  val eventLiftMatrix: Q = (s, dir) => {
    val mem = Dedup.pin(Tables.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct())
    val nUsers = mem.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val per = mem.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    val pairs = mem.as("a").join(mem.as("b"),
        col("a.user_id") === col("b.user_id")
          && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(per.select(col("event_type").as("type_a"), col("n_t").as("n_a")),
        "type_a")
      .join(per.select(col("event_type").as("type_b"), col("n_t").as("n_b")),
        "type_b")
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        round((col("n_ab") * col("n_users")).cast("double")
          / (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val eventLiftMatrixSql: String =
    """WITH mem AS (SELECT DISTINCT user_id, event_type FROM events),
      |nu AS (SELECT count(DISTINCT user_id) AS n_users FROM mem),
      |per AS (SELECT event_type, count(*) AS n_t FROM mem
      |  GROUP BY event_type),
      |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    count(*) AS n_ab
      |  FROM mem a JOIN mem b ON a.user_id = b.user_id
      |    AND a.event_type < b.event_type
      |  GROUP BY a.event_type, b.event_type)
      |SELECT type_a, type_b, n_ab,
      |  round(CAST(n_ab * n_users AS DOUBLE)
      |    / CAST(pa.n_t * pb.n_t AS DOUBLE), 6) AS lift
      |FROM p
      |JOIN per pa ON pa.event_type = p.type_a
      |JOIN per pb ON pb.event_type = p.type_b
      |CROSS JOIN nu
      |ORDER BY type_a, type_b""".stripMargin

  /** Inter-arrival burstiness audit per event type (the Poisson check a
    * stream-capacity planner runs: coefficient of variation of
    * inter-arrival times ≈ 1 for a Poisson process, ≫ 1 for bursty
    * traffic): gaps in EXACT INTEGER microseconds from one lead() pass
    * in deterministic (ts, event_id) order, then per-type
    * count/mean/cv, with variance from exact integer Σgap and Σgap²
    * (algebraic identity — both sums exact in decimal, the q171
    * discipline; the only floats are the final mean/cv divisions and a
    * sqrt). Scale: one window pass partitioned by type, one keyed agg —
    * nothing pairwise.
    */
  val burstinessAudit: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .select(col("event_type"), col("ts"), col("event_id"))
      .withColumn("gap_us",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .filter(col("gap_us").isNotNull)
    gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_us")).as("sum_us"),
        sum(col("gap_us").cast("decimal(19,0)") * col("gap_us")
          .cast("decimal(19,0)")).as("sum_sq"))
      .select(col("event_type"), col("n_gaps"),
        round(col("sum_us").cast("double") / col("n_gaps").cast("double"), 4)
          .as("mean_us"),
        round(
          sqrt((col("sum_sq").cast("double")
            - col("sum_us").cast("double") * col("sum_us").cast("double")
              / col("n_gaps").cast("double")) / col("n_gaps").cast("double"))
            / (col("sum_us").cast("double") / col("n_gaps").cast("double")), 6)
          .as("cv"))
      .orderBy(col("event_type"))
  }

  val burstinessAuditSql: String =
    """WITH g AS (SELECT event_type,
      |    CAST(epoch_us(lead(ts) OVER (PARTITION BY event_type
      |      ORDER BY ts, event_id)) - epoch_us(ts) AS BIGINT) AS gap_us
      |  FROM events),
      |f AS (SELECT event_type, gap_us FROM g WHERE gap_us IS NOT NULL)
      |SELECT event_type, count(*) AS n_gaps,
      |  round(CAST(sum(gap_us) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
      |    AS mean_us,
      |  round(sqrt((CAST(sum(CAST(gap_us AS DECIMAL(19,0))
      |        * CAST(gap_us AS DECIMAL(19,0))) AS DOUBLE)
      |      - CAST(sum(gap_us) AS DOUBLE) * CAST(sum(gap_us) AS DOUBLE)
      |        / CAST(count(*) AS DOUBLE)) / CAST(count(*) AS DOUBLE))
      |    / (CAST(sum(gap_us) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 6)
      |    AS cv
      |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Join-key skew profiler — the pre-flight diagnostic for
    * [[graft.ops.Skew]]: before a big keyed join/agg ships, measure how
    * concentrated the key distribution is (orders per customer here).
    * Reports the 5 hottest keys with their share plus the exact GINI
    * coefficient of the per-key counts. The Gini runs on the
    * COUNT-OF-COUNTS frame (m_c keys have count c — |distinct counts|
    * rows, value-domain not key-domain, the q123/q181 discipline): with
    * keys sorted by count, a tied block at count c spanning cumulative
    * key positions (K_prev, K] contributes c·(K(K+1)/2 − K_prev(K_prev
    * +1)/2) to Σi·xᵢ — INTEGER arithmetic end-to-end, then
    * G = 2S/(nT) − (n+1)/n as two single divisions. Scale: one keyed
    * count, one count-of-counts agg, windows over the tiny count grid;
    * the top-5 via TakeOrdered.
    */
  val joinSkewProfile: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val perKey = Dedup.pin(t(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n")))
    val coc = perKey.groupBy(col("n").as("c")).agg(count(lit(1)).as("m"))
    val wc = Window.partitionBy(lit(1)).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = coc
      .withColumn("k_cum", sum(col("m")).over(wc))
      .withColumn("k_prev", col("k_cum") - col("m"))
      .withColumn("s_blk",
        col("c") * expr("(k_cum * (k_cum + 1)) div 2 " +
          "- (k_prev * (k_prev + 1)) div 2"))
      .agg(sum(col("s_blk")).as("s"), sum(col("m")).as("n_keys"),
        sum(col("c") * col("m")).as("n_rows"))
      .select(round(lit(2.0) * col("s")
          / (col("n_keys") * col("n_rows")).cast("double")
          - (col("n_keys") + lit(1)).cast("double") / col("n_keys").cast("double"), 6)
        .as("gini"), col("n_keys"), col("n_rows"))
    perKey.orderBy(col("n").desc, col("o_custkey")).limit(5)
      .withColumn("rank",
        row_number().over(Window.partitionBy(lit(1))
          .orderBy(col("n").desc, col("o_custkey"))))
      .crossJoin(broadcast(g))
      .select(col("rank"), col("o_custkey"), col("n"),
        round(col("n") / col("n_rows").cast("double") * 100, 6).as("share_pct"),
        col("n_keys"), col("gini"))
      .orderBy(col("rank"))
  }

  val joinSkewProfileSql: String =
    """WITH pk AS (SELECT o_custkey, count(*) AS n FROM orders
      |  GROUP BY o_custkey),
      |coc AS (SELECT n AS c, count(*) AS m FROM pk GROUP BY n),
      |cum AS (SELECT c, m,
      |    CAST(sum(m) OVER (ORDER BY c) AS BIGINT) AS k_cum
      |  FROM coc),
      |blk AS (SELECT c, m, k_cum, k_cum - m AS k_prev,
      |    c * ((k_cum * (k_cum + 1)) // 2
      |      - ((k_cum - m) * ((k_cum - m) + 1)) // 2) AS s_blk
      |  FROM cum),
      |g AS (SELECT
      |    round(2.0 * CAST(sum(s_blk) AS BIGINT)
      |      / CAST(CAST(sum(m) AS BIGINT) * CAST(sum(c * m) AS BIGINT)
      |        AS DOUBLE)
      |      - CAST(CAST(sum(m) AS BIGINT) + 1 AS DOUBLE)
      |        / CAST(sum(m) AS BIGINT), 6) AS gini,
      |    CAST(sum(m) AS BIGINT) AS n_keys,
      |    CAST(sum(c * m) AS BIGINT) AS n_rows
      |  FROM blk),
      |top AS (SELECT o_custkey, n,
      |    row_number() OVER (ORDER BY n DESC, o_custkey) AS rank
      |  FROM pk ORDER BY n DESC, o_custkey LIMIT 5)
      |SELECT CAST(rank AS INTEGER) AS rank, o_custkey, n,
      |  round(n / CAST(n_rows AS DOUBLE) * 100, 6) AS share_pct,
      |  n_keys, gini
      |FROM top CROSS JOIN g ORDER BY rank""".stripMargin

  /** Benford first-digit audit (Newcomb 1881 / Benford '38 — the
    * fabricated-data forensic every financial DQ suite runs): the
    * distribution of the first significant digit of o_totalprice against
    * log10(1 + 1/d), with per-digit χ² terms. The digit is extracted
    * WITHOUT float formatting or float log10 (both engine-divergent):
    * prices are 2-decimal values, so round(x·100) is an exact integer
    * whose INTEGER-to-string first character is the digit — exact in
    * both engines. Expected probabilities are 9 single-op log10
    * derivations rounded to 8; χ² terms are single-expression doubles
    * rounded per digit. Scale: row-local digit extraction fused into the
    * scan; one 9-cell aggregation.
    */
  val benfordAudit: Q = (s, dir) => {
    val digits = t(s, dir, "orders")
      .filter(col("o_totalprice") > 0)
      .select(substring(round(col("o_totalprice") * 100, 0).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum(col("n_obs")).as("n_tot"))
    digits.crossJoin(broadcast(tot))
      .withColumn("p_benford", round(log10(lit(1.0) + lit(1.0) / col("digit")), 8))
      .withColumn("expected", col("n_tot") * col("p_benford"))
      .select(col("digit"), col("n_obs"),
        col("p_benford"),
        round(col("n_obs") / col("n_tot").cast("double"), 8).as("p_obs"),
        round((col("n_obs") - col("expected")) * (col("n_obs") - col("expected"))
          / col("expected"), 6).as("chi2_term"))
      .orderBy(col("digit"))
  }

  val benfordAuditSql: String =
    """WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0)
      |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
      |  FROM orders WHERE o_totalprice > 0),
      |c AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
      |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_tot FROM c)
      |SELECT digit, n_obs,
      |  round(log10(1.0 + 1.0 / digit), 8) AS p_benford,
      |  round(n_obs / CAST(n_tot AS DOUBLE), 8) AS p_obs,
      |  round((n_obs - n_tot * round(log10(1.0 + 1.0 / digit), 8))
      |    * (n_obs - n_tot * round(log10(1.0 + 1.0 / digit), 8))
      |    / (n_tot * round(log10(1.0 + 1.0 / digit), 8)), 6) AS chi2_term
      |FROM c CROSS JOIN t ORDER BY digit""".stripMargin

  /** BM25 retrieval scoring (Robertson–Spärck Jones '76 / Robertson '94;
    * k1=1.2, b=0.75) — the relevance ranker a curation pipeline runs to
    * pull topical slices out of a corpus (and the scoring half of any
    * RAG retrieval layer). The query is DATA-DERIVED so the gate binds
    * on every SF: the 3 tokens with document frequency closest to N/2
    * (maximally informative mid-df terms; exact integer |2·df − N| with
    * token tiebreak — no float in term selection). Plan: token stream →
    * per-(doc, term) tf against a ≤3-row broadcast query-term table →
    * per-term scores, each a single-expression double derivation, summed
    * per doc through DECIMAL(18,8) (the decSum contract — cross-row
    * float addition is the one non-reproducible op). idf uses the
    * +1-inside-ln BM25+ form (always positive). Scale: one tf join keyed
    * on the term, doc-length table keyed on doc_id, avg length rides a
    * broadcast 1-row frame; top-20 via TakeOrdered.
    */
  val bm25TopK: Q = (s, dir) => {
    val toks = Dedup.pin(t(s, dir, "documents")
      .select(col("doc_id"), explode(TextStats.tokens(lower(col("text")))).as("tokn")))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val nAvg = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val df = toks.select(col("doc_id"), col("tokn")).distinct()
      .groupBy(col("tokn")).agg(count(lit(1)).as("df"))
    val qterms = df.crossJoin(broadcast(nAvg.select(col("n_docs"))))
      .withColumn("spread", abs(lit(2L) * col("df") - col("n_docs")))
      .orderBy(col("spread"), col("tokn")).limit(3)
      .select(col("tokn"), col("df"))
    val tf = toks.join(broadcast(qterms), Seq("tokn"))
      .groupBy(col("doc_id"), col("tokn"), col("df"))
      .agg(count(lit(1)).as("tf"))
    tf.join(dl, Seq("doc_id")).crossJoin(broadcast(nAvg))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5))))
      .withColumn("term_score",
        round(col("idf") * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(0.25)
            + lit(0.75) * (col("dl").cast("double") / col("avgdl")))), 8)
          .cast("decimal(18,8)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("term_score")).cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
      .select(col("doc_id"), col("n_terms"), round(col("bm25"), 8).as("bm25"))
  }

  val bm25TopKSql: String =
    """WITH tok AS (SELECT doc_id,
      |    unnest(regexp_extract_all(lower(text), '\S+')) AS tokn
      |  FROM documents),
      |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
      |na AS (SELECT count(*) AS n_docs,
      |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
      |df AS (SELECT tokn, count(*) AS df
      |  FROM (SELECT DISTINCT doc_id, tokn FROM tok) GROUP BY tokn),
      |qt AS (SELECT tokn, df FROM df CROSS JOIN na
      |  ORDER BY abs(2 * df - n_docs), tokn LIMIT 3),
      |tf AS (SELECT t.doc_id, t.tokn, q.df, count(*) AS tf
      |  FROM tok t JOIN qt q ON t.tokn = q.tokn
      |  GROUP BY t.doc_id, t.tokn, q.df),
      |ts AS (SELECT tf.doc_id,
      |    CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
      |      * (tf * 2.2)
      |      / (tf + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))), 8)
      |      AS DECIMAL(18,8)) AS term_score
      |  FROM tf JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN na)
      |SELECT doc_id, n_terms, round(raw, 8) AS bm25 FROM (
      |  SELECT doc_id, count(*) AS n_terms,
      |    CAST(sum(term_score) AS DOUBLE) AS raw
      |  FROM ts GROUP BY doc_id
      |  ORDER BY raw DESC, doc_id LIMIT 20)
      |ORDER BY raw DESC, doc_id""".stripMargin

  /** Label-supervised contrastive triplet mining (the training-pair
    * harvest for embedding-model finetuning — Schroff '15 FaceNet hard
    * mining, applied corpus-side): for each anchor vector, the hardest
    * POSITIVE (highest-cosine same-label neighbor) and hardest NEGATIVE
    * (highest-cosine different-label vector — the boundary case that
    * drives contrastive gradients), with the margin between them.
    * Argmax is an exact struct-max on (raw cosine, −id) — the q24
    * precedent that ordered-summation cosines agree cross-engine makes
    * raw-double ranking oracle-safe; rounding touches OUTPUT columns
    * only. Gate anchors are bounded (vec_id < 100) so the exact
    * all-pairs side stays a harness; production mines candidates from
    * [[graft.ops.SimSearch]] buckets (IVF cell or SRP bucket) — the
    * same argmax over a bucket-bounded candidate stream.
    */
  val contrastiveTriplets: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val anchors = emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("aid"), col("embedding").as("av"),
        col("label").as("albl"))
    val cands = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"),
      col("label").as("clbl"))
    val scored = Dedup.pin(anchors.join(cands, col("aid") =!= col("cid"))
      .withColumn("cos", graft.functions.VectorExpressions
        .cosine_similarity(col("av"), col("cv"))))
    val pos = scored.filter(col("albl") === col("clbl"))
      .groupBy(col("aid"))
      .agg(max(struct(col("cos"), (-col("cid")).as("nid"))).as("m"))
      .select(col("aid"), (-col("m.nid")).as("pos_id"),
        col("m.cos").as("cp"))
    val neg = scored.filter(col("albl") =!= col("clbl"))
      .groupBy(col("aid"))
      .agg(max(struct(col("cos"), (-col("cid")).as("nid"))).as("m"))
      .select(col("aid"), (-col("m.nid")).as("neg_id"),
        col("m.cos").as("cn"))
    pos.join(neg, Seq("aid"))
      .select(col("aid").as("vec_id"), col("pos_id"),
        round(col("cp"), 6).as("cos_pos"),
        col("neg_id"), round(col("cn"), 6).as("cos_neg"),
        round(col("cp") - col("cn"), 6).as("margin"))
      .orderBy(col("vec_id"))
  }

  val contrastiveTripletsSql: String =
    """WITH v AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |sc AS (SELECT a.vec_id AS aid, c.vec_id AS cid,
      |    a.label AS albl, c.label AS clbl,
      |    list_dot_product(a.e, c.e) /
      |      (sqrt(list_dot_product(a.e, a.e))
      |        * sqrt(list_dot_product(c.e, c.e))) AS cos
      |  FROM v a JOIN v c ON a.vec_id < 100 AND a.vec_id <> c.vec_id),
      |p AS (SELECT aid, cid AS pos_id, cos AS cp FROM (
      |  SELECT aid, cid, cos,
      |    row_number() OVER (PARTITION BY aid ORDER BY cos DESC, cid) AS rn
      |  FROM sc WHERE albl = clbl) WHERE rn = 1),
      |n AS (SELECT aid, cid AS neg_id, cos AS cn FROM (
      |  SELECT aid, cid, cos,
      |    row_number() OVER (PARTITION BY aid ORDER BY cos DESC, cid) AS rn
      |  FROM sc WHERE albl <> clbl) WHERE rn = 1)
      |SELECT p.aid AS vec_id, pos_id, round(cp, 6) AS cos_pos,
      |  neg_id, round(cn, 6) AS cos_neg, round(cp - cn, 6) AS margin
      |FROM p JOIN n ON p.aid = n.aid
      |ORDER BY vec_id""".stripMargin

  /** Two-sample Kolmogorov–Smirnov drift audit: for every source, the exact
    * KS distance between that source's document-length distribution and the
    * rest of the corpus — the distribution-shift alarm a mixture pipeline
    * runs when a crawl snapshot or new provider lands (KL on binned scores
    * is q166; KS is the binning-free complement whose statistic is attained
    * at a pooled sample point, so it needs no bandwidth choice). Scale
    * shape: everything windows over the VALUE DOMAIN, never the corpus —
    * counts per (len, source) shrink the frame to |lens|×|sources| (the
    * q123 winsorize precedent; at petabyte scale the grid is coarsened by
    * bucketing len, same statistic on the gridded CDF), the per-source
    * cumulative is a window partitioned by source over distinct lens, and
    * the pooled cumulative is a partition-total window BY len (no global
    * single-partition window anywhere). Totals ride one broadcast one-row
    * frame. F_rest excludes the source itself, so a source is never
    * compared against its own mass.
    */
  val ksDrift: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val lens = Dedup.pin(
      t(s, dir, "documents").select(col("source"), col("n_chars").as("len")))
    val c = lens.groupBy(col("len"), col("source")).agg(count(lit(1)).as("cnt"))
    // dense grid: every source needs a CDF value at every pooled len
    val grid = lens.select(col("len")).distinct()
      .crossJoin(broadcast(lens.select(col("source")).distinct()))
    val filled = grid.join(c, Seq("len", "source"), "left")
      .select(col("len"), col("source"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val cum = filled.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(col("source")).orderBy(col("len"))))
    val withTot = cum.withColumn("cum_tot",
      sum(col("cum")).over(Window.partitionBy(col("len"))))
    val ns = lens.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val n = lens.agg(count(lit(1)).as("n_tot"))
    withTot.join(broadcast(ns), Seq("source")).crossJoin(broadcast(n))
      .groupBy(col("source"), col("n_docs"))
      // single-source corpus: the "rest" is empty, its CDF undefined —
      // report 0 drift rather than a 0/0 NaN (ADVICE r6)
      .agg(round(max(when(col("n_tot") === col("n_docs"), lit(0.0))
        .otherwise(abs(
          col("cum").cast("double") / col("n_docs")
            - (col("cum_tot") - col("cum")).cast("double")
              / (col("n_tot") - col("n_docs"))))), 6).as("ks"))
      .select(col("source"), col("n_docs"), col("ks"))
      .orderBy(col("source"))
  }

  val ksDriftSql: String =
    """WITH lens AS (SELECT source, n_chars AS len FROM documents),
      |c AS (SELECT len, source, count(*) AS cnt FROM lens GROUP BY 1, 2),
      |grid AS (SELECT l.len, s.source
      |  FROM (SELECT DISTINCT len FROM lens) l
      |  CROSS JOIN (SELECT DISTINCT source FROM lens) s),
      |f AS (SELECT g.len, g.source, coalesce(cnt, 0) AS cnt
      |  FROM grid g LEFT JOIN c ON g.len = c.len AND g.source = c.source),
      |cum AS (SELECT len, source,
      |    sum(cnt) OVER (PARTITION BY source ORDER BY len) AS cum FROM f),
      |ct AS (SELECT len, source, cum,
      |    sum(cum) OVER (PARTITION BY len) AS cum_tot FROM cum),
      |ns AS (SELECT source, count(*) AS n_docs FROM lens GROUP BY 1),
      |n AS (SELECT count(*) AS n_tot FROM lens)
      |SELECT ct.source, ns.n_docs,
      | round(max(CASE WHEN n_tot = n_docs THEN 0.0
      |   ELSE abs(CAST(cum AS DOUBLE) / n_docs
      |     - CAST(cum_tot - cum AS DOUBLE) / (n_tot - n_docs)) END), 6) AS ks
      |FROM ct JOIN ns ON ct.source = ns.source CROSS JOIN n
      |GROUP BY ct.source, ns.n_docs ORDER BY ct.source""".stripMargin

  /** Decile lift / calibration table: cut the corpus into 10 exact
    * length-deciles and report each decile's duplicate rate — the
    * "is my quality signal correlated with duplication?" audit run before
    * trusting a filter threshold (a lift table is how the reference's DQ
    * reports present rule hit-rates per band). Deciles are assigned by
    * VALUE against broadcast percentile_disc cut points — never ntile,
    * whose global row sort is both a scale hazard and nondeterministic
    * under ties; value-comparison assignment is reproducible on both
    * engines and keeps the corpus scan shuffle-free (one crossJoin of a
    * one-row 9-column cuts frame). Duplication is q20's exact content
    * fingerprint; the small-SF corpora carry no natural duplicates, so the
    * query plants the q179 re-crawl (every 50th doc under a shifted id) to
    * make every counter provably non-trivial at every SF.
    */
  val qualityLift: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val recrawled = Dedup.pin(
      docs.select(col("doc_id"), col("text"), col("n_chars"))
        .unionByName(docs.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + lit(10000000L)).as("doc_id"),
            col("text"), col("n_chars"))))
    val cuts = recrawled.agg(
      expr("percentile_disc(0.1) WITHIN GROUP (ORDER BY n_chars)").as("c1"),
      (2 to 9).map(k =>
        expr(s"percentile_disc(0.$k) WITHIN GROUP (ORDER BY n_chars)")
          .as(s"c$k")): _*)
    val withFp = recrawled.select(col("doc_id"), col("n_chars"),
      md5(col("text").cast("binary")).as("fp"))
    val copies = withFp.groupBy(col("fp")).agg(count(lit(1)).as("n_copies"))
    withFp.join(copies, Seq("fp"))
      .crossJoin(broadcast(cuts))
      .withColumn("decile", lit(1) + (1 to 9)
        .map(k => when(col("n_chars") > col(s"c$k"), 1).otherwise(0))
        .reduce(_ + _))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup"),
        round(sum(when(col("n_copies") > 1, 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 6).as("dup_rate"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("decile"))
  }

  val qualityLiftSql: String = {
    val decile = (1 to 9)
      .map(k => s"(CASE WHEN n_chars > c$k THEN 1 ELSE 0 END)")
      .mkString("1 + ", " + ", "")
    val cuts = (1 to 9)
      .map(k => s"quantile_disc(n_chars, 0.$k) AS c$k").mkString(", ")
    s"""WITH r AS (
      | SELECT doc_id, text, n_chars FROM documents
      | UNION ALL
      | SELECT doc_id + 10000000, text, n_chars FROM documents
      | WHERE doc_id % 50 = 0),
      |cuts AS (SELECT $cuts FROM r),
      |fp AS (SELECT doc_id, n_chars, md5(text) AS f FROM r),
      |cp AS (SELECT f, count(*) AS n_copies FROM fp GROUP BY f),
      |tag AS (SELECT fp.n_chars, cp.n_copies, $decile AS decile
      | FROM fp JOIN cp USING (f) CROSS JOIN cuts)
      |SELECT decile, count(*) AS n_docs,
      | CAST(coalesce(sum(CASE WHEN n_copies > 1 THEN 1 END), 0) AS BIGINT)
      |   AS n_dup,
      | round(CAST(coalesce(sum(CASE WHEN n_copies > 1 THEN 1 END), 0)
      |   AS DOUBLE) / count(*), 6) AS dup_rate,
      | min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM tag GROUP BY decile ORDER BY decile""".stripMargin
  }

  /** G² log-likelihood token keyness (Dunning '93 "Accurate Methods for
    * the Statistics of Surprise and Coincidence"): the 20 tokens whose
    * frequency in the lexicographically-first source deviates most from
    * the rest of the corpus — the corpus-linguistics complement of q169's
    * PMI (PMI ranks co-occurring PAIRS; G² ranks single terms against a
    * contingency expectation, and unlike PMI it is not dominated by rare
    * events). Scale shape: one token explode (linear in corpus bytes)
    * into a token-keyed hash aggregation; the focus label and the
    * (NA, NB) totals each ride a broadcast one-row frame; min-count ≥ 5
    * prunes the tail before the double math; top-20 is TakeOrdered, never
    * a global sort. Ties at the rounded statistic break on the token, so
    * the emitted set is deterministic on both engines.
    */
  val tokenKeyness: Q = (s, dir) => {
    // focus comes from the (tiny) documents table, so the exploded
    // corpus×token frame has exactly ONE consumer and is NOT cached —
    // pinning it was a memory hazard at full-catalog JVM scale and
    // bought nothing (r7 verdict item #6).
    val toks = t(s, dir, "documents")
      .select(col("source"),
        explode(TextStats.tokens(lower(col("text")))).as("token"))
    val focus = t(s, dir, "documents").agg(min(col("source")).as("focus"))
    // the pin moves to the VOCABULARY-sized per-token aggregate (two
    // consumers: the grand totals and the final projection) — state is
    // |vocab| rows, never corpus×tokens.
    val counts = Dedup.pin(toks.crossJoin(broadcast(focus))
      .groupBy(col("token"))
      .agg(sum(when(col("source") === col("focus"), 1L).otherwise(0L)).as("a"),
        sum(when(col("source") =!= col("focus"), 1L).otherwise(0L)).as("b")))
    val tot = counts.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    counts.filter(col("a") + col("b") >= 5)
      .crossJoin(broadcast(tot))
      .withColumn("ea",
        (col("a") + col("b")).cast("double") * col("na")
          / (col("na") + col("nb")))
      .withColumn("eb",
        (col("a") + col("b")).cast("double") * col("nb")
          / (col("na") + col("nb")))
      .withColumn("g2", round(lit(2.0) * (
        when(col("a") > 0, col("a").cast("double")
          * log(col("a").cast("double") / col("ea"))).otherwise(lit(0.0))
          + when(col("b") > 0, col("b").cast("double")
            * log(col("b").cast("double") / col("eb"))).otherwise(lit(0.0))),
        4))
      .select(col("token"), col("a").as("n_focus"), col("b").as("n_rest"),
        col("g2"))
      .orderBy(col("g2").desc, col("token"))
      .limit(20)
  }

  val tokenKeynessSql: String =
    """WITH tk AS (SELECT source,
      |    unnest(regexp_extract_all(lower(text), '\S+')) AS token
      |  FROM documents),
      |f AS (SELECT min(source) AS focus FROM documents),
      |c AS (SELECT token,
      |   CAST(coalesce(sum(CASE WHEN source = focus THEN 1 END), 0)
      |     AS BIGINT) AS a,
      |   CAST(coalesce(sum(CASE WHEN source <> focus THEN 1 END), 0)
      |     AS BIGINT) AS b
      | FROM tk CROSS JOIN f GROUP BY token),
      |tot AS (SELECT CAST(sum(a) AS BIGINT) AS na,
      |   CAST(sum(b) AS BIGINT) AS nb FROM c)
      |SELECT token, a AS n_focus, b AS n_rest,
      | round(2.0 * (
      |   (CASE WHEN a > 0 THEN CAST(a AS DOUBLE)
      |      * ln(CAST(a AS DOUBLE)
      |        / (CAST(a + b AS DOUBLE) * na / (na + nb))) ELSE 0 END)
      | + (CASE WHEN b > 0 THEN CAST(b AS DOUBLE)
      |      * ln(CAST(b AS DOUBLE)
      |        / (CAST(a + b AS DOUBLE) * nb / (na + nb))) ELSE 0 END)), 4)
      |   AS g2
      |FROM c CROSS JOIN tot
      |WHERE a + b >= 5
      |ORDER BY g2 DESC, token LIMIT 20""".stripMargin

  /** Consecutive-day activity streaks — the gaps-and-islands DATE variant
    * (q42 sessionizes by a TIME gap inside a day; streaks are the
    * engagement-retention complement over distinct calendar days, the
    * "longest run" metric every behavioral dashboard carries). Islands by
    * the classic row_number subtraction: within a user, day −
    * row_number(day) is constant exactly across consecutive days, so one
    * user-partitioned window plus a two-level aggregation yields every
    * streak without self-joins. Scale shape: distinct (user, day) first —
    * the frame shrinks to user-days before any window runs — then both
    * the window and the aggregations are user-partitioned; nothing
    * crosses users, no global sort.
    */
  val activityStreaks: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    // Tables.events, not the raw loader: ts must survive both testdata
    // layouts (INT64 TIMESTAMP(NANOS) vs NTZ micros — ADVICE r6)
    val days = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val streaks = days
      .withColumn("island", date_sub(col("d"), row_number().over(w)))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"))
    streaks.groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("max_streak"))
      .orderBy(col("user_id"))
  }

  val activityStreaksSql: String =
    """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
      |  FROM events),
      |isl AS (SELECT user_id,
      |    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
      |      AS INTEGER) AS island
      |  FROM days),
      |st AS (SELECT user_id, island, count(*) AS len
      |  FROM isl GROUP BY user_id, island)
      |SELECT user_id,
      | CAST(sum(len) AS BIGINT) AS n_active_days,
      | count(*) AS n_streaks,
      | CAST(max(len) AS BIGINT) AS max_streak
      |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Exact WEIGHTED median per group (quantity-weighted line price) — the
    * weighted percentile_disc Spark and DuckDB both lack as a builtin:
    * the smallest value whose cumulative weight reaches half the group
    * total (lower weighted median, the Edgeworth '88 definition). Weights
    * ride DECIMAL from the first aggregation — cross-row float sums are
    * engine-order-dependent (the q119/q126 rule), and the half-total test
    * is cum·2 ≥ total in exact decimal, never a double division. Scale
    * shape: the corpus collapses to (group, value) weight cells first, so
    * the cumulative window runs over the VALUE DOMAIN per group (the q181
    * KS precedent), and the reported median is a raw data value — no
    * arithmetic touches it.
    */
  val weightedMedian: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val pw = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        col("l_extendedprice").as("price"),
        col("l_quantity").cast("decimal(18,2)").as("w"))
      .groupBy(col("flag"), col("price")).agg(sum(col("w")).as("wsum"))
    val cum = pw.withColumn("cum",
      sum(col("wsum")).over(Window.partitionBy(col("flag")).orderBy(col("price"))))
    val tot = pw.groupBy(col("flag")).agg(sum(col("wsum")).as("tot"))
    cum.join(tot, Seq("flag"))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("flag"))
      .agg(min(col("price")).as("wmedian"),
        round(max(col("tot")).cast("double"), 2).as("total_w"))
      .orderBy(col("flag"))
  }

  val weightedMedianSql: String =
    """WITH pw AS (SELECT l_returnflag AS flag, l_extendedprice AS price,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS wsum
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (SELECT flag, price, wsum,
      |    sum(wsum) OVER (PARTITION BY flag ORDER BY price) AS cum FROM pw),
      |tot AS (SELECT flag, sum(wsum) AS tot FROM pw GROUP BY 1)
      |SELECT cum.flag, min(price) AS wmedian,
      | round(CAST(max(tot) AS DOUBLE), 2) AS total_w
      |FROM cum JOIN tot ON cum.flag = tot.flag
      |WHERE cum * 2 >= tot
      |GROUP BY cum.flag ORDER BY cum.flag""".stripMargin

  /** Reciprocal Rank Fusion of two retrieval lists (Cormack '09,
    * k=60) — the standard hybrid-retrieval merge step (lexical ⊕
    * semantic, or multi-probe semantic as here): each of two anchor
    * vectors produces a cosine top-50 candidate list; RRF fuses them by
    * Σ 1/(60+rank), rank-only so incomparable score scales never touch
    * each other. Ranks come from raw-double cosine ordering with a
    * vec_id tiebreak (the q24 precedent — ordered-summation cosines
    * agree cross-engine); the fused score is ONE two-term expression
    * `coalesce(1/(60+rₐ),0)+coalesce(1/(60+r_b),0)` evaluated
    * left-to-right in both engines, so no cross-row float summation
    * exists anywhere. Scale: each list is a TakeOrdered top-k off one
    * corpus scan (anchors ride a 1-row broadcast); the rank windows run
    * on k-bounded (≤50-row) frames; the fuse is a k×k outer join.
    */
  val rrfFusion: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val a0 = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("ae"))
    val a1 = emb.filter(col("vec_id") === 1)
      .select(col("embedding").as("be"))
    val scored = Dedup.pin(emb.filter(col("vec_id") > 1)
      .crossJoin(broadcast(a0)).crossJoin(broadcast(a1))
      .select(col("vec_id"),
        graft.functions.VectorExpressions
          .cosine_similarity(col("embedding"), col("ae")).as("cos_a"),
        graft.functions.VectorExpressions
          .cosine_similarity(col("embedding"), col("be")).as("cos_b")))
    def top(c: String, rk: String) = {
      val lim = scored.select(col("vec_id"), col(c))
        .orderBy(col(c).desc, col("vec_id")).limit(50)
      // bounded partition-less window: input is the limit(50) frame
      // above — 50 rows, never the corpus (r8 verdict #5 allowlist)
      lim.withColumn(rk, row_number().over(
          Window.orderBy(col(c).desc, col("vec_id"))))
        .select(col("vec_id"), col(rk))
    }
    top("cos_a", "rank_a")
      .join(top("cos_b", "rank_b"), Seq("vec_id"), "full_outer")
      .withColumn("rrf_raw",
        coalesce(lit(1.0) / (lit(60) + col("rank_a")), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + col("rank_b")), lit(0.0)))
      .orderBy(col("rrf_raw").desc, col("vec_id"))
      .select(col("vec_id"), col("rank_a"), col("rank_b"),
        round(col("rrf_raw"), 8).as("rrf"))
  }

  val rrfFusionSql: String =
    """WITH v AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |a AS (SELECT e AS ae FROM v WHERE vec_id = 0),
      |b AS (SELECT e AS be FROM v WHERE vec_id = 1),
      |sc AS (SELECT vec_id,
      |    list_dot_product(e, ae) / (sqrt(list_dot_product(e, e))
      |      * sqrt(list_dot_product(ae, ae))) AS cos_a,
      |    list_dot_product(e, be) / (sqrt(list_dot_product(e, e))
      |      * sqrt(list_dot_product(be, be))) AS cos_b
      |  FROM v CROSS JOIN a CROSS JOIN b WHERE vec_id > 1),
      |ra AS (SELECT vec_id, rank_a FROM (SELECT vec_id,
      |    row_number() OVER (ORDER BY cos_a DESC, vec_id) AS rank_a
      |  FROM sc) WHERE rank_a <= 50),
      |rb AS (SELECT vec_id, rank_b FROM (SELECT vec_id,
      |    row_number() OVER (ORDER BY cos_b DESC, vec_id) AS rank_b
      |  FROM sc) WHERE rank_b <= 50)
      |SELECT coalesce(ra.vec_id, rb.vec_id) AS vec_id, rank_a, rank_b,
      |  round(coalesce(1.0 / (60 + rank_a), 0.0)
      |    + coalesce(1.0 / (60 + rank_b), 0.0), 8) AS rrf
      |FROM ra FULL JOIN rb ON ra.vec_id = rb.vec_id
      |ORDER BY coalesce(1.0 / (60 + rank_a), 0.0)
      |  + coalesce(1.0 / (60 + rank_b), 0.0) DESC,
      |  coalesce(ra.vec_id, rb.vec_id)""".stripMargin

  /** Rendezvous (highest-random-weight) shard assignment + balance
    * audit (Thaler–Ravishankar '98) — the stateless document→shard map
    * a training-data writer uses when shards must stay stable under
    * shard-count changes (HRW moves only 1/S of keys on resize, vs
    * ~all for mod-hash): every doc goes to argmax over 8 shards of
    * md5(doc_id:shard), computed ROW-LOCALLY as an array_max over an
    * 8-struct array — assignment costs zero shuffles; only the
    * |shards|-row balance audit aggregates. The audit reports per-shard
    * doc count, char mass, and doc share — the skew check run before a
    * 1000-writer job is launched. Tiebreak (w, shard) struct-max =
    * larger shard id, mirrored exactly in the oracle's ORDER BY.
    */
  val rendezvousShards: Q = (s, dir) => {
    val S = 8
    val weights = array((0 until S).map { i =>
      struct(
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":" + i))), 1, 15), 16, 10).cast("long").as("w"),
        lit(i).as("shard"))
    }: _*)
    val assigned = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        array_max(weights).getField("shard").as("shard"))
    val tot = assigned.agg(count(lit(1)).as("n_tot"))
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_tot"))
      .crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_chars_tot"),
        round(col("n_docs").cast("double") / col("n_tot").cast("double"), 8)
          .as("doc_share"))
      .orderBy(col("shard"))
  }

  val rendezvousShardsSql: String =
    """WITH w AS (SELECT doc_id, n_chars, CAST(r.range AS INTEGER) AS shard,
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||':'
      |      ||CAST(r.range AS VARCHAR)), 1, 15))::BIGINT AS w
      |  FROM documents CROSS JOIN range(8) r),
      |pick AS (SELECT doc_id, n_chars, shard FROM (SELECT doc_id, n_chars,
      |    shard, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY w DESC, shard DESC) AS rn FROM w) WHERE rn = 1),
      |tot AS (SELECT count(*) AS n_tot FROM pick)
      |SELECT shard, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS n_chars_tot,
      |  round(CAST(count(*) AS DOUBLE) / CAST(n_tot AS DOUBLE), 8)
      |    AS doc_share
      |FROM pick CROSS JOIN tot
      |GROUP BY shard, n_tot ORDER BY shard""".stripMargin

  /** Kendall tau-b rank agreement (Kendall '38; tau-b tie correction)
    * between two per-source orderings — "do sources rank the same by
    * total char mass as by peak document size?", the sanity check run
    * before any rank-based mixture decision reuses one ranking as a
    * proxy for another (Pearson on the VALUES is q85; tau is the
    * rank-native complement, robust to monotone rescaling). Metrics
    * chosen to BIND on this corpus: per-source doc counts are uniform
    * by construction, so count-based ranks are all-ties — char mass and
    * max length both vary. All comparisons are EXACT INTEGER;
    * concordant/discordant/tied tallies are integer sums over the
    * sources²-bounded pair frame; only the single final tau
    * division+sqrt is float, and an all-ties axis (denominator 0)
    * reports NULL rather than tripping ANSI divide-by-zero. Scale: the
    * corpus collapses to |sources| rows before any pair work (the
    * q165/q197 discipline).
    */
  val rankAgreement: Q = (s, dir) => {
    val per = Dedup.pin(t(s, dir, "documents").groupBy(col("source"))
      .agg(sum(col("n_chars")).as("sc"), max(col("n_chars")).as("mx")))
    def sign(a: Column, b: Column) =
      when(a > b, 1).when(a < b, -1).otherwise(0)
    val pairs = per.as("a").join(per.as("b"),
        col("a.source") < col("b.source"))
      .select(
        sign(col("a.sc"), col("b.sc")).as("sx"),
        sign(col("a.mx"), col("b.mx")).as("sy"))
    pairs.agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("sx") * col("sy") > 0, 1L).otherwise(0L)).as("conc"),
        sum(when(col("sx") * col("sy") < 0, 1L).otherwise(0L)).as("disc"),
        sum(when(col("sx") === 0, 1L).otherwise(0L)).as("ties_x"),
        sum(when(col("sy") === 0, 1L).otherwise(0L)).as("ties_y"))
      .select(col("n_pairs"), col("conc"), col("disc"),
        col("ties_x"), col("ties_y"),
        when(col("n_pairs") === col("ties_x")
            || col("n_pairs") === col("ties_y"), lit(null).cast("double"))
          .otherwise(round((col("conc") - col("disc")).cast("double")
            / sqrt(((col("n_pairs") - col("ties_x"))
              * (col("n_pairs") - col("ties_y"))).cast("double")), 8))
          .as("tau_b"))
  }

  val rankAgreementSql: String =
    """WITH per AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS sc,
      |    CAST(max(n_chars) AS BIGINT) AS mx
      |  FROM documents GROUP BY source),
      |p AS (SELECT
      |    CASE WHEN a.sc > b.sc THEN 1 WHEN a.sc < b.sc THEN -1 ELSE 0
      |      END AS sx,
      |    CASE WHEN a.mx > b.mx THEN 1 WHEN a.mx < b.mx THEN -1 ELSE 0
      |      END AS sy
      |  FROM per a JOIN per b ON a.source < b.source)
      |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
      |  CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS disc,
      |  CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
      |  CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_y,
      |  CASE WHEN count(*) = sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END)
      |      OR count(*) = sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END)
      |    THEN NULL
      |    ELSE round(CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END)
      |        - sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |      / sqrt(CAST((count(*) - sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END))
      |        * (count(*) - sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END))
      |        AS DOUBLE)), 8) END AS tau_b
      |FROM p""".stripMargin

  /** Rolling 7-day distinct active users (the DAU/WAU curve every
    * engagement dashboard draws — and a sliding-window DISTINCT, the
    * aggregate Spark windows cannot express directly because distinct
    * state doesn't decompose): the corpus first collapses to DISTINCT
    * (user, day) memberships, then each membership fans out to the ≤7
    * grid days it is visible from (a CONSTANT fan-out range join
    * against the broadcast |days|-row grid — never a per-day rescan of
    * the corpus), and each grid day counts distinct users. DAU rides
    * the same membership frame with no fan-out. Scale: memberships are
    * |users|×|days| at worst; the window length bounds the join
    * multiplicity, so cost is 7·|memberships| regardless of corpus
    * size.
    */
  val rollingActiveUsers: Q = (s, dir) => {
    val mem = Dedup.pin(Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct())
    val days = mem.select(col("d")).distinct()
    val dau = mem.groupBy(col("d")).agg(countDistinct(col("user_id")).as("dau"))
    val wau = broadcast(days).as("g")
      .join(mem.as("m"),
        col("m.d") >= date_sub(col("g.d"), 6) && col("m.d") <= col("g.d"))
      .groupBy(col("g.d").as("d"))
      .agg(countDistinct(col("m.user_id")).as("wau"))
    dau.join(wau, Seq("d"))
      .select(col("d"), col("dau"), col("wau"))
      .orderBy(col("d"))
  }

  val rollingActiveUsersSql: String =
    """WITH mem AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
      |  FROM events),
      |days AS (SELECT DISTINCT d FROM mem),
      |dau AS (SELECT d, count(DISTINCT user_id) AS dau FROM mem GROUP BY d),
      |wau AS (SELECT g.d, count(DISTINCT m.user_id) AS wau
      |  FROM days g JOIN mem m ON m.d >= g.d - 6 AND m.d <= g.d
      |  GROUP BY g.d)
      |SELECT dau.d, dau, wau FROM dau JOIN wau ON dau.d = wau.d
      |ORDER BY dau.d""".stripMargin

  /** Stream-stream interval join parity — the FOURTH oracle-gated
    * Structured Streaming query, covering the last core streaming join
    * shape after q177 (windowed agg), q194 (stateful dedup) and q203
    * (stream-static join): view events joined to purchase events of the
    * same user within 2 hours AFTER the view (click-to-conversion
    * attribution), both sides watermarked, matches hash-checked against
    * the batch interval-join oracle. The gate watermark is
    * eviction-free (31 days > the corpus span) so stream ≡ batch
    * EXACTLY regardless of file arrival order; production uses a tight
    * watermark and accepts bounded lateness — the PLAN is identical,
    * only the eviction horizon differs. Per-pair gaps are exact integer
    * µs; the per-user rollup aggregates the memory-sink table in batch
    * (one stateful op per stream — the Spark multi-stateful
    * restriction).
    */
  val streamIntervalJoin: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
    val srcDir = scratch("graft_stream_ssjoin_src")
    Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .repartition(4)
      .write.mode("overwrite").parquet(srcDir.toString)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", org.apache.spark.sql.types.DoubleType)))
    def side(tpe: String) = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      .filter(col("event_type") === tpe)
    val joined = EventStreams.joinWithinWindow(
      side("view"), side("purchase"), "user_id", "2 hours", "31 days")
    val qname = "graft_stream_ssjoin_sink"
    val sq = joined
      .select(col("user_id"), col("l_id"), col("r_id"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))).as("gap_us"))
      .writeStream.outputMode("append").format("memory")
      .queryName(qname).trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    s.table(qname)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("gap_us")).as("sum_gap_us"))
      .orderBy(col("user_id"))
  }

  val streamIntervalJoinSql: String =
    """WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
      |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT v.user_id, count(*) AS n_pairs,
      |  CAST(sum(epoch_us(p.ts) - epoch_us(v.ts)) AS BIGINT) AS sum_gap_us
      |FROM v JOIN p ON v.user_id = p.user_id
      |  AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 2 HOUR
      |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin

  /** Streaming sessionization parity — the FIFTH oracle-gated
    * Structured Streaming query, and the first to gate CUSTOM state
    * (`flatMapGroupsWithState`, event-time timeout — the §2.8 surface
    * q177/q194/q203/q208 don't touch): 30-minute-gap user sessions
    * computed by [[EventStreams.sessionize]] over a 5-batch file
    * stream, hash-matched against the batch gaps-and-islands oracle.
    * Parity engineering: (1) files are staged TIME-PARTITIONED (4
    * disjoint event-time quarters, modtimes forced monotone) so
    * cross-batch arrival order is event-time order and nothing is ever
    * late past the 2 h watermark; (2) a far-future sentinel event
    * (user −1) closes the stream — its watermark advance makes the
    * trailing no-data batch fire every pending timeout, so OPEN
    * sessions flush (append mode would otherwise withhold them); (3)
    * session boundaries are exact event-time µs (EventStreams µs
    * state), and values ride as exact CENTS (whole doubles sum exactly
    * in any order) emitted as BIGINT — no float crosses a row
    * boundary. Scale: state is one small struct per ACTIVE user,
    * evicted by timeout; this is the production ingest-sessionizer
    * shape.
    */
  val streamSessions: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val srcDir = scratch("graft_stream_sess_src")
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("double").as("value"))
    // min/max are NULL on an empty corpus; any fixed span then stages
    // four empty quarters plus the sentinel, and the gate returns 0 rows
    val bounds = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0L, 4L)
      else (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(hi - lo, 4L)
    Staging.stageSlices(ev, unix_micros(col("ts")), 4, lo, span, srcDir,
      scratch("graft_stream_sess_stage"), Seq(col("event_id")))
    // sentinel: one far-future event advances the watermark past every
    // pending session timeout so append-mode state flushes at end-of-stream
    Staging.stageOne(s.range(1).select(lit(-1L).as("event_id"),
      timestamp_micros(lit(hi + 30L * 86400L * 1000000L)).as("ts"),
      lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
      lit(0.0).as("value")), 4, srcDir, scratch("graft_stream_sess_sent"))
    val stream = s.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir.toString)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[graft.streaming.EventStreams.Event]
    val sessions = graft.streaming.EventStreams.sessionize(stream)(s)
    val qname = "graft_stream_sess_sink"
    val sq = sessions.toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName(qname).trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    s.table(qname)
      .filter(col("user_id") >= 0)
      .select(col("user_id"), unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"), col("n_events"),
        col("total_value").cast("long").as("total_cents"))
      .orderBy(col("user_id"), col("start_us"))
  }

  val streamSessionsSql: String =
    """WITH e AS (SELECT user_id, ts,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |l AS (SELECT user_id, ts, cents,
      |    CASE WHEN lag(ts) OVER w IS NULL OR epoch_us(ts)
      |        - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0
      |      END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |g AS (SELECT user_id, ts, cents,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM l)
      |SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
      |  CAST(epoch_us(max(ts)) AS BIGINT) AS end_us,
      |  count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS total_cents
      |FROM g GROUP BY user_id, sid
      |ORDER BY user_id, start_us""".stripMargin

  /** Per-label embedding separability audit (Fisher '36 discriminant
    * ratio, diagonal form) — the label-quality check run before
    * embeddings are trusted for supervised mining (q196) or
    * cluster-keyed dedup (q155): for each label, between-class scatter
    * ‖μ_ℓ − μ_global‖² over within-class scatter (mean squared distance
    * to the label centroid). Everything reduces to per-(label, dim)
    * moment cells — n, Σx (decimal via the q68 float→STRING→decimal
    * route), Σx² (decimal product) — so the corpus is touched once and
    * all scatter algebra runs on the |labels|×dims moment frame.
    * Centroids are rounded to 6 dp FIRST (single exact-decimal→double
    * division + round, both engines), then re-enter decimal so the
    * dim-sums of squared components stay exact — no cross-row float
    * addition anywhere. Scale: moment cells are |labels|·dims rows.
    */
  val labelSeparability: Q = (s, dir) => {
    val cells = Dedup.pin(t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("vd", col("v").cast("string").cast("decimal(18,9)"))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("vd")).as("sx"),
        sum(col("vd") * col("vd")).as("sxx")))
    val mu = cells.withColumn("mu",
      round(col("sx").cast("double") / col("n"), 6).cast("decimal(18,6)"))
    val glob = cells.groupBy(col("pos"))
      .agg(sum(col("sx")).as("gx"), sum(col("n")).as("gn"))
      .withColumn("gmu",
        round(col("gx").cast("double") / col("gn"), 6).cast("decimal(18,6)"))
      .select(col("pos"), col("gmu"))
    mu.join(broadcast(glob), Seq("pos"))
      .groupBy(col("label"))
      .agg(max(col("n")).as("n_vecs"),
        sum(col("sxx")).as("q"),
        sum(col("mu") * col("mu")).as("smu2"),
        sum((col("mu") - col("gmu")) * (col("mu") - col("gmu"))).as("sbet"))
      .select(col("label"), col("n_vecs"),
        round(col("q").cast("double") / col("n_vecs")
          - col("smu2").cast("double"), 6).as("within"),
        round(col("sbet").cast("double"), 6).as("between"),
        round(col("sbet").cast("double")
          / (col("q").cast("double") / col("n_vecs")
            - col("smu2").cast("double")), 6).as("fisher"))
      .orderBy(col("label"))
  }

  val labelSeparabilitySql: String =
    """WITH cells AS (SELECT label, d.dim AS pos, count(*) AS n,
      |    sum(CAST(CAST(embedding[d.dim] AS VARCHAR) AS DECIMAL(18,9)))
      |      AS sx,
      |    sum(CAST(CAST(embedding[d.dim] AS VARCHAR) AS DECIMAL(18,9))
      |      * CAST(CAST(embedding[d.dim] AS VARCHAR) AS DECIMAL(18,9)))
      |      AS sxx
      |  FROM embeddings
      |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS dim) d
      |  GROUP BY 1, 2),
      |mu AS (SELECT *, CAST(round(CAST(sx AS DOUBLE) / n, 6)
      |    AS DECIMAL(18,6)) AS mu FROM cells),
      |gc AS (SELECT pos, CAST(round(CAST(sum(sx) AS DOUBLE)
      |      / CAST(sum(n) AS BIGINT), 6) AS DECIMAL(18,6)) AS gmu
      |  FROM cells GROUP BY pos)
      |SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
      |  round(CAST(sum(sxx) AS DOUBLE) / max(n)
      |    - CAST(sum(mu * mu) AS DOUBLE), 6) AS within,
      |  round(CAST(sum((mu - gmu) * (mu - gmu)) AS DOUBLE), 6) AS between,
      |  round(CAST(sum((mu - gmu) * (mu - gmu)) AS DOUBLE)
      |    / (CAST(sum(sxx) AS DOUBLE) / max(n)
      |      - CAST(sum(mu * mu) AS DOUBLE)), 6) AS fisher
      |FROM mu JOIN gc USING (pos)
      |GROUP BY label ORDER BY label""".stripMargin

  /** Retrieval-quality evaluation: nDCG@20 (Järvelin–Kekäläinen '02)
    * of a cosine ranking against label relevance — the eval harness a
    * similarity-search deployment (q24/q25/q40) runs on labeled probes:
    * anchor = vec 0, relevant = same label, ranking = raw-double cosine
    * with id tiebreak (the q24 ordered-summation precedent). Every DCG
    * term is round(rel/log₂(rank+1), 8) → DECIMAL before summation —
    * the discount constants are data-independent and verified
    * bit-equal between JVM `Math.log` and DuckDB `ln` for all ranks
    * used — so no float ever crosses a row boundary. iDCG reuses the
    * same 20-rank frame gated by the corpus-wide relevant count
    * (broadcast 1-row). Scale: one corpus scan, TakeOrdered top-20,
    * all scoring on the 20-row frame.
    */
  val ndcgEval: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val anchor = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("ae"), col("label").as("albl"))
    val scored = emb.crossJoin(broadcast(anchor))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        (col("label") === col("albl")).cast("int").as("rel"),
        graft.functions.VectorExpressions
          .cosine_similarity(col("embedding"), col("ae")).as("cos"))
    val nRel = scored.agg(sum(col("rel")).as("n_rel"))
    // bounded partition-less window: input is the limit(20) frame —
    // 20 rows, never the corpus (r8 verdict #5 allowlist)
    val top = Dedup.pin(scored.orderBy(col("cos").desc, col("vec_id")).limit(20)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id")))))
    val disc = lit(1.0) / (log(col("rk") + 1) / log(lit(2.0)))
    top.crossJoin(broadcast(nRel))
      .agg(max(col("n_rel")).as("n_rel"),
        sum(round(col("rel") * disc, 8).cast("decimal(18,8)")).as("dcgd"),
        sum(when(col("rk") <= col("n_rel"),
          round(disc, 8).cast("decimal(18,8)"))
          .otherwise(lit(0).cast("decimal(18,8)"))).as("idcgd"))
      .select(col("n_rel"),
        round(col("dcgd").cast("double"), 8).as("dcg"),
        round(col("idcgd").cast("double"), 8).as("idcg"),
        round(col("dcgd").cast("double") / col("idcgd").cast("double"), 6)
          .as("ndcg"))
  }

  val ndcgEvalSql: String =
    """WITH v AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |a AS (SELECT e AS ae, label AS albl FROM v WHERE vec_id = 0),
      |sc AS (SELECT vec_id,
      |    CASE WHEN label = albl THEN 1 ELSE 0 END AS rel,
      |    list_dot_product(e, ae) / (sqrt(list_dot_product(e, e))
      |      * sqrt(list_dot_product(ae, ae))) AS cos
      |  FROM v CROSS JOIN a WHERE vec_id <> 0),
      |nr AS (SELECT CAST(sum(rel) AS BIGINT) AS n_rel FROM sc),
      |top AS (SELECT rel, rk FROM (SELECT rel,
      |    row_number() OVER (ORDER BY cos DESC, vec_id) AS rk
      |  FROM sc) WHERE rk <= 20)
      |SELECT n_rel,
      |  round(CAST(sum(CAST(round(rel * (1.0 / (ln(rk + 1) / ln(2))), 8)
      |    AS DECIMAL(18,8))) AS DOUBLE), 8) AS dcg,
      |  round(CAST(sum(CASE WHEN rk <= n_rel
      |    THEN CAST(round(1.0 / (ln(rk + 1) / ln(2)), 8) AS DECIMAL(18,8))
      |    ELSE CAST(0 AS DECIMAL(18,8)) END) AS DOUBLE), 8) AS idcg,
      |  round(CAST(sum(CAST(round(rel * (1.0 / (ln(rk + 1) / ln(2))), 8)
      |      AS DECIMAL(18,8))) AS DOUBLE)
      |    / CAST(sum(CASE WHEN rk <= n_rel
      |      THEN CAST(round(1.0 / (ln(rk + 1) / ln(2)), 8) AS DECIMAL(18,8))
      |      ELSE CAST(0 AS DECIMAL(18,8)) END) AS DOUBLE), 6) AS ndcg
      |FROM top CROSS JOIN nr GROUP BY n_rel""".stripMargin

  /** Graph modularity of an attribute partition (Newman–Girvan '04,
    * Q = Σ_c [e_c/m − (d_c/2m)²]) — the assortativity audit run before
    * trusting a metadata column as a clustering proxy: does the
    * co-purchase part graph (q143's edge set, max-basket-guarded)
    * actually cluster by manufacturer? All inputs are exact integers
    * (within-class edge count e_c, class degree sum d_c, edge total m)
    * computed on the DISTINCT undirected edge list; each class term is
    * one compound float expression rounded to 8 places → DECIMAL, so
    * the cross-class sum is exact (the q126/q163 entropy-term
    * discipline). Scale: edges are basket²-bounded per order (capped),
    * degrees one keyed agg, class terms |classes| rows.
    */
  val modularityAudit: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
    val und = Dedup.pin(graft.ops.Graph
      .coOccurrenceEdges(li, "okey", "pk", 64)
      .filter(col("src") < col("dst")).distinct())
    val cls = t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    val m = und.agg(count(lit(1)).as("m"))
    val deg = und.select(col("src").as("pk"))
      .unionAll(und.select(col("dst").as("pk")))
      .groupBy(col("pk")).agg(count(lit(1)).as("deg"))
    val dSum = deg.join(cls, col("pk") === col("p_partkey"))
      .groupBy(col("p_brand")).agg(sum(col("deg")).as("d_c"),
        count(lit(1)).as("n_nodes"))
    val eIn = und
      .join(cls.select(col("p_partkey").as("src"), col("p_brand").as("ma")), "src")
      .join(cls.select(col("p_partkey").as("dst"), col("p_brand").as("mb")), "dst")
      .filter(col("ma") === col("mb"))
      .groupBy(col("ma").as("p_brand")).agg(count(lit(1)).as("e_c"))
    dSum.join(eIn, Seq("p_brand"), "left")
      .select(col("p_brand"), col("n_nodes"), col("d_c"),
        coalesce(col("e_c"), lit(0L)).as("e_c"))
      .crossJoin(broadcast(m))
      .select(col("p_brand"), col("m"),
        round(col("e_c").cast("double") / col("m")
          - (col("d_c").cast("double") / (lit(2) * col("m")))
            * (col("d_c").cast("double") / (lit(2) * col("m"))), 8)
          .cast("decimal(18,8)").as("term"))
      .agg(count(lit(1)).as("n_classes"), max(col("m")).as("m_edges"),
        round(sum(col("term")).cast("double"), 8).as("modularity"))
  }

  val modularityAuditSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
      |  FROM lineitem),
      |cap AS (SELECT okey, pk FROM (SELECT okey, pk, row_number()
      |    OVER (PARTITION BY okey ORDER BY pk) AS rn FROM b)
      |  WHERE rn <= 64),
      |und AS (SELECT DISTINCT a.pk AS src, b2.pk AS dst
      |  FROM cap a JOIN cap b2 ON a.okey = b2.okey AND a.pk < b2.pk),
      |m AS (SELECT count(*) AS m FROM und),
      |deg AS (SELECT pk, count(*) AS deg FROM (
      |    SELECT src AS pk FROM und UNION ALL SELECT dst FROM und)
      |  GROUP BY pk),
      |ds AS (SELECT p_brand, CAST(sum(deg) AS BIGINT) AS d_c,
      |    count(*) AS n_nodes
      |  FROM deg JOIN part ON pk = p_partkey GROUP BY p_brand),
      |ei AS (SELECT pa.p_brand, count(*) AS e_c
      |  FROM und JOIN part pa ON und.src = pa.p_partkey
      |  JOIN part pb ON und.dst = pb.p_partkey
      |  WHERE pa.p_brand = pb.p_brand GROUP BY pa.p_brand),
      |terms AS (SELECT ds.p_brand, n_nodes, coalesce(e_c, 0) AS e_c, d_c,
      |    CAST(round(CAST(coalesce(e_c, 0) AS DOUBLE) / m
      |      - (CAST(d_c AS DOUBLE) / (2 * m))
      |        * (CAST(d_c AS DOUBLE) / (2 * m)), 8) AS DECIMAL(18,8))
      |      AS term
      |  FROM ds LEFT JOIN ei ON ds.p_brand = ei.p_brand CROSS JOIN m)
      |SELECT count(*) AS n_classes, CAST(max(m) AS BIGINT) AS m_edges,
      |  round(CAST(sum(term) AS DOUBLE), 8) AS modularity
      |FROM terms CROSS JOIN m""".stripMargin
}
