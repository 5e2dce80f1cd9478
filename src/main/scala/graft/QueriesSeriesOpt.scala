package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{Readers, Writers}
import graft.ops.{Dedup, Layout, Multimodal, Ranks, SimSearch, Skew, TextStats, TopK}
import graft.transform.{Canonicalize, Enrich, Harmonize, Normalize}
import graft.quality.Expectations._
import graft.streaming.{EventStreams, Staging}

/** Time-series diagnostics and optimizer-infrastructure tier: ACF, z-order layout, DPP, CBO reorder, AQE skew, stream-stream joins.
  *
  * Mechanical split of the former single-file catalog (r10 verdict
  * hygiene note): one trait per family, linear chain, zero behavior
  * change. `Queries` mixes the chain in; entries register in
  * `Queries.all` / `Queries.oracles`.
  */
trait QueriesSeriesOpt extends QueriesMultimodal {
  /** Autocorrelation function of the daily event-count series, lags
    * 1–7 (Box–Jenkins Ch. 2 — the first diagnostic run on any metric
    * series before forecasting or anomaly models): the day axis is
    * DENSIFIED to a contiguous integer grid (outage days count as 0 —
    * silently skipping them shifts every lag), and r_k uses the
    * standard single-mean estimator. All moments are exact integers:
    * with S=Σx, Q=Σx², C_k=Σ x_t·x_{t+k} and A_k/B_k the truncated
    * sums, r_k = (n²C_k − nS(A_k+B_k) + (n−k)S²) / (n(nQ − S²)) — the
    * whole derivation rides DECIMAL(38,0) (x² sums wrap int64 at
    * corpus scale) and leaves integer space at ONE final division per
    * lag. Scale: one corpus scan into a |days|-row grid; the lag join
    * is grid×7, domain-bounded forever.
    */
  val acfDaily: Q = (s, dir) => {
    val ev = Tables.events(s, dir).select(to_date(col("ts")).as("d"))
    val b = ev.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val daily = ev.crossJoin(broadcast(b))
      .groupBy(datediff(col("d"), col("d0")).as("t"))
      .agg(count(lit(1)).as("x"))
    val grid = Dedup.pin(b
      .select(explode(sequence(lit(0), datediff(col("d1"), col("d0"))))
        .as("t"))
      .join(daily, Seq("t"), "left")
      .select(col("t"),
        coalesce(col("x"), lit(0L)).cast("decimal(38,0)").as("x")))
    val m = grid.agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("q"))
    val lagged = grid.as("a")
      .join(broadcast(grid).as("b"),
        col("b.t") - col("a.t") >= 1 && col("b.t") - col("a.t") <= 7)
      .groupBy((col("b.t") - col("a.t")).as("k"))
      .agg(sum(col("a.x") * col("b.x")).as("ck"),
        sum(col("a.x")).as("ak"), sum(col("b.x")).as("bk"))
    val nD = col("n").cast("decimal(38,0)")
    lagged.crossJoin(broadcast(m))
      .select(col("k"),
        round((nD * nD * col("ck") - nD * col("s") * (col("ak") + col("bk"))
          + (nD - col("k")) * col("s") * col("s")).cast("double")
          / (nD * (nD * col("q") - col("s") * col("s"))).cast("double"),
          6).as("acf"))
      .orderBy(col("k"))
  }

  val acfDailySql: String =
    """WITH e AS (SELECT CAST(ts AS DATE) AS d FROM events),
      |bnd AS (SELECT min(d) AS d0, max(d) AS d1 FROM e),
      |daily AS (SELECT datediff('day', d0, d) AS t,
      |    CAST(count(*) AS HUGEINT) AS x
      |  FROM e CROSS JOIN bnd GROUP BY 1),
      |grid AS (SELECT g.t, coalesce(daily.x, 0) AS x
      |  FROM (SELECT unnest(generate_series(0,
      |      datediff('day', d0, d1))) AS t FROM bnd) g
      |  LEFT JOIN daily ON daily.t = g.t),
      |m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS s,
      |    sum(x * x) AS q FROM grid),
      |lagged AS (SELECT b.t - a.t AS k, sum(a.x * b.x) AS ck,
      |    sum(a.x) AS ak, sum(b.x) AS bk
      |  FROM grid a JOIN grid b ON b.t - a.t BETWEEN 1 AND 7
      |  GROUP BY 1)
      |SELECT CAST(k AS INTEGER) AS k,
      |  round(CAST(n * n * ck - n * s * (ak + bk) + (n - k) * s * s
      |      AS DOUBLE)
      |    / CAST(n * (n * q - s * s) AS DOUBLE), 6) AS acf
      |FROM lagged CROSS JOIN m ORDER BY k""".stripMargin

  /** Mutual information + Cramér's V between two categorical columns
    * (nation × market segment) — the dependence audit run before
    * treating features as independent (stratification keys, naive-Bayes
    * style mixing, leakage screens). Complements q246's chi² DRIFT test
    * (same-variable across time) with cross-VARIABLE association, on
    * effect-size scales that don't grow with N the way raw chi² does.
    * All counts reduce to the |nations|×|segments| contingency grid +
    * two marginal frames (broadcast joins); per-cell chi²/MI terms are
    * ONE compound float expression from exact integers (identical op
    * order both engines), rounded to 8 dp and summed in DECIMAL — no
    * raw float crosses a row boundary (the q287 PSI discipline). Scale:
    * one corpus scan, then grid-sized algebra forever.
    */
  val mutualInformation: Q = (s, dir) => {
    val base = t(s, dir, "customer")
      .select(col("c_nationkey").as("i"), col("c_mktsegment").as("j"))
    val cells = Dedup.pin(base.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("nij")))
    val rows_ = cells.groupBy(col("i")).agg(sum(col("nij")).as("ri"))
    val cols_ = cells.groupBy(col("j")).agg(sum(col("nij")).as("cj"))
    val tot = cells.agg(sum(col("nij")).as("n"),
      countDistinct(col("i")).as("r_levels"),
      countDistinct(col("j")).as("c_levels"))
    val joined = cells
      .join(broadcast(rows_), Seq("i"))
      .join(broadcast(cols_), Seq("j"))
      .crossJoin(broadcast(tot))
    val nd = col("nij").cast("double"); val rd = col("ri").cast("double")
    val cd = col("cj").cast("double"); val tn = col("n").cast("double")
    val terms = joined.select(col("n"), col("r_levels"), col("c_levels"),
      round(pow(nd - rd * cd / tn, 2) / (rd * cd / tn), 8)
        .cast("decimal(28,8)").as("chi_term"),
      round((nd / tn) * log(nd * tn / (rd * cd)), 8)
        .cast("decimal(28,8)").as("mi_term"))
    terms.groupBy(col("n"), col("r_levels"), col("c_levels"))
      .agg(sum(col("chi_term")).as("chi2x"), sum(col("mi_term")).as("mix"))
      .select(col("n"), col("r_levels"), col("c_levels"),
        round(col("chi2x").cast("double"), 6).as("chi2"),
        round(sqrt(col("chi2x").cast("double")
          / (col("n").cast("double")
            * least(col("r_levels") - 1, col("c_levels") - 1)
              .cast("double"))), 6).as("cramers_v"),
        round(col("mix").cast("double"), 6).as("mi_nats"))
  }

  val mutualInformationSql: String =
    """WITH cells AS (SELECT c_nationkey AS i, c_mktsegment AS j,
      |    CAST(count(*) AS BIGINT) AS nij
      |  FROM customer GROUP BY 1, 2),
      |r AS (SELECT i, CAST(sum(nij) AS BIGINT) AS ri FROM cells GROUP BY i),
      |c AS (SELECT j, CAST(sum(nij) AS BIGINT) AS cj FROM cells GROUP BY j),
      |t AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
      |    count(DISTINCT i) AS r_levels, count(DISTINCT j) AS c_levels
      |  FROM cells),
      |terms AS (SELECT n, r_levels, c_levels,
      |    CAST(round(pow(CAST(nij AS DOUBLE) - CAST(ri AS DOUBLE)
      |          * CAST(cj AS DOUBLE) / CAST(n AS DOUBLE), 2)
      |        / (CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE)
      |          / CAST(n AS DOUBLE)), 8) AS DECIMAL(28,8)) AS chi_term,
      |    CAST(round((CAST(nij AS DOUBLE) / CAST(n AS DOUBLE))
      |        * ln(CAST(nij AS DOUBLE) * CAST(n AS DOUBLE)
      |          / (CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE))), 8)
      |      AS DECIMAL(28,8)) AS mi_term
      |  FROM cells JOIN r USING (i) JOIN c USING (j) CROSS JOIN t)
      |SELECT n, r_levels, c_levels,
      |  round(CAST(sum(chi_term) AS DOUBLE), 6) AS chi2,
      |  round(sqrt(CAST(sum(chi_term) AS DOUBLE)
      |    / (CAST(n AS DOUBLE)
      |      * CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE))), 6)
      |    AS cramers_v,
      |  round(CAST(sum(mi_term) AS DOUBLE), 6) AS mi_nats
      |FROM terms GROUP BY n, r_levels, c_levels""".stripMargin

  /** Theil T inequality index with its exact within/between
    * decomposition (Theil '67) over order revenue grouped by priority
    * class — the concentration audit whose decomposition answers "is
    * revenue inequality WITHIN segments or BETWEEN them?" (Gini, which
    * q199 ships for skew, does not decompose additively; Theil does —
    * that is the reason it exists). Revenue rides as exact integer
    * CENTS; every per-order term (x/μ)·ln(x/μ) is one compound float
    * expression from exact integers (x·N/S — identical op order both
    * engines), rounded to 8 dp and summed in DECIMAL. Group frames are
    * |priorities|-row broadcasts; the identity Σ_g(w_g·T_g + w_g·ln(μ_g/μ))
    * = T_total is spec-asserted from this output. Scale: two corpus
    * scans (total + within terms), grid algebra after.
    */
  val theilDecomposition: Q = (s, dir) => {
    val o = Dedup.pin(t(s, dir, "orders")
      .select(col("o_orderpriority").as("grp"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("decimal(38,0)").as("cents")))
    val g = Dedup.pin(o.groupBy(col("grp"))
      .agg(count(lit(1)).as("ng"), sum(col("cents")).as("sg")))
    val tot = g.agg(sum(col("ng")).as("n"), sum(col("sg")).as("stot"))
    val withG = o.join(broadcast(g), Seq("grp"))
      .crossJoin(broadcast(tot))
    val xd = col("cents").cast("double")
    def term(num: Column, den: Column): Column = {
      val ratio = xd * num.cast("double") / den.cast("double")
      round(ratio * log(ratio), 8).cast("decimal(28,8)")
    }
    withG
      .select(col("grp"), col("ng"), col("sg"), col("n"), col("stot"),
        term(col("ng"), col("sg")).as("tw"))
      .groupBy(col("grp"), col("ng"), col("sg"), col("n"), col("stot"))
      .agg(sum(col("tw")).as("tws"))
      .select(col("grp"), col("ng").as("n_orders"),
        expr("(sg * 10000) div stot").as("rev_share_bp"),
        round(col("tws").cast("double") / col("ng").cast("double"), 6)
          .as("t_within"),
        round((col("sg").cast("double") / col("stot").cast("double"))
          * (col("tws").cast("double") / col("ng").cast("double")), 6)
          .as("w_t_within"),
        round((col("sg").cast("double") / col("stot").cast("double"))
          * log((col("sg").cast("double") * col("n").cast("double"))
            / (col("stot").cast("double") * col("ng").cast("double"))), 6)
          .as("between_term"))
      .orderBy(col("grp"))
  }

  val theilDecompositionSql: String =
    """WITH o AS (SELECT o_orderpriority AS grp,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS HUGEINT) AS cents
      |  FROM orders),
      |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS ng,
      |    sum(cents) AS sg FROM o GROUP BY grp),
      |t AS (SELECT CAST(sum(ng) AS BIGINT) AS n, sum(sg) AS stot FROM g),
      |terms AS (SELECT grp, ng, sg, n, stot,
      |    CAST(round((CAST(cents AS DOUBLE) * CAST(ng AS DOUBLE)
      |        / CAST(sg AS DOUBLE))
      |      * ln(CAST(cents AS DOUBLE) * CAST(ng AS DOUBLE)
      |        / CAST(sg AS DOUBLE)), 8) AS DECIMAL(28,8)) AS tw
      |  FROM o JOIN g USING (grp) CROSS JOIN t)
      |SELECT grp, ng AS n_orders,
      |  CAST(sg * 10000 // stot AS BIGINT) AS rev_share_bp,
      |  round(CAST(sum(tw) AS DOUBLE) / CAST(ng AS DOUBLE), 6) AS t_within,
      |  round((CAST(sg AS DOUBLE) / CAST(stot AS DOUBLE))
      |    * (CAST(sum(tw) AS DOUBLE) / CAST(ng AS DOUBLE)), 6)
      |    AS w_t_within,
      |  round((CAST(sg AS DOUBLE) / CAST(stot AS DOUBLE))
      |    * ln((CAST(sg AS DOUBLE) * CAST(n AS DOUBLE))
      |      / (CAST(stot AS DOUBLE) * CAST(ng AS DOUBLE))), 6)
      |    AS between_term
      |FROM terms GROUP BY grp, ng, sg, n, stot
      |ORDER BY grp""".stripMargin

  /** IVF ANN with a TRAINED codebook (r9 advice #4): q40 proved the IVF
    * machinery at nprobe = all-cells (collapsing to brute force); this
    * gate runs the REAL configuration — a codebook LEARNED by two Lloyd
    * iterations ([[SimSearch.kmeansCentroids]]) and nprobe = 2 of 4
    * cells, so the result depends on the trained cell structure and the
    * probe pruning, not just on cosine ranking. The whole training loop
    * is cross-engine recomputable (the q126 keyed-model pattern taken to
    * its limit — the model here is the codebook itself): the init sample
    * is md5-keyed ([[SimSearch.md5SampledCentroids]]), assignment is the
    * same double-arithmetic argmax both engines evaluate, and per-dim
    * means ride the q68 float→STRING→decimal route with a single
    * double division + float rounding per cell — so the DuckDB oracle
    * re-derives the identical codebook FROM THE RAW TABLE, re-assigns
    * every vector, re-picks each query's 2 probe cells, and re-ranks.
    * Scale: training state is k×dim aggregate rows per round; the gate's
    * plan is the same write-time-partitionable cell join q40 runs.
    */
  val ivfTrained: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val corpus = emb.filter(col("vec_id") >= 10)
    val init = SimSearch.md5SampledCentroids(corpus, k = 4)
    val cents = SimSearch.kmeansCentroids(corpus, k = 4, iterations = 2,
      init = Some(init))
    SimSearch.ivfTopK(corpus, emb.filter(col("vec_id") < 10), k = 3,
      centroids = cents, nprobe = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  val ivfTrainedSql: String = {
    // one Lloyd round: assign every corpus vector to its max-cosine cell
    // (tie → min cell id), then per-(cell, dim) float→string→decimal
    // mean → double divide → float round; empty cells keep their
    // previous centroid. `prev` is the prior round's (cell, ce) CTE.
    def assign(out: String, prev: String): String =
      s"""$out AS (SELECT vec_id, v, cell FROM (
         |  SELECT r.vec_id, r.v, c.cell, row_number() OVER (
         |      PARTITION BY r.vec_id ORDER BY
         |      list_dot_product(r.ve, c.ce) /
         |        (sqrt(list_dot_product(r.ve, r.ve))
         |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
         |  FROM corpus r CROSS JOIN $prev c) WHERE rn = 1)""".stripMargin
    def refine(out: String, asg: String, prev: String): String =
      s"""${out}m AS (SELECT cell, d,
         |    CAST(CAST(sum(CAST(CAST(v[d] AS VARCHAR) AS DECIMAL(28,9)))
         |        AS DOUBLE) / count(*) AS REAL) AS mu
         |  FROM $asg CROSS JOIN generate_series(1, 64) g(d)
         |  GROUP BY cell, d),
         |$out AS (SELECT p.cell, coalesce(m.ml, p.ce) AS ce
         |  FROM $prev p LEFT JOIN (SELECT cell,
         |      list(CAST(mu AS DOUBLE) ORDER BY d) AS ml
         |    FROM ${out}m GROUP BY cell) m USING (cell))""".stripMargin
    s"""WITH corpus AS (SELECT vec_id, embedding AS v,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
       |  FROM embeddings WHERE vec_id >= 10),
       |qs AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
       |  FROM embeddings WHERE vec_id < 10),
       |c0 AS (SELECT vec_id AS cell,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
       |  FROM embeddings WHERE vec_id >= 10
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4),
       |${assign("a1", "c0")},
       |${refine("c1", "a1", "c0")},
       |${assign("a2", "c1")},
       |${refine("c2", "a2", "c1")},
       |cc AS (SELECT vec_id, cell FROM (
       |  SELECT r.vec_id, c.cell, row_number() OVER (
       |      PARTITION BY r.vec_id ORDER BY
       |      list_dot_product(r.ve, c.ce) /
       |        (sqrt(list_dot_product(r.ve, r.ve))
       |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
       |  FROM corpus r CROSS JOIN c2 c) WHERE rn = 1),
       |qp AS (SELECT vec_id AS query_id, ve AS qve, cell FROM (
       |  SELECT q.vec_id, q.ve, c.cell, row_number() OVER (
       |      PARTITION BY q.vec_id ORDER BY
       |      list_dot_product(q.ve, c.ce) /
       |        (sqrt(list_dot_product(q.ve, q.ve))
       |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
       |  FROM qs q CROSS JOIN c2 c) WHERE rn <= 2),
       |cand AS (SELECT qp.query_id, r.vec_id AS neighbor_id,
       |    list_dot_product(qp.qve, r.ve) /
       |      (sqrt(list_dot_product(qp.qve, qp.qve))
       |       * sqrt(list_dot_product(r.ve, r.ve))) AS score
       |  FROM qp JOIN cc ON qp.cell = cc.cell
       |    JOIN corpus r ON cc.vec_id = r.vec_id),
       |ranked AS (SELECT query_id, neighbor_id, score, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
       |  FROM cand)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       |  round(score, 6) AS score
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** Day-2 incremental semantic dedup (r9 advice #5 — the embedding
    * analog of q265's MinHash maintenance, completing the IVM family
    * with the SEMANTIC index): a planted day-2 batch — 30 verbatim
    * copies of day-1 vectors under shifted ids (provable dups: cosine 1
    * ≫ 0.99, and an identical vector lands in its original's cell) plus
    * a set of NEGATED vectors (provably fresh: cos(−a, b) = −cos(a, b)
    * ≤ ~0.51 on this corpus) — is screened against the standing day-1
    * index by [[Dedup.incrementalSemanticDedup]], probing ONLY index
    * members of the batch's own cells. Day-2 completeness AND scope are
    * both in the oracle: it recomputes every batch×index same-cell
    * cosine (so a missed dup fails the gate) and BY CONSTRUCTION
    * contains no index×index pair (so old×old work can't silently fund
    * the result — the q265 scope clause, structural here). Scale: day-2
    * cost is |Δ| × mean cell occupancy; the index is never self-joined.
    */
  val incrementalSemdedup: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val cents: Array[(Long, Array[Float])] = emb.filter(col("vec_id") < 8)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val copies = emb.filter(col("vec_id") < 30)
      .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"))
    val fresh = emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 300000L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    Dedup.incrementalSemanticDedup(emb, copies.unionByName(fresh), cents,
        threshold = 0.99)
      .select(col("id").as("vec_id"), col("cell"), col("dup_of"), col("kept"))
      .orderBy(col("vec_id"))
  }

  val incrementalSemdedupSql: String =
    """WITH emb AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |cents AS (SELECT vec_id AS cid, e AS ce FROM emb WHERE vec_id < 8),
      |batch AS (
      |  SELECT vec_id + 200000 AS vec_id, e FROM emb WHERE vec_id < 30
      |  UNION ALL
      |  SELECT vec_id + 300000, list_transform(e, x -> -x) FROM emb
      |  WHERE vec_id % 5 = 0),
      |ab AS (SELECT vec_id, e, cid AS cell FROM (
      |  SELECT b.vec_id, b.e, c.cid, row_number() OVER (
      |      PARTITION BY b.vec_id ORDER BY
      |      coalesce(list_dot_product(b.e, c.ce) /
      |        (sqrt(list_dot_product(b.e, b.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))), -2.0) DESC, c.cid)
      |    AS rn
      |  FROM batch b CROSS JOIN cents c) WHERE rn = 1),
      |ai AS (SELECT vec_id, e, cid AS cell FROM (
      |  SELECT v.vec_id, v.e, c.cid, row_number() OVER (
      |      PARTITION BY v.vec_id ORDER BY
      |      coalesce(list_dot_product(v.e, c.ce) /
      |        (sqrt(list_dot_product(v.e, v.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))), -2.0) DESC, c.cid)
      |    AS rn
      |  FROM emb v CROSS JOIN cents c) WHERE rn = 1),
      |hits AS (SELECT b.vec_id, min(i.vec_id) AS dup_of
      |  FROM ab b JOIN ai i ON b.cell = i.cell
      |  WHERE list_dot_product(b.e, i.e) /
      |      (sqrt(list_dot_product(b.e, b.e))
      |       * sqrt(list_dot_product(i.e, i.e))) >= 0.99
      |  GROUP BY b.vec_id)
      |SELECT b.vec_id, b.cell, h.dup_of, h.dup_of IS NULL AS kept
      |FROM ab b LEFT JOIN hits h USING (vec_id)
      |ORDER BY b.vec_id""".stripMargin

  /** Streaming dropped-late-row observability (r9 advice #6 — the first
    * gate on streaming's NEGATIVE space): q293 proved watermark-driven
    * null EMISSION; this proves watermark-driven DROPPING, hash-checked
    * through the engine's own observability surface — the
    * `numRowsDroppedByWatermark` state-operator metric summed over the
    * run's StreamingQueryProgress events. Arrival disorder is planted
    * with the q258 md5 jitter model widened to [0, 60 h) — wide enough
    * to push events MORE than one span-sixteenth micro-batch behind
    * (~45 h here), which is what real dropping requires: Spark filters
    * late rows against the PREVIOUS batch's watermark (lateness within
    * one batch is admitted by design — SPARK-24634 — so the late-filter
    * threshold for batch i is the watermark computed from data through
    * batch i−2, while EVICTION uses the one through i−1; the two being
    * one batch apart is also what guarantees an admitted late row never
    * lands on an already-evicted window, i.e. append mode never emits a
    * window twice). The jittered arrival order is staged into 16
    * one-file micro-batches (span-sixteenths, the q209 staging idiom)
    * plus a far-future sentinel that flushes every surviving window,
    * and a 1-minute windowed count under a 5-second watermark then
    * drops exactly the rows whose window end trails that lagged
    * watermark. The DuckDB oracle REPLAYS the protocol: per-batch
    * cumulative max event time, ms-floored, minus the delay, lagged two
    * batches (batches 0–1 run at watermark 0), a row dropped iff
    * window_end ≤ that value — and it counts the drops the way the
    * METRIC does: the filter sits above the pre-shuffle PARTIAL
    * aggregation, so same-(window, type) rows arriving in one
    * micro-batch merge before being dropped and the metric counts
    * dropped GROUPS per batch, not raw input rows (probed empirically
    * via [[StreamLateProbe]]: 105 late input rows report 104 — two
    * same-window clicks merged).
    * Kept-window counts, kept cents, and the dropped-group count must
    * all match the metric exactly.
    * Scale: this is the production lateness-audit loop — the metric is
    * free (the operator already computes it), and the gate proves it
    * means what the runbook says it means.
    */
  val streamDroppedLate: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
    val srcDir = scratch("graft_stream_late_src")
    // ONE arrival-key expression, used for BOTH the lo/hi bounds and
    // the slice bucketing — computable from the staged columns (the
    // staged files carry exactly the stream schema, not the jitter
    // column), and hoisted so the two uses can never desynchronize
    val arrKey = (unix_micros(col("ts"))
      + conv(substring(md5(col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 216000000000L)
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val bounds = ev.agg(min(arrKey).as("lo"), max(arrKey).as("hi"))
      .head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0L, 16L)
      else (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(hi - lo, 16L)
    Staging.stageSlices(ev, arrKey,
      16, lo, span, srcDir, scratch("graft_stream_late_stage"),
      Seq(col("event_id")))
    // sentinel: advances the final watermark past every real window end
    // so append mode flushes all surviving windows at end-of-stream
    Staging.stageOne(s.range(1).select(lit(-1L).as("event_id"),
      timestamp_micros(lit(hi + 30L * 86400L * 1000000L)).as("ts"),
      lit("sentinel").as("event_type"), lit(0L).as("cents")), 16, srcDir,
      scratch("graft_stream_late_sent"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType), StructField("cents", LongType)))
    val qname = "graft_stream_late_sink"
    val sq = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir.toString)
      .withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      .writeStream.outputMode("append").format("memory")
      .queryName(qname).trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    val dropped = sq.recentProgress.toSeq
      .flatMap(p => p.stateOperators.toSeq)
      .map(_.numRowsDroppedByWatermark).sum
    s.table(qname).filter(col("event_type") =!= "sentinel")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_windows"), sum(col("n")).as("kept_events"),
        sum(col("c")).as("total_cents"))
      .withColumn("dropped_late", lit(dropped))
      .orderBy(col("event_type"))
  }

  val streamDroppedLateSql: String =
    """WITH e AS (SELECT event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |j AS (SELECT *, us + ('0x'||substr(md5(CAST(event_id AS VARCHAR)),
      |    1, 15))::BIGINT % 216000000000 AS arr FROM e),
      |b AS (SELECT min(arr) AS lo, max(arr) AS hi,
      |    greatest(max(arr) - min(arr), 16) AS span FROM j),
      |bo AS (SELECT i, lo + i * span // 16 AS lo_i,
      |    CASE WHEN i = 15 THEN hi + 1 ELSE lo + (i + 1) * span // 16
      |    END AS hi_i
      |  FROM generate_series(0, 15) g(i), b),
      |bat AS (SELECT j.*, bo.i AS batch FROM j JOIN bo
      |  ON j.arr >= bo.lo_i AND j.arr < bo.hi_i),
      |mx AS (SELECT batch, max(us) AS bmax FROM bat GROUP BY batch),
      |wmv AS (SELECT g.i AS batch,
      |    CASE WHEN (SELECT max(bmax) FROM mx WHERE mx.batch <= g.i)
      |        IS NULL THEN 0
      |      ELSE greatest(0, (SELECT max(bmax) FROM mx
      |        WHERE mx.batch <= g.i) // 1000 - 5000) * 1000 END AS wm_us
      |  FROM generate_series(0, 15) g(i)),
      |cls AS (SELECT bat.*,
      |    CASE WHEN bat.batch <= 1 THEN 0 ELSE w.wm_us END AS wm_prev,
      |    ((us // 60000000) + 1) * 60000000 AS wend,
      |    (us // 60000000) * 60000000 AS wstart
      |  FROM bat LEFT JOIN wmv w ON w.batch = bat.batch - 2),
      |drp AS (SELECT count(*) AS dropped FROM (
      |  SELECT DISTINCT batch, wend, event_type FROM cls
      |  WHERE wend <= wm_prev)),
      |kept AS (SELECT event_type, wstart, count(*) AS n,
      |    CAST(sum(cents) AS BIGINT) AS c
      |  FROM cls WHERE wend > wm_prev GROUP BY event_type, wstart)
      |SELECT event_type, count(*) AS n_windows,
      |  CAST(sum(n) AS BIGINT) AS kept_events,
      |  CAST(sum(c) AS BIGINT) AS total_cents,
      |  (SELECT dropped FROM drp) AS dropped_late
      |FROM kept GROUP BY event_type ORDER BY event_type""".stripMargin

  /** IVF serving from a CELL-PARTITIONED layout — the 100 TB read path
    * the ivf scaladocs promise (q298 trains the codebook; this gate
    * materializes the serving layout): the corpus is written
    * hive-partitioned by its cell assignment, and queries are answered
    * by reading ONLY their probe cells. The executed plan's
    * PartitionFilters prove the scan touched nprobe directories, not
    * the corpus, and that proof rides IN the result row (the q107
    * pruned-flag pattern) — a pruning regression is a hash mismatch,
    * not a silent slowdown. The codebook is the q299 keyed slice
    * (vec_id < 4 — bounded, cross-engine recomputable); the probe-cell
    * set collected to the driver is ≤ k cells by construction. Scale:
    * write-time cell assignment is a narrow projection over the
    * corpus; each query's read is nprobe directory scans + a broadcast
    * hash join on cell.
    */
  val ivfPartitioned: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExpressions
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val cents: Array[(Long, Array[Float])] = emb.filter(col("vec_id") < 4)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    if (cents.isEmpty) {
      // empty corpus ⇒ empty codebook ⇒ no candidates, not a crash
      emb.select(col("vec_id").as("query_id"), lit(1).as("rank"),
        col("vec_id").as("neighbor_id"), lit(0.0).as("score"),
        lit(true).as("pruned")).filter(lit(false))
    } else {
      val cellIds = cents.map(_._1)
      val cvs = cents.map(_._2)
      val assigned = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("embedding"),
          VectorExpressions.nearest_cells(col("embedding"), cellIds, cvs, 1)
            .getItem(0).as("cell"))
      val tmp = scratch("graft_ivf_part").toString
      Writers.parquet(assigned, s"$tmp/corpus", partitionBy = Seq("cell"))
      val q = Dedup.pin(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          explode(VectorExpressions.nearest_cells(col("embedding"), cellIds,
            cvs, 2)).as("cell")))
      // ≤ k distinct cells by construction — the driver-side collect is
      // bounded by the codebook, never the query set or the corpus
      val probeCells = q.select(col("cell")).distinct()
        .collect().map(_.getLong(0)).sorted
      val probe = if (probeCells.isEmpty) lit(false)
        else col("cell").isin(probeCells: _*)
      val rd = Readers.parquetWithSchema(s, s"$tmp/corpus", assigned.schema)
        .filter(probe)
      val pruned = "PartitionFilters: \\[[^\\]]*(IN|INSET)[^\\]]*".r
        .findFirstIn(rd.queryExecution.executedPlan.toString).isDefined
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("neighbor_id"))
      rd.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
          col("cell"))
        .join(broadcast(q), Seq("cell"))
        .withColumn("score",
          VectorExpressions.cosine_similarity(col("qv"), col("cv")))
        .filter(col("score").isNotNull)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("score"), 6).as("score"), lit(pruned).as("pruned"))
        .orderBy(col("query_id"), col("rank"))
    }
  }

  val ivfPartitionedSql: String =
    """WITH emb AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |cents AS (SELECT vec_id AS cell, e AS ce FROM emb WHERE vec_id < 4),
      |corpus AS (SELECT vec_id, e FROM emb WHERE vec_id >= 10),
      |qs AS (SELECT vec_id, e FROM emb WHERE vec_id < 10),
      |cc AS (SELECT vec_id, e, cell FROM (
      |  SELECT r.vec_id, r.e, c.cell, row_number() OVER (
      |      PARTITION BY r.vec_id ORDER BY
      |      list_dot_product(r.e, c.ce) /
      |        (sqrt(list_dot_product(r.e, r.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
      |  FROM corpus r CROSS JOIN cents c) WHERE rn = 1),
      |qp AS (SELECT vec_id AS query_id, e AS qe, cell FROM (
      |  SELECT q.vec_id, q.e, c.cell, row_number() OVER (
      |      PARTITION BY q.vec_id ORDER BY
      |      list_dot_product(q.e, c.ce) /
      |        (sqrt(list_dot_product(q.e, q.e))
      |         * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cell) AS rn
      |  FROM qs q CROSS JOIN cents c) WHERE rn <= 2),
      |cand AS (SELECT qp.query_id, r.vec_id AS neighbor_id,
      |    list_dot_product(qp.qe, r.e) /
      |      (sqrt(list_dot_product(qp.qe, qp.qe))
      |       * sqrt(list_dot_product(r.e, r.e))) AS score
      |  FROM qp JOIN cc r USING (cell)),
      |ranked AS (SELECT query_id, neighbor_id, score, row_number() OVER (
      |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      |  FROM cand)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
      |  round(score, 6) AS score, TRUE AS pruned
      |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** Z-order layout audit ([[Layout]]): documents bucketized on two
    * INDEPENDENT dimensions — length (width-16 buckets) and an md5
    * source bucket (the q238 idiom) — written z-clustered with the
    * stored Morton key (q111 gates the interleave bit-for-bit), then
    * the pruning power of the layout is measured against the
    * lexicographic (a-major) alternative on a three-shape box workload:
    * narrow-in-a, narrow-in-b, narrow-in-both. For each layout, rows
    * are assigned to 16 equal-count files in layout-key order (a
    * DETERMINISTIC stand-in for the range-partitioned file boundaries,
    * which a sampling partitioner would draw non-reproducibly —
    * SCALE.md r9), per-file (min, max) of both dimensions are computed
    * — exactly what parquet footers store — and `files_*` counts the
    * files whose stats-box intersects each query box. The hash-checked
    * claim is z-order's WORST-CASE boundedness: the a-major layout
    * serves narrow-a queries perfectly but degenerates to a FULL scan
    * (16/16 files) on narrow-b shapes, while the z-clustered files are
    * quadtree boxes that serve every shape (file ranks recomputed from
    * the round-tripped parquet via the two-phase [[Ranks]] rank — one
    * range shuffle, no corpus-global window). `pushed` pins phase-1 of
    * the two-phase z-order read: the "both" box's z-WINDOW
    * ([[Layout.zWindow]] — a superset interval on the STORED cluster
    * key, correct by the Morton code's componentwise monotonicity)
    * reaches the scan as PushedFilters on z — the read-side mechanism
    * that turns those footer stats into skipped row groups at 100 TB.
    */
  val zorderLayout: Q = (s, dir) => {
    val base = t(s, dir, "documents")
      .select(col("doc_id"),
        Layout.bucket(col("n_chars"), 4).as("a"),
        (conv(substring(md5(col("source")), 1, 15), 16, 10).cast("long")
          % 256).as("b"))
    val tmp = scratch("graft_zorder").toString
    Layout.zorderWrite(base, col("a"), col("b"), s"$tmp/docs",
      numPartitions = 8)
    val schema = base.withColumn("z", Layout.zkey(col("a"), col("b"))).schema
    val rdAll = Readers.parquetWithSchema(s, s"$tmp/docs", schema)
    // phase-1 of the two-phase z-order read: the box's z-window (a
    // SUPERSET interval on the stored cluster key, [[Layout.zWindow]])
    // must reach the scan as PushedFilters on z — the mechanism that
    // turns the per-file footer stats measured below into skipped row
    // groups at read time
    val (zlo, zhi) = Layout.zWindow(8, 64, 15, 127)
    val pushed = "PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(z,".r
      .findFirstIn(rdAll.filter(col("z").between(zlo, zhi))
        .queryExecution.executedPlan.toString).isDefined
    val keyed = Dedup.pin(rdAll
      .withColumn("rm", col("a") * 256 + col("b")))
    val n1 = keyed.agg(count(lit(1)).as("nn"))
    def fileStats(key: String): DataFrame =
      Ranks.globalRowNumber(keyed, Seq(col(key), col("doc_id")), "rn",
          numPartitions = 8)
        .crossJoin(broadcast(n1))
        .select(expr("((rn - 1) * 16) div nn").as("f"), col("a"), col("b"))
        .groupBy(col("f"))
        .agg(min(col("a")).as("amn"), max(col("a")).as("amx"),
          min(col("b")).as("bmn"), max(col("b")).as("bmx"))
    val shapes = s.range(1).select(explode(array(
        struct(lit("narrow_a").as("shape"), lit(8L).as("alo"),
          lit(15L).as("ahi"), lit(0L).as("blo"), lit(255L).as("bhi")),
        struct(lit("narrow_b").as("shape"), lit(0L).as("alo"),
          lit(255L).as("ahi"), lit(64L).as("blo"), lit(127L).as("bhi")),
        struct(lit("both").as("shape"), lit(8L).as("alo"),
          lit(15L).as("ahi"), lit(64L).as("blo"), lit(127L).as("bhi"))))
        .as("q"))
      .select(col("q.*"))
    val hit = col("amn") <= col("ahi") && col("amx") >= col("alo") &&
      col("bmn") <= col("bhi") && col("bmx") >= col("blo")
    def touched(stats: DataFrame, out: String): DataFrame =
      stats.crossJoin(broadcast(shapes)) // ≤16 files × 3 shapes
        .groupBy(col("shape"))
        .agg(coalesce(sum(when(hit, 1L)), lit(0L)).as(out))
    val nBox = keyed.crossJoin(broadcast(shapes))
      .groupBy(col("shape"))
      .agg(coalesce(sum(when(col("a").between(col("alo"), col("ahi"))
        && col("b").between(col("blo"), col("bhi")), 1L)), lit(0L))
        .as("n_box"))
    nBox.join(touched(fileStats("z"), "files_z"), Seq("shape"))
      .join(touched(fileStats("rm"), "files_amajor"), Seq("shape"))
      .select(col("shape"), col("n_box"), col("files_z"),
        col("files_amajor"), lit(16L).as("n_files"),
        lit(pushed).as("pushed"))
      .orderBy(col("shape"))
  }

  val zorderLayoutSql: String =
    """WITH d AS (SELECT doc_id,
      |    least(n_chars >> 4, 255) AS a,
      |    ('0x' || substr(md5(source), 1, 15))::BIGINT % 256 AS b
      |  FROM documents),
      |k AS (SELECT doc_id, a, b,
      |    CAST(list_sum(list_transform(generate_series(0, 7),
      |      i -> ((a >> i) & 1) * (CAST(1 AS BIGINT) << (2*i))
      |         + ((b >> i) & 1) * (CAST(1 AS BIGINT) << (2*i + 1))))
      |      AS BIGINT) AS z,
      |    a * 256 + b AS rm
      |  FROM d),
      |n AS (SELECT count(*) AS nn FROM k),
      |sz AS (SELECT ((row_number() OVER (ORDER BY z, doc_id)) - 1) * 16
      |      // nn AS f, a, b FROM k, n),
      |fz AS (SELECT f, min(a) AS amn, max(a) AS amx,
      |    min(b) AS bmn, max(b) AS bmx FROM sz GROUP BY f),
      |sr AS (SELECT ((row_number() OVER (ORDER BY rm, doc_id)) - 1) * 16
      |      // nn AS f, a, b FROM k, n),
      |fr AS (SELECT f, min(a) AS amn, max(a) AS amx,
      |    min(b) AS bmn, max(b) AS bmx FROM sr GROUP BY f),
      |shapes AS (SELECT * FROM (VALUES
      |    ('narrow_a', 8, 15, 0, 255),
      |    ('narrow_b', 0, 255, 64, 127),
      |    ('both', 8, 15, 64, 127)) t(shape, alo, ahi, blo, bhi)),
      |zc AS (SELECT shape, CAST(coalesce(sum(CASE WHEN amn <= ahi
      |      AND amx >= alo AND bmn <= bhi AND bmx >= blo THEN 1 END), 0)
      |    AS BIGINT) AS files_z
      |  FROM shapes CROSS JOIN fz GROUP BY shape),
      |rc AS (SELECT shape, CAST(coalesce(sum(CASE WHEN amn <= ahi
      |      AND amx >= alo AND bmn <= bhi AND bmx >= blo THEN 1 END), 0)
      |    AS BIGINT) AS files_amajor
      |  FROM shapes CROSS JOIN fr GROUP BY shape),
      |bx AS (SELECT shape, CAST(coalesce(sum(CASE WHEN a BETWEEN alo
      |      AND ahi AND b BETWEEN blo AND bhi THEN 1 END), 0)
      |    AS BIGINT) AS n_box
      |  FROM shapes CROSS JOIN k GROUP BY shape)
      |SELECT shape, n_box, files_z, files_amajor,
      |  CAST(16 AS BIGINT) AS n_files, TRUE AS pushed
      |FROM bx JOIN zc USING (shape) JOIN rc USING (shape)
      |ORDER BY shape""".stripMargin

  /** Dynamic partition pruning (DPP) — the RUNTIME sibling of q107's
    * static partition pruning, and the optimization that makes
    * hive-partitioned fact tables queryable by DIMENSION attributes at
    * 100 TB: the fact is partitioned by order month, but the filter
    * lives on a dim ATTRIBUTE (`mon <= 3`) that Catalyst cannot
    * statically map to fact partitions — the only way to avoid
    * scanning every partition is the DPP subquery, which at execution
    * turns the broadcast dim's join keys into an IN-filter on the
    * fact's partition column (reusing the join's own broadcast, so the
    * filter costs nothing extra). The `dynamicpruning` expression's
    * presence in the fact scan's PartitionFilters is pinned IN the
    * result row (the q107/q301 pattern): if a config or plan change
    * ever drops DPP, the gate hash-mismatches instead of silently
    * scanning 4× the data. At 100 TB this is the difference between
    * reading three months and reading the table.
    */
  val dppPruning: Q = (s, dir) => {
    val tmp = scratch("graft_dpp").toString
    val fact = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        date_format(col("o_orderdate"), "yyyy-MM").as("om"))
    Writers.parquet(fact, s"$tmp/fact", partitionBy = Seq("om"))
    val dim = fact.select(col("om")).distinct()
      .withColumn("mon", substring(col("om"), 6, 2).cast("int"))
    Writers.parquet(dim, s"$tmp/dim")
    val f = Readers.parquetWithSchema(s, s"$tmp/fact", fact.schema)
    val d = Readers.parquetWithSchema(s, s"$tmp/dim", dim.schema)
      .filter(col("mon") <= 3)
    val joined = f.join(broadcast(d), Seq("om"))
    val dpp = "dynamicpruning".r.findFirstIn(
      joined.queryExecution.executedPlan.toString).isDefined
    joined.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
      .withColumn("dpp", lit(dpp))
      .orderBy(col("o_orderpriority"))
  }

  val dppPruningSql: String =
    """WITH f AS (SELECT o_orderpriority,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents,
      |    strftime(o_orderdate, '%Y-%m') AS om FROM orders),
      |d AS (SELECT DISTINCT om,
      |    CAST(substr(om, 6, 2) AS INTEGER) AS mon FROM f)
      |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS dpp
      |FROM f JOIN d USING (om) WHERE mon <= 3
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Cost-based join REORDER — the optimizer capability multi-join SQL
    * lives on at 100 TB: the query is WRITTEN in the worst order (the
    * fact joins customer FIRST; the one-nation filter joins LAST), and
    * with table + column statistics ANALYZEd and `spark.sql.cbo.
    * joinReorder` enabled, Catalyst's DP-based CostBasedJoinReorder
    * rewrites the tree so the selective customer⋈nation pair runs
    * first and the fact joins the already-filtered key set. The
    * reorder is pinned STRUCTURALLY, not by string luck: the optimized
    * plan must contain a Join whose two sides are the customer and
    * nation relations with no fact column on either side — a join the
    * written order never creates. Stats discipline matters as much as
    * the flag: without `FOR ALL COLUMNS` ndv the planner has no
    * selectivity to reorder on. Conf keys are set per-query and
    * RESTORED (the q263 provider pattern).
    */
  val cboReorder: Q = (s, dir) => {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val dbDir = scratch("graft_cbo_db")
    s.sql("DROP DATABASE IF EXISTS graft_cbo CASCADE")
    s.sql(s"CREATE DATABASE graft_cbo LOCATION '$dbDir'")
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable("graft_cbo.orders_t")
    t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable("graft_cbo.customer_t")
    t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable("graft_cbo.nation_t")
    Seq("orders_t", "customer_t", "nation_t").foreach(tn =>
      s.sql(s"ANALYZE TABLE graft_cbo.$tn COMPUTE STATISTICS FOR ALL COLUMNS"))
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = keys.map(k => k -> s.conf.getOption(k))
    keys.foreach(k => s.conf.set(k, "true"))
    try {
      val q = s.table("graft_cbo.orders_t")
        .join(s.table("graft_cbo.customer_t"),
          col("o_custkey") === col("c_custkey"))
        .join(s.table("graft_cbo.nation_t")
            .filter(col("n_name") === "NATION_7"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum((col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")).as("sum_cents"))
      val reordered = q.queryExecution.optimizedPlan
        .collect { case j: Join => j }
        .exists { j =>
          val sides = j.children.map(_.output.map(_.name).toSet)
          sides.exists(_.contains("c_custkey")) &&
            sides.exists(_.contains("n_nationkey")) &&
            !sides.exists(_.exists(_.startsWith("o_")))
        }
      // collect INSIDE the conf window so the hash-checked rows come
      // from the REORDERED execution the flag certifies (returning the
      // lazy frame would re-optimize it after the finally restores
      // cbo.* to default-off — the written worst order); ≤ 5 priority
      // groups, so the collect is bounded
      val rows = q.collect()
      import s.implicits._
      rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        .toDF("o_orderpriority", "n_orders", "sum_cents")
        .withColumn("reordered", lit(reordered))
        .orderBy(col("o_orderpriority"))
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  val cboReorderSql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |    AS BIGINT)) AS BIGINT) AS sum_cents, TRUE AS reordered
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |WHERE n_name = 'NATION_7'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Stream-stream FULL OUTER interval join — the THIRTEENTH streaming
    * gate, completing the stream-stream join family (q208 inner, q293
    * left-outer): the funnel that keeps BOTH miss sets — unconverted
    * views AND unattributed purchases (the revenue rows marketing
    * can't explain). Right-side null emission is the new semantics
    * under test: a purchase is released null-padded only when the
    * watermark proves no view with l_ts ∈ [r_ts − 2 h, r_ts) can still
    * arrive. Event-time-ordered staging keeps BOTH directions exact
    * under any delay: a view arriving in a later batch has l_ts ≥ that
    * purchase's batch max ≥ r_ts, violating the l_ts < r_ts bound — so
    * cross-batch probes of evicted state are impossible on either
    * side. Per-side far-future sentinels flush both unmatched sets
    * (the global watermark is the MIN across inputs). Scale: state is
    * the 2 h + delay band per side, evicted continuously.
    */
  val streamFullOuterJoin: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = scratch("graft_stream_ssfull_src")
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val bounds = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0L, 4L)
      else (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(hi - lo, 4L)
    Staging.stageSlices(ev, unix_micros(col("ts")), 4, lo, span, srcDir,
      scratch("graft_stream_ssfull_stage"), Seq(col("event_id")))
    val sentinelUs = hi + 30L * 86400L * 1000000L
    Staging.stageOne(s.range(2).select(
      (lit(-1L) - col("id")).as("event_id"),
      timestamp_micros(lit(sentinelUs)).as("ts"),
      lit(-1L).as("user_id"),
      when(col("id") === 0, lit("view")).otherwise(lit("purchase"))
        .as("event_type"),
      lit(0.0).as("value")), 4, srcDir, scratch("graft_stream_ssfull_sent"))
    def side(tpe: String) = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      .filter(col("event_type") === tpe)
    val joined = EventStreams.joinWithinWindow(
      side("view"), side("purchase"), "user_id", "2 hours", "2 hours",
      "full_outer")
    val qname = "graft_stream_ssfull_sink"
    val sq = joined
      .select(col("user_id"), col("l_id"), col("r_id"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))).as("gap_us"))
      .writeStream.outputMode("append").format("memory")
      .queryName(qname).trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    s.table(qname)
      .filter(col("user_id") >= 0)
      .groupBy(col("user_id"))
      .agg(
        count(when(col("l_id").isNotNull && col("r_id").isNotNull, 1))
          .as("n_pairs"),
        sum(when(col("l_id").isNotNull && col("r_id").isNull, 1L)
          .otherwise(0L)).as("n_unconverted"),
        sum(when(col("l_id").isNull, 1L).otherwise(0L)).as("n_orphans"),
        sum(col("gap_us")).as("sum_gap_us"))
      .orderBy(col("user_id"))
  }

  val streamFullOuterJoinSql: String =
    """WITH v AS (SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'view'),
      |p AS (SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase'),
      |fj AS (SELECT coalesce(v.user_id, p.user_id) AS user_id,
      |    v.event_id AS l_id, p.event_id AS r_id,
      |    epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      |  FROM v FULL JOIN p ON v.user_id = p.user_id
      |    AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 2 HOUR)
      |SELECT user_id,
      |  CAST(count(CASE WHEN l_id IS NOT NULL AND r_id IS NOT NULL
      |    THEN 1 END) AS BIGINT) AS n_pairs,
      |  CAST(coalesce(sum(CASE WHEN l_id IS NOT NULL AND r_id IS NULL
      |    THEN 1 END), 0) AS BIGINT) AS n_unconverted,
      |  CAST(coalesce(sum(CASE WHEN l_id IS NULL THEN 1 END), 0)
      |    AS BIGINT) AS n_orphans,
      |  CAST(sum(gap_us) AS BIGINT) AS sum_gap_us
      |FROM fj GROUP BY user_id ORDER BY user_id""".stripMargin

  /** AQE skew-join split — the RUNTIME answer to key skew, completing
    * the skew family ([[Skew]] covers detection q141 and manual salting
    * q142): a planted 90%-hot key makes one shuffle partition dwarf the
    * rest, and Adaptive Query Execution's OptimizeSkewedJoin splits
    * that partition into parallel sub-reads (duplicating the matching
    * build rows) instead of letting a single task own the hot key — no
    * salting rewrite, no manual key surgery. The split is pinned via
    * the `skew=true` marker the SortMergeJoin node carries in the FINAL
    * adaptive plan, which only exists after execution — so the gate
    * collects the aggregate ONCE inside the conf window and reads the
    * flag off that same execution's final plan: the hash-checked rows
    * are the rows the split plan produced (a disabled or
    * mis-thresholded AQE is a mismatch, not a silent one-task
    * straggler). Skew thresholds are
    * lowered to gate scale and RESTORED (the q263 provider pattern);
    * broadcast is disabled statically AND adaptively so the join stays
    * a shuffled SMJ — the shape skew splitting applies to. At 100 TB
    * this is the difference between a 10-minute straggler task and a
    * few hundred parallel sub-tasks.
    */
  val aqeSkewJoin: Q = (s, dir) => withShufflePartitions(s, 8) {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val vals = Seq("-1", "-1", "1KB", "2KB", "2.0")
    val prev = keys.map(k => k -> s.conf.getOption(k))
    keys.zip(vals).foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val ev = Tables.events(s, dir)
        .select(col("event_id"),
          when(col("event_id") % 10 < 9, 0L)
            .otherwise(col("event_id") % 100).as("k"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        // 8 upstream mappers: skew splits are MAP-OUTPUT ranges, so a
        // single-file scan (one mapper) leaves the hot partition
        // unsplittable no matter how skewed — the same reason a 100 TB
        // job wants many map tasks feeding a skewed exchange
        .repartition(8, col("event_id"))
      val dim = s.range(100).select(col("id").as("k"),
        concat(lit("grp_"), (col("id") % 4).cast("string")).as("grp"))
      val agg = ev.join(dim, Seq("k"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      // collect INSIDE the conf window so the hash-checked rows are the
      // ones the skew-split plan produced (returning the lazy frame
      // would re-plan it AFTER the finally restores the thresholds —
      // broadcast-shaped, and the flag would describe a different run);
      // group count is ≤ 4 by construction, so the collect is bounded
      val rows = agg.collect()
      val skewed = agg.queryExecution.executedPlan.toString
        .contains("skew=true")
      import s.implicits._
      rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        .toDF("grp", "n", "sum_cents")
        .withColumn("skew_split", lit(skewed))
        .orderBy(col("grp"))
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  val aqeSkewJoinSql: String =
    """WITH e AS (SELECT CASE WHEN event_id % 10 < 9 THEN 0
      |      ELSE event_id % 100 END AS k,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |d AS (SELECT i AS k, 'grp_' || CAST(i % 4 AS VARCHAR) AS grp
      |  FROM generate_series(0, 99) t(i))
      |SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS skew_split
      |FROM e JOIN d USING (k) GROUP BY grp ORDER BY grp""".stripMargin

  /** One 288-byte 18×16 grayscale FRAME of a planted video: block i of
    * frame j is md5("<id>|f<j>|<i>"); the variant rendition edits the
    * LAST frame's last block ("17v") — every other frame is
    * byte-identical to the base. Shared by [[videoFrameSample]].
    */
  protected def plantedVideoFrame(idCol: Column, j: Int, nfCol: Column,
                                variant: Boolean): Column = {
    def block(i: Int): Column = {
      val tag =
        if (variant)
          when(lit(j) === nfCol - 1 && lit(i) === 17, lit("17v"))
            .otherwise(lit(i.toString))
        else lit(i.toString)
      unhex(md5(concat(idCol.cast("string"), lit(s"|f$j|"), tag)
        .cast("binary")))
    }
    concat((0 until 18).map(block): _*)
  }

  /** VIDEO frame-sampling + near-dup detection — the third multimodal
    * modality (q277/q279 image, q280 audio): each document plants a
    * video as ONE opaque container binary (3–7 concatenated 288-byte
    * 18×16 grayscale frames — the fixed-frame-size raw layout) plus
    * typed metadata (`nf`), and docs with doc_id % 7 == 0 plant a
    * VARIANT rendition identical except the last frame (a re-encode
    * tail edit). The OP is the real pipeline shape: parse the
    * container back into frames by offset arithmetic
    * (`substring(video, fidx*288+1, 288)` — binary substring, one
    * row-local expression), sample at stride 2 (every other frame —
    * the standard cost/recall dial: sampling halves the hash work and
    * still catches any edit that leaves ≥2 sampled frames intact),
    * perceptual-hash each sampled frame with the q277 codegen
    * [[graft.functions.ImageExpressions.gray_dhash64]], and pair
    * videos BY SHARED SAMPLED-FRAME HASH through an equi-join on the
    * 8-byte fingerprint — bucketed by content, never an all-pairs
    * product. shared ≥ 2 admits exactly the base↔variant pairs with
    * nf ≥ 4 (nf = 3 samples frames {0, 2} and 2 IS the edited frame —
    * the deterministic miss both engines agree on; unrelated videos
    * collide on a 64-bit gradient hash with negligible probability and
    * the oracle would catch any such pair exactly). The DuckDB twin
    * recomputes every sampled frame's pixels, cells, and gradient bits
    * from the same md5 arithmetic and joins on the 64-bit BITSTRING —
    * so the gate pins the container round-trip byte-for-byte. Scale:
    * sampling and hashing are row-local (map-only over the container
    * bytes); join state is 8 bytes per sampled frame.
    */
  val videoFrameSample: Q = (s, dir) => {
    import graft.functions.ImageExpressions
    val base = t(s, dir, "documents")
      .select(col("doc_id"), (lit(3L) + col("doc_id") % 5).as("nf"))
    def render(variant: Boolean): Column =
      concat((0 until 7).map(j =>
        when(lit(j) < col("nf"),
          plantedVideoFrame(col("doc_id"), j, col("nf"), variant))
          .otherwise(lit(Array.empty[Byte]))): _*)
    val vids = base
      .select(col("doc_id").as("vid"), col("nf"),
        render(variant = false).as("video"))
      .unionByName(base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000000L).as("vid"), col("nf"),
          render(variant = true).as("video")))
    val frames = Dedup.pin(vids
      .select(col("vid"), col("nf"),
        explode(expr("sequence(CAST(0 AS BIGINT), (nf - 1) div 2)"))
          .as("k"))
      .withColumn("fidx", col("k") * 2)
      .join(vids.select(col("vid"), col("video")), Seq("vid"))
      .select(col("vid"),
        ImageExpressions.gray_dhash64(
          expr("substring(video, CAST(fidx * 288 + 1 AS INT), 288)"),
          18, 16).as("fh")))
    val counts = frames.groupBy(col("vid"))
      .agg(count(lit(1)).as("ns"))
    frames.as("a")
      .join(frames.as("b"),
        col("a.fh") === col("b.fh") && col("a.vid") < col("b.vid"))
      .groupBy(col("a.vid").as("vid1"), col("b.vid").as("vid2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 2)
      .join(counts.select(col("vid").as("vid1"), col("ns").as("n1")),
        Seq("vid1"))
      .join(counts.select(col("vid").as("vid2"), col("ns").as("n2")),
        Seq("vid2"))
      .select(col("vid1"), col("vid2"), col("shared"), col("n1"),
        col("n2"))
      .orderBy(col("vid1"), col("vid2"))
  }

  val videoFrameSampleSql: String =
    """WITH base AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS s,
      |    3 + doc_id % 5 AS nf FROM documents),
      |vids AS (
      |  SELECT doc_id AS vid, s, nf, FALSE AS v FROM base
      |  UNION ALL
      |  SELECT doc_id + 10000000, s, nf, TRUE FROM base
      |  WHERE doc_id % 7 = 0),
      |sf AS (SELECT vid, s, nf, v,
      |    unnest(generate_series(0, (nf - 1) // 2)) * 2 AS j FROM vids),
      |px AS (SELECT vid, j, list_transform(generate_series(0, 287), k ->
      |    ('0x' || substr(md5(s || '|f' || CAST(j AS VARCHAR) || '|' ||
      |        CASE WHEN v AND j = nf - 1 AND k // 16 = 17 THEN '17v'
      |          ELSE CAST(k // 16 AS VARCHAR) END),
      |      (k % 16) * 2 + 1, 2))::BIGINT) AS p
      |  FROM sf),
      |cells AS (SELECT vid, j, list_transform(generate_series(0, 71), g ->
      |    (p[(g // 9) * 2 * 18 + (g % 9) * 2 + 1]
      |     + p[(g // 9) * 2 * 18 + (g % 9) * 2 + 2]
      |     + p[((g // 9) * 2 + 1) * 18 + (g % 9) * 2 + 1]
      |     + p[((g // 9) * 2 + 1) * 18 + (g % 9) * 2 + 2]) // 4) AS cell
      |  FROM px),
      |h AS (SELECT vid, j, array_to_string(
      |    list_transform(generate_series(0, 63), b ->
      |      CASE WHEN cell[(b // 8) * 9 + (b % 8) + 2]
      |             > cell[(b // 8) * 9 + (b % 8) + 1]
      |        THEN '1' ELSE '0' END), '') AS hs
      |  FROM cells),
      |pairs AS (SELECT a.vid AS vid1, b.vid AS vid2,
      |    CAST(count(*) AS BIGINT) AS shared
      |  FROM h a JOIN h b ON a.hs = b.hs AND a.vid < b.vid
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |cnt AS (SELECT vid, CAST(count(*) AS BIGINT) AS ns
      |  FROM h GROUP BY vid)
      |SELECT vid1, vid2, shared, c1.ns AS n1, c2.ns AS n2
      |FROM pairs
      |JOIN cnt c1 ON c1.vid = vid1
      |JOIN cnt c2 ON c2.vid = vid2
      |ORDER BY vid1, vid2""".stripMargin

  /** Image RESIZE (thumbnailing) — the remaining verb of the multimodal
    * surface (decode → q30/q125 header parse, feature-extract →
    * q277/q279/q280, frame-sample → q307, resize → HERE): the planted
    * 18×16 images are downsampled to a 9×8 thumbnail with the codegen
    * nearest-neighbor [[graft.functions.ImageExpressions.gray_resize]]
    * (exact floor source-index map), and the gate pins every output
    * BYTE (the 72-byte thumb as hex) plus an independent CONSUMER of
    * the resized buffer — the 9×8 aHash — against a DuckDB twin that
    * recomputes both the resize and the hash from the md5 pixel
    * stream. Scale: resize is a row-local generated-code pass — at
    * 100 TB thumbnailing is map-only, and the thumbnail column is what
    * downstream perceptual indexing reads instead of full frames.
    */
  val imageResize: Q = (s, dir) => {
    import graft.functions.ImageExpressions
    t(s, dir, "documents")
      .select(col("doc_id").as("id"),
        plantedImagePixels(col("doc_id"), variant = false).as("px"))
      .withColumn("thumb",
        ImageExpressions.gray_resize(col("px"), 18, 16, 9, 8))
      .select(col("id"), lower(hex(col("thumb"))).as("thumb_hex"),
        lpad(lower(hex(
          ImageExpressions.gray_ahash64(col("thumb"), 9, 8))), 16, "0")
          .as("thumb_ahash"))
      .orderBy(col("id"))
  }

  val imageResizeSql: String =
    """WITH px AS (SELECT doc_id AS id,
      |    list_transform(generate_series(0, 287), k ->
      |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
      |          CAST(k // 16 AS VARCHAR)), (k % 16) * 2 + 1, 2))::BIGINT)
      |      AS p
      |  FROM documents),
      |th AS (SELECT id, list_transform(generate_series(0, 71), k ->
      |      p[(k // 9) * 2 * 18 + (k % 9) * 2 + 1]) AS t FROM px),
      |mn AS (SELECT id, t,
      |    list_sum(list_transform(generate_series(0, 63), j ->
      |      t[(j // 8) * 9 + (j % 8) + 1])) // 64 AS mean FROM th),
      |bits AS (SELECT id, t,
      |    list_transform(generate_series(0, 63), i ->
      |      t[(i // 8) * 9 + (i % 8) + 1] > mean) AS abit FROM mn)
      |SELECT id,
      |  array_to_string(list_transform(generate_series(1, 72), k ->
      |    printf('%02x', t[k])), '') AS thumb_hex,
      |  array_to_string(list_transform(generate_series(1, 16), j ->
      |    substr('0123456789abcdef',
      |      (CASE WHEN abit[4 * (16 - j) + 1] THEN 1 ELSE 0 END)
      |      + (CASE WHEN abit[4 * (16 - j) + 2] THEN 2 ELSE 0 END)
      |      + (CASE WHEN abit[4 * (16 - j) + 3] THEN 4 ELSE 0 END)
      |      + (CASE WHEN abit[4 * (16 - j) + 4] THEN 8 ELSE 0 END) + 1,
      |      1)), '') AS thumb_ahash
      |FROM bits ORDER BY id""".stripMargin
}
