package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{Readers, Writers}
import graft.ops.{Dedup, Layout, Multimodal, Ranks, SimSearch, Skew, TextStats, TopK}
import graft.transform.{Canonicalize, Enrich, Harmonize, Normalize}
import graft.quality.Expectations._
import graft.streaming.{EventStreams, Staging}

/** The declared query catalog: one entry per operator family from
  * SURVEY.md §2 (reference parity) plus the north-star LLM-pipeline
  * operators, each exercised over the driver testdata (FIXTURES.md §C).
  *
  * Determinism contract (the driver hash-compares against DuckDB):
  *  - every query ends in a total ORDER BY (unique key tiebreaks);
  *  - cross-row double sums go through per-value DECIMAL casts (exact,
  *    order-independent) and back to double;
  *  - derived doubles are rounded to a fixed scale;
  *  - column names are identical here and in the oracle SQL.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- scratch-dir lifecycle (ADVICE r6: sink/stream gates were leaving
  // per-invocation temp copies behind — disk grew linearly with reruns).
  // One JVM-exit hook sweeps every dir handed out by `scratch`.
  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    scratchDirs.forEach { p =>
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(p.toFile)
    }
  }))
  private def scratch(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.add(p)
    p
  }

  /** Run `body` with a reduced shuffle-partition count, restoring the
    * session value after. Streaming gates use this: a stateful query
    * instantiates one state store per shuffle partition PER micro-batch
    * (checkpoint fsync each), so 32 partitions over gate-sized state is
    * pure per-batch overhead — 8 cuts the constant without touching
    * results (all gates end in deterministic sorts/aggs; outputs are
    * checked value-identical across parallelism). Production sizes this
    * to state volume, not to the batch default.
    */
  private def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val old = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", old)
  }

  /** Exact order-independent sum of a money-ish double column: per-row
    * decimal cast → decimal sum → double.
    */
  private def decSum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  // ================================================================ parity

  /** Flagship (E4 gold shape): fact ⋈ dim inner, ⋈ dim left, group, avg.
    * J1+J2+A1-A4+P13 (SURVEY §2.4, §2.5, §3.3).
    */
  val goldFlagship: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    li.join(o, col("l_orderkey") === col("o_orderkey"), "inner")
      .join(c, col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
        decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("c_mktsegment"), col("o_orderstatus"))
  }

  val goldFlagshipSql: String =
    """SELECT c_mktsegment, o_orderstatus, count(*) AS n_rows,
      | sum(l_quantity) AS sum_qty,
      | round(sum(l_quantity)/count(*), 6) AS avg_qty,
      | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      | LEFT JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  /** X1/P7: rule-table canonicalization folded into one Project. */
  val canonicalize: Q = (s, dir) => {
    val rules = Seq(
      Canonicalize.Rule("c_name", "Customer#0*", "CUST "),
      Canonicalize.Rule("c_name", "\\s+", " "),
      Canonicalize.Rule("c_name", "^\\s+|\\s+$", ""))
    Canonicalize(t(s, dir, "customer"), rules)
      .select(col("c_custkey"), upper(col("c_name")).as("canon_name"))
      .orderBy(col("c_custkey"))
  }

  val canonicalizeSql: String =
    """SELECT c_custkey,
      | upper(regexp_replace(regexp_replace(regexp_replace(c_name,
      |   'Customer#0*', 'CUST ', 'g'), '\s+', ' ', 'g'), '^\s+|\s+$', '', 'g')) AS canon_name
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** X2/P8: split + 0-based getItem with NULL out-of-range (E1:74). */
  val splitGetItem: Q = (s, dir) =>
    t(s, dir, "part").select(
      col("p_partkey"),
      Enrich.splitItem(col("p_name"), " ", 1).as("name_word2"),
      Enrich.splitItem(col("p_type"), " ", 1).as("type_word2"))
      .orderBy(col("p_partkey"))

  val splitGetItemSql: String =
    """SELECT p_partkey,
      | string_split(p_name, ' ')[2] AS name_word2,
      | string_split(p_type, ' ')[2] AS type_word2
      |FROM part ORDER BY p_partkey""".stripMargin

  /** P9/X4/X5/F1: when/isin conditional remap (E4:37-38). */
  val whenIsinRemap: Q = (s, dir) =>
    t(s, dir, "orders")
      .select(Enrich.remapAll(col("o_orderpriority"), Seq(
        (Seq("1-URGENT", "2-HIGH"), "HOT"),
        (Seq("5-LOW"), "COLD"))).as("priority_class"))
      .groupBy(col("priority_class"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("priority_class"))

  val whenIsinRemapSql: String =
    """SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'HOT'
      |            WHEN o_orderpriority IN ('5-LOW') THEN 'COLD'
      |            ELSE o_orderpriority END AS priority_class,
      | count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** U1+P1+P6: harmonized union of asymmetric schemas (G0a:56-66). */
  val unionHarmonize: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val f1 = c.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"))
    val f2 = c.filter(col("c_custkey") % 2 === 1)
      .select(col("c_custkey"), col("c_mktsegment"))
    Harmonize.unionAll(Seq(f1, f2)).orderBy(col("c_custkey"))
  }

  val unionHarmonizeSql: String =
    """SELECT c_custkey, c_name, '' AS c_mktsegment FROM customer WHERE c_custkey % 2 = 0
      |UNION ALL
      |SELECT c_custkey, '' AS c_name, c_mktsegment FROM customer WHERE c_custkey % 2 = 1
      |ORDER BY c_custkey""".stripMargin

  /** P11: single-Project column-name normalization (E1:54-58). */
  val renameNormalize: Q = (s, dir) => {
    val messy = t(s, dir, "region").toDF("R-RegionKey", "R Name")
    Normalize.columns(messy).orderBy(col("r_regionkey"))
  }

  val renameNormalizeSql: String =
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"

  /** P13/X1/§4.4-c: decimal-comma fix + legacy-semantics casts, ANSI-safe. */
  val castCommaFix: Q = (s, dir) => {
    val e = Tables.events(s, dir)
    val sCol = concat(col("user_id").cast("string"), lit(","),
      (col("event_id") % 100).cast("string"))
    val fixed = Enrich.commaToDot(sCol)
    e.select(
      col("event_id"),
      Enrich.toDoubleOrNull(fixed).as("parsed_value"),
      Enrich.legacyStringToInt(fixed).as("int_value"))
      .orderBy(col("event_id"))
  }

  val castCommaFixSql: String =
    """SELECT event_id,
      | CAST(replace(CAST(user_id AS VARCHAR) || ',' || CAST(event_id % 100 AS VARCHAR), ',', '.') AS DOUBLE) AS parsed_value,
      | CAST(trunc(CAST(replace(CAST(user_id AS VARCHAR) || ',' || CAST(event_id % 100 AS VARCHAR), ',', '.') AS DOUBLE)) AS INTEGER) AS int_value
      |FROM events ORDER BY event_id""".stripMargin

  /** Q1-Q3: one-pass DQ violation counts (E1:139-151, SURVEY §2.9). */
  val dqViolations: Q = (s, dir) => {
    val suite = Suite("orders_dq", Seq(
      NotNull("o_orderstatus"),
      NotNull("o_custkey"),
      Between("o_totalprice", 0, 1e7),
      InSet("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
      MatchesRegex("o_orderpriority", "^[0-9]-[A-Z ]+$")))
    val aggs = suite.expectations.map(e =>
      sum(e.violationIndicator).as(s"v_${e.kind}_${e.column}"))
    t(s, dir, "orders").agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  val dqViolationsSql: String =
    """SELECT count(*) AS n_rows,
      | CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_not_null_o_orderstatus,
      | CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_not_null_o_custkey,
      | CAST(sum(CASE WHEN o_totalprice IS NOT NULL AND (o_totalprice < 0 OR o_totalprice > 10000000) THEN 1 ELSE 0 END) AS BIGINT) AS v_between_o_totalprice,
      | CAST(sum(CASE WHEN o_orderpriority IS NOT NULL AND o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW') THEN 1 ELSE 0 END) AS BIGINT) AS v_in_set_o_orderpriority,
      | CAST(sum(CASE WHEN o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^[0-9]-[A-Z ]+$') THEN 1 ELSE 0 END) AS BIGINT) AS v_matches_regex_o_orderpriority
      |FROM orders""".stripMargin

  /** P10/X3: upper + length. */
  val upperLength: Q = (s, dir) =>
    t(s, dir, "supplier").select(
      col("s_suppkey"),
      Enrich.upperCol(col("s_name")).as("name_uc"),
      length(col("s_name")).as("name_len"))
      .orderBy(col("s_suppkey"))

  val upperLengthSql: String =
    """SELECT s_suppkey, upper(s_name) AS name_uc,
      | CAST(length(s_name) AS INTEGER) AS name_len
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** P3: report projection with unicode/space column names (E4:75-91). */
  val prettyReport: Q = (s, dir) =>
    t(s, dir, "customer")
      .groupBy(col("c_mktsegment").as("Segmento de Mercado"))
      .agg(
        count(lit(1)).as("Número de Clientes"),
        round(decSum(col("c_acctbal"), 2) / count(lit(1)), 4).as("Saldo Médio"))
      .orderBy(col("Segmento de Mercado"))

  val prettyReportSql: String =
    """SELECT c_mktsegment AS "Segmento de Mercado",
      | count(*) AS "Número de Clientes",
      | round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/count(*), 4) AS "Saldo Médio"
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exotic identifiers end-to-end: the reference's en-dash column
    * `quantidade_de_clientes_–_scr` (U+2013 survives the reference's
    * rename loop, E2:151) plus accented/space names. Verify writes this
    * result to parquet and the driver re-reads + hash-compares it, so the
    * full parquet round-trip of the SURVEY §1.2 identifier hazard is on
    * the oracle gate.
    */
  val endashReport: Q = (s, dir) =>
    t(s, dir, "customer")
      .groupBy(col("c_nationkey").as("Nação"))
      .agg(
        count(lit(1)).as("quantidade_de_clientes_–_scr"),
        round(decSum(col("c_acctbal"), 2) / count(lit(1)), 4)
          .as("Saldo Médio – Posição"))
      .orderBy(col("Nação"))

  val endashReportSql: String =
    """SELECT c_nationkey AS "Nação",
      | CAST(count(*) AS BIGINT) AS "quantidade_de_clientes_–_scr",
      | round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/count(*), 4)
      |   AS "Saldo Médio – Posição"
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin

  /** Window-function battery: lag/lead, row_number, running decimal sum,
    * 3-row moving average — partition by customer, total order within the
    * partition via (o_orderdate, o_orderkey unique). Running sums use the
    * per-row decimal cast so cross-row accumulation is exact (doubles
    * would differ in ulps between engines' window accumulators).
    */
  val windowBattery: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMov = w.rowsBetween(-2, Window.currentRow)
    val dec = col("o_totalprice").cast("decimal(18,2)")
    t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      row_number().over(w).as("seq"),
      sum(dec).over(wRun).cast("double").as("run_total"),
      round(sum(dec).over(wMov).cast("double") / count(lit(1)).over(wMov), 4)
        .as("mov_avg3"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val windowBatterySql: String =
    """SELECT o_custkey, o_orderkey,
      | lag(o_totalprice) OVER w AS prev_price,
      | lead(o_totalprice) OVER w AS next_price,
      | CAST(row_number() OVER w AS INTEGER) AS seq,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total,
      | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |  / count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** GROUPING SETS with grouping() markers (generalizes q32 rollup /
    * q33 cube). Expressed via spark.sql — grouping sets have no
    * DataFrame-API form.
    */
  val groupingSetsQ: Q = (s, dir) => {
    t(s, dir, "orders").createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        | count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
        | CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
        |  o_orderpriority NULLS FIRST""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      | CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
      | CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |  (o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
      |  o_orderpriority NULLS FIRST""".stripMargin

  /** Deterministic stratified sampling: the sample membership is a pure
    * function of the row key (first md5 hex digit), so the sample is
    * reproducible across engines, runs, and partitionings — unlike
    * rand()/TABLESAMPLE. Per-stratum rates via the digit threshold
    * (F 25%, O 12.5%, P 50%).
    */
  val hashSample: Q = (s, dir) =>
    t(s, dir, "orders")
      .withColumn("h", substring(md5(col("o_orderkey").cast("string")), 1, 1))
      .filter(
        (col("o_orderstatus") === "F" && col("h") < "4") ||
          (col("o_orderstatus") === "O" && col("h") < "2") ||
          (col("o_orderstatus") === "P" && col("h") < "8"))
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))

  val hashSampleSql: String =
    """SELECT o_orderkey, o_orderstatus FROM (
      | SELECT o_orderkey, o_orderstatus,
      |  substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) AS h
      | FROM orders) x
      |WHERE (o_orderstatus = 'F' AND h < '4')
      |   OR (o_orderstatus = 'O' AND h < '2')
      |   OR (o_orderstatus = 'P' AND h < '8')
      |ORDER BY o_orderkey""".stripMargin

  /** Range join (equality + time-band): events of the same user within
    * 5 minutes AFTER each event — burst detection. The equality key
    * (user) bounds the join: the shuffle clusters by user and the band is
    * a probe-side condition, so no cross product ever forms; for pure
    * range joins (no equality key) the same shape works with a time-bin
    * bucket key on both sides.
    */
  val rangeJoinBursts: Q = (s, dir) => {
    val e = Tables.events(s, dir)
    val l = e.select(col("event_id").as("eid"), col("user_id").as("uid"),
      col("ts").as("t0"))
    val r = e.select(col("event_id").as("eid2"), col("user_id").as("uid2"),
      col("ts").as("t1"), col("value"))
    l.join(r, col("uid") === col("uid2") && col("t1") > col("t0") &&
        col("t1") <= col("t0") + expr("INTERVAL 5 MINUTES"))
      .groupBy(col("eid"))
      .agg(count(lit(1)).as("n_followers"), decSum(col("value"), 2).as("follower_value"))
      .orderBy(col("eid"))
  }

  val rangeJoinBurstsSql: String =
    """SELECT l.event_id AS eid,
      | CAST(count(*) AS BIGINT) AS n_followers,
      | CAST(sum(CAST(r.value AS DECIMAL(18,2))) AS DOUBLE) AS follower_value
      |FROM events l JOIN events r
      |  ON r.user_id = l.user_id AND r.ts > l.ts
      | AND r.ts <= l.ts + INTERVAL 5 MINUTE
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Unpivot/melt (inverse of q37 pivot): conditional-agg a wide frame,
    * then melt metric columns into (status, metric, n) long form via
    * Dataset.unpivot — one narrow map after the aggregate, no shuffle.
    */
  val unpivotMetrics: Q = (s, dir) => {
    val wide = t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"),
        count(when(col("o_orderpriority") === "2-HIGH", 1)).as("n_high"),
        count(when(col("o_orderpriority") === "5-LOW", 1)).as("n_low"))
    wide.unpivot(
      ids = Array(col("o_orderstatus")),
      values = Array(col("n_urgent"), col("n_high"), col("n_low")),
      variableColumnName = "metric", valueColumnName = "n")
      .orderBy(col("o_orderstatus"), col("metric"))
  }

  val unpivotMetricsSql: String =
    """WITH wide AS (
      | SELECT o_orderstatus,
      |  CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
      |  CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS n_high,
      |  CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS n_low
      | FROM orders GROUP BY o_orderstatus)
      |SELECT o_orderstatus, 'n_urgent' AS metric, n_urgent AS n FROM wide
      |UNION ALL SELECT o_orderstatus, 'n_high', n_high FROM wide
      |UNION ALL SELECT o_orderstatus, 'n_low', n_low FROM wide
      |ORDER BY o_orderstatus, metric""".stripMargin

  /** SCD1 merge/upsert: a base snapshot merged with an updates delta —
    * updated rows override, unmatched updates insert, the rest carry over.
    * Expressed as a full outer join + coalesce (the portable MERGE INTO):
    * one shuffle on the merge key; at scale the base side would be
    * bucketed on the key so only the delta shuffles.
    */
  val mergeUpsert: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val base = c.filter(col("c_custkey") < 1000)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val updates = c.filter(col("c_custkey") >= 500 && col("c_custkey") < 1200)
      .select(col("c_custkey").as("u_custkey"),
        lit("UPDATED").as("u_mktsegment"),
        round(col("c_acctbal") + 100.0, 2).as("u_acctbal"))
    base.join(updates, col("c_custkey") === col("u_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("u_custkey")).as("custkey"),
        coalesce(col("u_mktsegment"), col("c_mktsegment")).as("mktsegment"),
        coalesce(col("u_acctbal"), col("c_acctbal")).as("acctbal"))
      .orderBy(col("custkey"))
  }

  val mergeUpsertSql: String =
    """WITH base AS (
      | SELECT c_custkey, c_mktsegment, c_acctbal FROM customer WHERE c_custkey < 1000),
      |updates AS (
      | SELECT c_custkey AS u_custkey, 'UPDATED' AS u_mktsegment,
      |  round(c_acctbal + 100.0, 2) AS u_acctbal
      | FROM customer WHERE c_custkey >= 500 AND c_custkey < 1200)
      |SELECT coalesce(c_custkey, u_custkey) AS custkey,
      | coalesce(u_mktsegment, c_mktsegment) AS mktsegment,
      | coalesce(u_acctbal, c_acctbal) AS acctbal
      |FROM base FULL OUTER JOIN updates ON c_custkey = u_custkey
      |ORDER BY custkey""".stripMargin

  /** PII anonymization pass: irreversible keyed hash (sha2-256) for join
    * keys, regex masking for quasi-identifiers — pure narrow map, the
    * shape of a compliance scrub over 100 TB.
    */
  val anonymize: Q = (s, dir) =>
    t(s, dir, "customer").select(
      sha2(concat(lit("pepper:"), col("c_name")), 256).as("name_hash"),
      regexp_replace(col("c_name"), "[0-9]", "X").as("name_masked"),
      col("c_mktsegment"))
      .orderBy(col("name_hash"))

  val anonymizeSql: String =
    """SELECT sha256('pepper:' || c_name) AS name_hash,
      | regexp_replace(c_name, '[0-9]', 'X', 'g') AS name_masked,
      | c_mktsegment
      |FROM customer ORDER BY name_hash""".stripMargin

  /** Schema-based JSON parsing (from_json → struct field access), the
    * typed counterpart of q17's get_json_object.
    */
  val fromJsonStruct: Q = (s, dir) =>
    Tables.events(s, dir).select(
      col("event_id"),
      from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .getField("k").as("k_typed"))
      .orderBy(col("event_id"))

  val fromJsonStructSql: String =
    """SELECT event_id,
      | TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed
      |FROM events ORDER BY event_id""".stripMargin

  /** Map-typed columns: build a map from entries, access by key, list the
    * sorted key set (final columns scalar — the driver comparator cannot
    * hash map/array cells).
    */
  val mapOps: Q = (s, dir) =>
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        map_from_arrays(
          array(lit("status"), lit("priority")),
          array(col("o_orderstatus"), col("o_orderpriority"))).as("m"))
      .select(
        col("o_orderkey"),
        col("m").getItem("status").as("m_status"),
        element_at(col("m"), "priority").as("m_priority"),
        array_join(sort_array(map_keys(col("m"))), ",").as("m_keys"),
        size(col("m")).as("m_size"))
      .orderBy(col("o_orderkey"))

  val mapOpsSql: String =
    """SELECT o_orderkey,
      | o_orderstatus AS m_status,
      | o_orderpriority AS m_priority,
      | 'priority,status' AS m_keys,
      | 2 AS m_size
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** min_by/max_by: value of one column at the extremum of another
    * (DuckDB arg_min/arg_max). Extremum column (o_orderkey) is unique per
    * group, so the pick is deterministic.
    */
  val minByMaxBy: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        min_by(col("o_custkey"), col("o_orderkey")).as("first_cust"),
        max_by(col("o_custkey"), col("o_orderkey")).as("last_cust"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus"))

  val minByMaxBySql: String =
    """SELECT o_orderstatus,
      | arg_min(o_custkey, o_orderkey) AS first_cust,
      | arg_max(o_custkey, o_orderkey) AS last_cust,
      | min(o_orderkey) AS min_key,
      | max(o_orderkey) AS max_key
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Dedup cluster formation: connected components (min-label fixpoint)
    * over the q23 exact-Jaccard pair list — pairwise matches → clusters →
    * keeper per cluster. Oracle: DuckDB recursive CTE transitive closure
    * over the identical edge set.
    */
  val dedupClusters: Q = (s, dir) => {
    val pairs = Dedup.blockedJaccardPairs(t(s, dir, "documents"), "text", "doc_id",
      Seq("lang", "n_chars"), threshold = 0.5)
    Dedup.clusters(pairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  val dedupClustersSql: String =
    """WITH RECURSIVE toks AS (
      | SELECT doc_id, lang, n_chars,
      |  list_distinct(regexp_extract_all(lower(text), '\S+')) AS tok
      | FROM documents WHERE length(regexp_extract_all(lower(text), '\S+')) > 0),
      |edges AS (
      | SELECT l.doc_id AS a, r.doc_id AS b
      | FROM toks l JOIN toks r
      |   ON l.lang = r.lang AND l.n_chars = r.n_chars AND l.doc_id < r.doc_id
      | WHERE CAST(length(list_intersect(l.tok, r.tok)) AS DOUBLE) /
      |       length(list_distinct(list_concat(l.tok, r.tok))) >= 0.5),
      |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      |reach AS (SELECT a, b FROM sym
      |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a)
      |SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  /** Quantile-band quality filter: keep documents between p10 and p90 of
    * the per-language length distribution (percent_rank — exact, unlike
    * approx_percentile, so it is oracle-checkable; at 100 TB you'd swap in
    * approx_percentile thresholds computed once per partition).
    */
  val qualityBand: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        percent_rank().over(w).as("pr"))
      .filter(col("pr") >= 0.1 && col("pr") <= 0.9)
      .select(col("doc_id"), col("lang"), col("n_chars"), round(col("pr"), 6).as("pr"))
      .orderBy(col("doc_id"))
  }

  val qualityBandSql: String =
    """SELECT doc_id, lang, n_chars, round(pr, 6) AS pr FROM (
      | SELECT doc_id, lang, n_chars,
      |  percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS pr
      | FROM documents) x
      |WHERE pr >= 0.1 AND pr <= 0.9 ORDER BY doc_id""".stripMargin

  /** TF-IDF top-3 terms per document. The idf is the SMOOTHED RATIO
    * (n+1)/(df+1) without the log: rational double arithmetic is
    * bit-identical across engines where log()'s libm ulps are not, and
    * the per-document ranking it induces is the same.
    */
  val tfidfTerms: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), explode(TextStats.tokens(lower(col("text")))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy(col("token")).agg(countDistinct(col("doc_id")).as("df"))
    val n = t(s, dir, "documents").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
    tf.join(dfreq, "token").crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"),
        round(col("tf") * (col("n") + 1.0) / (col("df") + 1.0), 6).as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("token"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  val tfidfTermsSql: String =
    """WITH toks AS (
      | SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS token
      | FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (
      | SELECT tf.doc_id, tf.token,
      |  round(tf.tf * (n.n + 1.0) / (df.df + 1.0), 6) AS score
      | FROM tf JOIN df USING (token) CROSS JOIN n),
      |ranked AS (
      | SELECT doc_id, token, score,
      |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rk
      | FROM scored)
      |SELECT doc_id, CAST(rk AS INTEGER) AS rk, token, score
      |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** Per-group embedding centroids (the aggregation behind k-means /
    * cluster summaries): posexplode to (group, dim, value), exact decimal
    * mean per cell. Long output (512 rows), no array columns on the gate.
    * Floats go float→STRING→decimal on BOTH sides: the shortest
    * round-trip string of a float is engine-independent, whereas direct
    * float→decimal rounding differs in ulps (Spark rounds the shortest
    * double string, DuckDB the full binary expansion — caught at sf0.001).
    */
  val embeddingCentroids: Q = (s, dir) =>
    t(s, dir, "embeddings")
      .select((col("vec_id") % 8).as("grp"),
        posexplode(col("embedding")).as(Seq("pos", "val")))
      .groupBy(col("grp"), (col("pos") + 1).as("dim"))
      .agg(round(sum(col("val").cast("string").cast("decimal(18,9)")).cast("double")
        / count(lit(1)), 6).as("centroid"))
      .orderBy(col("grp"), col("dim"))

  val embeddingCentroidsSql: String =
    """SELECT vec_id % 8 AS grp, CAST(d.dim AS INTEGER) AS dim,
      | round(CAST(sum(CAST(CAST(embedding[d.dim] AS VARCHAR) AS DECIMAL(18,9)))
      |   AS DOUBLE) / count(*), 6) AS centroid
      |FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS dim) d
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Date/time battery: month-end, ISO week, day-of-week, week truncation,
    * month arithmetic. dayofweek differs between engines (Spark 1=Sunday,
    * DuckDB 0=Sunday) and DuckDB's date_trunc returns DATE — the oracle
    * normalizes both; month delta uses the explicit (year, month) formula
    * on both sides rather than engine-specific month-diff functions.
    */
  val dateBattery: Q = (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      last_day(col("o_orderdate")).as("month_end"),
      weekofyear(col("o_orderdate")).as("iso_week"),
      dayofweek(col("o_orderdate")).as("dow"),
      date_trunc("week", col("o_orderdate")).as("week_start"),
      ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
        .as("months_since"))
      .orderBy(col("o_orderkey"))

  val dateBatterySql: String =
    """SELECT o_orderkey,
      | last_day(o_orderdate) AS month_end,
      | CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
      | CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
      | CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
      | CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS INTEGER)
      |   AS months_since
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Fuzzy string matching: levenshtein distance (record-linkage /
    * canonical-name matching primitive) + translate remap.
    */
  val fuzzyStrings: Q = (s, dir) =>
    t(s, dir, "customer").select(
      col("c_custkey"),
      levenshtein(col("c_name"), lit("Customer#000000000")).as("lev_to_proto"),
      levenshtein(col("c_name"), translate(col("c_name"), "0123456789", "OI234S6789"))
        .as("lev_digit_swap"),
      translate(col("c_name"), "#", "-").as("name_dashed"))
      .orderBy(col("c_custkey"))

  val fuzzyStringsSql: String =
    """SELECT c_custkey,
      | CAST(levenshtein(c_name, 'Customer#000000000') AS INTEGER) AS lev_to_proto,
      | CAST(levenshtein(c_name, translate(c_name, '0123456789', 'OI234S6789'))
      |   AS INTEGER) AS lev_digit_swap,
      | translate(c_name, '#', '-') AS name_dashed
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Conditional / boolean / bitwise aggregates: count_if, bool_and,
    * bool_or, bit_and/or/xor — the profiling-and-flags aggregate family.
    */
  val condAggs: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count_if(col("o_totalprice") > 200000).as("n_big"),
        bool_and(col("o_totalprice") > 0).as("all_pos"),
        bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
        bit_and(col("o_orderkey")).as("key_band"),
        bit_or(col("o_orderkey")).as("key_bor"),
        bit_xor(col("o_orderkey")).as("key_bxor"))
      .orderBy(col("o_orderstatus"))

  val condAggsSql: String =
    """SELECT o_orderstatus,
      | CAST(count(*) FILTER (o_totalprice > 200000) AS BIGINT) AS n_big,
      | bool_and(o_totalprice > 0) AS all_pos,
      | bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
      | bit_and(o_orderkey) AS key_band,
      | bit_or(o_orderkey) AS key_bor,
      | bit_xor(o_orderkey) AS key_bxor
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Exact-arithmetic standard deviation: decimal sum and sum-of-squares
    * (order-independent), variance assembled in double from exact inputs —
    * byte-identical across engines and partitionings where stddev_samp's
    * streaming double accumulation is not.
    */
  val exactStddev: Q = (s, dir) => {
    val dec = col("o_totalprice").cast("decimal(18,2)")
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec * dec).cast("double").as("sq"),
        sum(dec).cast("double").as("sm"))
      .select(col("o_orderstatus"), col("n"),
        round(sqrt((col("sq") - col("sm") * col("sm") / col("n")) / (col("n") - 1)), 4)
          .as("sd"))
      .orderBy(col("o_orderstatus"))
  }

  val exactStddevSql: String =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      | round(sqrt((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) *
      |                       CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |   - CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) *
      |     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*))
      |  / (count(*) - 1)), 4) AS sd
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Column profiler: one scan → long-form per-column stats (see
    * quality/Profiler.scala). Doubles canonicalize through decimal before
    * stringification — double→string formatting is engine-specific.
    */
  val profileColumns: Q = (s, dir) =>
    graft.quality.Profiler.profile(
      t(s, dir, "customer"),
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      canon = Map("c_acctbal" -> ((c: Column) => c.cast("decimal(18,2)"))))
      .orderBy(col("col_name"))

  val profileColumnsSql: String = {
    def one(c: String, canonExpr: String) =
      s"""SELECT '$c' AS col_name,
         | CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
         | CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         | CAST(min($canonExpr) AS VARCHAR) AS min_value,
         | CAST(max($canonExpr) AS VARCHAR) AS max_value
         |FROM customer""".stripMargin
    Seq(
      one("c_custkey", "c_custkey"),
      one("c_name", "c_name"),
      one("c_nationkey", "c_nationkey"),
      one("c_acctbal", "CAST(c_acctbal AS DECIMAL(18,2))"),
      one("c_mktsegment", "c_mktsegment"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** HOF predicate quantifiers: exists / forall / filter-count over token
    * arrays (DuckDB expresses the quantifiers via list_filter lengths).
    */
  val existsForall: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), TextStats.tokens(lower(col("text"))).as("tok"))
      .select(
        col("doc_id"),
        exists(col("tok"), t => length(t) > 10).as("has_long"),
        forall(col("tok"), t => length(t) < 25).as("all_under25"),
        size(filter(col("tok"), t => t.rlike("^[0-9]+$"))).as("n_numeric"))
      .orderBy(col("doc_id"))

  val existsForallSql: String =
    """WITH toks AS (
      | SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tok FROM documents)
      |SELECT doc_id,
      | length(list_filter(tok, t -> length(t) > 10)) > 0 AS has_long,
      | length(list_filter(tok, t -> NOT length(t) < 25)) = 0 AS all_under25,
      | CAST(length(list_filter(tok, t -> regexp_full_match(t, '[0-9]+'))) AS INTEGER)
      |   AS n_numeric
      |FROM toks ORDER BY doc_id""".stripMargin

  /** Calendar densification: explode each order into one row per month of
    * its following quarter (sequence + explode — the gap-filling shape
    * behind as-of reporting tables).
    */
  val dateDensify: Q = (s, dir) =>
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"),
        explode(sequence(
          date_trunc("month", col("o_orderdate")),
          date_trunc("month", col("o_orderdate")) + expr("INTERVAL 2 MONTHS"),
          expr("INTERVAL 1 MONTH"))).as("report_month"))
      .orderBy(col("o_orderkey"), col("report_month"))

  val dateDensifySql: String =
    """SELECT o_orderkey, unnest(generate_series(
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP),
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) + INTERVAL 2 MONTH,
      |  INTERVAL 1 MONTH)) AS report_month
      |FROM orders WHERE o_orderkey < 500
      |ORDER BY o_orderkey, report_month""".stripMargin

  /** PURE range join (no equality key) via time-bin bucketing
    * (ops/RangeJoin.binned): every event paired with all events in the
    * next 2 minutes corpus-wide. The bin key restores an equi-join —
    * shuffle 2|L|+|R|, never a cross product — where q58 relies on a
    * user-key broadcast. Oracle: the naive inequality join (DuckDB IEJoin
    * handles it exactly).
    */
  val rangeJoinBinned: Q = (s, dir) => {
    val e = Tables.events(s, dir).withColumn("one", lit(1))
    graft.ops.RangeJoin.binned(e, e, "one", "ts", windowMs = 120000L,
      leftCols = Seq("event_id"), rightCols = Seq("event_id", "value"))
      .groupBy(col("l_event_id"))
      .agg(count(lit(1)).as("n_next"), decSum(col("r_value"), 2).as("next_value"))
      .orderBy(col("l_event_id"))
  }

  val rangeJoinBinnedSql: String =
    """SELECT l.event_id AS l_event_id,
      | CAST(count(*) AS BIGINT) AS n_next,
      | CAST(sum(CAST(r.value AS DECIMAL(18,2))) AS DOUBLE) AS next_value
      |FROM events l JOIN events r
      |  ON r.ts > l.ts AND epoch_ms(r.ts) <= epoch_ms(l.ts) + 120000
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Approximate quantiles (Greenwald–Khanna sketch behind
    * approx_percentile) next to exact: the gate carries the exact median
    * plus assertions that the sketch landed within 1% — the q52 pattern
    * applied to quantiles.
    */
  val approxQuantiles: Q = (s, dir) => {
    val ap50 = expr("approx_percentile(o_totalprice, 0.5, 10000)")
    val ap90 = expr("approx_percentile(o_totalprice, 0.9, 10000)")
    val ex50 = expr("percentile(o_totalprice, 0.5)")
    val ex90 = expr("percentile(o_totalprice, 0.9)")
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        round(ex50, 4).as("p50_exact"),
        (abs(ap50 - ex50) / ex50 <= 0.01).as("p50_est_ok"),
        (abs(ap90 - ex90) / ex90 <= 0.01).as("p90_est_ok"))
      .orderBy(col("o_orderstatus"))
  }

  val approxQuantilesSql: String =
    """SELECT o_orderstatus,
      | round(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
      | TRUE AS p50_est_ok,
      | TRUE AS p90_est_ok
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Bitwise scalar battery: shifts, and/or/xor, popcount — the bit-level
    * functions behind fingerprints and bucket keys, as first-class gate
    * coverage (they ran only inside q22's internals before).
    */
  val bitScalars: Q = (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      shiftleft(col("o_orderkey"), 3).as("shl3"),
      shiftrightunsigned(col("o_orderkey"), 2).as("shr2"),
      col("o_orderkey").bitwiseAND(lit(0xffL)).as("low8"),
      col("o_orderkey").bitwiseOR(lit(1L)).as("odd"),
      col("o_orderkey").bitwiseXOR(col("o_custkey")).as("mix"),
      bit_count(col("o_orderkey")).as("pop"))
      .orderBy(col("o_orderkey"))

  val bitScalarsSql: String =
    """SELECT o_orderkey,
      | o_orderkey << 3 AS shl3,
      | o_orderkey >> 2 AS shr2,
      | o_orderkey & 255 AS low8,
      | o_orderkey | 1 AS odd,
      | xor(o_orderkey, o_custkey) AS mix,
      | CAST(bit_count(o_orderkey) AS INTEGER) AS pop
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Binary encoding battery: hex / base64 round-trips over string bytes. */
  val encodeBattery: Q = (s, dir) =>
    t(s, dir, "customer").select(
      col("c_custkey"),
      hex(col("c_name").cast("binary")).as("name_hex"),
      base64(col("c_name").cast("binary")).as("name_b64"),
      unbase64(base64(col("c_name").cast("binary"))).cast("string").as("b64_rt"),
      lower(hex(unhex(hex(col("c_name").cast("binary"))))).as("hex_rt_lc"))
      .orderBy(col("c_custkey"))

  val encodeBatterySql: String =
    """SELECT c_custkey,
      | hex(CAST(c_name AS BLOB)) AS name_hex,
      | to_base64(CAST(c_name AS BLOB)) AS name_b64,
      | CAST(from_base64(to_base64(CAST(c_name AS BLOB))) AS VARCHAR) AS b64_rt,
      | lower(hex(CAST(c_name AS BLOB))) AS hex_rt_lc
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Struct-typed columns: build, field access, and whole-struct ordering
    * comparison (lexicographic by field) — the nested-type family the gate
    * didn't cover yet. Final columns are scalars for the comparator.
    */
  val structOps: Q = (s, dir) =>
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        struct(col("o_orderstatus").as("s"), col("o_totalprice").as("p")).as("st"))
      .select(
        col("o_orderkey"),
        col("st.s").as("st_status"),
        col("st.p").as("st_price"),
        (col("st") > struct(lit("O").as("s"), lit(100000.0).as("p"))).as("st_gt"))
      .orderBy(col("o_orderkey"))

  val structOpsSql: String =
    """SELECT o_orderkey,
      | struct_pack(s := o_orderstatus, p := o_totalprice).s AS st_status,
      | struct_pack(s := o_orderstatus, p := o_totalprice).p AS st_price,
      | struct_pack(s := o_orderstatus, p := o_totalprice) >
      |   struct_pack(s := 'O', p := 100000.0) AS st_gt
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** explode_outer NULL semantics: rows with empty arrays survive as a
    * NULL token row (plain explode silently drops them — a real data-loss
    * footgun in token pipelines).
    */
  val explodeOuter: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"),
        filter(TextStats.tokens(lower(col("text"))), t => length(t) > 12).as("longs"))
      .select(col("doc_id"), explode_outer(col("longs")).as("tok"))
      .orderBy(col("doc_id"), col("tok"))

  val explodeOuterSql: String =
    """WITH t AS (
      | SELECT doc_id,
      |  list_filter(regexp_extract_all(lower(text), '\S+'),
      |              x -> length(x) > 12) AS longs
      | FROM documents)
      |SELECT t.doc_id, u.tok
      |FROM t LEFT JOIN LATERAL (SELECT unnest(longs) AS tok) u ON TRUE
      |ORDER BY doc_id, tok NULLS FIRST""".stripMargin

  /** Regex capture-group backreferences in replacement (Spark `$n`,
    * DuckDB/RE2 `\n` — same semantics, different spelling).
    */
  val regexBackrefs: Q = (s, dir) =>
    t(s, dir, "customer").select(
      col("c_custkey"),
      regexp_replace(col("c_name"), "^(Customer)#0*([0-9]+)$", "$2:$1").as("swapped"),
      regexp_replace(col("c_name"), "(0+)([1-9])", "<$2>").as("zeros_tagged"))
      .orderBy(col("c_custkey"))

  val regexBackrefsSql: String =
    """SELECT c_custkey,
      | regexp_replace(c_name, '^(Customer)#0*([0-9]+)$', '\2:\1') AS swapped,
      | regexp_replace(c_name, '(0+)([1-9])', '<\2>', 'g') AS zeros_tagged
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Window value functions: first/last/nth over the full partition frame
    * plus ntile bucketing — deterministic because the partition order
    * (o_orderdate, unique o_orderkey) is total.
    */
  val windowValues: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders").select(
      col("o_orderkey"),
      first(col("o_totalprice")).over(wFull).as("fv"),
      last(col("o_totalprice")).over(wFull).as("lv"),
      nth_value(col("o_totalprice"), 2).over(wFull).as("nv2"),
      ntile(4).over(w).as("quartile"))
      .orderBy(col("o_orderkey"))
  }

  val windowValuesSql: String =
    """SELECT o_orderkey,
      | first_value(o_totalprice) OVER wf AS fv,
      | last_value(o_totalprice) OVER wf AS lv,
      | nth_value(o_totalprice, 2) OVER wf AS nv2,
      | CAST(ntile(4) OVER w AS INTEGER) AS quartile
      |FROM orders
      |WINDOW
      | w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      | wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin

  /** UNION DISTINCT (q05 exercises union-all harmonization; this is the
    * dedup-union set operation).
    */
  val unionDistinct: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .union(o.filter(col("o_totalprice") > 300000).select(col("o_custkey")))
      .distinct()
      .orderBy(col("o_custkey"))
  }

  val unionDistinctSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |UNION
      |SELECT o_custkey FROM orders WHERE o_totalprice > 300000
      |ORDER BY o_custkey""".stripMargin

  /** Exact-arithmetic Pearson correlation (same decimal-sums technique as
    * q72's stddev): corr()'s streaming double accumulation is not
    * cross-engine reproducible; sums of fixed-scale decimals are.
    */
  val exactCorr: Q = (s, dir) => {
    val qd = col("l_quantity").cast("decimal(18,2)")
    val pd = col("l_extendedprice").cast("decimal(18,2)")
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(qd * pd).cast("double").as("sxy"),
        sum(qd).cast("double").as("sx"),
        sum(pd).cast("double").as("sy"),
        sum(qd * qd).cast("double").as("sxx"),
        sum(pd * pd).cast("double").as("syy"))
      .select(col("l_returnflag"), col("n"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) /
          (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
            sqrt(col("syy") - col("sy") * col("sy") / col("n"))), 6)
          .as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  val exactCorrSql: String =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      | round((CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) *
      |                 CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |   - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) *
      |     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*))
      |  / (sqrt(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) *
      |                   CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |       - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) *
      |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
      |   * sqrt(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                   CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |       - CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) *
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*))),
      |  6) AS corr_qty_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** percentile_disc: exact discrete quantiles (an actual data value, not
    * an interpolation — deterministic by construction, no rounding
    * needed). Completes the quantile family next to q43 (continuous) and
    * q77 (sketch).
    */
  val percentileDisc: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50_disc"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").as("p90_disc"),
        min(col("o_totalprice")).as("p0"),
        max(col("o_totalprice")).as("p100"))
      .orderBy(col("o_orderstatus"))

  val percentileDiscSql: String =
    """SELECT o_orderstatus,
      | quantile_disc(o_totalprice, 0.5) AS p50_disc,
      | quantile_disc(o_totalprice, 0.9) AS p90_disc,
      | min(o_totalprice) AS p0,
      | max(o_totalprice) AS p100
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** F: row filter with parquet pushdown (latent in reference, SURVEY §2.3). */
  val filterPushdown: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") < to_timestamp(lit("1995-06-01 00:00:00"))
        && col("l_discount") > 0.05 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate"))
      // (l_orderkey, l_linenumber) is NOT unique in the testdata — order by
      // every output column so tied rows can't flip between engines
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("l_quantity"), col("l_shipdate"))

  val filterPushdownSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1995-06-01 00:00:00'
      |  AND l_discount > 0.05 AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity, l_shipdate""".stripMargin

  /** J2: left join with unmatched rows + null-aware aggregation. */
  val leftJoinNulls: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 48)
    o.join(big, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(col("o_orderkey"))
      .agg(count(col("l_orderkey")).as("n_big_items"),
        sum(col("l_quantity")).as("big_qty"))
      .orderBy(col("o_orderkey"))
  }

  val leftJoinNullsSql: String =
    """SELECT o_orderkey, count(l_orderkey) AS n_big_items, sum(l_quantity) AS big_qty
      |FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 48) li
      |  ON o_orderkey = l_orderkey
      |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin

  /** Window top-k per group (needed by north-star top-k, SURVEY §2.8). */
  val windowTopK: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val windowTopKSql: String =
    """SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) x
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Global sort + limit. */
  val sortLimit: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .limit(100)

  val sortLimitSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin

  /** Distinct. */
  val distinctFlags: Q = (s, dir) =>
    t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus"))
      .distinct().orderBy(col("l_returnflag"), col("l_linestatus"))

  val distinctFlagsSql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY 1, 2""".stripMargin

  /** Time-bucketed aggregation (batch equivalent of the streaming window).
    * Sum goes through PER-VALUE decimal casts (the determinism contract) —
    * summing raw doubles then casting would leave the result dependent on
    * partial-aggregation order.
    */
  val hourlyEvents: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value"), 2).as("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  val hourlyEventsSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      | count(*) AS n_events,
      | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** JSON field extraction from a string column. */
  val jsonExtract: Q = (s, dir) =>
    Tables.events(s, dir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").try_cast("int").as("k_int"))
      .orderBy(col("event_id"))

  val jsonExtractSql: String =
    """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
      | TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
      |FROM events ORDER BY event_id""".stripMargin

  /** A-family extras: min/max/count-distinct per group. */
  val aggStats: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("uniq_cust"),
        min(col("o_totalprice")).as("mn_price"),
        max(col("o_totalprice")).as("mx_price"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  val aggStatsSql: String =
    """SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS uniq_cust,
      | min(o_totalprice) AS mn_price, max(o_totalprice) AS mx_price, count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Set difference: customers with finished orders but no open ones. */
  val exceptNonBuyers: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  val exceptNonBuyersSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey""".stripMargin

  // ============================================================ north-star

  /** Exact dedup by normalized fingerprint: keeper + duplicate flag. */
  val dedupExact: Q = (s, dir) =>
    Dedup.byFingerprint(t(s, dir, "documents"))
      .select(col("doc_id"), col("fp"), col("keeper_id"), col("is_duplicate"))
      .orderBy(col("doc_id"))

  val dedupExactSql: String =
    """SELECT doc_id, fp,
      | min(doc_id) OVER (PARTITION BY fp) AS keeper_id,
      | doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_duplicate
      |FROM (SELECT doc_id,
      |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      | FROM documents) x
      |ORDER BY doc_id""".stripMargin

  /** MinHash+LSH near-dup RECALL GATE (r3 VERDICT #1: the four approximate
    * queries had no driver-checkable oracle). The exact ground truth — the
    * FULL pair set at the matched threshold, word-3-shingle Jaccard ≥ 0.7
    * over all doc pairs — is SQL-expressible, and the banding path's
    * output is by construction a SUBSET of it (candidates are verified
    * with the true Jaccard), so `exact LEFT JOIN lsh` with a found flag is
    * a complete gate: a missed pair surfaces as found_by_lsh=false and
    * hash-mismatches the all-TRUE oracle; a spurious pair is impossible.
    * The exact side is the oracle HARNESS (bounded to gate SFs; recall
    * measurement is inherently pairwise) — the operator under test is the
    * production path. The exact side is collision-driven, not O(n²): the
    * gram self-join only materializes pairs that share a shingle.
    */
  val dedupMinhash: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val sh = array_distinct(Dedup.wordShingles(col("text"), 3))
    // localCheckpoint: the shingle table feeds the gram explode (twice,
    // via the self-join) and both count joins — materialize the expensive
    // shingle build once (cluster analog: write the shingle table)
    val base = docs.select(col("doc_id").as("id"), sh.as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), col("sh"), size(col("sh")).as("n"))
      .localCheckpoint(true)
    // sparse similarity join, not an all-pairs product: explode shingles,
    // join on the shingle, count shared shingles per pair, and recover
    // |A∪B| = |A|+|B|-|A∩B| — pairs sharing zero shingles (the vast
    // majority) never materialize, so the exact side is collision-driven
    // rather than O(n²) on both engines
    val g = base.select(col("id"), explode(col("sh")).as("gram"))
    val inter = g.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("cnt"))
    val exact = inter
      .join(base.select(col("id").as("id1"), col("n").as("n1")), "id1")
      .join(base.select(col("id").as("id2"), col("n").as("n2")), "id2")
      .withColumn("jaccard",
        col("cnt").cast("double") / (col("n1") + col("n2") - col("cnt")))
      .filter(col("jaccard") >= 0.7)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
    val lsh = Dedup.minhashNearDuplicates(docs, "text", "doc_id",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.7,
      useWordShingles = true)
    exact.join(lsh.select(col("id1"), col("id2"), lit(true).as("found")),
        Seq("id1", "id2"), "left")
      .select(col("id1"), col("id2"), col("jaccard"),
        coalesce(col("found"), lit(false)).as("found_by_lsh"))
      .orderBy(col("id1"), col("id2"))
  }

  val dedupMinhashSql: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tok
      |              FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tok)-2),
      |         i -> tok[i]||' '||tok[i+1]||' '||tok[i+2])) AS sh
      |       FROM toks WHERE len(tok) >= 3),
      |g AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
      |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS cnt
      |          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id),
      |p AS (SELECT i.id1, i.id2,
      |        CAST(i.cnt AS DOUBLE) / (len(l.sh) + len(r.sh) - i.cnt) AS j
      |      FROM inter i JOIN sh l ON i.id1 = l.doc_id
      |                   JOIN sh r ON i.id2 = r.doc_id)
      |SELECT id1, id2, round(j, 6) AS jaccard, TRUE AS found_by_lsh
      |FROM p WHERE j >= 0.7 ORDER BY id1, id2""".stripMargin

  /** SimHash pigeonhole-bucketed pairs, EXACTLY gated (r3 VERDICT #1): the
    * fingerprint is [[TextStats.md5Simhash]] — same Charikar construction
    * as the native codegen simhash64, but built from cross-engine
    * primitives so the DuckDB oracle recomputes fingerprints bit-for-bit
    * and takes the BRUTE-FORCE hamming join; the Spark side runs the
    * bucketed pigeonhole path. Equal output proves the bucketing machinery
    * (chunking, first-match emission, join-condition Hamming) loses and
    * invents nothing — the pigeonhole completeness theorem, checked per
    * pair per row. The FNV fingerprint stays the production default
    * (faster, codegen'd; covered by OpsSpec).
    */
  val dedupSimhash: Q = (s, dir) => {
    val withFp = t(s, dir, "documents")
      .select(col("doc_id").as("id"),
        graft.functions.VectorExpressions.md5_simhash60(
          TextStats.tokens(lower(col("text")))).as("fp"))
      .filter(col("fp").isNotNull)
    Dedup.simhashPairs(withFp, maxHammingDistance = 8)
      .select(col("id1"), col("id2"), col("hamming").cast("int").as("hamming"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Shared oracle CTE: md5-based 60-bit simhash per doc (see
    * [[graft.ops.TextStats.md5Simhash]]).
    */
  private val md5SimhashCte: String =
    """toks AS (
      |  SELECT doc_id, list_transform(regexp_extract_all(lower(text), '\S+'),
      |    t -> (('0x'||substr(md5(t),1,15))::BIGINT)) AS hs
      |  FROM documents),
      |fps AS (
      |  SELECT doc_id, list_sum(list_transform(generate_series(0,59),
      |    b -> CASE WHEN list_sum(list_transform(hs, h -> (h >> b) & 1))*2 >= len(hs)
      |         THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS fp
      |  FROM toks WHERE len(hs) > 0)""".stripMargin

  val dedupSimhashSql: String =
    s"""WITH $md5SimhashCte
      |SELECT l.doc_id AS id1, r.doc_id AS id2,
      |  CAST(bit_count(xor(l.fp, r.fp)) AS INTEGER) AS hamming
      |FROM fps l JOIN fps r
      |  ON l.doc_id < r.doc_id AND bit_count(xor(l.fp, r.fp)) <= 8
      |ORDER BY id1, id2""".stripMargin

  /** Blocked exact token-Jaccard near-dup — fully oracle-checkable. */
  val dedupJaccard: Q = (s, dir) =>
    Dedup.blockedJaccardPairs(t(s, dir, "documents"), "text", "doc_id",
      Seq("lang", "n_chars"), threshold = 0.5)
      .orderBy(col("id1"), col("id2"))

  val dedupJaccardSql: String =
    """WITH toks AS (
      | SELECT doc_id, lang, n_chars,
      |  list_distinct(regexp_extract_all(lower(text), '\S+')) AS tok
      | FROM documents WHERE length(regexp_extract_all(lower(text), '\S+')) > 0)
      |SELECT l.doc_id AS id1, r.doc_id AS id2,
      | round(CAST(length(list_intersect(l.tok, r.tok)) AS DOUBLE) /
      |       length(list_distinct(list_concat(l.tok, r.tok))), 6) AS jaccard
      |FROM toks l JOIN toks r
      |  ON l.lang = r.lang AND l.n_chars = r.n_chars AND l.doc_id < r.doc_id
      |WHERE CAST(length(list_intersect(l.tok, r.tok)) AS DOUBLE) /
      |      length(list_distinct(list_concat(l.tok, r.tok))) >= 0.5
      |ORDER BY id1, id2""".stripMargin

  /** Brute-force cosine top-k (exact ANN baseline). */
  val simsearchBrute: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    SimSearch.bruteForceTopK(
      emb.filter(col("vec_id") >= 10), emb.filter(col("vec_id") < 10), k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  val simsearchBruteSql: String =
    """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |           FROM embeddings),
      |scored AS (
      | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  list_dot_product(q.e, c.e) /
      |   (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS score
      | FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id >= 10),
      |ranked AS (
      | SELECT query_id, neighbor_id, score,
      |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      | FROM scored)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
      | round(score, 6) AS score
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** LSH-bucketed ANN top-k, exactly gated (r3 VERDICT #1): at
    * `probeRadius = planes` multiprobe covers every bucket, so the result
    * PROVABLY equals brute-force top-k — the oracle is plain SQL, and the
    * full bucketing/probe/re-rank machinery still executes (bucket ids,
    * mask explosion, bucket join, windowed re-rank). The production
    * recall/cost trade at small radii is measured in OpsSpec
    * (single-probe vs 1-flip multiprobe vs exhaustive). k=7 distinguishes
    * this gate's output from q24's (k=5 brute baseline).
    */
  val simsearchLsh: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    SimSearch.lshTopK(
      emb.filter(col("vec_id") >= 10), emb.filter(col("vec_id") < 10),
      k = 7, planes = 4, probeRadius = 4)
      .orderBy(col("query_id"), col("rank"))
  }

  val simsearchLshSql: String =
    """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |           FROM embeddings),
      |scored AS (
      | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  list_dot_product(q.e, c.e) /
      |   (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS score
      | FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id >= 10),
      |ranked AS (
      | SELECT query_id, neighbor_id, score,
      |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      | FROM scored)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
      | round(score, 6) AS score
      |FROM ranked WHERE rank <= 7 ORDER BY query_id, rank""".stripMargin

  /** Per-document text statistics + quality score. */
  val textStats: Q = (s, dir) =>
    TextStats.documentStats(t(s, dir, "documents")).orderBy(col("doc_id"))

  val textStatsSql: String =
    """SELECT doc_id,
      | CAST(length(text) AS INTEGER) AS n_chars_m,
      | CAST(length(regexp_extract_all(text, '\S+')) AS INTEGER) AS n_tokens,
      | CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INTEGER) AS n_subwords,
      | CAST(length(regexp_extract_all(text, '[[:punct:]]')) AS INTEGER) AS n_punct,
      | CAST(length(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS INTEGER) AS n_stopwords,
      | round(
      |   least(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) / 50.0, 1.0) * 0.4
      | + (1.0 - least(CAST(length(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
      |     / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)) * 0.3
      | + least(CAST(length(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
      |     / greatest(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 4.0, 1.0) * 0.3,
      | 6) AS quality
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Token histogram via explode (Generator coverage). */
  val tokenHistogram: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(explode(TextStats.tokens(lower(col("text")))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  val tokenHistogramSql: String =
    """SELECT token, count(*) AS n FROM (
      | SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS token FROM documents) x
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  /** Language-ID heuristic (profile scoring). Oracle-checked: the scoring
    * is plain regexp counting + argmax, so the DuckDB twin reproduces it
    * with an order-preserving "zero-padded score ‖ lang" string max
    * (DuckDB 1.0's greatest() has no struct overload). Ties resolve to the
    * lexicographically largest lang on both sides.
    */
  val langId: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        TextStats.languageId(col("text")).as("predicted_lang"))
      .orderBy(col("doc_id"))

  val langIdSql: String = {
    val packs = TextStats.defaultProfiles.toSeq.sortBy(_._1).map {
      case (lang, grams) =>
        s"lpad(CAST(length(regexp_extract_all(lower(text), '${grams.mkString("|")}')) " +
          s"AS VARCHAR), 10, '0') || '$lang'"
    }.mkString(", ")
    s"""SELECT doc_id, lang AS labeled_lang,
       | substr(greatest($packs), 11) AS predicted_lang
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Content fingerprinting: md5 (oracle-checkable) + simhash (custom). */
  val fingerprints: Q = (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      TextStats.fingerprint(col("text")).as("fp_md5"))
      .orderBy(col("doc_id"))

  val fingerprintsSql: String =
    """SELECT doc_id,
      | md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Multimodal: opaque binary payloads + REAL header decode (r3 VERDICT
    * #6 — decode was a stub). Fixture payloads are synthesized per row
    * from the documents table: doc_id%3==0 → a valid PNG signature+IHDR
    * with width/height derived from row fields; ==1 → a JPEG with
    * SOI+APP0/JFIF+SOF0 (so the decoder must WALK segments, not just look
    * at a fixed offset); ==2 → raw text bytes (must decode to NULLs). The
    * oracle recomputes the planted dimensions arithmetically, so the gate
    * proves the byte-level encode→parse round-trip: signature checks,
    * big-endian field extraction, segment-length skipping.
    */
  val multimodalMeta: Q = (s, dir) => {
    def be32(c: Column) = unhex(lpad(hex(c), 8, "0"))
    def be16(c: Column) = unhex(lpad(hex(c), 4, "0"))
    val w = (lit(1) + col("n_chars") % 64).cast("int")
    val h = (lit(1) + col("doc_id") % 64).cast("int")
    val png = concat(
      unhex(lit("89504E470D0A1A0A")), // signature
      unhex(lit("0000000D49484452")), // IHDR length 13 + type
      be32(w), be32(h),
      unhex(lit("0802000000")),       // bit depth 8, truecolor, std flags
      unhex(lit("DEADBEEF")))         // CRC (not validated by the parser)
    val jpeg = concat(
      unhex(lit("FFD8")),                                   // SOI
      unhex(lit("FFE000104A46494600010100000100010000")),   // APP0/JFIF len 16
      unhex(lit("FFC0001108")), be16(h), be16(w),           // SOF0 len 17, prec 8
      unhex(lit("03012200021101031101")))                   // 3 components
    val payload = when(col("doc_id") % 3 === 0, png)
      .when(col("doc_id") % 3 === 1, jpeg)
      .otherwise(col("text").cast("binary"))
    val kind = when(col("doc_id") % 3 === 0, "png")
      .when(col("doc_id") % 3 === 1, "jpeg").otherwise("doc")
    val media = t(s, dir, "documents")
      .select(col("doc_id").as("media_id"), kind.as("kind"), payload.as("payload"))
    Multimodal.imageMeta(media).orderBy(col("media_id"))
  }

  val multimodalMetaSql: String =
    """SELECT doc_id AS media_id,
      | CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'doc' END AS kind,
      | CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 39
      |   ELSE octet_length(CAST(text AS BLOB)) END AS INTEGER) AS byte_len,
      | CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' END AS fmt,
      | CAST(CASE WHEN doc_id % 3 <= 1 THEN 1 + n_chars % 64 END AS INTEGER) AS width,
      | CAST(CASE WHEN doc_id % 3 <= 1 THEN 1 + doc_id % 64 END AS INTEGER) AS height
      |FROM documents ORDER BY media_id""".stripMargin

  /** Embedding norms per label (deterministic double pipeline). */
  val embeddingNorms: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    emb.select(col("label"),
        round(sqrt(graft.functions.VectorExpressions.dot_product(
          col("embedding"), col("embedding"))), 6).as("nrm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("nrm").cast("decimal(18,6)")).cast("double") / count(lit(1)), 4)
          .as("avg_norm"))
      .orderBy(col("label"))
  }

  val embeddingNormsSql: String =
    """SELECT label, count(*) AS n,
      | round(CAST(sum(CAST(round(sqrt(list_dot_product(
      |   list_transform(embedding, x -> CAST(x AS DOUBLE)),
      |   list_transform(embedding, x -> CAST(x AS DOUBLE)))), 6) AS DECIMAL(18,6))) AS DOUBLE)
      |  / count(*), 4) AS avg_norm
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  // ==================================================== extended relational

  /** Rollup with grouping indicators (subtotal lattice). */
  val rollupOrders: Q = (s, dir) =>
    t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg( // grouping() is only resolvable inside the grouping aggregate
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        count(lit(1)).as("n"), decSum(col("o_totalprice"), 2).as("total"))
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("g_status"), col("g_prio"), col("n"), col("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val rollupOrdersSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      | CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
      | count(*) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  /** Cube over lineitem flags. */
  val cubeFlags: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("g_rf"), col("g_ls"), col("n"), col("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first,
        col("g_rf"), col("g_ls"))

  val cubeFlagsSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
      | CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
      | count(*) AS n, sum(l_quantity) AS qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3, 4""".stripMargin

  /** Left-semi join (EXISTS). */
  val joinSemi: Q = (s, dir) => {
    val pending = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
    t(s, dir, "customer")
      .join(pending, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val joinSemiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join (NOT EXISTS). */
  val joinAnti: Q = (s, dir) => {
    val discounted = t(s, dir, "lineitem").filter(col("l_discount") > 0.09)
    t(s, dir, "part")
      .join(discounted, col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))
  }

  val joinAntiSql: String =
    """SELECT p_partkey, p_name FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_partkey = p_partkey AND l_discount > 0.09)
      |ORDER BY p_partkey""".stripMargin

  /** Intersect: customers holding both finished and open orders. */
  val intersectBuyers: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  val intersectBuyersSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey""".stripMargin

  /** Pivot order counts: one column per status. */
  val pivotStatus: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("o_orderpriority"))

  val pivotStatusSql: String =
    """SELECT o_orderpriority,
      | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
      | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
      | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Backward as-of join: latest purchase by the same user at/before each
    * error event (composed union+window — see [[graft.ops.AsOfJoin]]).
    */
  val asofJoin: Q = (s, dir) => {
    val e = Tables.events(s, dir)
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_event_id"))
    graft.ops.AsOfJoin.backward(errors, purchases, Seq("user_id"),
      "ts", "ts", Seq("ts"), tiebreak = Some("p_event_id"))
      .select(col("event_id"), col("user_id"), col("asof_ts").as("last_purchase_ts"))
      .orderBy(col("event_id"))
  }

  val asofJoinSql: String =
    """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |           FROM events WHERE event_type = 'error'),
      |     p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      |           FROM events WHERE event_type = 'purchase')
      |SELECT e.event_id, e.user_id, p.ts AS last_purchase_ts
      |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
      |ORDER BY e.event_id""".stripMargin

  /** Scalar-function battery: string/date/math parity in one projection. */
  val functionBattery: Q = (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("d"),
      substring(col("o_orderpriority"), 1, 1).as("prio_code"),
      regexp_replace(lower(col("o_orderpriority")), "-", "_").as("prio_snake"),
      lpad(col("o_orderstatus"), 3, "*").as("status_pad"),
      reverse(col("o_orderstatus")).as("status_rev"),
      length(col("o_orderpriority")).as("prio_len"),
      floor(col("o_totalprice")).as("price_floor"),
      ceil(col("o_totalprice")).as("price_ceil"),
      round(sqrt(col("o_totalprice")), 6).as("price_sqrt"),
      (col("o_orderkey") % 7).as("key_mod"))
      .orderBy(col("o_orderkey"))

  val functionBatterySql: String =
    """SELECT o_orderkey,
      | CAST(year(o_orderdate) AS INTEGER) AS y,
      | CAST(month(o_orderdate) AS INTEGER) AS m,
      | CAST(day(o_orderdate) AS INTEGER) AS d,
      | substring(o_orderpriority, 1, 1) AS prio_code,
      | regexp_replace(lower(o_orderpriority), '-', '_', 'g') AS prio_snake,
      | lpad(o_orderstatus, 3, '*') AS status_pad,
      | reverse(o_orderstatus) AS status_rev,
      | CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
      | CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      | CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
      | round(sqrt(o_totalprice), 6) AS price_sqrt,
      | o_orderkey % 7 AS key_mod
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** IVF-style ANN, exactly gated (r3 VERDICT #1): at `nprobe = 8` (every
    * cell of the 8-centroid codebook) each query's candidate set is the
    * whole corpus — every corpus vector sits in exactly one cell and all
    * cells are probed — so the result PROVABLY equals brute-force top-k
    * and the oracle is plain SQL, while the full IVF machinery executes
    * (codebook sample, nearest-cell assignment, probe explosion, cell
    * join, re-rank). The production nprobe=2 recall is measured in
    * OpsSpec. k=3 distinguishes this gate's output from q24 (k=5) and
    * q25 (k=7).
    */
  val simsearchIvf: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val corpus = emb.filter(col("vec_id") >= 10)
    val centroids = SimSearch.sampledCentroids(corpus, k = 8)
    SimSearch.ivfTopK(corpus, emb.filter(col("vec_id") < 10), k = 3,
      centroids = centroids, nprobe = 8)
      .orderBy(col("query_id"), col("rank"))
  }

  val simsearchIvfSql: String =
    """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |           FROM embeddings),
      |scored AS (
      | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  list_dot_product(q.e, c.e) /
      |   (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS score
      | FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id >= 10),
      |ranked AS (
      | SELECT query_id, neighbor_id, score,
      |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      | FROM scored)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
      | round(score, 6) AS score
      |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** Capstone curation pipeline: quality-filter + fingerprint-dedup a
    * corpus, then per-language stats — the canonical LLM training-data
    * prep flow, end-to-end oracle-checkable. One narrow scoring pass,
    * one 16-byte-key shuffle for dedup, one aggregation.
    */
  val curationPipeline: Q = (s, dir) => {
    val scored = t(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      TextStats.qualityScore(col("text")).as("q"),
      TextStats.tokenCount(col("text")).as("n_tok"),
      TextStats.fingerprint(col("text")).as("fp"))
    Dedup.markDuplicates(scored, col("fp"), col("doc_id"))
      .filter(col("q") >= 0.7 && !col("is_duplicate"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok").cast("long")).as("total_tokens"),
        round(decSum(col("q"), 6) / count(lit(1)), 4).as("avg_quality"))
      .orderBy(col("lang"))
  }

  val curationPipelineSql: String =
    """WITH s AS (
      | SELECT doc_id, lang,
      |  round(
      |    least(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) / 50.0, 1.0) * 0.4
      |  + (1.0 - least(CAST(length(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
      |      / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)) * 0.3
      |  + least(CAST(length(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
      |      / greatest(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 4.0, 1.0) * 0.3,
      |  6) AS q,
      |  length(regexp_extract_all(text, '\S+')) AS n_tok,
      |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      | FROM documents),
      |d AS (SELECT *, doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_dup FROM s)
      |SELECT lang, count(*) AS n_docs,
      | CAST(sum(n_tok) AS BIGINT) AS total_tokens,
      | round(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE)/count(*), 4) AS avg_quality
      |FROM d WHERE q >= 0.7 AND NOT is_dup
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Batch sessionization: lag + cumulative gap-count window (the batch
    * twin of streaming `EventStreams.sessionize`). 30-minute gap.
    */
  val sessionizeBatch: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val newSession = when(
      col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long") > 1800, 1L)
      .otherwise(lit(0L))
    Tables.events(s, dir)
      .withColumn("session_id", sum(newSession).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val sessionizeBatchSql: String =
    """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |marked AS (
      | SELECT user_id, ts,
      |  CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
      | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessioned AS (
      | SELECT user_id, ts,
      |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      | FROM marked)
      |SELECT user_id, session_id, count(*) AS n_events,
      | min(ts) AS session_start, max(ts) AS session_end
      |FROM sessioned GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Exact percentiles (sort-based `percentile`, not the approximate
    * sketch) — rounded to absorb interpolation ulp.
    */
  val percentiles: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  val percentilesSql: String =
    """SELECT o_orderstatus,
      | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      | count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Aggregate-to-array: sorted collect (deterministic by construction).
    * The array op (collect_set → sort_array) stays under test, but the
    * final column is canonicalized to a comma-joined string — the driver's
    * comparator cannot hash array cells, so both sides emit the scalar.
    */
  val collectArrays: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        array_join(sort_array(collect_set(col("l_linestatus"))), ",").as("statuses"),
        countDistinct(col("l_linestatus")).as("n_statuses"))
      .orderBy(col("l_returnflag"))

  val collectArraysSql: String =
    """SELECT l_returnflag,
      | array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
      | CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_statuses
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Native top-k-per-key via the custom TopKPerKey operator (partial
    * bounded top-k → shuffle of survivors → final top-k; see
    * graft/plans/TopKPerKey.scala). Same semantics as the q13 window
    * formulation — which is exactly what the oracle checks.
    */
  val topkNative: Q = (s, dir) => {
    GraftExtensions.install(s) // planner strategy on the live session
    // project BEFORE the operator: TopKPerKey's output = child output, so
    // pruning by hand keeps the shuffle + survivor sort on 3 columns, not
    // the full lineitem row
    TopK.perKey(
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
      keyCols = Seq("l_orderkey"), orderCol = "l_extendedprice",
      tiebreakCol = "l_linenumber", k = 2)
      // total order: (orderkey, linenumber) is not unique in the testdata
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }

  val topkNativeSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
      | SELECT l_orderkey, l_linenumber, l_extendedprice,
      |  row_number() OVER (PARTITION BY l_orderkey
      |    ORDER BY l_extendedprice DESC, l_linenumber) AS rn
      | FROM lineitem) x
      |WHERE rn <= 2 ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin

  /** Higher-order array functions: transform / filter / aggregate / zip.
    * The numeric sort happens on the int array (sort_array over
    * transform(length)); only the final emitted column is joined to a
    * string, because the driver's comparator cannot hash array cells.
    */
  val hofArrays: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), TextStats.tokens(lower(col("text"))).as("tok"))
      .select(
        col("doc_id"),
        array_join(
          sort_array(transform(col("tok"), t => length(t))).cast("array<string>"),
          ",").as("len_sorted"),
        aggregate(col("tok"), lit(0), (acc, t) => acc + length(t)).as("len_sum"),
        size(filter(col("tok"), t => length(t) > 4)).as("n_long"))
      .orderBy(col("doc_id"))

  val hofArraysSql: String =
    """WITH toks AS (
      | SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tok FROM documents)
      |SELECT doc_id,
      | array_to_string(list_sort(list_transform(tok, t -> CAST(length(t) AS INTEGER))), ',') AS len_sorted,
      | CAST(coalesce(list_sum(list_transform(tok, t -> length(t))), 0) AS INTEGER) AS len_sum,
      | CAST(length(list_filter(tok, t -> length(t) > 4)) AS INTEGER) AS n_long
      |FROM toks ORDER BY doc_id""".stripMargin

  /** Null-handling semantics: coalesce, nullif, null-safe equality. */
  val nullSemantics: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val nullable = when(col("o_orderstatus") === "P", lit(null).cast("string"))
      .otherwise(col("o_orderstatus"))
    o.select(
      col("o_orderkey"),
      coalesce(nullable, lit("UNKNOWN")).as("status_filled"),
      nullif(col("o_orderstatus"), lit("O")).as("status_nullif"),
      (nullable <=> lit(null).cast("string")).as("is_null_safe_eq"),
      isnull(nullable).as("is_null"))
      .orderBy(col("o_orderkey"))
  }

  val nullSemanticsSql: String =
    """SELECT o_orderkey,
      | coalesce(CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END, 'UNKNOWN') AS status_filled,
      | nullif(o_orderstatus, 'O') AS status_nullif,
      | (CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END IS NOT DISTINCT FROM NULL) AS is_null_safe_eq,
      | (CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END IS NULL) AS is_null
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Ordered string aggregation per group. */
  val stringAgg: Q = (s, dir) =>
    t(s, dir, "nation")
      .groupBy((col("n_regionkey") % 2).as("rk_mod"))
      .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("names"),
        count(lit(1)).as("n"))
      .orderBy(col("rk_mod"))

  val stringAggSql: String =
    """SELECT n_regionkey % 2 AS rk_mod,
      | string_agg(n_name, ',' ORDER BY n_name) AS names,
      | count(*) AS n
      |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin

  /** Date arithmetic: diffs, offsets, truncation, extraction. */
  val dateArithmetic: Q = (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
        .as("days_to_2002"),
      date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
      last_day(col("o_orderdate").cast("date")).as("month_end"),
      quarter(col("o_orderdate")).as("qtr"),
      dayofweek(col("o_orderdate")).as("dow"))
      .orderBy(col("o_orderkey"))

  val dateArithmeticSql: String =
    """SELECT o_orderkey,
      | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
      | CAST(o_orderdate AS DATE) + 30 AS plus30,
      | last_day(CAST(o_orderdate AS DATE)) AS month_end,
      | CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      | CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Six-table analytics join (TPC-H Q5 shape): regional revenue through
    * customer→orders→lineitem→supplier with co-nation constraint. The
    * dims chain into broadcasts; lineitem never shuffles for the joins.
    */
  val revenueByNation: Q = (s, dir) => {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region")
    cust
      .join(ord, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name").isin("ASIA", "EUROPE"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val revenueByNationSql: String =
    """SELECT r_name, n_name,
      | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      | count(*) AS n_items
      |FROM customer
      | JOIN orders   ON c_custkey = o_custkey
      | JOIN lineitem ON o_orderkey = l_orderkey
      | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      | JOIN nation   ON s_nationkey = n_nationkey
      | JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name IN ('ASIA', 'EUROPE')
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Unicode NFC normalization (custom expression; DuckDB nfc_normalize
    * oracle) + normalized fingerprint — the dedup-prep combination.
    */
  val unicodeNormalize: Q = (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      graft.functions.NormalizeUnicode.normalize_unicode(col("text"), "NFC")
        .as("text_nfc"),
      md5(graft.functions.NormalizeUnicode.normalize_unicode(
        lower(col("text")), "NFC").cast("binary")).as("fp_nfc"))
      .orderBy(col("doc_id"))

  val unicodeNormalizeSql: String =
    """SELECT doc_id, nfc_normalize(text) AS text_nfc,
      | md5(nfc_normalize(lower(text))) AS fp_nfc
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Approximate distinct counts (HLL++) next to exact — the sketch
    * every 100 TB cardinality estimate runs on. HLL merge is commutative
    * so the estimate is deterministic across partitionings, but its exact
    * value is engine-specific, so the gate columns are the exact count
    * plus an assertion that each sketch landed within 5% of truth (the
    * configured rsd) — the oracle checks the exact count and expects the
    * assertions to hold.
    */
  val approxSketches: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        (abs(approx_count_distinct(col("l_partkey"), 0.02) - countDistinct(col("l_partkey")))
          .cast("double") / countDistinct(col("l_partkey")) <= 0.05).as("parts_est_ok"),
        (abs(approx_count_distinct(col("l_orderkey"), 0.02) - countDistinct(col("l_orderkey")))
          .cast("double") / countDistinct(col("l_orderkey")) <= 0.05).as("orders_est_ok"))
      .orderBy(col("l_returnflag"))

  val approxSketchesSql: String =
    """SELECT l_returnflag,
      | CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      | TRUE AS parts_est_ok,
      | TRUE AS orders_est_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** regexp_extract with capture groups (completes the regex family:
    * replace, count, extract_all, matches, extract).
    */
  val regexExtract: Q = (s, dir) =>
    t(s, dir, "customer").select(
      col("c_custkey"),
      regexp_extract(col("c_name"), "Customer#(0*)([0-9]+)", 2).as("cust_num"),
      length(regexp_extract(col("c_name"), "Customer#(0*)", 1)).as("n_zeros"),
      regexp_extract(col("c_name"), "([a-z]+)", 1).as("no_match_empty"))
      .orderBy(col("c_custkey"))

  val regexExtractSql: String =
    """SELECT c_custkey,
      | regexp_extract(c_name, 'Customer#(0*)([0-9]+)', 2) AS cust_num,
      | CAST(length(regexp_extract(c_name, 'Customer#(0*)', 1)) AS INTEGER) AS n_zeros,
      | regexp_extract(c_name, '([a-z]+)', 1) AS no_match_empty
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ===================================================== round-3 additions

  /** Embedding near-dup, incremental-ingest shape: a small "new batch"
    * (broadcast) scanned exactly once against the historical corpus, exact
    * cosine ≥ threshold — recall 1.0 by construction, linear in the corpus
    * at any scale (the corpus side never shuffles). The LSH-bucketed
    * variant (`Dedup.embeddingNearDuplicates`) is the sub-linear path when
    * approximate recall is acceptable; this is the gate-exact one.
    */
  val embeddingNearDup: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    SimSearch.thresholdSearch(
      emb.filter(col("vec_id") >= 50), emb.filter(col("vec_id") < 50),
      threshold = 0.35)
      .orderBy(col("batch_id"), col("corpus_id"))
  }

  val embeddingNearDupSql: String =
    """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |           FROM embeddings),
      |p AS (SELECT b.vec_id AS batch_id, c.vec_id AS corpus_id,
      | list_dot_product(b.e,c.e) /
      |  (sqrt(list_dot_product(b.e,b.e))*sqrt(list_dot_product(c.e,c.e))) AS score
      | FROM v b JOIN v c ON b.vec_id < 50 AND c.vec_id >= 50)
      |SELECT p.batch_id, p.corpus_id, round(p.score,6) AS score
      |FROM p WHERE p.score >= 0.35 ORDER BY p.batch_id, p.corpus_id""".stripMargin

  /** Token-budget sequence packing: documents streamed in stable order are
    * assigned to fixed-budget shards by running token count — the shard
    * layout step before tokenized training data is written. The window is
    * per-lang (each lang packs independently), so at 100 TB the cumsum
    * parallelizes across the partition key instead of one global sort;
    * shard id is `start_offset div budget` — pure integer arithmetic,
    * bit-identical on any engine.
    */
  val packShards: Q = (s, dir) => {
    TextStats.packIntoShards(
      t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
      groupCol = "lang", orderCol = "doc_id",
      nTok = TextStats.tokenCount(col("text")), budget = 4000L)
      .groupBy(col("lang"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("shard_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("shard_id"))
  }

  val packShardsSql: String =
    """WITH t AS (SELECT doc_id, lang,
      |  CAST(length(regexp_extract_all(text,'\S+')) AS BIGINT) AS n_tok FROM documents),
      |c AS (SELECT doc_id, lang, n_tok,
      |  CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM t)
      |SELECT lang, (cum - n_tok) // 4000 AS shard_id, count(*) AS n_docs,
      | CAST(sum(n_tok) AS BIGINT) AS shard_tokens,
      | min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c GROUP BY lang, (cum - n_tok) // 4000 ORDER BY lang, shard_id""".stripMargin

  /** Canonical-document selection per dedup cluster: clusters from the
    * exact-Jaccard pair list (q65 machinery), keeper = longest text with
    * min-id tiebreak — the "which copy do we train on" step after near-dup
    * clustering. Window runs over cluster members only (a tiny fraction of
    * the corpus), never the corpus.
    */
  val clusterCanonical: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val pairs = Dedup.blockedJaccardPairs(docs, "text", "doc_id",
      Seq("lang", "n_chars"), threshold = 0.5)
    val cl = Dedup.clusters(pairs)
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    cl.join(docs.select(col("doc_id"), col("n_chars")), cl("id") === col("doc_id"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("n_chars")).as("cluster_chars"),
        min(when(col("rn") === 1, col("doc_id"))).as("canonical_id"))
      .orderBy(col("cluster_id"))
  }

  val clusterCanonicalSql: String =
    """WITH RECURSIVE toks AS (
      | SELECT doc_id, lang, n_chars,
      |  list_distinct(regexp_extract_all(lower(text), '\S+')) AS tok
      | FROM documents WHERE length(regexp_extract_all(lower(text), '\S+')) > 0),
      |edges AS (
      | SELECT l.doc_id AS a, r.doc_id AS b FROM toks l JOIN toks r
      |   ON l.lang = r.lang AND l.n_chars = r.n_chars AND l.doc_id < r.doc_id
      | WHERE CAST(length(list_intersect(l.tok, r.tok)) AS DOUBLE) /
      |       length(list_distinct(list_concat(l.tok, r.tok))) >= 0.5),
      |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      |reach AS (SELECT a, b FROM sym
      |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a),
      |cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
      |m AS (SELECT c.cluster_id, c.doc_id, d.n_chars,
      |      row_number() OVER (PARTITION BY c.cluster_id
      |        ORDER BY d.n_chars DESC, c.doc_id) AS rn
      |      FROM cl c JOIN documents d ON c.doc_id = d.doc_id)
      |SELECT cluster_id, count(*) AS n_members,
      | CAST(sum(n_chars) AS BIGINT) AS cluster_chars,
      | min(CASE WHEN rn=1 THEN doc_id END) AS canonical_id
      |FROM m GROUP BY cluster_id ORDER BY cluster_id""".stripMargin

  /** Boilerplate stripping: HTML tags, URLs, e-mail addresses removed and
    * whitespace collapsed — the standard web-scrape cleanup pass. A fixed
    * boilerplate suffix is appended first so the strip rules demonstrably
    * fire on every row; `clean_fp` (md5) proves byte-exact output against
    * the oracle, not just lengths. One narrow codegen'd map, no shuffle.
    */
  val stripBoilerplate: Q = (s, dir) => {
    val raw = concat(col("text"), lit(
      " <div class=\"footer\">Contact <b>us</b></div> https://example.com/path?q=1 admin@example.com"))
    val clean = trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      raw,
      "<[^>]*>", " "),
      "https?://\\S+", " "),
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", " "),
      "\\s+", " "))
    t(s, dir, "documents")
      .select(col("doc_id"),
        length(raw).as("raw_len"),
        length(clean).as("clean_len"),
        (length(raw) - length(clean)).as("removed"),
        md5(clean.cast("binary")).as("clean_fp"))
      .orderBy(col("doc_id"))
  }

  val stripBoilerplateSql: String =
    """WITH a AS (SELECT doc_id,
      |  text || ' <div class="footer">Contact <b>us</b></div> https://example.com/path?q=1 admin@example.com' AS raw
      | FROM documents),
      |c AS (SELECT doc_id, raw,
      |  trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
      |   '<[^>]*>', ' ', 'g'), 'https?://\S+', ' ', 'g'),
      |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', ' ', 'g'),
      |   '\s+', ' ', 'g')) AS clean FROM a)
      |SELECT doc_id, CAST(length(raw) AS INTEGER) AS raw_len,
      | CAST(length(clean) AS INTEGER) AS clean_len,
      | CAST(length(raw)-length(clean) AS INTEGER) AS removed, md5(clean) AS clean_fp
      |FROM c ORDER BY doc_id""".stripMargin

  /** Benchmark-contamination check: character 13-gram overlap between each
    * corpus document and a "benchmark" set (doc_id < 20 stands in for the
    * eval suite). The benchmark's distinct grams are tiny and broadcast
    * with a hit marker; the corpus side is ONE generate+explode pass whose
    * left-join + single doc_id aggregation computes total and shared gram
    * counts together — no shuffle join, and exactly one explode of the
    * corpus in the physical plan (round 3 evaluated the corpus branch
    * twice, VERDICT r3 "What's wrong" #2). The doc_id aggregation does
    * shuffle the gram stream, but map-side partial agg collapses it to one
    * row per doc before the exchange.
    */
  val contamination: Q = (s, dir) => {
    val docs = t(s, dir, "documents").filter(length(col("text")) >= 13)
    val bench = docs.filter(col("doc_id") < 20)
      .select(explode(TextStats.charNgrams(col("text"), 13)).as("gram"))
      .distinct().withColumn("hit", lit(1))
    val corpus = docs.filter(col("doc_id") >= 20)
      .select(col("doc_id"), explode(TextStats.charNgrams(col("text"), 13)).as("gram"))
    corpus.join(broadcast(bench), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_shared"))
      .filter(col("n_shared") >= 1)
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_grams"), 6).as("contamination"))
      .orderBy(col("doc_id"))
  }

  val contaminationSql: String =
    """WITH pos AS (SELECT doc_id, text,
      |  unnest(generate_series(1, length(text)-12)) AS i
      | FROM documents WHERE length(text) >= 13),
      |g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 13) AS gram FROM pos),
      |b AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20),
      |c AS (SELECT * FROM g WHERE doc_id >= 20),
      |tot AS (SELECT doc_id, count(*) AS n_grams FROM c GROUP BY doc_id),
      |sh AS (SELECT c.doc_id, count(*) AS n_shared FROM c JOIN b USING (gram) GROUP BY c.doc_id)
      |SELECT doc_id, n_grams, n_shared,
      | round(CAST(n_shared AS DOUBLE)/n_grams, 6) AS contamination
      |FROM sh JOIN tot USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Deterministic fixed-size per-group sample ("seeded reservoir"): top-20
    * per lang by md5 of the id — reproducible across engines, runs, and
    * partitionings, unlike rand()-based sampling. The hash order is data-
    * independent, so re-running on a grown corpus changes membership only
    * by consistent-hash eviction: an id leaves only when a newcomer hashes
    * lower — never a wholesale reshuffle (the stability that matters for
    * eval holdouts).
    */
  val reservoirSample: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    // Native bottom-k-per-key operator instead of a full per-lang window
    // sort: the partial stage keeps ≤ 20 rows per lang per input partition,
    // so the exchange carries survivors only (≤ 20·langs·partitions rows),
    // never the corpus — round 3 instead shuffled and sorted every document
    // on a handful of lang keys (VERDICT r3 "What's wrong" #1). The rank is
    // recovered with a window over the ≤ 20·langs survivors, which is
    // constant-sized at any corpus scale.
    GraftExtensions.install(s)
    val w = Window.partitionBy(col("lang")).orderBy(col("hk"), col("doc_id"))
    TopK.perKey(
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), md5(col("doc_id").cast("string")).as("hk")),
      keyCols = Seq("lang"), orderCol = "hk", tiebreakCol = "doc_id",
      k = 20, asc = true)
      .withColumn("rn", row_number().over(w))
      .select(col("lang"), col("rn"), col("doc_id"), col("hk"))
      .orderBy(col("lang"), col("rn"))
  }

  val reservoirSampleSql: String =
    """WITH h AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hk FROM documents),
      |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn FROM h)
      |SELECT lang, CAST(rn AS INTEGER) AS rn, doc_id, hk
      |FROM r WHERE rn <= 20 ORDER BY lang, rn""".stripMargin

  /** Corpus-wide top-10 word bigrams: element_at over a generated index
    * sequence (the n-gram generalization of the q27 unigram histogram).
    * Map-side partial agg absorbs the explode fan-out before the shuffle.
    */
  val bigramTopK: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(TextStats.tokens(lower(col("text"))).as("tok"))
      .filter(size(col("tok")) >= 2)
      .select(explode(TextStats.wordBigrams(col("tok"))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram")).limit(10)

  val bigramTopKSql: String =
    """WITH toks AS (SELECT regexp_extract_all(lower(text), '\S+') AS tok FROM documents
      | WHERE length(regexp_extract_all(lower(text), '\S+')) >= 2),
      |b AS (SELECT unnest(list_transform(generate_series(1, len(tok)-1),
      |  i -> tok[i] || ' ' || tok[i+1])) AS bigram FROM toks)
      |SELECT bigram, count(*) AS n FROM b
      |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 10""".stripMargin

  /** Cluster-native simhash dedup: connected components of the radius-8
    * Hamming graph computed WITHOUT materializing the pair list — each
    * superstep's bucket-join probe stream feeds straight into a per-node
    * min-label aggregation (see [[graft.ops.Dedup.simhashClusters]]).
    * This is the scale answer to pair output being quadratic in duplicate-
    * cluster size (r3 VERDICT "What's wrong" #3): output is one row per
    * doc at any corpus scale. Oracle: recursive-CTE transitive closure
    * over the brute-force pair set on the same md5-simhash fingerprints —
    * exact component-level equivalence, per row.
    */
  val simhashClusterQ: Q = (s, dir) => {
    val withFp = t(s, dir, "documents")
      .select(col("doc_id").as("id"),
        graft.functions.VectorExpressions.md5_simhash60(
          TextStats.tokens(lower(col("text")))).as("fp"))
      .filter(col("fp").isNotNull)
    Dedup.simhashClusters(withFp, maxHammingDistance = 8)
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  val simhashClusterSql: String =
    s"""WITH RECURSIVE $md5SimhashCte,
      |edges AS (
      |  SELECT l.doc_id AS a, r.doc_id AS b FROM fps l JOIN fps r
      |  ON l.doc_id < r.doc_id AND bit_count(xor(l.fp, r.fp)) <= 8),
      |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      |reach AS (SELECT a, b FROM sym
      |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a),
      |cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)
      |SELECT f.doc_id, coalesce(cl.cluster_id, f.doc_id) AS cluster_id
      |FROM fps f LEFT JOIN cl ON f.doc_id = cl.doc_id
      |ORDER BY f.doc_id""".stripMargin

  /** Boilerplate n-gram MINING (corpus-level complement of the q91 probe):
    * char 13-grams whose document frequency crosses a threshold are
    * template/boilerplate candidates — the discovery step before a strip
    * rule like q90's exists. One explode pass; grams are per-doc distinct
    * (charNgrams dedups), so the groupBy count IS document frequency;
    * map-side partial agg absorbs the fan-out and TakeOrdered bounds the
    * output. Linear in the corpus, shuffle keyed on the gram.
    */
  val boilerplateNgrams: Q = (s, dir) =>
    t(s, dir, "documents").filter(length(col("text")) >= 13)
      .select(explode(TextStats.charNgrams(col("text"), 13)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 5)
      .orderBy(col("df").desc, col("gram")).limit(20)

  val boilerplateNgramsSql: String =
    """WITH pos AS (SELECT doc_id, text, unnest(generate_series(1, length(text)-12)) AS i
      |             FROM documents WHERE length(text) >= 13),
      |g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 13) AS gram FROM pos),
      |df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram)
      |SELECT gram, CAST(df AS BIGINT) AS df FROM df WHERE df >= 5
      |ORDER BY df DESC, gram LIMIT 20""".stripMargin

  /** Int8 scalar quantization round-trip for embeddings: per-vector
    * min/max affine quantization to [0,255] and back, emitting the max
    * absolute reconstruction error — the storage-shrink step (4× smaller
    * vectors) before ANN at scale, with its error budget made visible.
    * Per-row array math only (no shuffle); max over the error list is
    * evaluation-order-free, so the oracle comparison is exact. Both
    * engines round half-up on the non-negative quantization argument.
    */
  val embeddingQuantize: Q = (s, dir) => {
    val e = transform(col("embedding"), x => x.cast("double"))
    val mn = array_min(e)
    val mx = array_max(e)
    val err = transform(e, x =>
      abs(mn + round((x - mn) * 255.0 / (mx - mn)) * (mx - mn) / 255.0 - x))
    t(s, dir, "embeddings")
      .filter(mx > mn)
      .select(col("vec_id"), round(mn, 6).as("qmin"), round(mx, 6).as("qmax"),
        round(array_max(err), 6).as("max_abs_err"))
      .orderBy(col("vec_id"))
  }

  val embeddingQuantizeSql: String =
    """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |           FROM embeddings),
      |m AS (SELECT vec_id, e, list_min(e) AS mn, list_max(e) AS mx FROM v)
      |SELECT vec_id, round(mn, 6) AS qmin, round(mx, 6) AS qmax,
      | round(list_max(list_transform(e,
      |   x -> abs(mn + round((x-mn)*255/(mx-mn))*(mx-mn)/255 - x))), 6) AS max_abs_err
      |FROM m WHERE mx > mn ORDER BY vec_id""".stripMargin

  /** SRP-bucketed embedding near-dup on the gate (the one north-star op
    * still spec-only after r3 — testdata has no near pairs, max cosine
    * ~0.51). The query plants them: the first 50 vectors are re-ingested
    * verbatim under shifted ids (the re-crawl shape), so the exact pair
    * set at cosine ≥ 0.99 is precisely those 50 copies — and identical
    * vectors land in the SAME SRP bucket by construction, so recall is
    * PROVABLE, not empirical. The exact twin is planted-anchored (pairs
    * with a planted right side: 50·(N+50) pairs, linear in the corpus),
    * SQL-expressible; found_by_lsh=false would hash-mismatch the all-TRUE
    * oracle. Perturbed-pair recall (the probabilistic case) stays in
    * OpsSpec.
    */
  val embeddingNearDupLsh: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val planted = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val all = emb.unionByName(planted)
    val lsh = Dedup.embeddingNearDuplicates(all, "embedding", "vec_id",
      planes = 12, threshold = 0.99)
    val exact = all.select(col("vec_id").as("id1"), col("embedding").as("e1"))
      .join(broadcast(planted.select(col("vec_id").as("id2"), col("embedding").as("e2"))),
        col("id1") < col("id2"))
      .withColumn("cosine",
        graft.functions.VectorExpressions.cosine_similarity(col("e1"), col("e2")))
      .filter(col("cosine").isNotNull && col("cosine") >= 0.99)
      .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
    exact.join(lsh.select(col("id1"), col("id2"), lit(true).as("found")),
        Seq("id1", "id2"), "left")
      .select(col("id1"), col("id2"), col("cosine"),
        coalesce(col("found"), lit(false)).as("found_by_lsh"))
      .orderBy(col("id1"), col("id2"))
  }

  val embeddingNearDupLshSql: String =
    """WITH all_v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, list_transform(embedding, x -> CAST(x AS DOUBLE))
      |  FROM embeddings WHERE vec_id < 50),
      |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
      |        list_dot_product(a.e, b.e) /
      |         (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS c
      |      FROM all_v a JOIN all_v b
      |        ON a.vec_id < b.vec_id AND b.vec_id >= 100000)
      |SELECT id1, id2, round(c, 6) AS cosine, TRUE AS found_by_lsh
      |FROM p WHERE c >= 0.99 ORDER BY id1, id2""".stripMargin

  /** DQ checkpoint surface on the gate (r3 VERDICT #9: Q2/Q4–Q6 were
    * spec-only): a suite DEFINITION goes through the JSON round-trip
    * (Q4, `suiteToJson`→`suiteFromJson` — the reference's
    * save_expectation_suite, E1:156), runs as ONE aggregate pass over the
    * batch (Q5, `Checkpoint.run`), including a schema-level column_exists
    * (Q2) and a row-level expectation on a column the schema LACKS (Q6
    * introspection: reports failed with violations = all rows instead of
    * throwing), and the per-expectation validation result is emitted as
    * rows the oracle recomputes with plain SQL. The driver-side result
    * materialization is bounded by the suite size, never the data.
    */
  val dqCheckpoint: Q = (s, dir) => {
    val suite = Suite("customer_dq", Seq(
      NotNull("c_custkey"),
      NotNull("c_mktsegment"),
      Between("c_acctbal", -1000, 9000),
      MatchesRegex("c_name", "^Customer#\\d+$"),
      InSet("c_mktsegment",
        Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")),
      ColumnExists("c_acctbal"),
      ColumnExists("c_loyalty_tier"),   // absent: schema-level fail
      NotNull("c_loyalty_tier")))       // absent row-level: fail, all rows
    val roundTripped =
      graft.quality.Expectations.suiteFromJson(
        graft.quality.Expectations.suiteToJson(suite))
    val result = graft.quality.Checkpoint.run(t(s, dir, "customer"), roundTripped)
    import s.implicits._
    result.results
      .map(r => (r.kind, r.column, r.violations, r.passed, result.rows))
      .toDF("expectation", "column", "violations", "passed", "n_rows")
      .orderBy(col("expectation"), col("column"))
  }

  val dqCheckpointSql: String =
    """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM customer)
      |SELECT * FROM (
      | SELECT 'not_null' AS expectation, 'c_custkey' AS "column",
      |  CAST((SELECT count(*) FROM customer WHERE c_custkey IS NULL) AS BIGINT) AS violations,
      |  (SELECT count(*) FROM customer WHERE c_custkey IS NULL) = 0 AS passed,
      |  n.n_rows FROM n
      | UNION ALL
      | SELECT 'not_null', 'c_mktsegment',
      |  CAST((SELECT count(*) FROM customer WHERE c_mktsegment IS NULL) AS BIGINT),
      |  (SELECT count(*) FROM customer WHERE c_mktsegment IS NULL) = 0, n.n_rows FROM n
      | UNION ALL
      | SELECT 'between', 'c_acctbal',
      |  CAST((SELECT count(*) FROM customer
      |        WHERE c_acctbal IS NOT NULL AND (c_acctbal < -1000 OR c_acctbal > 9000)) AS BIGINT),
      |  (SELECT count(*) FROM customer
      |   WHERE c_acctbal IS NOT NULL AND (c_acctbal < -1000 OR c_acctbal > 9000)) = 0,
      |  n.n_rows FROM n
      | UNION ALL
      | SELECT 'matches_regex', 'c_name',
      |  CAST((SELECT count(*) FROM customer
      |        WHERE c_name IS NOT NULL AND NOT regexp_matches(c_name, '^Customer#\d+$')) AS BIGINT),
      |  (SELECT count(*) FROM customer
      |   WHERE c_name IS NOT NULL AND NOT regexp_matches(c_name, '^Customer#\d+$')) = 0,
      |  n.n_rows FROM n
      | UNION ALL
      | SELECT 'in_set', 'c_mktsegment',
      |  CAST((SELECT count(*) FROM customer WHERE c_mktsegment IS NOT NULL
      |        AND c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')) AS BIGINT),
      |  (SELECT count(*) FROM customer WHERE c_mktsegment IS NOT NULL
      |   AND c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')) = 0,
      |  n.n_rows FROM n
      | UNION ALL
      | SELECT 'column_exists', 'c_acctbal', CAST(0 AS BIGINT), TRUE, n.n_rows FROM n
      | UNION ALL
      | SELECT 'column_exists', 'c_loyalty_tier', CAST(1 AS BIGINT), FALSE, n.n_rows FROM n
      | UNION ALL
      | SELECT 'not_null', 'c_loyalty_tier', n.n_rows, FALSE, n.n_rows FROM n
      |) x ORDER BY expectation, "column" """.stripMargin

  /** Filesystem surface on the gate (S6/S7/S8 — parquet sink, part-file
    * listing, recursive copy; the reference's layer-promotion file ops,
    * E1:91-97, G0b:8): write a table as one part file, LIST it, COPY the
    * directory, and read the COPY back — emitted rows must equal the
    * parquet original (any sink/list/copy defect breaks the round-trip)
    * and n_files must be exactly the coalesced 1.
    */
  val fsRoundtrip: Q = (s, dir) => {
    val tmp = scratch("graft_fs_src").toString
    val dst = scratch("graft_fs_dst").toString + "/copy"
    Writers.parquet(t(s, dir, "region").coalesce(1), tmp)
    val nFiles = Writers.listParquetFiles(tmp,
      s.sparkContext.hadoopConfiguration).size
    Writers.copyRecursive(tmp, dst, s.sparkContext.hadoopConfiguration)
    Readers.parquet(s, dst)
      .withColumn("n_files", lit(nFiles))
      .orderBy(col("r_regionkey"))
  }

  val fsRoundtripSql: String =
    """SELECT r_regionkey, r_name, CAST(1 AS INTEGER) AS n_files
      |FROM region ORDER BY r_regionkey""".stripMargin

  /** Append-mode bronze ingestion (G0a:28's incremental alternative to the
    * overwrite reload): day-1 load writes a document batch with
    * `mode('overwrite')`, day-2 appends a second batch that re-crawls part
    * of day-1 (doc_id ≡ 0 mod 3 lands in both), the bronze dir is re-read
    * as one table, and the ingest screen reports per doc its
    * first-occurrence batch and copy count — the promotion-time dedup
    * decision an append-only bronze layer requires. The oracle recomputes
    * the two batches as a UNION ALL over the parquet original, so a lost
    * append, a double append, or an overwrite-instead-of-append all break
    * the hash. Scale shape: the append is a metadata-only commit (new part
    * files, no rewrite of day-1), and the screen is one hash aggregation
    * on the batch-tagged key — no shuffle of document payloads.
    */
  val appendBronze: Q = (s, dir) => {
    val bronze = scratch("graft_bronze").toString
    val docs = t(s, dir, "documents")
    Writers.parquet(docs.filter(col("doc_id") % 3 === 0)
      .withColumn("ingest_batch", lit(1)), bronze)
    Writers.parquet(docs.filter(col("doc_id") % 3 <= 1)
      .withColumn("ingest_batch", lit(2)), bronze,
      mode = org.apache.spark.sql.SaveMode.Append)
    Readers.parquet(s, bronze)
      .groupBy(col("doc_id"))
      .agg(min(col("ingest_batch")).as("first_batch"),
        count(lit(1)).as("n_copies"),
        sum(col("n_chars")).as("chars_ingested"))
      .orderBy(col("doc_id"))
  }

  val appendBronzeSql: String =
    """WITH b AS (
      | SELECT doc_id, 1 AS ingest_batch, n_chars FROM documents WHERE doc_id % 3 = 0
      | UNION ALL
      | SELECT doc_id, 2 AS ingest_batch, n_chars FROM documents WHERE doc_id % 3 <= 1)
      |SELECT doc_id, CAST(min(ingest_batch) AS INTEGER) AS first_batch,
      | count(*) AS n_copies, CAST(sum(n_chars) AS BIGINT) AS chars_ingested
      |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ==================================================== CSV ingest gates

  /** CSV round-trip gates (r3 VERDICT #5: S1–S3 — the reference's PRIMARY
    * ingest path, G0a:26,38,52-53 — never touched the driver gate because
    * testdata is parquet-only). Each query materializes a table as
    * delimited text into a fresh temp dir, re-ingests it through the
    * reference-semantics readers (header, all-string schema, explicit
    * downstream casts), and emits the typed rows; the oracle reads the
    * PARQUET original, so any delimiter/quote/header/cast defect breaks
    * the hash. The write is driver-side eager and dim-table-sized; the
    * read-back is the operator under test.
    */
  private def csvRoundtrip(s: SparkSession, dir: String, table: String,
                           delim: String, casts: Seq[(String, String)]): DataFrame = {
    val tmp = scratch(s"graft_csv_$table").toString
    Writers.csv(t(s, dir, table), tmp, delimiter = delim)
    casts.foldLeft(Readers.csv(s, tmp, delimiter = delim)) {
      case (df, (c, ty)) => df.withColumn(c, col(c).cast(ty))
    }
  }

  /** S1: tab-separated (banks shape, G0a:26). */
  val csvTsvRoundtrip: Q = (s, dir) =>
    csvRoundtrip(s, dir, "nation", "\t",
      Seq("n_nationkey" -> "int", "n_regionkey" -> "int"))
      .orderBy(col("n_nationkey"))

  val csvTsvRoundtripSql: String =
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** S3: pipe-separated (employees shape, G0a:52-53) incl. a double column
    * — Spark serializes doubles with the shortest round-trippable
    * representation, so string→double re-casts are bit-exact.
    */
  val csvPipeRoundtrip: Q = (s, dir) =>
    csvRoundtrip(s, dir, "supplier", "|",
      Seq("s_suppkey" -> "bigint", "s_nationkey" -> "int",
        "s_acctbal" -> "double"))
      .orderBy(col("s_suppkey"))

  val csvPipeRoundtripSql: String =
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
      |ORDER BY s_suppkey""".stripMargin

  /** S2: comma-separated with embedded delimiters and quote characters in
    * a field — exercises the writer's quoting and the reader's unquoting
    * (the oracle never sees the CSV, only the final values, so the gate
    * checks the round-trip is lossless, not any particular escape style).
    */
  val csvQuotedRoundtrip: Q = (s, dir) => {
    val tmp = scratch("graft_csv_quoted").toString
    val spiked = t(s, dir, "supplier").select(
      col("s_suppkey"),
      concat(col("s_name"), lit(", area "), col("s_nationkey"),
        lit(" -- \"hq\"")).as("s_label"),
      col("s_acctbal"))
    Writers.csv(spiked, tmp, delimiter = ",")
    Readers.csv(s, tmp, delimiter = ",")
      .select(col("s_suppkey").cast("bigint").as("s_suppkey"),
        col("s_label"), col("s_acctbal").cast("double").as("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  val csvQuotedRoundtripSql: String =
    """SELECT s_suppkey,
      | s_name || ', area ' || CAST(s_nationkey AS VARCHAR) || ' -- "hq"' AS s_label,
      | s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** Malformed-row quarantine (Readers.csvWithCorruptCapture): one row of
    * the CSV copy is doctored so an int column fails to parse; PERMISSIVE
    * mode must keep every good row AND capture exactly the bad one in the
    * corrupt-record column instead of dropping or dying — the lineage
    * contract for dirty input at 100 TB. The oracle derives the expected
    * counts arithmetically from the parquet original.
    */
  val csvQuarantine: Q = (s, dir) => {
    import org.apache.spark.sql.types._
    val tmp = scratch("graft_csv_quar").toString
    val doctored = t(s, dir, "nation").select(
      col("n_nationkey").cast("string"),
      col("n_name"),
      when(col("n_nationkey") === 0, lit("not_an_int"))
        .otherwise(col("n_regionkey").cast("string")).as("n_regionkey"))
    Writers.csv(doctored, tmp, delimiter = ",")
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    Readers.csvWithCorruptCapture(s, tmp, schema, delimiter = ",")
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("_corrupt_record")).as("n_corrupt"),
        sum(when(col("_corrupt_record").isNull, col("n_regionkey"))).as("good_region_sum"))
  }

  val csvQuarantineSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      | CAST(1 AS BIGINT) AS n_corrupt,
      | CAST(sum(CASE WHEN n_nationkey <> 0 THEN n_regionkey END) AS BIGINT) AS good_region_sum
      |FROM nation""".stripMargin

  /** Partitioned-layout round-trip with the PLAN INVARIANT on the gate:
    * write documents hive-partitioned by `lang` (the silver-layer layout
    * SCALE.md prescribes for a 100 TB corpus), read back with a lang
    * filter, and emit `pruned` = whether the executed plan answered the
    * filter via PartitionFilters (directory pruning — the scan must touch
    * ONE partition, not the corpus). The oracle asserts TRUE, so a
    * pruning regression is a hash mismatch, not a silent slowdown —
    * PartitionDemo's evidence promoted to a driver-checked row.
    */
  val partitionedPruning: Q = (s, dir) => {
    val tmp = scratch("graft_part_gate").toString
    val docs = t(s, dir, "documents")
    Writers.parquet(docs, s"$tmp/docs", partitionBy = Seq("lang"))
    // schema-specified read-back: an empty source writes no part files,
    // and inference on a fileless dir throws (EmptyInputSpec)
    val rd = Readers.parquetWithSchema(s, s"$tmp/docs", docs.schema)
      .filter(col("lang") === "en")
    val pruned = "PartitionFilters: \\[[^\\]]*= en[^\\]]*\\]".r
      .findFirstIn(rd.queryExecution.executedPlan.toString).isDefined
    rd.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .withColumn("pruned", lit(pruned))
      .orderBy(col("lang"))
  }

  val partitionedPruningSql: String =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      | CAST(sum(n_chars) AS BIGINT) AS sum_chars, TRUE AS pruned
      |FROM documents WHERE lang = 'en'
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** JSONL round-trip: write a table as JSON lines (the interchange format
    * most crawl/training pipelines land first), re-ingest via the JSONL
    * source with schema inference, and emit typed rows against the parquet
    * original — any serialization, quoting, or numeric-fidelity defect
    * breaks the hash. Doubles survive because Spark writes the shortest
    * round-trippable representation. (At 100 TB inference costs an extra
    * pass — production would pin the schema; the gate exercises the
    * inference path deliberately.)
    */
  val jsonlRoundtrip: Q = (s, dir) => {
    val tmp = scratch("graft_jsonl").toString
    val cust = t(s, dir, "customer")
    Writers.jsonl(cust, tmp)
    Readers.jsonlOrEmpty(s, tmp, cust.schema)
      .select(col("c_custkey").cast("bigint").as("c_custkey"), col("c_name"),
        col("c_mktsegment"), col("c_acctbal").cast("double").as("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  val jsonlRoundtripSql: String =
    """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** ORC sink round-trip (the `Writers.orc` layer extension, previously
    * spec-only): write a typed table as ORC, re-read it through Spark's
    * ORC source, emit rows against the parquet original. ORC is fully
    * type-preserving, so no casts — any encoder/decoder defect (including
    * double fidelity) breaks the hash.
    */
  val orcRoundtrip: Q = (s, dir) => {
    val tmp = scratch("graft_orc").toString
    Writers.orc(t(s, dir, "part"), tmp)
    s.read.orc(tmp).orderBy(col("p_partkey"))
  }

  val orcRoundtripSql: String =
    """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Salted skew join on the gate: `Skew.saltedJoin` spreads a hot join
    * key over `factor` tasks (big side salted from a row-identity column,
    * dim side replicated) — the manual fix for the skew AQE can't split.
    * The contract is EXACT equivalence to the plain join, so the oracle is
    * simply the unsalted SQL join: any duplication/loss from the salt
    * replication is a row-count or hash mismatch.
    */
  val saltedJoinQ: Q = (s, dir) => {
    val joined = Skew.saltedJoin(
      t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus")),
      keys = Seq("o_orderkey"), saltFrom = "l_partkey", factor = 4)
    joined.groupBy(col("o_orderstatus"))
      .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderstatus"))
  }

  val saltedJoinSql: String =
    """SELECT o_orderstatus,
      | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      | count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Morton (Z-order) interleave on the gate: the native codegen
    * expression (`functions.VectorExpressions.MortonInterleave`, the
    * clustering key for two-dimensional row-group pruning — see
    * `Writers.compact(sortCols)`) recomputed bit-for-bit by the oracle as
    * a shift/mask sum. Inputs are bounded below 2^16 so the 16-term SQL
    * expansion covers every set bit (the native path interleaves 32).
    */
  val mortonZorder: Q = (s, dir) =>
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_size"),
        (col("p_partkey") % 1024).cast("int").as("pk_lo"))
      .withColumn("z", graft.functions.VectorExpressions
        .morton_interleave(col("p_size"), col("pk_lo")))
      .orderBy(col("p_partkey"))

  val mortonZorderSql: String =
    """SELECT p_partkey, p_size, CAST(p_partkey % 1024 AS INTEGER) AS pk_lo,
      | CAST(list_sum(list_transform(generate_series(0, 15),
      |   i -> ((p_size >> i) & 1) * (CAST(1 AS BIGINT) << (2*i))
      |      + (((p_partkey % 1024) >> i) & 1) * (CAST(1 AS BIGINT) << (2*i + 1))))
      |   AS BIGINT) AS z
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Small-file compaction on the gate (`Writers.compact` — the
    * maintenance op that keeps scan task counts sane after micro-batch
    * sinks accrete thousands of part files): deliberately write 8 small
    * files, compact to the byte-target (here: one), and emit the rows
    * plus before/after file counts — row fidelity AND the file-count
    * collapse are both hash-checked.
    */
  val compactRoundtrip: Q = (s, dir) => {
    val tmp = scratch("graft_compact")
      .toString + "/t"
    Writers.parquet(t(s, dir, "supplier").repartition(8), tmp)
    val conf = s.sparkContext.hadoopConfiguration
    val before = Writers.listParquetFiles(tmp, conf).size
    Writers.compact(s, tmp, targetBytesPerFile = 1L << 30)
    val after = Writers.listParquetFiles(tmp, conf).size
    Readers.parquet(s, tmp)
      .withColumn("n_before", lit(before))
      .withColumn("n_after", lit(after))
      .orderBy(col("s_suppkey"))
  }

  val compactRoundtripSql: String =
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
      | CAST(8 AS INTEGER) AS n_before, CAST(1 AS INTEGER) AS n_after
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** Two-phase skew-tolerant aggregation on the gate (`Skew.saltedSumCount`
    * — the manual partial/final split for composed metrics over a hot
    * key): exact equivalence to the plain GROUP BY is the contract, so
    * the plain SQL aggregate is the oracle. The value column is decimal-
    * cast BEFORE the two-phase sum so the result is order-independent
    * (double partial sums would re-associate differently per run).
    */
  val saltedAgg: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
      .withColumn("qty_dec", col("l_quantity").cast("decimal(18,4)"))
    Skew.saltedSumCount(li, keys = Seq("l_returnflag"), valueCol = "qty_dec",
      factor = 8, saltFrom = "l_partkey")
      .select(col("l_returnflag"),
        col("sum_qty_dec").cast("double").as("sum_qty"), col("n"))
      .orderBy(col("l_returnflag"))
  }

  val saltedAggSql: String =
    """SELECT l_returnflag,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      | count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Schema-evolution read on the gate (`Readers.parquetMergeSchema` — the
    * contract for a layer directory whose late files gained a column):
    * write the same table twice into one directory, the second copy with
    * an extra column, and read the union back with mergeSchema — early
    * rows must surface the evolved column as NULL, late rows with its
    * value, and the merged schema must carry all columns. The oracle
    * recomputes both generations from the original.
    */
  val mergeSchemaRead: Q = (s, dir) => {
    val tmp = scratch("graft_evolve").toString
    val nat = t(s, dir, "nation")
    Writers.parquet(
      nat.select(col("n_nationkey"), col("n_name"), lit(0).as("gen")), tmp)
    nat.select((col("n_nationkey") + 100).as("n_nationkey"), col("n_name"),
        lit(1).as("gen"), col("n_regionkey").as("evolved_region"))
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(tmp)
    Readers.parquetMergeSchema(s, tmp)
      .orderBy(col("n_nationkey"))
  }

  val mergeSchemaReadSql: String =
    """SELECT n_nationkey, n_name, CAST(0 AS INTEGER) AS gen,
      | CAST(NULL AS INTEGER) AS evolved_region
      |FROM nation
      |UNION ALL
      |SELECT n_nationkey + 100, n_name, 1, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** Custom typed AGGREGATE on the gate: token-weighted mean quality per
    * source through [[graft.functions.Aggregators.WeightedMean]] — an
    * `Aggregator` with an exact decimal buffer (partials associative +
    * commutative, bit-identical under any partitioning), the engine's
    * coverage of Spark's custom-aggregate surface alongside its custom
    * scalar codegen expressions. The oracle recomputes the same ratio
    * from decimal sums; the final double division and round are performed
    * identically on both engines.
    */
  val weightedQuality: Q = (s, dir) => {
    val scored = t(s, dir, "documents").select(col("source"),
      TextStats.qualityScore(col("text")).as("q"),
      TextStats.tokenCount(col("text")).cast("long").as("w"))
    scored.groupBy(col("source"))
      .agg(
        round(graft.functions.Aggregators.weighted_mean(col("q"), col("w")), 6)
          .as("weighted_quality"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("source"))
  }

  val weightedQualitySql: String =
    """WITH scored AS (SELECT source,
      | round(
      |   least(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) / 50.0, 1.0) * 0.4
      | + (1.0 - least(CAST(length(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
      |     / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)) * 0.3
      | + least(CAST(length(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
      |     / greatest(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 4.0, 1.0) * 0.3,
      | 6) AS q,
      | CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS w
      |FROM documents)
      |SELECT source,
      | round(CAST(sum(CAST(q AS DECIMAL(18,6)) * w) AS DOUBLE)
      |   / CAST(sum(w) AS DOUBLE), 6) AS weighted_quality,
      | count(*) AS n_docs
      |FROM scored GROUP BY source ORDER BY source""".stripMargin

  /** Length-bucketed batch packing with the padding-waste metric: docs go
    * to power-of-two token-length buckets (floor(log2 n) computed
    * INTEGER-exactly as len(bin(n))-1 — float log2 would risk off-by-one
    * at exact powers), fixed-size batches of 32 are enumerated per bucket,
    * and each batch reports `padding_waste` = max·count − sum, the tokens
    * a pad-to-longest collator would burn — the efficiency signal bucketed
    * batching exists to minimize. Like q88, the window parallelizes across
    * buckets (log-many keys); at 100 TB the same op would batch within
    * (bucket, partition) locally — the global enumeration here is the
    * deterministic formulation the hash gate requires.
    */
  val lengthBatches: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
    t(s, dir, "documents")
      .select(col("doc_id"), TextStats.tokenCount(col("text")).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("bucket", (length(bin(col("n_tok"))) - 1).cast("int"))
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_id", expr("CAST((rn - 1) div 32 AS BIGINT)"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("batch_size"),
        max(col("n_tok")).as("max_tok"),
        sum(col("n_tok")).as("sum_tok"),
        (max(col("n_tok")) * count(lit(1)) - sum(col("n_tok"))).as("padding_waste"))
      .orderBy(col("bucket"), col("batch_id"))
  }

  val lengthBatchesSql: String =
    """WITH d AS (SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |b AS (SELECT doc_id, n_tok,
      |    CAST(length(bin(n_tok)) - 1 AS INTEGER) AS bucket
      |  FROM d WHERE n_tok > 0),
      |r AS (SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
      |  FROM b)
      |SELECT bucket, (rn - 1) // 32 AS batch_id,
      | CAST(count(*) AS BIGINT) AS batch_size,
      | CAST(max(n_tok) AS BIGINT) AS max_tok,
      | CAST(sum(n_tok) AS BIGINT) AS sum_tok,
      | CAST(max(n_tok) * count(*) - sum(n_tok) AS BIGINT) AS padding_waste
      |FROM r GROUP BY bucket, (rn - 1) // 32
      |ORDER BY bucket, batch_id""".stripMargin

  /** Incremental ingest dedup ([[graft.ops.Dedup.incrementalNew]]): a 10%
    * "incoming batch" (doc_id ≡ 0 mod 10) screened against the other 90%
    * "existing corpus" — per incoming doc, is its exact content new, and
    * is it outside Hamming radius 8 of every corpus simhash? The oracle
    * recomputes both flags with NOT EXISTS over the SQL-recomputable
    * md5-simhash fingerprints (the pigeonhole chunk recall is exact, so
    * the bucketed path must agree row-for-row). An exact duplicate is by
    * construction also a near duplicate (radius 0), which the spec
    * asserts as an implication invariant.
    */
  val incrementalDedup: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    Dedup.incrementalNew(
      corpus = docs.filter(col("doc_id") % 10 =!= 0),
      incoming = docs.filter(col("doc_id") % 10 === 0))
      .select(col("id").as("doc_id"), col("exact_new"), col("near_new"))
      .orderBy(col("doc_id"))
  }

  val incrementalDedupSql: String =
    s"""WITH $md5SimhashCte,
      |xf AS (SELECT doc_id,
      |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS xfp
      |  FROM documents),
      |j AS (SELECT f.doc_id, f.fp, x.xfp FROM fps f JOIN xf x USING (doc_id)),
      |inc AS (SELECT * FROM j WHERE doc_id % 10 = 0),
      |cor AS (SELECT * FROM j WHERE doc_id % 10 <> 0)
      |SELECT i.doc_id,
      | NOT EXISTS (SELECT 1 FROM cor c WHERE c.xfp = i.xfp) AS exact_new,
      | NOT EXISTS (SELECT 1 FROM cor c
      |             WHERE bit_count(xor(c.fp, i.fp)) <= 8) AS near_new
      |FROM inc i ORDER BY i.doc_id""".stripMargin

  // ==================================== corpus quality / mixing signals

  /** Gopher-style per-document repetition signals (Rae et al. '21 §A1.1
    * shape): type-token ratio, the fraction of bigram occurrences taken
    * by the single most frequent bigram, and the fraction covered by any
    * repeated bigram — the cheap repetition pre-filter before training.
    * ONE corpus scan: token stats ride through both keyed aggregations as
    * carried max() columns instead of a second scan + self-join (the q91
    * lesson, VERDICT r3 "What's wrong" #2). Map-side partial agg absorbs
    * the explode fan-out; both shuffles are keyed on (doc_id[, bigram]),
    * so the plan is linear in the corpus and skew-free at 100 TB.
    */
  val repetitionSignals: Q = (s, dir) => {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), TextStats.tokens(lower(col("text"))).as("tok"))
      .filter(size(col("tok")) >= 2)
      .select(col("doc_id"),
        size(col("tok")).cast("long").as("n_tokens"),
        size(array_distinct(col("tok"))).cast("long").as("n_distinct"),
        col("tok"))
    val cnt = toks
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        explode(TextStats.wordBigrams(col("tok"))).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("c"),
        max(col("n_tokens")).as("n_tokens"),
        max(col("n_distinct")).as("n_distinct"))
    cnt.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        max(col("c")).as("top_n"),
        coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("dup_n"),
        max(col("n_tokens")).as("n_tokens"),
        max(col("n_distinct")).as("n_distinct"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 6).as("ttr"),
        round(col("top_n").cast("double") / col("n_bigrams"), 6)
          .as("top_bigram_frac"),
        round(col("dup_n").cast("double") / col("n_bigrams"), 6)
          .as("dup_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  val repetitionSignalsSql: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tok
      |              FROM documents),
      |t2 AS (SELECT doc_id, tok,
      |         CAST(len(tok) AS BIGINT) AS n_tokens,
      |         CAST(len(list_distinct(tok)) AS BIGINT) AS n_distinct
      |       FROM toks WHERE len(tok) >= 2),
      |b AS (SELECT doc_id, n_tokens, n_distinct,
      |        unnest(list_transform(generate_series(1, len(tok)-1),
      |          i -> tok[i] || ' ' || tok[i+1])) AS bigram
      |      FROM t2),
      |c AS (SELECT doc_id, bigram, count(*) AS c,
      |        max(n_tokens) AS n_tokens, max(n_distinct) AS n_distinct
      |      FROM b GROUP BY doc_id, bigram),
      |a AS (SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_n,
      |        coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS dup_n,
      |        max(n_tokens) AS n_tokens, max(n_distinct) AS n_distinct
      |      FROM c GROUP BY doc_id)
      |SELECT doc_id, n_tokens,
      | round(n_distinct / CAST(n_tokens AS DOUBLE), 6) AS ttr,
      | round(top_n / CAST(n_bigrams AS DOUBLE), 6) AS top_bigram_frac,
      | round(dup_n / CAST(n_bigrams AS DOUBLE), 6) AS dup_bigram_frac
      |FROM a ORDER BY doc_id""".stripMargin

  /** Domain-mix resampling: down-sample every source to the token budget
    * of the SMALLEST source (equal-mix policy) with data-derived rates and
    * deterministic membership — keep doc iff its md5-uniform u < rate.
    * Differs from q57 (static per-stratum rates) in that the rates come
    * out of a first aggregation pass over the data itself. Per-source
    * totals are ~|sources| rows → broadcast back; membership is a pure
    * row-local predicate, so the corpus never shuffles: scan → broadcast
    * join → final per-source agg of survivors-only partials. The min
    * target comes from a single-partition window over the POST-AGG totals
    * (≤ |sources| rows), not a separate aggregate branch — a branch would
    * re-run the corpus scan + tokenize a third time (the q91 lesson):
    * exactly 2 scans of documents in the physical plan, never 3.
    */
  val domainMix: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents").select(
      col("doc_id"), col("source"),
      TextStats.tokenCount(col("text")).cast("long").as("n_tok"),
      (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long").cast("double") / lit(math.pow(2, 60))).as("u"))
    val totals = docs.groupBy(col("source")).agg(sum(col("n_tok")).as("total_tok"))
    val rated = totals.withColumn("rate",
      min(col("total_tok")).over(Window.partitionBy(lit(1))).cast("double")
        / col("total_tok").cast("double"))
    docs.join(broadcast(rated.select(col("source"), col("total_tok"), col("rate"))),
        Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("total_tok")).as("total_tok"),
        round(max(col("rate")), 6).as("rate"),
        coalesce(sum(when(col("u") < col("rate"), 1L)), lit(0L)).as("n_kept"),
        coalesce(sum(when(col("u") < col("rate"), col("n_tok"))), lit(0L))
          .as("kept_tok"))
      .orderBy(col("source"))
  }

  val domainMixSql: String =
    """WITH d AS (SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |      / CAST(pow(2, 60) AS DOUBLE) AS u
      |  FROM documents),
      |tot AS (SELECT source, sum(n_tok) AS total_tok FROM d GROUP BY source),
      |tg AS (SELECT min(total_tok) AS target_tok FROM tot),
      |r AS (SELECT source, total_tok,
      |        CAST(target_tok AS DOUBLE) / CAST(total_tok AS DOUBLE) AS rate
      |      FROM tot, tg)
      |SELECT d.source,
      | CAST(count(*) AS BIGINT) AS n_docs,
      | CAST(max(total_tok) AS BIGINT) AS total_tok,
      | round(max(rate), 6) AS rate,
      | CAST(coalesce(sum(CASE WHEN u < rate THEN 1 END), 0) AS BIGINT) AS n_kept,
      | CAST(coalesce(sum(CASE WHEN u < rate THEN n_tok END), 0) AS BIGINT) AS kept_tok
      |FROM d JOIN r USING (source)
      |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** Per-document n-gram NOVELTY: the fraction of a doc's distinct
    * bigrams that occur in no other document — the inverse signal of
    * q100's boilerplate mining (high novelty = unique content, low =
    * templated), computed against the corpus itself rather than q91's
    * external benchmark. Per-doc distinct is array_distinct (row-local,
    * no shuffle); the gram table feeds BOTH the document-frequency
    * aggregation and the join probe, so it is pinned once (Dedup.pin —
    * released by Verify/Bench after consumption) instead of re-exploding
    * the corpus twice; both the DF shuffle and the join are keyed on the
    * bigram, co-partitioned after the agg.
    */
  val ngramNovelty: Q = (s, dir) => {
    val grams = Dedup.pin(
      t(s, dir, "documents")
        .select(col("doc_id"), TextStats.tokens(lower(col("text"))).as("tok"))
        .filter(size(col("tok")) >= 2)
        .select(col("doc_id"),
          explode(array_distinct(TextStats.wordBigrams(col("tok")))).as("bigram")))
    val df = grams.groupBy(col("bigram")).agg(count(lit(1)).as("df"))
    grams.join(df, Seq("bigram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        coalesce(sum(when(col("df") === 1, 1L)), lit(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_bigrams"), col("n_unique"),
        round(col("n_unique").cast("double") / col("n_bigrams"), 6).as("novelty"))
      .orderBy(col("doc_id"))
  }

  val ngramNoveltySql: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tok
      |              FROM documents),
      |g AS (SELECT DISTINCT doc_id, bigram FROM (
      |        SELECT doc_id, unnest(list_transform(generate_series(1, len(tok)-1),
      |          i -> tok[i] || ' ' || tok[i+1])) AS bigram
      |        FROM toks WHERE len(tok) >= 2) x),
      |df AS (SELECT bigram, count(*) AS df FROM g GROUP BY bigram)
      |SELECT g.doc_id,
      | CAST(count(*) AS BIGINT) AS n_bigrams,
      | CAST(coalesce(sum(CASE WHEN df = 1 THEN 1 END), 0) AS BIGINT) AS n_unique,
      | round(coalesce(sum(CASE WHEN df = 1 THEN 1 END), 0)
      |   / CAST(count(*) AS DOUBLE), 6) AS novelty
      |FROM g JOIN df USING (bigram)
      |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin

  // ==================================== round 5: corpus surgery & layout

  /** Passage-level exact dedup (the cross-document repeated-passage removal
    * of Lee et al. '22 "Deduplicating Training Data Makes Language Models
    * Better", hash-granularity variant): each document is cut into
    * consecutive 20-token passages, every passage is fingerprinted, and a
    * passage survives only if it is the corpus-wide FIRST occurrence of its
    * fingerprint (order = (doc_id, position)); surviving passages are
    * reassembled in order and the result is emitted as an md5 so the gate
    * is byte-exact without shipping text. Scale shape: the passage table is
    * pinned once (feeds both the first-occurrence aggregation and the keep
    * probe), the dedup decision is a hash aggregation keyed on the 32-hex
    * fingerprint — never a corpus sort — and reassembly groups only
    * surviving passages per doc. Docs whose every passage occurred earlier
    * elsewhere vanish (nothing left to reassemble) on both engines.
    */
  val passageDedup: Q = (s, dir) => {
    val P = 20
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), TextStats.tokens(col("text")).as("tok"))
      .filter(size(col("tok")) > 0)
      .select(col("doc_id"), col("tok"), size(col("tok")).cast("long").as("n_tok"))
    val passages = Dedup.pin(
      toks.select(col("doc_id"),
          expr(s"CAST((n_tok + ${P - 1}) div $P AS BIGINT)").as("n_passages"),
          posexplode(transform(
            sequence(lit(0), expr(s"CAST((n_tok + ${P - 1}) div $P AS INT)") - 1),
            w => array_join(slice(col("tok"), w * P + 1, lit(P)), " "))))
        .select(col("doc_id"), col("n_passages"), col("pos"),
          col("col").as("passage"),
          md5(col("col").cast("binary")).as("pfp"),
          // global (doc_id, pos) order as a fixed-width zero-padded string
          // — collision-free at any document length, where a numeric
          // doc_id*K+pos encoding silently collides once a doc exceeds K
          // passages (non-negative ids assumed, as everywhere in the gate)
          concat(lpad(col("doc_id").cast("string"), 19, "0"),
            lpad(col("pos").cast("string"), 12, "0")).as("okey")))
    val firsts = passages.groupBy(col("pfp")).agg(min(col("okey")).as("first_okey"))
    passages.join(firsts, Seq("pfp"))
      .filter(col("okey") === col("first_okey"))
      .groupBy(col("doc_id"))
      .agg(max(col("n_passages")).as("n_passages"),
        count(lit(1)).as("n_kept"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("passage")))),
            p => p.getField("passage")), " ").cast("binary")).as("dedup_md5"))
      .orderBy(col("doc_id"))
  }

  val passageDedupSql: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tok
      |              FROM documents),
      |t2 AS (SELECT doc_id, tok, CAST(len(tok) AS BIGINT) AS n
      |       FROM toks WHERE len(tok) > 0),
      |p AS (SELECT doc_id, (n + 19) // 20 AS n_passages,
      |        unnest(generate_series(1, (n + 19) // 20)) - 1 AS pos,
      |        unnest(list_transform(generate_series(1, (n + 19) // 20),
      |          w -> array_to_string(tok[(w-1)*20+1 : (w-1)*20+20], ' '))) AS passage
      |      FROM t2),
      |f AS (SELECT *, md5(passage) AS pfp,
      |        lpad(CAST(doc_id AS VARCHAR), 19, '0') ||
      |        lpad(CAST(pos AS VARCHAR), 12, '0') AS okey FROM p),
      |fk AS (SELECT pfp, min(okey) AS first_okey FROM f GROUP BY pfp),
      |k AS (SELECT f.* FROM f JOIN fk USING (pfp) WHERE okey = first_okey)
      |SELECT doc_id, CAST(max(n_passages) AS BIGINT) AS n_passages,
      | count(*) AS n_kept,
      | md5(string_agg(passage, ' ' ORDER BY pos)) AS dedup_md5
      |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Temperature-based mixture reweighting (the multilingual upsampling
    * recipe of Xue et al. '21 mT5 §3.1 / Conneau et al. '20 XLM-R:
    * q_i ∝ p_i^α with α=0.3): one corpus scan aggregates per-language token
    * mass; p, p^α, the renormalized sampling share, and the repeat factor
    * q/p all derive from a window over the POST-AGG totals (≤ |langs| rows
    * — the q91/q105 single-scan lesson). Doubles cross engines only through
    * single-operation derivations (one division, one pow); the cross-row
    * p^α normalizer is summed as a 12-digit DECIMAL so the tiny-row total
    * is bit-identical under any association order.
    */
  val temperatureMix: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(lit(1))
    t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextStats.tokenCount(col("text")).cast("long")).as("total_tok"))
      .withColumn("p",
        col("total_tok").cast("double") / sum(col("total_tok")).over(w).cast("double"))
      .withColumn("pa", round(pow(col("p"), 0.3), 12).cast("decimal(20,12)"))
      .withColumn("q", col("pa").cast("double") / sum(col("pa")).over(w).cast("double"))
      .select(col("lang"), col("n_docs"), col("total_tok"),
        round(col("p"), 6).as("p_data"),
        round(col("q"), 6).as("p_sample"),
        round(col("q") / col("p"), 6).as("repeat_factor"))
      .orderBy(col("lang"))
  }

  val temperatureMixSql: String =
    """WITH l AS (SELECT lang, count(*) AS n_docs,
      |    CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tok
      |  FROM documents GROUP BY lang),
      |w AS (SELECT *,
      |    CAST(total_tok AS DOUBLE) / CAST(sum(total_tok) OVER () AS DOUBLE) AS p
      |  FROM l),
      |a AS (SELECT *, CAST(round(pow(p, 0.3), 12) AS DECIMAL(20,12)) AS pa FROM w),
      |n AS (SELECT *,
      |    CAST(pa AS DOUBLE) / CAST(sum(pa) OVER () AS DOUBLE) AS q
      |  FROM a)
      |SELECT lang, n_docs, total_tok,
      | round(p, 6) AS p_data,
      | round(q, 6) AS p_sample,
      | round(q / p, 6) AS repeat_factor
      |FROM n ORDER BY lang""".stripMargin

  /** Deterministic stratified train/val/test split (90/5/5 per language):
    * membership is a pure row-local predicate on the md5-uniform of the
    * doc_id — reproducible across engines, runs, partitionings, and corpus
    * growth (a doc never migrates between splits when new data arrives,
    * the property that keeps eval holdouts stable). The corpus never
    * shuffles rows: scan → row-local split tag → one partial-agg'd
    * aggregation keyed on (lang, split).
    */
  val stratifiedSplit: Q = (s, dir) => {
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(math.pow(2, 60)))
    t(s, dir, "documents")
      .select(col("lang"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tok"),
        when(u < 0.90, "train").when(u < 0.95, "val").otherwise("test").as("split"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tok"))
      .orderBy(col("lang"), col("split"))
  }

  val stratifiedSplitSql: String =
    """WITH d AS (SELECT lang,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |      / CAST(pow(2, 60) AS DOUBLE) AS u
      |  FROM documents)
      |SELECT lang,
      | CASE WHEN u < 0.90 THEN 'train' WHEN u < 0.95 THEN 'val'
      |      ELSE 'test' END AS split,
      | count(*) AS n_docs,
      | CAST(sum(n_tok) AS BIGINT) AS total_tok
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** RAG-style overlapping chunking: window 64 tokens, stride 48 (16-token
    * overlap), last window ragged — the retrieval-index layout step. Chunk
    * enumeration is row-local (sequence + slice under one explode, no
    * shuffle at all before the ORDER BY); each chunk carries its token
    * span and an md5 so the gate is byte-exact on content without
    * shipping chunk text. nchunks = 1 for n ≤ 64 else ceil((n-64)/48)+1,
    * computed in exact integer arithmetic on both engines.
    */
  val ragChunks: Q = (s, dir) => {
    val W = 64; val S = 48
    t(s, dir, "documents")
      .select(col("doc_id"), TextStats.tokens(col("text")).as("tok"))
      .filter(size(col("tok")) > 0)
      .select(col("doc_id"), col("tok"), size(col("tok")).cast("long").as("n_tok"))
      .withColumn("n_chunks",
        when(col("n_tok") <= W, lit(1L))
          .otherwise(expr(s"CAST((n_tok - $W + ${S - 1}) div $S AS BIGINT) + 1")))
      .select(col("doc_id"), col("n_tok"),
        posexplode(transform(sequence(lit(0), col("n_chunks").cast("int") - 1),
          i => struct(
            (i * S + 1).cast("long").as("start_tok"),
            least(lit(W).cast("long"), col("n_tok") - i * S).as("len_tok"),
            md5(array_join(slice(col("tok"), i * S + 1, lit(W)), " ").cast("binary"))
              .as("chunk_md5")))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("col.start_tok"), col("col.len_tok"), col("col.chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val ragChunksSql: String =
    """WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tok
      |              FROM documents),
      |t2 AS (SELECT doc_id, tok, CAST(len(tok) AS BIGINT) AS n
      |       FROM toks WHERE len(tok) > 0),
      |c AS (SELECT doc_id, n,
      |        CASE WHEN n <= 64 THEN 1 ELSE (n - 64 + 47) // 48 + 1 END AS nc
      |      FROM t2),
      |x AS (SELECT doc_id,
      |        unnest(generate_series(1, nc)) - 1 AS chunk_id,
      |        unnest(list_transform(generate_series(1, nc),
      |          i -> {s: (i-1)*48 + 1,
      |                l: least(64, n - (i-1)*48),
      |                m: md5(array_to_string(tok[(i-1)*48+1 : (i-1)*48+64], ' '))}))
      |          AS ch
      |      FROM c JOIN t2 USING (doc_id, n))
      |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      | CAST(ch.s AS BIGINT) AS start_tok,
      | CAST(ch.l AS BIGINT) AS len_tok,
      | ch.m AS chunk_md5
      |FROM x ORDER BY doc_id, chunk_id""".stripMargin

  /** Per-source vocabulary statistics (Heaps-law evidence for tokenizer and
    * dedup planning): total token occurrences, distinct vocabulary size,
    * hapax count (frequency-1 tokens — the long-tail mass), type-token
    * ratio, and the modal token share. Two keyed aggregations, both with
    * map-side partials absorbing the explode fan-out; shuffle volume is
    * (source, distinct-token) sized, a vanishing fraction of the corpus.
    */
  val vocabGrowth: Q = (s, dir) => {
    val cnt = t(s, dir, "documents")
      .select(col("source"), explode(TextStats.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    cnt.groupBy(col("source"))
      .agg(sum(col("c")).as("total_tok"),
        count(lit(1)).as("vocab"),
        coalesce(sum(when(col("c") === 1, 1L)), lit(0L)).as("hapax"),
        max(col("c")).as("top_freq"))
      .select(col("source"), col("total_tok"), col("vocab"), col("hapax"),
        round(col("vocab").cast("double") / col("total_tok"), 6).as("ttr"),
        round(col("top_freq").cast("double") / col("total_tok"), 6).as("top_share"))
      .orderBy(col("source"))
  }

  val vocabGrowthSql: String =
    """WITH tk AS (SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
      |            FROM documents),
      |c AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY source, tok),
      |a AS (SELECT source, sum(c) AS total_tok, count(*) AS vocab,
      |        coalesce(sum(CASE WHEN c = 1 THEN 1 END), 0) AS hapax,
      |        max(c) AS top_freq
      |      FROM c GROUP BY source)
      |SELECT source, CAST(total_tok AS BIGINT) AS total_tok,
      | CAST(vocab AS BIGINT) AS vocab, CAST(hapax AS BIGINT) AS hapax,
      | round(vocab / CAST(total_tok AS DOUBLE), 6) AS ttr,
      | round(top_freq / CAST(total_tok AS DOUBLE), 6) AS top_share
      |FROM a ORDER BY source""".stripMargin

  /** Per-language winsorized quality statistics: clip scores at the exact
    * empirical p05/p95 and report the clipped mean beside the raw mean —
    * the outlier-robust aggregate quality filters are tuned against.
    * The quantiles are EXACT order statistics (value at rank ceil(q·n),
    * integer arithmetic, no interpolation) computed by the histogram
    * method: aggregate (lang, score) counts, cumulative-sum over the
    * DISTINCT score values, pick the first value whose cum ≥ rank. The
    * per-lang window therefore sorts score *cardinality* (≤ 10^6 distinct
    * 6-dec values), never corpus rows — the scalable exact-quantile shape
    * (contrast q92's corpus-wide window, VERDICT r3 "What's wrong" #1;
    * approximate twin: q77). Scores are pinned once and feed both the
    * histogram and the final clip; cross-row means go through DECIMAL.
    */
  val winsorizeQuality: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val scored = Dedup.pin(
      t(s, dir, "documents").select(col("lang"),
        TextStats.qualityScore(col("text")).as("q")))
    val hist = scored.groupBy(col("lang"), col("q")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("lang")).orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("lang"))
    val bounds = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(col("lang"))
      .agg(min(when(col("cum") >= expr("(n * 5 + 99) div 100"), col("q"))).as("lo"),
        min(when(col("cum") >= expr("(n * 95 + 99) div 100"), col("q"))).as("hi"))
    scored.join(broadcast(bounds), Seq("lang"))
      .select(col("lang"), col("lo"), col("hi"),
        col("q").cast("decimal(18,6)").as("qd"),
        least(greatest(col("q"), col("lo")), col("hi"))
          .cast("decimal(18,6)").as("wd"),
        (col("q") < col("lo")).cast("long").as("is_lo"),
        (col("q") > col("hi")).cast("long").as("is_hi"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(max(col("lo")), 6).as("p05"),
        round(max(col("hi")), 6).as("p95"),
        round((sum(col("qd")) / count(lit(1))).cast("double"), 6).as("mean_q"),
        round((sum(col("wd")) / count(lit(1))).cast("double"), 6).as("mean_q_wins"),
        sum(col("is_lo")).as("n_clipped_lo"),
        sum(col("is_hi")).as("n_clipped_hi"))
      .orderBy(col("lang"))
  }

  val winsorizeQualitySql: String =
    """WITH scored AS (SELECT lang,
      | round(
      |   least(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) / 50.0, 1.0) * 0.4
      | + (1.0 - least(CAST(length(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
      |     / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)) * 0.3
      | + least(CAST(length(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
      |     / greatest(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 4.0, 1.0) * 0.3,
      | 6) AS q
      |FROM documents),
      |h AS (SELECT lang, q, count(*) AS c FROM scored GROUP BY lang, q),
      |w AS (SELECT lang, q,
      |        sum(c) OVER (PARTITION BY lang ORDER BY q
      |                     ROWS UNBOUNDED PRECEDING) AS cum,
      |        sum(c) OVER (PARTITION BY lang) AS n
      |      FROM h),
      |b AS (SELECT lang,
      |        min(CASE WHEN cum >= (n * 5 + 99) // 100 THEN q END) AS lo,
      |        min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN q END) AS hi
      |      FROM w GROUP BY lang)
      |SELECT s.lang, count(*) AS n_docs,
      | round(max(lo), 6) AS p05, round(max(hi), 6) AS p95,
      | round(CAST(sum(CAST(q AS DECIMAL(18,6))) / count(*) AS DOUBLE), 6) AS mean_q,
      | round(CAST(sum(CAST(least(greatest(q, lo), hi) AS DECIMAL(18,6)))
      |   / count(*) AS DOUBLE), 6) AS mean_q_wins,
      | CAST(coalesce(sum(CASE WHEN q < lo THEN 1 END), 0) AS BIGINT) AS n_clipped_lo,
      | CAST(coalesce(sum(CASE WHEN q > hi THEN 1 END), 0) AS BIGINT) AS n_clipped_hi
      |FROM scored s JOIN b USING (lang)
      |GROUP BY s.lang ORDER BY s.lang""".stripMargin

  /** Bloom-pruned exact semi join ([[graft.ops.BloomJoin]]): lineitems of
    * urgent finished orders, with the fact side prefiltered by a bloom
    * filter over the qualifying order keys before the exact semi join.
    * Bloom FPs are removed by the semi join and FNs are impossible, so
    * the result is row-identical to the plain semi join — which is the
    * oracle (WHERE EXISTS). At 100 TB the `might_contain` predicate runs
    * scan-side and cuts the fact shuffle to rows that can possibly match;
    * the filter itself is a few MB broadcast regardless of corpus size.
    */
  val bloomSemiJoin: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val hot = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
    graft.ops.BloomJoin.semiJoin(li, hot, "l_orderkey", "o_orderkey",
        expectedItems = 1 << 20)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  val bloomSemiJoinSql: String =
    """SELECT l_returnflag, count(*) AS n_items,
      | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F'
      |    AND o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Audio-header decode over binary media columns (the WAV sibling of
    * q30's PNG/JPEG gate; [[graft.functions.AudioExpressions]]): fixture
    * RIFF/WAVE payloads are synthesized per row — odd doc_ids get a LIST
    * chunk BEFORE "fmt " so the decoder must walk chunks, not read fixed
    * offsets; doc_id%3==2 rows carry raw text bytes and must decode to
    * NULLs. The oracle recomputes the planted rate/channels/width/size
    * arithmetically, so the gate proves the little-endian encode→parse
    * round-trip including the integer-exact duration derivation.
    */
  val audioMeta: Q = (s, dir) => {
    import graft.functions.AudioExpressions._
    def le32(c: Column) = {
      val h = lpad(hex(c), 8, "0")
      unhex(concat(substring(h, 7, 2), substring(h, 5, 2),
        substring(h, 3, 2), substring(h, 1, 2)))
    }
    def le16(c: Column) = {
      val h = lpad(hex(c), 4, "0")
      unhex(concat(substring(h, 3, 2), substring(h, 1, 2)))
    }
    val rate = (lit(8000L) + (col("doc_id") % 4) * 8000L)
    val ch = (lit(1L) + col("doc_id") % 2)
    val bits = lit(16L)
    val dataBytes = (col("n_chars") * 4L)
    val fmtChunk = concat(lit("fmt ").cast("binary"), le32(lit(16L)),
      le16(lit(1L)), le16(ch), le32(rate), le32(rate * ch * 2L),
      le16(ch * 2L), le16(bits))
    val listChunk = concat(lit("LIST").cast("binary"), le32(lit(4L)),
      lit("INFO").cast("binary"))
    val dataChunk = concat(lit("data").cast("binary"), le32(dataBytes))
    val wav = concat(lit("RIFF").cast("binary"), le32(dataBytes + 36L),
      lit("WAVE").cast("binary"),
      when(col("doc_id") % 2 === 1, listChunk)
        .otherwise(lit(Array.emptyByteArray)),
      fmtChunk, dataChunk)
    val payload = when(col("doc_id") % 3 === 2, col("text").cast("binary"))
      .otherwise(wav)
    t(s, dir, "documents")
      .select(col("doc_id").as("media_id"), payload.as("payload"))
      .select(col("media_id"),
        audio_format(col("payload")).as("fmt"),
        audio_sample_rate(col("payload")).as("sample_rate"),
        audio_channels(col("payload")).as("channels"),
        audio_bits(col("payload")).as("bits"),
        audio_data_bytes(col("payload")).as("data_bytes"),
        audio_duration_ms(col("payload")).as("duration_ms"))
      .orderBy(col("media_id"))
  }

  val audioMetaSql: String =
    """SELECT doc_id AS media_id,
      | CASE WHEN doc_id % 3 <> 2 THEN 'wav' END AS fmt,
      | CAST(CASE WHEN doc_id % 3 <> 2 THEN 8000 + (doc_id % 4) * 8000 END AS INTEGER) AS sample_rate,
      | CAST(CASE WHEN doc_id % 3 <> 2 THEN 1 + doc_id % 2 END AS INTEGER) AS channels,
      | CAST(CASE WHEN doc_id % 3 <> 2 THEN 16 END AS INTEGER) AS bits,
      | CASE WHEN doc_id % 3 <> 2 THEN n_chars * 4 END AS data_bytes,
      | CASE WHEN doc_id % 3 <> 2 THEN (n_chars * 4 * 8000)
      |   // ((8000 + (doc_id % 4) * 8000) * (1 + doc_id % 2) * 16) END AS duration_ms
      |FROM documents ORDER BY media_id""".stripMargin

  /** Unigram surprisal scoring (the perplexity-proxy LM filter of
    * Wenzek et al. '20 CCNet §4.3, unigram variant): train a unigram LM on
    * the corpus itself (token frequencies), score each document by its
    * mean −ln p(token). High surprisal = unusual token mix (noise, rare
    * boilerplate); low = prototypical text — the standard cheap ranking
    * before an expensive LM pass. Scale shape: the token table is pinned
    * once and feeds BOTH the frequency aggregation and the scoring join
    * (the q91/q106 lesson); the model side is (vocab)-sized, joined on the
    * token key — never broadcast (vocab can reach 10^8 at 100 TB) and
    * never a corpus sort. Cross-engine determinism: per-token −ln p is
    * rounded to 8 decimals and decimal-summed, so association order
    * cannot move the mean.
    */
  val tokenSurprisal: Q = (s, dir) => {
    val toks = Dedup.pin(
      t(s, dir, "documents")
        .select(col("doc_id"), explode(TextStats.tokens(lower(col("text")))).as("tok")))
    val freqs = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = freqs.agg(sum(col("c")).as("total"))
    val scored = freqs.crossJoin(broadcast(total))
      .select(col("tok"),
        round(-log(col("c").cast("double") / col("total").cast("double")), 8)
          .cast("decimal(18,8)").as("s"))
    toks.join(scored, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        round((sum(col("s")).cast("double") / count(lit(1))), 6).as("avg_surprisal"))
      .orderBy(col("doc_id"))
  }

  val tokenSurprisalSql: String =
    """WITH tk AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
      |            FROM documents),
      |f AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
      |t AS (SELECT sum(c) AS total FROM f),
      |sc AS (SELECT tok,
      |         CAST(round(-ln(CAST(c AS DOUBLE) / CAST(total AS DOUBLE)), 8)
      |           AS DECIMAL(18,8)) AS s
      |       FROM f, t)
      |SELECT doc_id, count(*) AS n_tok,
      | round(CAST(sum(s) AS DOUBLE) / count(*), 6) AS avg_surprisal
      |FROM tk JOIN sc USING (tok)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Corpus snapshot diff — the ingest-ops primitive behind incremental
    * re-training decisions ("what changed since the last crawl?"): two
    * deterministic synthetic snapshots of the documents table (old = ids
    * not ≡0 mod 7; new = ids not ≡0 mod 5, with ids ≡0 mod 11 textually
    * revised) are full-outer-joined on doc_id and every doc classified
    * added / removed / changed / unchanged by content fingerprint.
    * One shuffle keyed on doc_id; the 16-byte fingerprints travel, never
    * the text (the exact-dedup shuffle discipline).
    */
  val snapshotDiff: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val old = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("lang").as("lang_a"),
        TextStats.fingerprint(col("text")).as("ofp"))
    val nw = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("lang").as("lang_b"),
        TextStats.fingerprint(
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text"))).as("nfp"))
    old.join(nw, Seq("doc_id"), "full_outer")
      .select(coalesce(col("lang_a"), col("lang_b")).as("lang"),
        when(col("ofp").isNull, "added")
          .when(col("nfp").isNull, "removed")
          .when(col("ofp") =!= col("nfp"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("lang"), col("status"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("status"))
  }

  val snapshotDiffSql: String =
    """WITH old AS (SELECT doc_id, lang,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS ofp
      |  FROM documents WHERE doc_id % 7 <> 0),
      |nw AS (SELECT doc_id, lang,
      |    md5(trim(regexp_replace(lower(
      |      CASE WHEN doc_id % 11 = 0 THEN text || ' rev2' ELSE text END),
      |      '\s+', ' ', 'g'))) AS nfp
      |  FROM documents WHERE doc_id % 5 <> 0)
      |SELECT coalesce(old.lang, nw.lang) AS lang,
      | CASE WHEN ofp IS NULL THEN 'added'
      |      WHEN nfp IS NULL THEN 'removed'
      |      WHEN ofp <> nfp THEN 'changed'
      |      ELSE 'unchanged' END AS status,
      | count(*) AS n_docs
      |FROM old FULL OUTER JOIN nw USING (doc_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Blocked fuzzy nearest-neighbor match (entity-resolution shape): for
    * each part, the closest DIFFERENTLY-NAMED part by Levenshtein ≤ 4,
    * candidates restricted to the same blocking key (the name's final
    * word). Two scale disciplines compose: (1) blocking keeps the edit
    * distance off the full cross product; (2) the pairwise work runs over
    * DISTINCT names only — real catalogs repeat names heavily (here 20k
    * parts share ~120 names), and distinct-entity cardinality grows
    * sublinearly, so the quadratic stage is corpus-size-independent while
    * every corpus-sized step is a broadcast join. (A first cut joined raw
    * rows: 66M levenshtein evals at sf0.1, ~2 min — the distinct-first
    * formulation is ~10^4× fewer.) The arg-min packs (dist ‖ name) into a
    * lexicographic min (the q28 argmax trick), deterministic on ties; the
    * reported nn_id is the min part id bearing the matched name.
    */
  val fuzzyBlockedMatch: Q = (s, dir) => {
    val p = t(s, dir, "part")
      .select(col("p_partkey").as("id"), lower(col("p_name")).as("nm"))
    // COMPOSITE block key: last word + name-length bucket. A single-token
    // block re-quadratics on a real catalog's dominant last token; the
    // length bucket subdivides hot blocks WITHOUT losing matches, because
    // levenshtein ≤ 4 bounds the length difference by 4 < the bucket
    // width 8 — a true match is always in the same or an adjacent bucket,
    // so the probe side fans out to {lb−1, lb, lb+1} (each true pair
    // meets exactly once: the build side keeps its own single bucket).
    // The oracle keeps the plain last-token block: same filtered pair
    // set, so identical results — the gate proves the subdivision exact.
    val names = Dedup.pin(
      p.select(col("nm")).distinct()
        .withColumn("blk", element_at(split(col("nm"), " "), -1))
        .withColumn("lb", floor(length(col("nm")) / 8)))
    val probe = names.select(col("nm"), col("blk"),
      explode(array(col("lb") - 1, col("lb"), col("lb") + 1)).as("lb"))
    val reps = p.groupBy(col("nm")).agg(min(col("id")).as("rep_id"))
    val nn = probe.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.lb") === col("b.lb") &&
          col("a.nm") =!= col("b.nm"))
      .select(col("a.nm").as("nm"), col("b.nm").as("cand_nm"),
        levenshtein(col("a.nm"), col("b.nm")).as("d"))
      .filter(col("d") <= 4)
      .groupBy(col("nm"))
      .agg(min(concat(lpad(col("d").cast("string"), 3, "0"), col("cand_nm")))
        .as("pk"))
      .select(col("nm"),
        substring(col("pk"), 1, 3).cast("int").as("nn_dist"),
        col("pk").substr(lit(4), length(col("pk")) - 3).as("nn_nm"))
      .join(reps.select(col("nm").as("nn_nm"), col("rep_id").as("nn_id")),
        Seq("nn_nm"))
    p.join(broadcast(nn.select(col("nm"), col("nn_dist"), col("nn_id"))),
        Seq("nm"))
      .select(col("id").as("p_partkey"), col("nn_dist"), col("nn_id"))
      .orderBy(col("p_partkey"))
  }

  val fuzzyBlockedMatchSql: String =
    """WITH p AS (SELECT p_partkey AS id, lower(p_name) AS nm FROM part),
      |names AS (SELECT DISTINCT nm, string_split(nm, ' ')[-1] AS blk FROM p),
      |reps AS (SELECT nm, min(id) AS rep_id FROM p GROUP BY nm),
      |c AS (SELECT a.nm AS nm, b.nm AS cand_nm, levenshtein(a.nm, b.nm) AS d
      |      FROM names a JOIN names b ON a.blk = b.blk AND a.nm <> b.nm
      |      WHERE levenshtein(a.nm, b.nm) <= 4),
      |m AS (SELECT nm, min(lpad(CAST(d AS VARCHAR), 3, '0') || cand_nm) AS pk
      |      FROM c GROUP BY nm),
      |nn AS (SELECT m.nm,
      |         CAST(substr(pk, 1, 3) AS INTEGER) AS nn_dist,
      |         r.rep_id AS nn_id
      |       FROM m JOIN reps r ON r.nm = substr(m.pk, 4))
      |SELECT p.id AS p_partkey, nn_dist, nn_id
      |FROM p JOIN nn USING (nm)
      |ORDER BY p_partkey""".stripMargin

  /** Distributed BPE vocabulary induction ([[graft.ops.Bpe]]): the first 6
    * merge rounds over the lowercased corpus, emitted as the merge table
    * (round, pair, frequency). The DuckDB oracle is the unrolled 6-stage
    * CTE chain generated by `Bpe.mergesOracleSql` — each stage recomputes
    * its own argmax, so the gate proves pair counting, the deterministic
    * tie rule, and the left-to-right merge application all round-trip.
    */
  val bpeMerges: Q = (s, dir) =>
    graft.ops.Bpe.merges(t(s, dir, "documents"), "text", rounds = 6)

  val bpeMergesSql: String = graft.ops.Bpe.mergesOracleSql(6)

  /** Per-language Zipf slope: least-squares slope of ln(freq) vs ln(rank)
    * over the token frequency ranking — the corpus-health statistic whose
    * drift flags template/boilerplate contamination (natural language sits
    * near −1). The ranking window runs over the per-lang VOCABULARY
    * (sublinear in the corpus — the q128/q129 discipline), not corpus
    * rows. Determinism: x/y are 8-dec-rounded logs summed as DECIMALs
    * (exact, association-free); the closed-form slope is then a fixed
    * sequence of double ops on identical operands, rounded to 6.
    */
  val zipfSlope: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val freqs = t(s, dir, "documents")
      .select(col("lang"), explode(TextStats.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("f"))
    val ranked = freqs.withColumn("rk",
      row_number().over(Window.partitionBy(col("lang"))
        .orderBy(col("f").desc, col("tok"))))
    val xy = ranked.select(col("lang"),
      round(log(col("rk").cast("double")), 8).cast("decimal(18,8)").as("x"),
      round(log(col("f").cast("double")), 8).cast("decimal(18,8)").as("y"))
    xy.groupBy(col("lang"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("x") * col("y")).cast("double").as("sxy"))
      .select(col("lang"), col("n").cast("long").as("n_vocab"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("zipf_slope"))
      .orderBy(col("lang"))
  }

  val zipfSlopeSql: String =
    """WITH tk AS (SELECT lang, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
      |            FROM documents),
      |f AS (SELECT lang, tok, count(*) AS f FROM tk GROUP BY lang, tok),
      |r AS (SELECT lang, f,
      |        row_number() OVER (PARTITION BY lang ORDER BY f DESC, tok) AS rk
      |      FROM f),
      |xy AS (SELECT lang,
      |         CAST(round(ln(CAST(rk AS DOUBLE)), 8) AS DECIMAL(18,8)) AS x,
      |         CAST(round(ln(CAST(f AS DOUBLE)), 8) AS DECIMAL(18,8)) AS y
      |       FROM r),
      |a AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n,
      |        CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |        CAST(sum(x * x) AS DOUBLE) AS sxx,
      |        CAST(sum(x * y) AS DOUBLE) AS sxy
      |      FROM xy GROUP BY lang)
      |SELECT lang, CAST(n AS BIGINT) AS n_vocab,
      | round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope
      |FROM a ORDER BY lang""".stripMargin

  /** JSONL malformed-line quarantine (`Readers.jsonlWithCorruptCapture` —
    * the JSON sibling of q98's CSV gate): one line of the JSONL copy is
    * doctored into invalid JSON; PERMISSIVE mode must keep every good
    * line AND capture exactly the broken one in the corrupt-record
    * column. The oracle derives the expected counts arithmetically from
    * the parquet original.
    */
  val jsonlQuarantine: Q = (s, dir) => {
    import org.apache.spark.sql.types._
    val tmp = scratch("graft_jsonl_quar").toString
    t(s, dir, "nation").select(
        when(col("n_nationkey") === 0, lit("{broken"))
          .otherwise(to_json(struct(col("n_nationkey"), col("n_name"),
            col("n_regionkey")))).as("value"))
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(tmp)
    val schema = StructType(Seq(
      StructField("n_nationkey", LongType),
      StructField("n_name", StringType),
      StructField("n_regionkey", LongType)))
    Readers.jsonlWithCorruptCapture(s, tmp, schema)
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("_corrupt_record")).as("n_corrupt"),
        sum(when(col("_corrupt_record").isNull, col("n_regionkey")))
          .as("good_region_sum"))
  }

  val jsonlQuarantineSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      | CAST(1 AS BIGINT) AS n_corrupt,
      | CAST(sum(CASE WHEN n_nationkey <> 0 THEN n_regionkey END) AS BIGINT) AS good_region_sum
      |FROM nation""".stripMargin

  /** Winnowing fingerprint overlap (Schleimer et al. '03 "Winnowing:
    * Local Algorithms for Document Fingerprinting" — the MOSS detector):
    * positional char-20-gram hashes, sampled by taking the minimum of
    * each 8-hash sliding window, then pairwise overlap counting on the
    * sampled set. Versus q91/q100's every-gram indexes, winnowing keeps
    * the partial-overlap guarantee (any shared run ≥ k+w−1 chars shares
    * a fingerprint) at ~2/(w+1) the index size — the sampling is the
    * scale story. Both the hash array and the exploded fingerprint table
    * are pinned: the sliding-window minima reference the hash array from
    * inside a HOF lambda, and without the cache boundary CollapseProject
    * inlines the whole gram-hash construction into the lambda — O(n²·k)
    * per document (the round-4 lambda-recompute trap). The window min is
    * array_min(slice) — O(n·w) per doc, fine here; a custom monotonic-
    * deque expression would make it O(n) if profiles ever demand it.
    */
  val winnowOverlap: Q = (s, dir) => {
    val K = 20; val W = 8
    // fused native md5-winnow (same VALUES as the composed
    // transform/md5/conv/array_min formulation — Md5WinnowSpec proves
    // the equivalence; the DuckDB oracle below is that spec verbatim):
    // the 59.8 s r7 bench row was expression-tree overhead around the
    // inherent md5 work, not the join (VERDICT r7 perf audit)
    val fps = Dedup.pin(
      t(s, dir, "documents").filter(length(col("text")) >= K + W - 1)
        .select(col("doc_id"),
          explode(graft.functions.WinnowFingerprints
            .md5_winnow_set(col("text"), K, W)).as("fp")))
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .orderBy(col("id1"), col("id2"))
  }

  val winnowOverlapSql: String =
    """WITH g AS (SELECT doc_id,
      |    list_transform(generate_series(1, length(text) - 19),
      |      i -> ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 20)), 1, 15))::BIGINT) AS h
      |  FROM documents WHERE length(text) >= 27),
      |m AS (SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, len(h) - 7),
      |      j -> list_min(h[j : j + 7]))) AS fps
      |  FROM g),
      |e AS (SELECT doc_id, unnest(fps) AS fp FROM m)
      |SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_shared
      |FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY 1, 2""".stripMargin

  /** CLUSTER-NATIVE winnowing dedup — the scale path that retires q132's
    * pair materialization ([[graft.ops.Dedup.winnowClusters]]): the pair
    * list is quadratic in duplicate-cluster size (127× output at 10× docs,
    * SCALE.md round-5), so instead each fingerprint bucket emits STAR
    * edges to its minimum doc id (linear, component-preserving) and the
    * min-label fixpoint of q65 turns them into clusters. Semantics: docs
    * sharing any ≥ k+w−1-char run cluster transitively; one output row
    * per clustered doc. Same md5 hash as q132 so the DuckDB oracle can
    * recompute the identical fingerprints (production twin uses the
    * native [[graft.functions.WinnowFingerprints]] hash — the q22/q94
    * FNV-vs-md5 gate pattern); the oracle's closure is a recursive CTE
    * over the identical star-edge set.
    */
  val winnowClustersQ: Q = (s, dir) => {
    val K = 20; val W = 8
    val withH = Dedup.pin(
      t(s, dir, "documents").filter(length(col("text")) >= K + W - 1)
        .select(col("doc_id"),
          transform(sequence(lit(1), length(col("text")) - (K - 1)),
            i => conv(substring(md5(col("text").substr(i, lit(K)).cast("binary")),
              1, 15), 16, 10).cast("long")).as("h")))
    val fps = withH.select(col("doc_id").as("id"),
      explode(array_distinct(
        transform(sequence(lit(1), size(col("h")) - (W - 1)),
          j => array_min(slice(col("h"), j, lit(W)))))).as("fp"))
    Dedup.clusters(Dedup.starEdges(fps))
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  val winnowClustersSql: String =
    """WITH RECURSIVE g AS (SELECT doc_id,
      |    list_transform(generate_series(1, length(text) - 19),
      |      i -> ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 20)), 1, 15))::BIGINT) AS h
      |  FROM documents WHERE length(text) >= 27),
      |m AS (SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, len(h) - 7),
      |      j -> list_min(h[j : j + 7]))) AS fps
      |  FROM g),
      |e AS (SELECT doc_id, unnest(fps) AS fp FROM m),
      |hub AS (SELECT fp, min(doc_id) AS hub FROM e GROUP BY fp HAVING count(*) >= 2),
      |edges AS (SELECT DISTINCT e.doc_id AS a, h.hub AS b
      |  FROM e JOIN hub h USING (fp) WHERE e.doc_id <> h.hub),
      |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      |reach AS (SELECT a, b FROM sym
      |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a)
      |SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  /** End-to-end curation FUNNEL — the whole training-data pipeline as one
    * query: exact dedup → benchmark decontamination → quality floor →
    * length band → stratified split, reported as survivor counts + token
    * mass per stage. Shape: every per-doc decision is computed as a FLAG
    * in one wide frame (one fingerprint window, one gram-overlap
    * aggregation joined back, row-local quality/length/split), the frame
    * is pinned, and the funnel is conditional aggregation — the corpus is
    * never passed once per stage (stage k = flags 1..k, monotone by
    * construction). This is the composition proof for the operator
    * catalog: q20's dedup, q91's contamination, q26's quality, q116's
    * lengths, and q120's split in a single DAG.
    */
  val curationFunnel: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val bench = docs.filter(col("doc_id") < 20).filter(length(col("text")) >= 13)
      .select(explode(TextStats.charNgrams(col("text"), 13)).as("gram"))
      .distinct().withColumn("hit", lit(1))
    // contaminated = heavy overlap (≥ 30% of the doc's distinct grams in
    // the benchmark set) — the any-single-gram rule is degenerate on a
    // shared-vocabulary corpus (q91 measures 477/500 docs with ≥ 1 hit,
    // median ratio 0.13), so the funnel uses the ratio-threshold variant
    val contam = docs.filter(length(col("text")) >= 13)
      .select(col("doc_id"), explode(TextStats.charNgrams(col("text"), 13)).as("gram"))
      .join(broadcast(bench), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg((count(col("hit")).cast("double") / count(lit(1))).as("ratio"))
      .filter(col("ratio") >= 0.3).withColumn("contam", lit(true))
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(math.pow(2, 60)))
    val flags = Dedup.pin(docs
      .withColumn("fp", TextStats.fingerprint(col("text")))
      .withColumn("keeper", col("doc_id") ===
        min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .join(contam.select(col("doc_id"), col("contam")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tok"),
        col("keeper"),
        (col("keeper") && col("doc_id") >= 20 &&
          !coalesce(col("contam"), lit(false))).as("clean"),
        TextStats.qualityScore(col("text")).as("q"),
        when(u < 0.90, "train").when(u < 0.95, "val").otherwise("test").as("split"))
      .withColumn("good", col("clean") && col("q") >= 0.45)
      .withColumn("fit", col("good") && col("n_tok").between(10, 5000)))
    def stage(name: String, cond: Column) =
      flags.filter(cond).agg(
        lit(name).as("stage"),
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tok")), lit(0L)).as("n_tokens"))
    stage("1_raw", lit(true))
      .unionAll(stage("2_dedup", col("keeper")))
      .unionAll(stage("3_decontam", col("clean")))
      .unionAll(stage("4_quality", col("good")))
      .unionAll(stage("5_length", col("fit")))
      .unionAll(stage("6_train", col("fit") && col("split") === "train"))
      .unionAll(stage("7_val", col("fit") && col("split") === "val"))
      .unionAll(stage("8_test", col("fit") && col("split") === "test"))
      .orderBy(col("stage"))
  }

  val curationFunnelSql: String =
    """WITH pos AS (SELECT doc_id, text, unnest(generate_series(1, length(text)-12)) AS i
      |  FROM documents WHERE length(text) >= 13),
      |g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 13) AS gram FROM pos),
      |b AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20),
      |ct AS (SELECT doc_id FROM (
      |    SELECT g.doc_id,
      |      CAST(count(b.gram) AS DOUBLE) / count(*) AS ratio
      |    FROM g LEFT JOIN b ON g.gram = b.gram GROUP BY g.doc_id)
      |  WHERE ratio >= 0.3),
      |fl AS (SELECT d.doc_id,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    d.doc_id = min(d.doc_id) OVER (PARTITION BY
      |      md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS keeper,
      |    round(
      |      least(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) / 50.0, 1.0) * 0.4
      |    + (1.0 - least(CAST(length(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
      |        / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)) * 0.3
      |    + least(CAST(length(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
      |        / greatest(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 4.0, 1.0) * 0.3,
      |    6) AS q,
      |    (ct.doc_id IS NOT NULL) AS contam,
      |    CASE WHEN u < 0.90 THEN 'train' WHEN u < 0.95 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM (SELECT *, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |          / CAST(pow(2, 60) AS DOUBLE) AS u FROM documents) d
      |  LEFT JOIN ct ON ct.doc_id = d.doc_id),
      |f2 AS (SELECT *, (keeper AND doc_id >= 20 AND NOT contam) AS clean FROM fl),
      |f3 AS (SELECT *, (clean AND q >= 0.45) AS good FROM f2),
      |f4 AS (SELECT *, (good AND n_tok BETWEEN 10 AND 5000) AS fit FROM f3)
      |SELECT stage, n_docs, n_tokens FROM (
      |  SELECT '1_raw' AS stage, count(*) AS n_docs,
      |    CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS n_tokens FROM f4
      |  UNION ALL SELECT '2_dedup', count(*), CAST(coalesce(sum(n_tok), 0) AS BIGINT)
      |    FROM f4 WHERE keeper
      |  UNION ALL SELECT '3_decontam', count(*), CAST(coalesce(sum(n_tok), 0) AS BIGINT)
      |    FROM f4 WHERE clean
      |  UNION ALL SELECT '4_quality', count(*), CAST(coalesce(sum(n_tok), 0) AS BIGINT)
      |    FROM f4 WHERE good
      |  UNION ALL SELECT '5_length', count(*), CAST(coalesce(sum(n_tok), 0) AS BIGINT)
      |    FROM f4 WHERE fit
      |  UNION ALL SELECT '6_train', count(*), CAST(coalesce(sum(n_tok), 0) AS BIGINT)
      |    FROM f4 WHERE fit AND split = 'train'
      |  UNION ALL SELECT '7_val', count(*), CAST(coalesce(sum(n_tok), 0) AS BIGINT)
      |    FROM f4 WHERE fit AND split = 'val'
      |  UNION ALL SELECT '8_test', count(*), CAST(coalesce(sum(n_tok), 0) AS BIGINT)
      |    FROM f4 WHERE fit AND split = 'test'
      |) ORDER BY stage""".stripMargin

  /** BPE encoding with the learned merges ([[graft.ops.Bpe.encodeSymbols]]
    * — the apply side of q129): per-source token/char/symbol totals and
    * the symbols-per-char compression the 6-merge vocabulary achieves.
    * Merges apply per DISTINCT word (sublinear); the corpus is scored by
    * one keyed join per token occurrence.
    */
  val bpeEncode: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val enc = graft.ops.Bpe.encodeSymbols(docs, "text", rounds = 6)
    docs.select(col("source"),
        explode(TextStats.tokens(lower(col("text")))).as("w"))
      .join(enc, Seq("w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(length(col("w"))).cast("bigint").as("n_chars"),
        sum(col("n_sym")).as("n_symbols"))
      .select(col("source"), col("n_tokens"), col("n_chars"), col("n_symbols"),
        round(col("n_symbols").cast("double") / col("n_chars"), 6)
          .as("sym_per_char"))
      .orderBy(col("source"))
  }

  val bpeEncodeSql: String = graft.ops.Bpe.encodeOracleSql(6)

  /** SCD TYPE-2 history build — the companion to q60's SCD1 merge: per
    * user, collapse consecutive repeats of `event_type` and emit validity
    * intervals [valid_from, valid_to) with an open (NULL) end for the
    * current state — the standard change-capture layout for dimension
    * history. Two window passes over the SAME (user_id; ts, event_id)
    * spec (lag to find change points, lead over the survivors for the
    * interval end) → one hash exchange, sort reused; per-user windows
    * parallelize across the key space at any scale.
    */
  val scd2History: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  val scd2HistorySql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |    CAST(ts AS TIMESTAMP) AS ts FROM events),
      |c AS (SELECT *, lag(event_type) OVER
      |        (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
      |ch AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type),
      |o AS (SELECT user_id, event_id, event_type, ts AS valid_from,
      |        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |          AS valid_to
      |      FROM ch)
      |SELECT user_id, event_id, event_type, valid_from, valid_to,
      | valid_to IS NULL AS is_current
      |FROM o ORDER BY user_id, valid_from, event_id""".stripMargin

  /** Deletion propagation ("right to be forgotten"): a customer key set
    * (c_custkey ≡ 0 mod 97) cascades through customer → orders →
    * lineitem, and the query reports kept/deleted row counts per table —
    * the audit artifact a data-subject erasure run must produce. Each
    * table is one anti/semi join against the (small, broadcast) key set
    * or its order-key projection; nothing shuffles the fact tables.
    */
  val forgetKeys: Q = (s, dir) => {
    val keys = t(s, dir, "customer").filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey"))
    val orders = t(s, dir, "orders")
    val doomedOrders = orders.join(broadcast(keys),
      col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"))
    def report(name: String, total: DataFrame, doomed: DataFrame) = {
      val d = doomed.agg(count(lit(1)).as("n_deleted"))
      total.agg(count(lit(1)).as("n_total")).crossJoin(d)
        .select(lit(name).as("table_name"),
          (col("n_total") - col("n_deleted")).as("n_kept"), col("n_deleted"))
    }
    val cust = t(s, dir, "customer")
    val li = t(s, dir, "lineitem")
    report("1_customer", cust,
        cust.join(broadcast(keys), Seq("c_custkey"), "left_semi"))
      .unionAll(report("2_orders", orders,
        orders.join(broadcast(keys),
          col("o_custkey") === col("c_custkey"), "left_semi")))
      .unionAll(report("3_lineitem", li,
        li.join(broadcast(doomedOrders),
          col("l_orderkey") === col("o_orderkey"), "left_semi")))
      .orderBy(col("table_name"))
  }

  val forgetKeysSql: String =
    """WITH k AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      |doomed_o AS (SELECT o_orderkey FROM orders
      |             WHERE o_custkey IN (SELECT c_custkey FROM k))
      |SELECT '1_customer' AS table_name,
      | CAST((SELECT count(*) FROM customer) -
      |   (SELECT count(*) FROM k) AS BIGINT) AS n_kept,
      | CAST((SELECT count(*) FROM k) AS BIGINT) AS n_deleted
      |UNION ALL
      |SELECT '2_orders',
      | CAST((SELECT count(*) FROM orders) -
      |   (SELECT count(*) FROM doomed_o) AS BIGINT),
      | CAST((SELECT count(*) FROM doomed_o) AS BIGINT)
      |UNION ALL
      |SELECT '3_lineitem',
      | CAST((SELECT count(*) FROM lineitem) -
      |   (SELECT count(*) FROM lineitem
      |    WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_o)) AS BIGINT),
      | CAST((SELECT count(*) FROM lineitem
      |    WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_o)) AS BIGINT)
      |ORDER BY table_name""".stripMargin

  /** Referential-integrity audit across the star schema: orphaned foreign
    * keys per relationship (lineitem→orders/part/supplier, orders→
    * customer) plus null-key counts — the relational layer of the DQ
    * story (column expectations are q08/q99; this is the cross-table
    * contract). Each relationship is one broadcast/keyed anti join; a
    * healthy warehouse emits zeros, and the gate pins that invariant so
    * ingest regressions become hash mismatches.
    */
  val integrityAudit: Q = (s, dir) => {
    def audit(name: String, fact: DataFrame, fk: String,
              dim: DataFrame, pk: String) =
      fact.agg(lit(name).as("relationship"),
          count(lit(1)).as("n_rows"),
          coalesce(sum(col(fk).isNull.cast("long")), lit(0L)).as("n_null_fk"))
        .crossJoin(
          fact.filter(col(fk).isNotNull)
            .join(dim.select(col(pk).as(fk)), Seq(fk), "left_anti")
            .agg(count(lit(1)).as("n_orphans")))
    val li = t(s, dir, "lineitem")
    audit("1_lineitem_orders", li, "l_orderkey", t(s, dir, "orders"), "o_orderkey")
      .unionAll(audit("2_lineitem_part", li, "l_partkey",
        t(s, dir, "part"), "p_partkey"))
      .unionAll(audit("3_lineitem_supplier", li, "l_suppkey",
        t(s, dir, "supplier"), "s_suppkey"))
      .unionAll(audit("4_orders_customer", t(s, dir, "orders"), "o_custkey",
        t(s, dir, "customer"), "c_custkey"))
      .select(col("relationship"), col("n_rows"), col("n_null_fk"),
        col("n_orphans"))
      .orderBy(col("relationship"))
  }

  val integrityAuditSql: String =
    """SELECT '1_lineitem_orders' AS relationship,
      | CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows,
      | CAST((SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL) AS BIGINT) AS n_null_fk,
      | CAST((SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL
      |   AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT) AS n_orphans
      |UNION ALL SELECT '2_lineitem_part',
      | (SELECT count(*) FROM lineitem),
      | (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL),
      | (SELECT count(*) FROM lineitem WHERE l_partkey IS NOT NULL
      |   AND l_partkey NOT IN (SELECT p_partkey FROM part))
      |UNION ALL SELECT '3_lineitem_supplier',
      | (SELECT count(*) FROM lineitem),
      | (SELECT count(*) FROM lineitem WHERE l_suppkey IS NULL),
      | (SELECT count(*) FROM lineitem WHERE l_suppkey IS NOT NULL
      |   AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
      |UNION ALL SELECT '4_orders_customer',
      | (SELECT count(*) FROM orders),
      | (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
      | (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL
      |   AND o_custkey NOT IN (SELECT c_custkey FROM customer))
      |ORDER BY relationship""".stripMargin

  /** Behavioral conversion funnel over the event stream: per user, the
    * ordered progression first-view → first-click-after-view →
    * first-purchase-after-click, reported as stage populations and
    * conversion rates. One groupBy(user) pass computes the three
    * conditional first-timestamps (min with a when-guard is order-free —
    * no window, no sort); the funnel is then a single-row aggregate.
    */
  val conversionFunnel: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val perUser = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click_any"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_buy_any"))
      .select(col("user_id"), col("t_view"),
        when(col("t_click_any") > col("t_view"), col("t_click_any")).as("t_click"))
      .join(ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_buy_all")),
        Seq("user_id"), "left")
    perUser.agg(
        count(lit(1)).as("n_users"),
        coalesce(sum(col("t_view").isNotNull.cast("long")), lit(0L)).as("n_view"),
        coalesce(sum(col("t_click").isNotNull.cast("long")), lit(0L)).as("n_view_click"),
        coalesce(sum((col("t_buy_all") > col("t_click")).cast("long")), lit(0L))
          .as("n_full_funnel"))
      .select(col("n_users"), col("n_view"), col("n_view_click"),
        col("n_full_funnel"),
        // guards: an empty (or view-free) stream must report NULL rates,
        // not an ANSI divide-by-zero (EmptyInputSpec)
        when(col("n_view") > 0,
          round(col("n_view_click").cast("double") / col("n_view"), 6))
          .as("view_to_click"),
        when(col("n_view_click") > 0,
          round(col("n_full_funnel").cast("double") / col("n_view_click"), 6))
          .as("click_to_buy"))
  }

  val conversionFunnelSql: String =
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |           FROM events),
      |pu AS (SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click_any,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy_all
      |  FROM e GROUP BY user_id),
      |f AS (SELECT user_id, t_view,
      |    CASE WHEN t_click_any > t_view THEN t_click_any END AS t_click,
      |    t_buy_all
      |  FROM pu)
      |SELECT CAST(count(*) AS BIGINT) AS n_users,
      | CAST(coalesce(sum(CASE WHEN t_view IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_view,
      | CAST(coalesce(sum(CASE WHEN t_click IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_view_click,
      | CAST(coalesce(sum(CASE WHEN t_buy_all > t_click THEN 1 END), 0) AS BIGINT) AS n_full_funnel,
      | round(coalesce(sum(CASE WHEN t_click IS NOT NULL THEN 1 END), 0)
      |   / CAST(coalesce(sum(CASE WHEN t_view IS NOT NULL THEN 1 END), 0) AS DOUBLE), 6) AS view_to_click,
      | round(coalesce(sum(CASE WHEN t_buy_all > t_click THEN 1 END), 0)
      |   / CAST(coalesce(sum(CASE WHEN t_click IS NOT NULL THEN 1 END), 0) AS DOUBLE), 6) AS click_to_buy
      |FROM f""".stripMargin

  /** Weekly cohort retention: users grouped by the ISO week of their first
    * event; for each (cohort_week, week_offset) the count of cohort users
    * active in that offset week. Two keyed aggregations (first-event per
    * user, then distinct user per cell) — the cohort matrix never needs a
    * window or a sort, and both shuffles key on user/cohort.
    */
  val cohortRetention: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
    val firstWk = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    ev.join(firstWk, Seq("user_id"))
      .select(col("user_id"), col("cohort_wk"),
        datediff(col("wk"), col("cohort_wk")).cast("int").as("day_off"))
      .select(col("user_id"), col("cohort_wk"),
        (col("day_off") / 7).cast("int").as("week_offset"))
      .distinct()
      .groupBy(col("cohort_wk"), col("week_offset"))
      .agg(count(lit(1)).as("n_active_users"))
      .orderBy(col("cohort_wk"), col("week_offset"))
  }

  val cohortRetentionSql: String =
    """WITH e AS (SELECT user_id,
      |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
      |  FROM events),
      |fw AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
      |j AS (SELECT DISTINCT e.user_id, cohort_wk,
      |    CAST(date_diff('day', cohort_wk, wk) // 7 AS INTEGER) AS week_offset
      |  FROM e JOIN fw USING (user_id))
      |SELECT cohort_wk, week_offset,
      | CAST(count(*) AS BIGINT) AS n_active_users
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Market-basket co-occurrence: the top part pairs ordered together,
    * with support counts — the a-priori first pass. Pairs are generated
    * WITHIN each order only (self-join keyed on the order key; basket
    * sizes are bounded, so per-order pair fan-out is a constant, never
    * corpus-quadratic), then one count aggregation; the top slice goes
    * through TakeOrdered. Dedup on (order, pair) first so multi-line
    * orders of the same part don't inflate support.
    */
  val marketBasket: Q = (s, dir) => {
    // basket-local pair generation: ONE shuffle builds the per-order part
    // set (collect_set folds the dedup in), pairs enumerate row-locally
    // from the bounded basket array, then one count aggregation — the
    // self-join formulation costs four exchanges (distinct, both join
    // sides, agg) for the same result (measured 2.4 s → ~1 s at sf0.1)
    val baskets = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .filter(size(col("parts")) >= 2)
    baskets
      .select(explode(flatten(transform(
        sequence(lit(1), size(col("parts")) - 1),
        i => transform(sequence(i + 1, size(col("parts"))),
          j => struct(element_at(col("parts"), i).as("part_a"),
            element_at(col("parts"), j).as("part_b")))))).as("pair"))
      .groupBy(col("pair.part_a").as("part_a"), col("pair.part_b").as("part_b"))
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .limit(25)
  }

  val marketBasketSql: String =
    """WITH i AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
      |           FROM lineitem)
      |SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS support
      |FROM i a JOIN i b ON a.okey = b.okey AND a.pk < b.pk
      |GROUP BY 1, 2
      |ORDER BY support DESC, part_a, part_b
      |LIMIT 25""".stripMargin

  /** Hourly event-rate anomaly detection: per event type, hours whose
    * volume deviates from the trailing-24-hour mean by more than 3
    * trailing standard deviations. The expensive step is the hourly
    * aggregation (map-side partials over the raw stream); the window
    * arithmetic runs over the tiny (hours × types) frame, with the
    * trailing moments as exact integer sums (sum, sum of squares) so the
    * z-score is a fixed double derivation on both engines.
    */
  val hourlyAnomalies: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-24, -1)
    hourly
      .withColumn("m", count(col("n")).over(w))
      .withColumn("s1", sum(col("n")).over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
      .filter(col("m") >= 12)
      .withColumn("mean", col("s1").cast("double") / col("m"))
      .withColumn("var0",
        col("s2").cast("double") / col("m") - col("mean") * col("mean"))
      .filter(col("var0") > 0)
      .withColumn("z", (col("n") - col("mean")) / sqrt(col("var0")))
      .filter(abs(col("z")) >= 3.0)
      .select(col("hour"), col("event_type"), col("n"),
        round(col("mean"), 6).as("trailing_mean"),
        round(col("z"), 6).as("z_score"))
      .orderBy(col("hour"), col("event_type"))
  }

  val hourlyAnomaliesSql: String =
    """WITH h AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
      |    event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT *,
      |    count(n) OVER w AS m,
      |    sum(n) OVER w AS s1,
      |    sum(n * n) OVER w AS s2
      |  FROM h
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
      |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      |z AS (SELECT hour, event_type, n,
      |    CAST(s1 AS DOUBLE) / m AS mean,
      |    CAST(s2 AS DOUBLE) / m
      |      - (CAST(s1 AS DOUBLE) / m) * (CAST(s1 AS DOUBLE) / m) AS var0
      |  FROM t WHERE m >= 12)
      |SELECT hour, event_type, n,
      | round(mean, 6) AS trailing_mean,
      | round((n - mean) / sqrt(var0), 6) AS z_score
      |FROM z WHERE var0 > 0 AND abs((n - mean) / sqrt(var0)) >= 3.0
      |ORDER BY hour, event_type""".stripMargin

  /** Embedding drift monitor: per label, the L2 distance between the
    * centroid of "snapshot A" (even vec_ids) and "snapshot B" (odd) —
    * the drift statistic an embedding pipeline alarms on when a model or
    * corpus shifts. Determinism chain: per-dim means use exact decimal
    * sums (q68 machinery); the rounded means cross back into
    * DECIMAL(18,6) via strings (exact — shortest-repr of a round-6
    * double is its 6-dec literal); the 64-dim squared-diff sum is decimal
    * (association-free); only the final sqrt is a double op. The heavy
    * aggregation is per (label, half, dim) with map-side partials; the
    * drift math runs on a labels×dims frame.
    */
  val embeddingDrift: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
    val cents = emb
      .select(col("label"), (col("vec_id") % 2).as("half"),
        posexplode(col("embedding")).as(Seq("pos", "val")))
      .groupBy(col("label"), col("half"), col("pos"))
      .agg(round(sum(col("val").cast("string").cast("decimal(18,9)"))
        .cast("double") / count(lit(1)), 6).as("c"))
    val diffs = cents.groupBy(col("label"), col("pos"))
      .agg(
        sum(when(col("half") === 0, col("c"))).cast("string")
          .cast("decimal(18,6)").as("c0"),
        sum(when(col("half") === 1, col("c"))).cast("string")
          .cast("decimal(18,6)").as("c1"))
      .select(col("label"), ((col("c0") - col("c1")) * (col("c0") - col("c1")))
        .as("d2"))
    val ns = emb.groupBy(col("label"))
      .agg(coalesce(sum((col("vec_id") % 2 === 0).cast("long")), lit(0L)).as("n_a"),
        coalesce(sum((col("vec_id") % 2 === 1).cast("long")), lit(0L)).as("n_b"))
    ns.join(
        diffs.groupBy(col("label"))
          .agg(round(sqrt(sum(col("d2")).cast("double")), 6).as("drift_l2")),
        Seq("label"))
      .orderBy(col("label"))
  }

  val embeddingDriftSql: String =
    """WITH h AS (SELECT label, vec_id % 2 AS half, d.dim AS dim,
      |    CAST(CAST(embedding[d.dim] AS VARCHAR) AS DECIMAL(18,9)) AS v
      |  FROM embeddings CROSS JOIN
      |    (SELECT unnest(generate_series(1, 64)) AS dim) d),
      |c AS (SELECT label, half, dim,
      |        round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS c
      |      FROM h GROUP BY 1, 2, 3),
      |w AS (SELECT label, dim,
      |        CAST(CAST(sum(CASE WHEN half = 0 THEN c END) AS VARCHAR)
      |          AS DECIMAL(18,6)) AS c0,
      |        CAST(CAST(sum(CASE WHEN half = 1 THEN c END) AS VARCHAR)
      |          AS DECIMAL(18,6)) AS c1
      |      FROM c GROUP BY 1, 2),
      |dd AS (SELECT label, sum((c0 - c1) * (c0 - c1)) AS d2 FROM w GROUP BY 1),
      |ns AS (SELECT label,
      |        CAST(coalesce(sum(CASE WHEN vec_id % 2 = 0 THEN 1 END), 0) AS BIGINT) AS n_a,
      |        CAST(coalesce(sum(CASE WHEN vec_id % 2 = 1 THEN 1 END), 0) AS BIGINT) AS n_b
      |      FROM embeddings GROUP BY 1)
      |SELECT ns.label, n_a, n_b,
      | round(sqrt(CAST(d2 AS DOUBLE)), 6) AS drift_l2
      |FROM ns JOIN dd ON ns.label = dd.label
      |ORDER BY ns.label""".stripMargin

  /** Co-purchase PageRank ([[graft.ops.Graph.pageRank]]): part importance
    * over the ordered-together graph (symmetric by construction, so no
    * dangling mass), 5 damped iterations from the uniform start, in
    * FIXED-POINT integer mass units — three floating formulations each
    * diverged from DuckDB by 1 ulp (see Graph scaladoc); integer
    * arithmetic is the reproducible form. The oracle is a generated
    * 5-stage unrolled CTE chain (the q129 BPE pattern — aggregation is
    * not allowed in a recursive CTE term) of the same exact BIGINT ops.
    */
  val copurchaseRank: Q = (s, dir) => {
    // max-basket guard (VERDICT r6 #6): TPC-H baskets are ≤7 parts, so
    // the 64 cap never binds here — it exists so one pathological order
    // cannot detonate the O(basket²) pair emission on a raw feed
    val items = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
    val edges = graft.ops.Graph.coOccurrenceEdges(items, "okey", "pk")
    graft.ops.Graph.pageRank(edges, iterations = 5)
      .select(col("pk").as("p_partkey"), col("r").as("rank_units"))
      .orderBy(col("p_partkey"))
  }

  val copurchaseRankSql: String = {
    val head =
      """WITH i AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
        |           FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
        |      FROM i a JOIN i b ON a.okey = b.okey AND a.pk <> b.pk),
        |d AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |nn AS (SELECT count(*) AS n FROM d),
        |p0 AS (SELECT src AS pk, CAST(1000000000000 // n AS BIGINT) AS r
        |       FROM d, nn)""".stripMargin
    val iters = (1 to 5).map { k =>
      s"""c$k AS (SELECT e.dst,
         |    CAST(sum(p.r // d.deg) AS BIGINT) AS s
         |  FROM e JOIN p${k - 1} p ON e.src = p.pk JOIN d ON d.src = e.src
         |  GROUP BY e.dst),
         |p$k AS (SELECT dst AS pk,
         |    CAST((15 * 1000000000000) // (100 * n)
         |      + (85 * s) // 100 AS BIGINT) AS r
         |  FROM c$k, nn)""".stripMargin
    }
    ((head +: iters).mkString(",\n")) +
      "\nSELECT pk AS p_partkey, r AS rank_units FROM p5 ORDER BY pk"
  }

  /** Compressed-CSV ingest round-trip: write region as gzip CSV (crawl
    * dumps and public datasets ship as .csv.gz; Spark's text sources
    * decompress by extension) and read it back through the standard CSV
    * reader — the gate proves the compressed path end-to-end, with the
    * codec visible in the part-file names. Note gzip is NOT splittable:
    * one task per file on read, so at 100 TB the layout rule is many
    * medium .csv.gz files (or zstd/bzip2 where splittable codecs are
    * available), never one giant archive.
    */
  val csvGzipRoundtrip: Q = (s, dir) => {
    val tmp = scratch("graft_csv_gz").toString
    t(s, dir, "region").write
      .option("header", "true").option("compression", "gzip")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).csv(tmp)
    val gzParts = new java.io.File(tmp).listFiles()
      .count(_.getName.endsWith(".csv.gz"))
    Readers.csv(s, tmp)
      .select(col("r_regionkey").cast("bigint").as("r_regionkey"),
        col("r_name"))
      .withColumn("gz_parts_nonzero", lit(gzParts > 0))
      .orderBy(col("r_regionkey"))
  }

  val csvGzipRoundtripSql: String =
    """SELECT r_regionkey, r_name, TRUE AS gz_parts_nonzero
      |FROM region ORDER BY r_regionkey""".stripMargin

  // ===================================================== round-6 additions

  /** PII scrubbing (the CCNet/Dolma-style redaction pass a public-crawl
    * pipeline runs before training): regex-redact emails, IPv4 addresses,
    * and phone numbers, reporting per-doc hit counts and the md5 of the
    * scrubbed text (so the EXACT replacement output is hash-pinned, not
    * just the counts). The synthetic corpus contains no PII, so each doc
    * is first augmented with deterministic doc_id-derived PII — the same
    * construction on both engines (the q30/q125 planted-fixture pattern:
    * the fixtures are synthetic, the scrub machinery is the real
    * operator). Row-local (one Project), no shuffle; patterns use the
    * regex subset common to Java and RE2 so both engines match
    * identically. At 100 TB this runs as a narrow map fused into the
    * ingest scan — zero exchanges.
    */
  val piiScrub: Q = (s, dir) => {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
    val phone = "\\b\\d{3}-\\d{4}\\b"
    val planted = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or 10.0."), (col("doc_id") % 256).cast("string"),
        lit("."), (col("doc_id") % 97).cast("string"),
        lit(" call 555-01"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0")).as("text"))
    planted.select(col("doc_id"),
      regexp_count(col("text"), lit(email)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(ip)).cast("long").as("n_ips"),
      regexp_count(col("text"), lit(phone)).cast("long").as("n_phones"),
      md5(regexp_replace(regexp_replace(regexp_replace(col("text"),
        email, "[EMAIL]"), ip, "[IP]"), phone, "[PHONE]")).as("scrub_md5"))
      .orderBy(col("doc_id"))
  }

  val piiScrubSql: String =
    """WITH planted AS (SELECT doc_id,
      |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 10.0.'
      |    || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 97 AS VARCHAR)
      |    || ' call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS text
      |  FROM documents)
      |SELECT doc_id,
      | CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      | CAST(len(regexp_extract_all(text, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ips,
      | CAST(len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
      | md5(regexp_replace(regexp_replace(regexp_replace(text,
      |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |   '\b(\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g'),
      |   '\b\d{3}-\d{4}\b', '[PHONE]', 'g')) AS scrub_md5
      |FROM planted ORDER BY doc_id""".stripMargin

  /** Training sequence packing (the GPT-style pre-tokenization step that
    * concatenates documents into fixed-length training sequences): docs in
    * doc_id order are laid head-to-tail per source shard, each doc assigned
    * to the sequence its FIRST token lands in (seq_id = preceding-token
    * count div 512), reporting per-sequence doc/token counts and how many
    * docs straddle a sequence boundary (the fraction the loader must
    * split). The pack key is the SOURCE shard — the window cumsum runs per
    * shard in parallel; a global pack would serialize the corpus through
    * one partition, so at 100 TB the shard key IS the scale contract
    * (same discipline as q88's byte-packing).
    *
    * Oracle-typing note (the round-6 red row, root-caused round 7): a
    * DuckDB window `sum(BIGINT)` is HUGEINT, and HUGEINT fetches into
    * pandas as float64 — so an output column derived from it without
    * `CAST(... AS BIGINT)` hashes as `0.0` against Spark's int64 `0`
    * even though every value compares equal. `seq_id` was the one
    * aggregate-derived output column in the catalog missing the cast.
    */
  val sequencePack: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val L = 512
    val toks = t(s, dir, "documents").select(col("source"), col("doc_id"),
      size(TextStats.tokens(lower(col("text")))).cast("long").as("n_tok"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.withColumn("tok_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("tok_before") / L).cast("long"))
      .withColumn("straddles",
        floor((col("tok_before") + col("n_tok") - 1) / L) > col("seq_id"))
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddling"))
      .orderBy(col("source"), col("seq_id"))
  }

  val sequencePackSql: String =
    """WITH toks AS (SELECT source, doc_id,
      |  CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |laid AS (SELECT source, doc_id, n_tok,
      |  coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
      |  FROM toks)
      |SELECT source, CAST(tok_before // 512 AS BIGINT) AS seq_id,
      | count(*) AS n_docs,
      | CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      | CAST(sum(CASE WHEN (tok_before + n_tok - 1) // 512 > tok_before // 512
      |   THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling
      |FROM laid GROUP BY source, seq_id
      |ORDER BY source, seq_id""".stripMargin

  /** Token-budget data mixing (the sampling step after q119's temperature
    * weights are chosen): each source contributes its docs in quality
    * order — longest first, doc_id tiebreak — until a fixed token budget
    * is exhausted, and the report shows kept vs available mass per source.
    * The cut is a per-source window cumsum (parallel across sources, one
    * shuffle on the source key); the budget constant (800 tokens) binds on
    * every SF, so the gate actually exercises the cut, not a no-op keep.
    * At 100 TB the same plan holds: sources are the mixture components,
    * each windowed independently.
    */
  val tokenBudgetMix: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val budget = 800L
    val toks = t(s, dir, "documents").select(col("source"), col("doc_id"),
      col("n_chars"),
      size(TextStats.tokens(lower(col("text")))).cast("long").as("n_tok"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.withColumn("cum_tok", sum(col("n_tok")).over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_avail"),
        sum(when(col("cum_tok") <= budget, 1L).otherwise(0L)).as("n_kept"),
        sum(col("n_tok")).as("tok_avail"),
        sum(when(col("cum_tok") <= budget, col("n_tok")).otherwise(0L))
          .as("tok_kept"))
      .orderBy(col("source"))
  }

  val tokenBudgetMixSql: String =
    """WITH toks AS (SELECT source, doc_id, n_chars,
      |  CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (SELECT source, n_tok,
      |  sum(n_tok) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
      |  FROM toks)
      |SELECT source, count(*) AS n_avail,
      | CAST(sum(CASE WHEN cum_tok <= 800 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      | CAST(sum(n_tok) AS BIGINT) AS tok_avail,
      | CAST(sum(CASE WHEN cum_tok <= 800 THEN n_tok ELSE 0 END) AS BIGINT) AS tok_kept
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  /** Dynamic partition overwrite (the lakehouse re-ingest path: replace
    * ONLY the partitions present in the incoming batch, leave the rest of
    * the table untouched — Spark's `partitionOverwriteMode=dynamic`, the
    * portable analog of Delta's replaceWhere). Day-1 writes the full
    * corpus partitioned by lang; day-2 re-ingests just the `en` partition
    * with corrected metadata (+100000 chars); the read-back aggregate
    * proves the other four partitions survived byte-for-byte (static
    * overwrite semantics would delete them → row-count mismatch) and the
    * target was replaced, not appended (append would double-count `en`).
    * At 100 TB this is THE incremental-reload primitive: a day's
    * re-crawl touches its partitions only, with no rewrite of the lake.
    */
  val dynamicPartitionOverwrite: Q = (s, dir) => {
    val tmp = scratch("graft_dpo").toString
    // n_chars goes to long BEFORE day-1 so both generations of the `en`
    // partition carry the same parquet physical type (day-2's +100000L
    // would otherwise widen int→long only in the rewritten files).
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        col("lang"))
    docs.write.partitionBy("lang")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
    docs.filter(col("lang") === "en")
      .withColumn("n_chars", col("n_chars") + 100000L)
      .write.partitionBy("lang")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic").parquet(tmp)
    // Explicit schema: an empty corpus writes zero data files and
    // inference would fail; the table contract is known here.
    s.read.schema(docs.schema).parquet(tmp)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  val dynamicPartitionOverwriteSql: String =
    """SELECT lang, count(*) AS n_docs,
      | CAST(sum(n_chars + CASE WHEN lang = 'en' THEN 100000 ELSE 0 END) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Domain-blocklist filtering (the C4/RefinedWeb URL screen: drop docs
    * whose source domain — or ANY registrable parent of it — is on a
    * blocklist, so `spam.com` also blocks `cdn.spam.com`). Hosts are
    * planted doc_id-deterministically (same construction both engines;
    * the q147 fixture pattern). The scale shape is the point: the suffix
    * hierarchy is exploded on DISTINCT hosts only (label depth ≤ 4, so
    * the explode is bounded fan-out on a table of unique domains, not the
    * corpus), matched against the blocklist with a broadcast join, and
    * the surviving blocked-host set — never larger than the blocklist's
    * coverage — broadcasts back onto the corpus scan. At 100 TB: corpus
    * stays linear, blocklist of millions broadcasts once, no shuffle
    * touches document text.
    */
  val domainBlocklist: Q = (s, dir) => {
    import s.implicits._
    val docs = t(s, dir, "documents").select(col("doc_id"),
      concat(
        when(col("doc_id") % 3 === 0, "").when(col("doc_id") % 3 === 1, "www.")
          .otherwise("cdn."),
        when(col("doc_id") % 5 === 0, "news.com")
          .when(col("doc_id") % 5 === 1, "spam.com")
          .when(col("doc_id") % 5 === 2, "blog.org")
          .when(col("doc_id") % 5 === 3, "ads.tracker.net")
          .otherwise("docs.example.com")).as("host"))
    val blocklist = Seq("spam.com", "tracker.net").toDF("b")
    val blockedHosts = graft.ops.UrlFilter.blockedHosts(docs, blocklist)
    docs.join(broadcast(blockedHosts.withColumn("blk", lit(true))),
        Seq("host"), "left_outer")
      .groupBy(col("host"), coalesce(col("blk"), lit(false)).as("blocked"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("host"))
  }

  val domainBlocklistSql: String =
    """WITH d AS (SELECT doc_id,
      |  (CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN 'www.' ELSE 'cdn.' END) ||
      |  (CASE doc_id % 5 WHEN 0 THEN 'news.com' WHEN 1 THEN 'spam.com'
      |     WHEN 2 THEN 'blog.org' WHEN 3 THEN 'ads.tracker.net'
      |     ELSE 'docs.example.com' END) AS host FROM documents),
      |suf AS (SELECT DISTINCT host FROM d),
      |x AS (SELECT host,
      |  unnest(list_transform(generate_series(1, len(string_split(host,'.'))),
      |    i -> array_to_string(string_split(host,'.')[i:], '.'))) AS s FROM suf),
      |blocked AS (SELECT DISTINCT host FROM x WHERE s IN ('spam.com','tracker.net'))
      |SELECT d.host, (b.host IS NOT NULL) AS blocked, count(*) AS n_docs
      |FROM d LEFT JOIN blocked b ON d.host = b.host
      |GROUP BY 1, 2 ORDER BY d.host""".stripMargin

  /** Content-defined chunking (the rolling-boundary split used by
    * dedup-friendly storage and incremental corpus sync — rsync/LBFS
    * lineage: boundaries follow CONTENT, so an insertion reshuffles one
    * chunk, not every fixed-width window downstream of it). Token-level
    * CDC: a token is a boundary iff md5(token) ≡ 0 (mod 8) — expected
    * chunk length 8 tokens; each doc splits at its boundaries, each chunk
    * is fingerprinted, and the report counts per doc its chunks, distinct
    * chunks, and NOVEL chunks (fingerprints whose corpus-wide first
    * occurrence — min doc_id — is this doc): the storage the corpus
    * actually costs under content-addressed dedup. Plan: one corpus scan
    * → posexplode → per-doc boundary cumsum (window keyed on doc_id, no
    * global sort) → hash-agg reassembly → fingerprint-keyed min. All
    * shuffles are keyed on (doc_id[, chunk]) or the 16-byte fingerprint —
    * linear and skew-free at 100 TB.
    */
  val cdcChunks: Q = (s, dir) => {
    // Single pass over the chunk stream: reduce to (doc, fp, multiplicity)
    // first, then a min-doc window over fp marks novelty — referencing
    // `chunks` twice (per-doc agg + first-occurrence agg + join back)
    // would recompute the whole posexplode+window subtree and scan the
    // corpus twice (caught by PlanCheck: two Window/Exchange chains).
    val perDocFp = graft.ops.Cdc.chunks(t(s, dir, "documents"))
      .groupBy(col("doc_id"), col("fp"))
      .agg(count(lit(1)).as("c"))
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    perDocFp
      .withColumn("first_doc", min(col("doc_id")).over(wFp))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
          .as("n_novel"))
      .orderBy(col("doc_id"))
  }

  val cdcChunksSql: String =
    """WITH tok AS (SELECT doc_id,
      |    unnest(regexp_extract_all(lower(text), '\S+')) AS t,
      |    generate_subscripts(regexp_extract_all(lower(text), '\S+'), 1) AS pos
      |  FROM documents),
      |b AS (SELECT doc_id, pos, t,
      |    CASE WHEN ('0x'||substr(md5(t),1,15))::BIGINT % 8 = 0 THEN 1 ELSE 0 END AS bd
      |  FROM tok),
      |c AS (SELECT doc_id, pos, t,
      |    coalesce(sum(bd) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
      |  FROM b),
      |ch AS (SELECT doc_id, chunk_id,
      |    md5(string_agg(t, ' ' ORDER BY pos)) AS fp
      |  FROM c GROUP BY doc_id, chunk_id),
      |fo AS (SELECT fp, min(doc_id) AS first_doc FROM ch GROUP BY fp),
      |nv AS (SELECT first_doc AS doc_id, count(*) AS n_novel FROM fo GROUP BY first_doc),
      |pc AS (SELECT doc_id, count(*) AS n_chunks, count(DISTINCT fp) AS n_distinct
      |  FROM ch GROUP BY doc_id)
      |SELECT pc.doc_id, pc.n_chunks, CAST(pc.n_distinct AS BIGINT) AS n_distinct,
      |  CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel
      |FROM pc LEFT JOIN nv USING (doc_id) ORDER BY pc.doc_id""".stripMargin

  /** Incremental corpus-sync savings under content-defined chunking (the
    * payoff query for q152's Cdc op): day-2 re-ingests the corpus with a
    * patch spliced into the MIDDLE of every 7th document, both days are
    * CDC-chunked, and the report counts day-2 chunks already present in
    * day-1's content-addressed store — the bytes an incremental sync
    * does NOT ship. Mid-doc edits are the case that breaks fixed-width
    * windows (every downstream window shifts); CDC boundaries re-align,
    * so ~96% of chunks dedup against the store. Plan: two linear chunk
    * passes + one semi-style left join keyed on the 16-byte fingerprint;
    * at 100 TB the store side is a distinct-fp table, shuffle-joined on
    * the hash — no broadcast of corpus-sized state.
    */
  val cdcSync: Q = (s, dir) => {
    val day1 = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val patched = day1.withColumn("text",
      concat(expr("substring(text, 1, CAST(length(text)/2 AS INT))"),
        lit(" patched segment inserted here "),
        expr("substring(text, CAST(length(text)/2 AS INT) + 1)")))
    val day2 = day1.filter(col("doc_id") % 7 =!= 0)
      .unionByName(patched.filter(col("doc_id") % 7 === 0))
    val store = graft.ops.Cdc.chunks(day1).select(col("fp")).distinct()
    graft.ops.Cdc.chunks(day2, keepCols = Seq("lang"))
      .join(store.withColumn("known", lit(true)), Seq("fp"), "left_outer")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("known"), 1L).otherwise(0L)).as("n_shared"))
      .orderBy(col("lang"))
  }

  val cdcSyncSql: String =
    """WITH d1 AS (SELECT doc_id, lang, text FROM documents),
      |pat AS (SELECT doc_id, lang,
      |    substr(text, 1, length(text)//2) || ' patched segment inserted here ' ||
      |    substr(text, length(text)//2 + 1) AS text FROM documents),
      |d2 AS (SELECT * FROM d1 WHERE doc_id % 7 <> 0
      |       UNION ALL SELECT * FROM pat WHERE doc_id % 7 = 0),
      |t1 AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS t,
      |    generate_subscripts(regexp_extract_all(lower(text), '\S+'), 1) AS pos FROM d1),
      |c1 AS (SELECT doc_id, pos, t,
      |    coalesce(sum(CASE WHEN ('0x'||substr(md5(t),1,15))::BIGINT % 8 = 0 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id FROM t1),
      |store AS (SELECT DISTINCT md5(string_agg(t, ' ' ORDER BY pos)) AS fp
      |    FROM c1 GROUP BY doc_id, chunk_id),
      |t2 AS (SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '\S+')) AS t,
      |    generate_subscripts(regexp_extract_all(lower(text), '\S+'), 1) AS pos FROM d2),
      |c2 AS (SELECT doc_id, lang, pos, t,
      |    coalesce(sum(CASE WHEN ('0x'||substr(md5(t),1,15))::BIGINT % 8 = 0 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id FROM t2),
      |ch2 AS (SELECT doc_id, chunk_id, max(lang) AS lang,
      |    md5(string_agg(t, ' ' ORDER BY pos)) AS fp FROM c2 GROUP BY doc_id, chunk_id)
      |SELECT lang, count(*) AS n_chunks,
      |  CAST(sum(CASE WHEN s.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
      |FROM ch2 LEFT JOIN store s USING (fp)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Principal embedding direction via distributed gram matrix + integer
    * power iteration (the whitening/drift-axis step of an embedding
    * pipeline). The 100 TB work — X^T X over the corpus — is ONE scan:
    * quantize each vector to integers (q101's non-negative-argument
    * rounding trick, scale 1000), explode the dim² index pairs row-locally,
    * and hash-aggregate into ≤ dim² gram cells; map-side partials absorb
    * the fan-out. The gram collect and the 8-round power iteration are
    * codebook math, bounded by dim² = 4096 cells — never the corpus (the
    * SimSearch.kmeansCentroids precedent). All iteration arithmetic is
    * integer (the q143 lesson: float fixpoints are cross-engine-
    * unreproducible), on the RAW gram — dividing by n first truncates
    * the off-diagonal cells (whose means are < 1) to zero and collapses
    * the matrix to its diagonal (caught by the float-reference spec).
    * Per-round rescale v' = (s·1e6) // max|s| in truncating division
    * (DuckDB `//` ≡ BigInt `/`, both toward zero). The driver iterates
    * in BigInt; the DISTRIBUTED sums stay Long-safe to ~4e13 rows
    * (|gram| ≤ 2.4e5·n), and DuckDB's sum is HUGEINT. Oracle is a
    * generated PcaIters-round unrolled CTE
    * (64 rounds: the corpus spectrum's eigengap is ~0.93, so ~60 rounds
    * isolate the dominant axis; pinned by the float-reference spec).
    */
  val PcaIters = 64

  val embeddingPca: Q = (s, dir) => {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    // symmetry: emit only i ≤ j (upper triangle — half the explode/agg
    // volume), mirror on the driver; the gram is exactly symmetric so the
    // full-matrix oracle sees identical values
    val gramDf = emb.select(expr(
        "transform(embedding, x -> CAST(round((CAST(x AS DOUBLE) + 1.0D)" +
          " * 1000.0D) AS BIGINT) - 1000)").as("q"))
      .select(explode(expr(
        "flatten(transform(q, (xi, i) -> transform(" +
          "slice(q, i + 1, size(q) - i), (xj, j) ->" +
          " struct(i, i + j AS j, xi * xj AS p))))")).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.p").as("p"))
      .groupBy(col("i"), col("j")).agg(sum(col("p")).as("g"))
    val cells = gramDf.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> BigInt(r.getLong(2)))
    if (cells.isEmpty) Seq.empty[(Int, Long)].toDF("i", "loading")
    else {
      val gm = cells.iterator.flatMap { case ((i, j), g) =>
        if (i == j) Iterator((i, j) -> g)
        else Iterator((i, j) -> g, (j, i) -> g)
      }.toMap
      val dim = cells.iterator.map(_._1._1).max + 1
      val zero = BigInt(0)
      val scale = BigInt(1000000)
      var v = Array.fill(dim)(scale)
      for (_ <- 1 to PcaIters) {
        val sv = Array.tabulate(dim) { i =>
          var acc = zero
          var j = 0
          while (j < dim) { acc += gm.getOrElse((i, j), zero) * v(j); j += 1 }
          acc
        }
        val mx = sv.iterator.map(_.abs).max
        v = if (mx == zero) Array.fill(dim)(zero)
        else sv.map(s => s * scale / mx)
      }
      v.zipWithIndex.map { case (value, i) => (i, value.toLong) }.toSeq
        .toDF("i", "loading").orderBy(col("i"))
    }
  }

  val embeddingPcaSql: String = {
    val head =
      """WITH qq AS (SELECT list_transform(embedding,
        |    x -> CAST(round((CAST(x AS DOUBLE) + 1.0) * 1000.0) AS BIGINT) - 1000) AS q
        |  FROM embeddings),
        |e AS (SELECT q, unnest(q) AS xi, generate_subscripts(q, 1) - 1 AS i FROM qq),
        |p AS (SELECT i, xi, unnest(q) AS xj, generate_subscripts(q, 1) - 1 AS j FROM e),
        |gram AS MATERIALIZED (SELECT i, j, sum(xi * xj) AS g FROM p GROUP BY i, j),
        |v0 AS (SELECT DISTINCT i AS j, CAST(1000000 AS BIGINT) AS v FROM gram)""".stripMargin
    val rounds = (1 to PcaIters).map { k =>
      s"""s$k AS MATERIALIZED (SELECT gram.i, sum(gram.g * v.v) AS s
         |  FROM gram JOIN v${k - 1} v ON gram.j = v.j GROUP BY gram.i),
         |m$k AS (SELECT max(abs(s)) AS mx FROM s$k),
         |v$k AS MATERIALIZED (SELECT i AS j, CASE WHEN mx = 0 THEN 0
         |  ELSE (s * 1000000) // mx END AS v FROM s$k, m$k)""".stripMargin
    }
    head + ",\n" + rounds.mkString(",\n") + "\n" +
      s"SELECT CAST(j AS INTEGER) AS i, CAST(v AS BIGINT) AS loading FROM v$PcaIters ORDER BY i"
  }

  /** SemDeDup semantic dedup on the gate ([[Dedup.semanticDedup]]): the
    * q102 planting pattern — the first 50 vectors re-ingested verbatim
    * under shifted ids — makes the near-dup set exact (copies have
    * cosine ≈ 1 ≫ 0.99; the corpus's own max pair cosine is ~0.51, so
    * every comparison sits far from the threshold and cross-engine float
    * parity is safe). The codebook is the 8 vectors with vec_id < 8
    * (SQL-derivable, so the oracle recomputes the SAME assignment), and
    * a copy always lands in its original's cell — identical vector,
    * identical argmax — so the within-cell prune provably catches all 50
    * copies. Output: every vector with its cell and kept verdict.
    */
  val semanticDedupGate: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val planted = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val all = emb.unionByName(planted)
    // codebook: bounded 8-row collect (the ivfTopK coarse-quantizer shape)
    val cents: Array[(Long, Array[Float])] = emb.filter(col("vec_id") < 8)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    Dedup.semanticDedup(all, cents, threshold = 0.99)
      .select(col("id").as("vec_id"), col("cell"), col("kept"))
      .orderBy(col("vec_id"))
  }

  val semanticDedupGateSql: String =
    """WITH all_v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, list_transform(embedding, x -> CAST(x AS DOUBLE))
      |  FROM embeddings WHERE vec_id < 50),
      |cents AS (SELECT vec_id AS cid, e AS ce FROM all_v WHERE vec_id < 8),
      |scored AS (
      |  SELECT v.vec_id, v.e, c.cid,
      |    coalesce(list_dot_product(v.e, c.ce) /
      |      (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.ce, c.ce))),
      |     -2.0) AS cos
      |  FROM all_v v CROSS JOIN cents c),
      |assigned AS (
      |  SELECT vec_id, e, cid AS cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY cos DESC, cid) AS rn FROM scored) WHERE rn = 1),
      |dups AS (
      |  SELECT DISTINCT b.vec_id
      |  FROM assigned a JOIN assigned b
      |    ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE list_dot_product(a.e, b.e) /
      |    (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
      |    >= 0.99)
      |SELECT v.vec_id, v.cell, d.vec_id IS NULL AS kept
      |FROM assigned v LEFT JOIN dups d ON v.vec_id = d.vec_id
      |ORDER BY v.vec_id""".stripMargin

  /** DSIR importance weights (Xie et al. '23, arXiv:2302.03169): score
    * every document by how target-like its hashed-n-gram profile is —
    * log w(x) = Σ_grams [ln p_target(bucket) − ln p_raw(bucket)] under
    * Laplace-smoothed bag-of-hashed-bigrams models. Here target = the
    * corpus's English slice, raw = the whole corpus, buckets = md5-hashed
    * word bigrams mod 1024 (the established cross-engine 60-bit md5
    * pattern). The scale shape is DSIR's selling point: ONE corpus pass
    * explodes bigrams to 8-byte bucket ids (text never shuffles), both
    * n-gram models are ≤ B-row aggregates, and the per-doc scoring join
    * is against a B-row broadcast — at 100 TB the model build and the
    * scoring are both linear scans with bounded state. Cross-row float
    * discipline: per-bucket ln-ratio rounded to 8 places → DECIMAL, so
    * the per-doc sums are exact (the q126 surprisal contract).
    */
  val dsirWeights: Q = (s, dir) => {
    val B = 1024
    val feats = Dedup.pin(
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextStats.tokens(lower(col("text"))).as("tok"))
        .filter(size(col("tok")) >= 2)
        .select(col("doc_id"), col("lang"),
          explode(TextStats.wordBigrams(col("tok"))).as("g"))
        .select(col("doc_id"), col("lang"),
          (conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long") % B)
            .as("b")))
    val raw = feats.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = feats.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val totals = feats.agg(count(lit(1)).as("tr"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tt"))
    val deltas = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        round(
          log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
            (col("tt") + B).cast("double")) -
          log((col("cr") + 1).cast("double") /
            (col("tr") + B).cast("double")), 8)
          .cast("decimal(18,8)").as("d"))
    feats.join(deltas, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        // the sum is EXACT decimal — cast straight to double (one
        // correctly-rounded conversion, bit-identical cross-engine); a
        // final round(…, 6) sat exactly on a half boundary on this corpus
        sum(col("d")).cast("double").as("dsir_logw"))
      .orderBy(col("doc_id"))
  }

  val dsirWeightsSql: String =
    """WITH toks AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '\S+') AS tok
      |  FROM documents WHERE length(regexp_extract_all(lower(text), '\S+')) >= 2),
      |g AS (SELECT doc_id, lang,
      |    unnest(list_transform(generate_series(1, len(tok)-1),
      |      i -> tok[i] || ' ' || tok[i+1])) AS g
      |  FROM toks),
      |f AS (SELECT doc_id, lang,
      |    ('0x'||substr(md5(g),1,15))::BIGINT % 1024 AS b FROM g),
      |raw AS (SELECT b, count(*) AS cr FROM f GROUP BY b),
      |tgt AS (SELECT b, count(*) AS ct FROM f WHERE lang = 'en' GROUP BY b),
      |tot AS (SELECT count(*) AS tr,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tt FROM f),
      |d AS (SELECT b,
      |    CAST(round(ln(CAST(coalesce(ct, 0) + 1 AS DOUBLE) / CAST(tt + 1024 AS DOUBLE))
      |             - ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + 1024 AS DOUBLE)), 8)
      |      AS DECIMAL(18,8)) AS d
      |  FROM raw LEFT JOIN tgt USING (b), tot)
      |SELECT doc_id, count(*) AS n_grams,
      | CAST(sum(d) AS DOUBLE) AS dsir_logw
      |FROM f JOIN d USING (b)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Co-purchase triangle census ([[graft.ops.Graph.triangleCounts]]):
    * per-part neighbor and triangle counts over the same order-basket
    * graph as q143 — the cohesion companion to PageRank's centrality
    * (triangles drive clustering coefficients and community seeds). The
    * engine path is degree-ordered orientation (wedge fan-out bounded by
    * O(√m) per node); the oracle counts the same triangles naively with
    * id-ordered joins — the census is orientation-invariant, integer
    * end-to-end, no float surface at all.
    */
  val triangleCensus: Q = (s, dir) => {
    val items = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
      .distinct()
    val edges = items.as("a").join(items.as("b"),
        col("a.okey") === col("b.okey") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
    graft.ops.Graph.triangleCounts(edges)
      .select(col("id").as("p_partkey"), col("deg").as("n_neighbors"),
        col("n_tri"))
      .orderBy(col("p_partkey"))
  }

  val triangleCensusSql: String =
    """WITH i AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
      |           FROM lineitem),
      |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
      |      FROM i a JOIN i b ON a.okey = b.okey AND a.pk < b.pk),
      |deg AS (SELECT id, count(*) AS deg FROM (
      |    SELECT u AS id FROM e UNION ALL SELECT v AS id FROM e) GROUP BY id),
      |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |        FROM e e1 JOIN e e2 ON e2.u = e1.v
      |        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      |corners AS (SELECT id, count(*) AS n_tri FROM (
      |    SELECT a AS id FROM tri UNION ALL SELECT b AS id FROM tri
      |    UNION ALL SELECT c AS id FROM tri) GROUP BY id)
      |SELECT d.id AS p_partkey, d.deg AS n_neighbors,
      | CAST(coalesce(c.n_tri, 0) AS BIGINT) AS n_tri
      |FROM deg d LEFT JOIN corners c ON c.id = d.id
      |ORDER BY p_partkey""".stripMargin

  /** Gopher-style composite document filter (Rae et al. '21 §A1.1,
    * thresholds adapted to this corpus's 10–99-token documents): the
    * classic rule battery a crawl corpus passes before training — a
    * word-count band, a mean-word-length band, and a stopword floor —
    * each emitted as its own verdict plus the conjunction, so downstream
    * reporting can attribute removals per rule. Entirely row-local (ONE
    * projection over the scan, no shuffle until the output sort): at
    * 100 TB this fuses into the ingest scan exactly like q147's PII
    * scrub. Float discipline: mean word length is a single int/int
    * division (cross-engine exact) and its band edges are integers, so
    * no boundary can disagree; everything else is integer.
    */
  val gopherFilter: Q = (s, dir) => {
    val nW = TextStats.tokenCount(col("text"))
    val mwl = length(regexp_replace(col("text"), "\\s", "")).cast("double") /
      greatest(nW, lit(1)).cast("double")
    val stw = TextStats.stopwordCount(col("text"), TextStats.defaultStopwords)
    val rWords = nW.between(20, 80)
    val rMwl = mwl >= 3.0 && mwl <= 10.0
    val rStop = stw >= 2
    t(s, dir, "documents").select(
        col("doc_id"),
        nW.as("n_words"),
        round(mwl, 4).as("mean_word_len"),
        stw.as("n_stopwords"),
        rWords.as("r_words"),
        rMwl.as("r_word_len"),
        rStop.as("r_stopwords"),
        (rWords && rMwl && rStop).as("pass"))
      .orderBy(col("doc_id"))
  }

  val gopherFilterSql: String =
    """WITH s AS (SELECT doc_id,
      |    CAST(length(regexp_extract_all(text, '\S+')) AS INTEGER) AS n_words,
      |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) /
      |      greatest(length(regexp_extract_all(text, '\S+')), 1) AS mwl,
      |    CAST(length(regexp_extract_all(lower(text),
      |      '\b(the|a|an|and|of|to|in|is|it)\b')) AS INTEGER) AS n_stopwords
      |  FROM documents)
      |SELECT doc_id, n_words, round(mwl, 4) AS mean_word_len, n_stopwords,
      | n_words BETWEEN 20 AND 80 AS r_words,
      | mwl >= 3.0 AND mwl <= 10.0 AS r_word_len,
      | n_stopwords >= 2 AS r_stopwords,
      | (n_words BETWEEN 20 AND 80) AND mwl >= 3.0 AND mwl <= 10.0
      |   AND n_stopwords >= 2 AS pass
      |FROM s ORDER BY doc_id""".stripMargin

  /** Per-domain quota cap (the C4/RefinedWeb host-cap curation step: no
    * source may contribute more than N documents, best-quality first) —
    * planned through the NATIVE [[graft.plans.TopKPerKey]] operator, not
    * a window: map-side partial top-k keeps only ≤ k·partitions
    * survivors per source before the exchange, so at 100 TB a
    * billion-doc source ships k rows per input partition instead of its
    * whole corpus slice to one reducer (the q45/q92 survivors-only
    * discipline). Ordering is the rounded-6 quality score — q26 pins its
    * cross-engine equality, so rank order (with the doc_id tiebreak) is
    * engine-independent.
    */
  val domainQuota: Q = (s, dir) => {
    GraftExtensions.install(s)
    val scored = t(s, dir, "documents").select(
      col("doc_id"), col("source"),
      TextStats.qualityScore(col("text")).as("quality"))
    TopK.perKey(scored, keyCols = Seq("source"), orderCol = "quality",
        tiebreakCol = "doc_id", k = 10)
      .orderBy(col("source"), col("quality").desc, col("doc_id"))
  }

  val domainQuotaSql: String =
    """WITH s AS (SELECT doc_id, source,
      | round(
      |   least(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) / 50.0, 1.0) * 0.4
      | + (1.0 - least(CAST(length(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
      |     / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)) * 0.3
      | + least(CAST(length(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
      |     / greatest(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 4.0, 1.0) * 0.3,
      | 6) AS quality
      |FROM documents),
      |r AS (SELECT *, row_number() OVER (PARTITION BY source
      |        ORDER BY quality DESC, doc_id) AS rn FROM s)
      |SELECT doc_id, source, quality FROM r WHERE rn <= 10
      |ORDER BY source, quality DESC, doc_id""".stripMargin

  /** Co-purchase reachability ([[graft.ops.Graph.bfsLevels]]): hop
    * distance from the low-key seed parts over the same basket graph as
    * q143/q157, `BfsRounds` synchronous min-propagation supersteps —
    * integer end-to-end (the q143 lesson: no floating fixpoint), lineage
    * cut per round. Oracle: an unrolled per-round CTE chain, exactly the
    * q143/q153 pattern.
    */
  val BfsRounds = 4

  val bfsLevelsQ: Q = (s, dir) => {
    val items = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
      .distinct()
    val edges = items.as("a").join(items.as("b"),
        col("a.okey") === col("b.okey") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
    val seeds = edges.select(col("src").as("id"))
      .filter(col("id") <= 10).distinct()
    graft.ops.Graph.bfsLevels(edges, seeds, rounds = BfsRounds)
      .select(col("pk").as("p_partkey"), col("d").as("hops"))
      .orderBy(col("p_partkey"))
  }

  val bfsLevelsSql: String = {
    val head =
      """WITH i AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
        |           FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
        |      FROM i a JOIN i b ON a.okey = b.okey AND a.pk <> b.pk),
        |d0 AS (SELECT DISTINCT src AS pk, CAST(0 AS BIGINT) AS d
        |       FROM e WHERE src <= 10)""".stripMargin
    val rounds = (1 to BfsRounds).map { k =>
      s"""d$k AS MATERIALIZED (SELECT pk, min(d) AS d FROM (
         |    SELECT pk, d FROM d${k - 1}
         |    UNION ALL
         |    SELECT e.dst, d.d + 1 FROM e JOIN d${k - 1} d ON e.src = d.pk)
         |  GROUP BY pk)""".stripMargin
    }
    ((head +: rounds).mkString(",\n")) +
      s"\nSELECT pk AS p_partkey, d AS hops FROM d$BfsRounds ORDER BY p_partkey"
  }

  /** Co-purchase k-core ([[graft.ops.Graph.kCore]]): the dense kernel of
    * the basket graph after `KCoreRounds` peels at k = ¾ of the average
    * degree — data-derived so the threshold tracks scale (a fixed
    * absolute k either never peels or empties the graph as SF grows; ¾
    * of average peels meaningfully at every SF, measured in SCALE.md).
    * k is one bounded scalar aggregate on the driver; the oracle derives
    * the SAME k in SQL, so both engines run the identical peel. Integer
    * end-to-end.
    */
  val KCoreRounds = 4

  val kCoreQ: Q = (s, dir) => {
    val items = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk"))
      .distinct()
    val edges = items.as("a").join(items.as("b"),
        col("a.okey") === col("b.okey") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct()
    val mn = edges.agg(count(lit(1)).as("m"),
      countDistinct(col("src")).as("n")).head()
    // empty graph ⇒ no nodes to peel; k=1 keeps the op total, output empty
    val k = if (mn.getLong(1) == 0L) 1
      else ((mn.getLong(0) / mn.getLong(1)) * 3 / 4).toInt.max(1)
    graft.ops.Graph.kCore(edges, k, rounds = KCoreRounds)
      .select(col("id").as("p_partkey"), col("core_deg"))
      .orderBy(col("p_partkey"))
  }

  val kCoreSql: String = {
    val head =
      """WITH i AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
        |           FROM lineitem),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS src, b.pk AS dst
        |      FROM i a JOIN i b ON a.okey = b.okey AND a.pk <> b.pk),
        |kk AS (SELECT (count(*) // count(DISTINCT src)) * 3 // 4 AS k
        |       FROM e0)""".stripMargin
    val rounds = (1 to KCoreRounds).map { r =>
      s"""k$r AS MATERIALIZED (SELECT src FROM e${r - 1}
         |  GROUP BY src HAVING count(*) >= (SELECT k FROM kk)),
         |e$r AS MATERIALIZED (SELECT e.src, e.dst FROM e${r - 1} e
         |  JOIN k$r a ON e.src = a.src JOIN k$r b ON e.dst = b.src)""".stripMargin
    }
    ((head +: rounds).mkString(",\n")) +
      s"""\nSELECT src AS p_partkey, count(*) AS core_deg
         |FROM e$KCoreRounds GROUP BY src ORDER BY p_partkey""".stripMargin
  }

  /** First-order event-transition census (the Markov-chain counterpart
    * of q138's funnel: what actually follows what, per user stream):
    * lead() over the deterministic (ts, event_id) per-user order, then a
    * (from, to) count and an exact-ratio transition probability. One
    * window pass + one types²-bounded aggregation; the totals join is a
    * broadcast of ≤ |event_types| rows. The probability is a SINGLE
    * long/long division (correctly rounded identically on both engines)
    * — no cross-row float accumulation.
    */
  val eventTransitions: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(s, dir)
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    val counts = steps.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("tot").cast("double"), 6).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val eventTransitionsSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |             CAST(ts AS TIMESTAMP) AS ts FROM events),
      |s AS (SELECT user_id, event_type AS from_type,
      |        lead(event_type) OVER (PARTITION BY user_id
      |          ORDER BY ts, event_id) AS to_type
      |      FROM e),
      |c AS (SELECT from_type, to_type, count(*) AS n FROM s
      |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.n,
      | round(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS p
      |FROM c JOIN t USING (from_type)
      |ORDER BY c.from_type, c.to_type""".stripMargin

  /** Corpus datasheet (the "dataset card" numbers a training corpus
    * ships with — Gebru '18's datasheet headline row): ONE aggregation
    * pass for docs/tokens/chars/means plus a langs-bounded entropy
    * term. Float discipline: mean quality is the decSum contract;
    * language entropy follows q126 — each per-lang −p·ln p term is
    * rounded to 8 places → DECIMAL before the (exact) sum, because
    * ln's libm ulps are the only cross-engine float hazard here.
    */
  val corpusDatasheet: Q = (s, dir) => {
    val docs = Dedup.pin(t(s, dir, "documents").select(
      col("doc_id"), col("lang"), col("source"),
      TextStats.tokenCount(col("text")).cast("long").as("n_tok"),
      length(col("text")).cast("long").as("n_chars"),
      TextStats.qualityScore(col("text")).as("q")))
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(col("n_tok")).as("n_tokens"),
      sum(col("n_chars")).as("n_chars"),
      round(decSum(col("q"), 6) / count(lit(1)), 4).as("mean_quality"))
    val lc = Dedup.pin(docs.groupBy(col("lang")).agg(count(lit(1)).as("c")))
    val ent = lc.crossJoin(broadcast(lc.agg(sum(col("c")).as("tot"))))
      .select(round(-log(col("c").cast("double") / col("tot").cast("double"))
          * col("c").cast("double") / col("tot").cast("double"), 8)
        .cast("decimal(18,8)").as("term"))
      .agg(sum(col("term")).cast("double").as("lang_entropy"))
    base.crossJoin(broadcast(ent))
  }

  val corpusDatasheetSql: String =
    """WITH s AS (SELECT doc_id, lang, source,
      |    CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    CAST(length(text) AS BIGINT) AS nc,
      |    round(
      |      least(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) / 50.0, 1.0) * 0.4
      |    + (1.0 - least(CAST(length(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
      |        / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)) * 0.3
      |    + least(CAST(length(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
      |        / greatest(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 4.0, 1.0) * 0.3,
      |    6) AS q
      |  FROM documents),
      |base AS (SELECT count(*) AS n_docs,
      |    count(DISTINCT lang) AS n_langs,
      |    count(DISTINCT source) AS n_sources,
      |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |    CAST(sum(nc) AS BIGINT) AS n_chars,
      |    round(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4)
      |      AS mean_quality
      |  FROM s),
      |lc AS (SELECT lang, count(*) AS c FROM s GROUP BY lang),
      |tot AS (SELECT sum(c) AS tot FROM lc),
      |ent AS (SELECT CAST(sum(CAST(round(
      |      -ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
      |        * CAST(c AS DOUBLE) / CAST(tot AS DOUBLE), 8)
      |    AS DECIMAL(18,8))) AS DOUBLE) AS lang_entropy FROM lc, tot)
      |SELECT * FROM base CROSS JOIN ent""".stripMargin

  /** Robust per-source quality outliers (median/MAD — Hampel '74's
    * estimator, the 3-MAD rule of Leys '13): per source, the LOWER
    * median (the actual data value at rank ⌈n/2⌉ — no interpolation, so
    * both engines select the same 6-decimal score) via one row_number
    * window, the MAD the same way over absolute deviations, then a
    * 3·MAD outlier count. The windows shuffle only (source, q) pairs —
    * never text — and parallelize across sources; the median/MAD frames
    * are source-bounded broadcasts. Exact rank-select is the gate
    * contract; at 100 TB the same shape runs with approx_percentile per
    * group (sketch, no per-group sort) — the documented trade.
    */
  val madOutliers: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val scored = Dedup.pin(t(s, dir, "documents")
      .select(col("source"), TextStats.qualityScore(col("text")).as("q")))
    val counts = scored.groupBy(col("source")).agg(count(lit(1)).as("n"))
    // (n+1)/2 in double then truncate: exact for any realistic n (< 2^52)
    val kth = ((col("n") + 1) / 2).cast("long")
    val meds = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("q"))))
      .join(broadcast(counts), Seq("source"))
      .filter(col("rn") === kth)
      .select(col("source"), col("q").as("med_q"))
    val dev = Dedup.pin(scored.join(broadcast(meds), Seq("source"))
      .select(col("source"), col("med_q"),
        abs(col("q") - col("med_q")).as("ad")))
    val mads = dev
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("ad"))))
      .join(broadcast(counts), Seq("source"))
      .filter(col("rn") === kth)
      .select(col("source"), col("ad").as("mad_q"))
    dev.join(broadcast(mads), Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("med_q")).as("med_q"), max(col("mad_q")).as("mad_q"),
        sum(when(col("ad") > col("mad_q") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(col("source"))
  }

  val madOutliersSql: String = {
    val qExpr =
      """round(
        |      least(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) / 50.0, 1.0) * 0.4
        |    + (1.0 - least(CAST(length(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
        |        / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)) * 0.3
        |    + least(CAST(length(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
        |        / greatest(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 4.0, 1.0) * 0.3,
        |    6)""".stripMargin
    s"""WITH s AS (SELECT source, $qExpr AS q FROM documents),
       |n AS (SELECT source, count(*) AS n FROM s GROUP BY source),
       |r AS (SELECT source, q,
       |    row_number() OVER (PARTITION BY source ORDER BY q) AS rn FROM s),
       |med AS (SELECT r.source, r.q AS med_q FROM r JOIN n USING (source)
       |        WHERE rn = (n + 1) // 2),
       |d AS (SELECT s.source, m.med_q, abs(s.q - m.med_q) AS ad
       |      FROM s JOIN med m USING (source)),
       |r2 AS (SELECT source, ad,
       |    row_number() OVER (PARTITION BY source ORDER BY ad) AS rn FROM d),
       |mad AS (SELECT r2.source, r2.ad AS mad_q FROM r2 JOIN n USING (source)
       |        WHERE rn = (n + 1) // 2)
       |SELECT d.source, count(*) AS n_docs, max(d.med_q) AS med_q,
       | max(m.mad_q) AS mad_q,
       | CAST(sum(CASE WHEN d.ad > m.mad_q * 3 THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_outliers
       |FROM d JOIN mad m USING (source)
       |GROUP BY d.source ORDER BY d.source""".stripMargin
  }

  /** Cross-source leakage matrix: for every unordered source pair, how
    * many distinct character 13-grams (q91's contamination granularity)
    * the two slices share, plus the set Jaccard. The scale shape:
    * grams are md5-hashed to 60-bit longs BEFORE the distinct — the
    * shuffles carry (source, 8-byte hash), never text — and the
    * per-source DISTINCT bounds the gram-keyed self-join's fan-out at
    * |sources| rows per gram (the q23/q165 sparse-join discipline: pair
    * work is proportional to genuinely-shared grams, nothing all-pairs).
    * Output is sources²-bounded. Hash collisions are deterministic and
    * identical on both engines, so the gate is exact.
    */
  val crossSourceOverlap: Q = (s, dir) => {
    val grams = Dedup.pin(t(s, dir, "documents")
      .filter(length(col("text")) >= 13)
      .select(col("source"),
        explode(TextStats.charNgrams(col("text"), 13)).as("gram"))
      .select(col("source"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long")
          .as("gh"))
      .distinct())
    val totals = grams.groupBy(col("source")).agg(count(lit(1)).as("ng"))
    val shared = grams.as("a").join(grams.as("b"),
        col("a.gh") === col("b.gh") && col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("sh"))
    val ta = totals.select(col("source").as("src_a"), col("ng").as("grams_a"))
    val tb = totals.select(col("source").as("src_b"), col("ng").as("grams_b"))
    ta.crossJoin(tb).filter(col("src_a") < col("src_b"))
      .join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("grams_a"), col("grams_b"),
        coalesce(col("sh"), lit(0L)).as("n_shared"),
        round(coalesce(col("sh"), lit(0L)).cast("double") /
          (col("grams_a") + col("grams_b") - coalesce(col("sh"), lit(0L)))
            .cast("double"), 6).as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val crossSourceOverlapSql: String =
    """WITH d0 AS (SELECT source, text FROM documents WHERE length(text) >= 13),
      |pos AS (SELECT source, text,
      |    unnest(generate_series(1, length(text)-12)) AS i FROM d0),
      |g AS (SELECT DISTINCT source,
      |    ('0x'||substr(md5(substr(text, CAST(i AS INTEGER), 13)),1,15))::BIGINT
      |      AS gh FROM pos),
      |tot AS (SELECT source, count(*) AS ng FROM g GROUP BY source),
      |sh AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS sh
      |       FROM g a JOIN g b ON a.gh = b.gh AND a.source < b.source
      |       GROUP BY 1, 2)
      |SELECT ta.source AS src_a, tb.source AS src_b,
      | ta.ng AS grams_a, tb.ng AS grams_b,
      | CAST(coalesce(sh.sh, 0) AS BIGINT) AS n_shared,
      | round(CAST(coalesce(sh.sh, 0) AS DOUBLE)
      |   / CAST(ta.ng + tb.ng - coalesce(sh.sh, 0) AS DOUBLE), 6) AS jaccard
      |FROM tot ta JOIN tot tb ON ta.source < tb.source
      |LEFT JOIN sh ON sh.src_a = ta.source AND sh.src_b = tb.source
      |ORDER BY src_a, src_b""".stripMargin

  /** Per-source distribution divergence (the data-mixing diagnostic
    * DSIR's importance weights aggregate over): KL(source ‖ corpus)
    * under Laplace-smoothed hashed-bigram models — the SAME feature
    * space as q156, rolled up per source instead of per document. The
    * full B-bucket grid (observed or not — smoothing gives every bucket
    * mass) is sources×1024, a dimension table; the corpus model is a
    * ≤B-row broadcast. Float discipline: each p·ln(p/q) term is rounded
    * to 8 places → DECIMAL before the exact per-source sum (the q126
    * contract — ln's libm ulps are the only cross-engine hazard).
    */
  val sourceDivergence: Q = (s, dir) => {
    val B = 1024
    val feats = Dedup.pin(t(s, dir, "documents")
      .select(col("source"), TextStats.tokens(lower(col("text"))).as("tok"))
      .filter(size(col("tok")) >= 2)
      .select(col("source"), explode(TextStats.wordBigrams(col("tok"))).as("g"))
      .select(col("source"),
        (conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long") % B)
          .as("b")))
    val srcCounts = feats.groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("cs"))
    val srcTotals = feats.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val corpusCounts = feats.groupBy(col("b")).agg(count(lit(1)).as("cb"))
    val corpusTotal = feats.agg(count(lit(1)).as("n"))
    val ps = (coalesce(col("cs"), lit(0L)) + 1).cast("double") /
      (col("ns") + B).cast("double")
    val pc = (coalesce(col("cb"), lit(0L)) + 1).cast("double") /
      (col("n") + B).cast("double")
    srcTotals
      .select(col("source"), col("ns"),
        explode(sequence(lit(0L), lit((B - 1).toLong))).as("b"))
      .join(srcCounts, Seq("source", "b"), "left")
      .join(broadcast(corpusCounts), Seq("b"), "left")
      .crossJoin(broadcast(corpusTotal))
      .select(col("source"), col("ns"),
        round(ps * log(ps / pc), 8).cast("decimal(18,8)").as("term"))
      .groupBy(col("source"))
      .agg(max(col("ns")).as("n_grams"),
        sum(col("term")).cast("double").as("kl"))
      .orderBy(col("source"))
  }

  val sourceDivergenceSql: String =
    """WITH toks AS (SELECT source,
      |    regexp_extract_all(lower(text), '\S+') AS tok FROM documents
      |  WHERE length(regexp_extract_all(lower(text), '\S+')) >= 2),
      |g AS (SELECT source, unnest(list_transform(generate_series(1, len(tok)-1),
      |    i -> tok[i] || ' ' || tok[i+1])) AS g FROM toks),
      |f AS (SELECT source,
      |    ('0x'||substr(md5(g),1,15))::BIGINT % 1024 AS b FROM g),
      |sc AS (SELECT source, b, count(*) AS cs FROM f GROUP BY 1, 2),
      |st AS (SELECT source, count(*) AS ns FROM f GROUP BY 1),
      |cc AS (SELECT b, count(*) AS cb FROM f GROUP BY 1),
      |ct AS (SELECT count(*) AS n FROM f),
      |grid AS (SELECT st.source, st.ns, gs.b FROM st
      |  CROSS JOIN (SELECT unnest(generate_series(0, 1023)) AS b) gs),
      |terms AS (SELECT grid.source, grid.ns,
      |   CAST(round(
      |     (CAST(coalesce(sc.cs, 0) + 1 AS DOUBLE) / CAST(grid.ns + 1024 AS DOUBLE)) *
      |     ln((CAST(coalesce(sc.cs, 0) + 1 AS DOUBLE) / CAST(grid.ns + 1024 AS DOUBLE)) /
      |        (CAST(coalesce(cc.cb, 0) + 1 AS DOUBLE) / CAST(ct.n + 1024 AS DOUBLE))), 8)
      |   AS DECIMAL(18,8)) AS term
      |   FROM grid LEFT JOIN sc ON sc.source = grid.source AND sc.b = grid.b
      |   LEFT JOIN cc ON cc.b = grid.b, ct)
      |SELECT source, max(ns) AS n_grams, CAST(sum(term) AS DOUBLE) AS kl
      |FROM terms GROUP BY source ORDER BY source""".stripMargin

  /** Conversion-latency distribution: per user, first 'view' → first
    * LATER 'purchase' in exact integer microseconds, then the exact
    * discrete quartiles (percentile_disc — actual data values, q86's
    * contract) plus the exact-integer mean. One filtered user-keyed
    * aggregation (two conditional mins in a single pass) + one global
    * reduce over the converted-user latencies — linear, text-free, and
    * the integer microsecond arithmetic is bit-exact cross-engine.
    */
  val timeToConvert: Q = (s, dir) => {
    val firsts = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view",
          unix_micros(col("ts")))).as("v"),
        min(when(col("event_type") === "purchase",
          unix_micros(col("ts")))).as("p"))
      .filter(col("v").isNotNull && col("p").isNotNull && col("p") > col("v"))
      .select((col("p") - col("v")).as("lat_us"))
    firsts.agg(
      count(lit(1)).as("n_users"),
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY lat_us)")
        .cast("long").as("p25_us"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_us)")
        .cast("long").as("p50_us"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY lat_us)")
        .cast("long").as("p75_us"),
      round(sum(col("lat_us")).cast("double") / count(lit(1)) / lit(1000000.0), 6)
        .as("mean_s"))
  }

  val timeToConvertSql: String =
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |u AS (SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
      |  FROM e GROUP BY user_id),
      |lat AS (SELECT p - v AS lat_us FROM u
      |  WHERE v IS NOT NULL AND p IS NOT NULL AND p > v)
      |SELECT count(*) AS n_users,
      | CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY lat_us) AS BIGINT) AS p25_us,
      | CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_us) AS BIGINT) AS p50_us,
      | CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY lat_us) AS BIGINT) AS p75_us,
      | round(CAST(sum(lat_us) AS DOUBLE) / count(*) / 1000000.0, 6) AS mean_s
      |FROM lat""".stripMargin

  /** Pareto (skyline) frontier of user activity — points (n_events,
    * total_value) per user, keep the non-dominated set (Börzsönyi '01's
    * skyline operator). The textbook formulation is the quadratic
    * NOT-EXISTS dominance self-join; the engine runs the O(n log n)
    * sweep instead: distinct points sorted (x DESC, y DESC), a point
    * survives iff its y strictly exceeds the running max y over all
    * preceding points (every preceding point has larger x, or equal x
    * and larger y — exactly its candidate dominators). One narrow sort
    * over the DISTINCT point set, one window pass, no self-join. At
    * 100 TB the same shape runs behind a per-partition local skyline
    * first (Pareto filtering is distributive — each partition discards
    * its own dominated points, and the global pass sees only the union
    * of local frontiers). Oracle: the independent NOT EXISTS dominance
    * formulation — equivalence of strategies, not a transcription.
    */
  val skylineUsers: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val pts = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        decSum(col("value"), 2).as("total_value"))
      .groupBy(col("n_events"), col("total_value"))
      .agg(count(lit(1)).as("n_users"), min(col("user_id")).as("min_user"))
    val sweep = Window
      .orderBy(col("n_events").desc, col("total_value").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pts.withColumn("rmax", max(col("total_value")).over(sweep))
      .filter(col("rmax").isNull || col("total_value") > col("rmax"))
      .select(col("n_events"), col("total_value"), col("n_users"),
        col("min_user"))
      .orderBy(col("n_events").desc, col("total_value").desc)
  }

  val skylineUsersSql: String =
    """WITH u AS (SELECT user_id, count(*) AS n_events,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |  FROM events GROUP BY user_id),
      |p AS (SELECT n_events, total_value, count(*) AS n_users,
      |    min(user_id) AS min_user
      |  FROM u GROUP BY n_events, total_value)
      |SELECT n_events, total_value, n_users, min_user FROM p
      |WHERE NOT EXISTS (SELECT 1 FROM p q
      |  WHERE q.n_events >= p.n_events AND q.total_value >= p.total_value
      |    AND (q.n_events > p.n_events OR q.total_value > p.total_value))
      |ORDER BY n_events DESC, total_value DESC""".stripMargin

  /** Collocation mining by pointwise mutual information (Church &
    * Hanks '90): PMI(w1,w2) = ln(p(w1 w2) / (p(w1)·p(w2))) over adjacent
    * word bigrams, min count 5, top 40. Three hash aggregations (unigram
    * counts, bigram counts, two scalar totals) — the explode fan-out is
    * absorbed by map-side partial agg before any shuffle, and the
    * bigram⋈unigram count joins carry only (token, count) pairs, never
    * text. The PMI argument is an exact integer ratio pushed through one
    * double division, so both engines evaluate bit-identical input to
    * ln; round(…, 6) absorbs any last-ulp libm difference (the q163
    * entropy discipline). Scales: vocab-bounded join sides, corpus-
    * linear everything else.
    */
  val pmiCollocations: Q = (s, dir) => {
    val toks = Dedup.pin(t(s, dir, "documents")
      .select(TextStats.tokens(lower(col("text"))).as("tok")))
    val uni = toks.select(explode(col("tok")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val nu = toks.agg(sum(size(col("tok"))).as("nu"))
    val m = toks.filter(size(col("tok")) >= 2)
      .agg(sum(size(col("tok")) - 1).as("m"))
    val big = toks.filter(size(col("tok")) >= 2)
      .select(explode(TextStats.wordBigrams(col("tok"))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= 5)
      .select(split_part(col("bigram"), lit(" "), lit(1)).as("w1"),
        split_part(col("bigram"), lit(" "), lit(2)).as("w2"),
        col("c12"))
    big
      .join(uni.select(col("w").as("w1"), col("c1").as("c1a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c1").as("c1b")), Seq("w2"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(m))
      .select(col("w1"), col("w2"), col("c12"),
        round(log(col("c12").cast("double") * col("nu") * col("nu") /
          (col("m").cast("double") * col("c1a") * col("c1b"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(40)
  }

  val pmiCollocationsSql: String =
    """WITH toks AS (SELECT regexp_extract_all(lower(text), '\S+') AS tok
      |  FROM documents),
      |u AS (SELECT w, count(*) AS c1
      |  FROM (SELECT unnest(tok) AS w FROM toks) GROUP BY w),
      |nu AS (SELECT CAST(sum(len(tok)) AS BIGINT) AS nu FROM toks),
      |m AS (SELECT CAST(sum(len(tok) - 1) AS BIGINT) AS m FROM toks
      |  WHERE len(tok) >= 2),
      |b AS (SELECT unnest(list_transform(generate_series(1, len(tok)-1),
      |    i -> tok[i] || ' ' || tok[i+1])) AS bigram
      |  FROM toks WHERE len(tok) >= 2),
      |bg AS (SELECT split_part(bigram, ' ', 1) AS w1,
      |    split_part(bigram, ' ', 2) AS w2, count(*) AS c12
      |  FROM b GROUP BY bigram HAVING count(*) >= 5)
      |SELECT w1, w2, c12,
      |  round(ln(CAST(c12 AS DOUBLE) * nu * nu
      |    / (CAST(m AS DOUBLE) * ua.c1 * ub.c1)), 6) AS pmi
      |FROM bg
      |JOIN u ua ON ua.w = bg.w1
      |JOIN u ub ON ub.w = bg.w2
      |CROSS JOIN nu CROSS JOIN m
      |ORDER BY pmi DESC, w1, w2 LIMIT 40""".stripMargin

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis '06,
    * algorithm A-Res): each document draws key = ln(u)/w for a uniform
    * u ∈ (0,1) and weight w (= n_chars); the k largest keys are an exact
    * weighted sample without replacement. u is a deterministic
    * Knuth-multiplicative residue of doc_id mod the prime 1e9+7 so both
    * engines draw the identical variate. The top-k lands on Spark's
    * TakeOrderedAndProject — a size-k heap per partition, then a driver
    * merge of partitions×k rows — which IS distributed A-Res (each
    * executor keeps only its local reservoir; nothing global is sorted).
    * At 100 TB: k·n_partitions rows cross the wire, the corpus never
    * shuffles.
    */
  val weightedSample: Q = (s, dir) => {
    val keyed = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("double").as("w"))
      .withColumn("u",
        ((col("doc_id") * lit(2654435761L) + lit(1L)) % lit(1000000007L))
          .cast("double") / lit(1000000007.0))
      .withColumn("es_key", log(col("u")) / col("w"))
    keyed.orderBy(col("es_key").desc, col("doc_id")).limit(100)
      .select(col("doc_id"), col("w").cast("long").as("w"),
        round(col("es_key"), 9).as("es_key"))
      .orderBy(col("doc_id"))
  }

  val weightedSampleSql: String =
    """WITH kd AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
      |    CAST((doc_id * 2654435761 + 1) % 1000000007 AS DOUBLE)
      |      / 1000000007.0 AS u
      |  FROM documents),
      |sel AS (SELECT doc_id, w, ln(u) / w AS es_key FROM kd
      |  ORDER BY es_key DESC, doc_id LIMIT 100)
      |SELECT doc_id, CAST(w AS BIGINT) AS w, round(es_key, 9) AS es_key
      |FROM sel ORDER BY doc_id""".stripMargin

  /** Incremental aggregate-state maintenance (the materialized-view /
    * partial-agg merge pattern every periodic-reload pipeline needs once
    * full recompute stops fitting the window): day-1 computes per-source
    * ALGEBRAIC partials — count, Σtok, Σtok² (for variance), Σchars,
    * min/max id, all exact integers — and persists them as a state table
    * bounded by |sources|; the day-2 refresh scans ONLY the delta batch,
    * computes the same partials, and merges state ⊎ delta with the
    * aggregates' own merge functions (sum-of-sums, min-of-mins,
    * max-of-maxes). Non-mergeable reports (mean, population variance)
    * derive at the end from merged sums only — the algebraic
    * decomposition that makes the merge exact. The oracle recomputes from
    * the full corpus, so a dropped delta row, a double merge, or a
    * non-mergeable state column all break the hash. Scale shape: day-2
    * cost is O(delta) + a |sources|-row merge — the 100 TB day-1 corpus
    * is never rescanned; the derived doubles divide exact integers with
    * the same operation order on both engines.
    */
  val incrementalAgg: Q = (s, dir) => {
    val d = t(s, dir, "documents")
    def partials(df: DataFrame): DataFrame = df
      .select(col("source"),
        TextStats.tokenCount(col("text")).cast("long").as("tc"),
        col("n_chars"), col("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tc")).as("s_tok"),
        sum(col("tc") * col("tc")).as("ss_tok"),
        sum(col("n_chars")).as("s_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
    val stateDir =
      scratch("graft_aggstate").toString
    Writers.parquet(partials(d.filter(col("doc_id") % 3 =!= 0)), stateDir)
    Readers.parquet(s, stateDir)
      .unionByName(partials(d.filter(col("doc_id") % 3 === 0)))
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("s_tok")).as("s_tok"),
        sum(col("ss_tok")).as("ss_tok"),
        sum(col("s_chars")).as("s_chars"),
        min(col("min_doc")).as("min_doc"),
        max(col("max_doc")).as("max_doc"))
      .select(col("source"), col("n_docs"), col("s_tok"), col("s_chars"),
        col("min_doc"), col("max_doc"),
        round(col("s_tok").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_tok"),
        round((col("ss_tok").cast("double")
            - col("s_tok").cast("double") * col("s_tok").cast("double")
              / col("n_docs").cast("double"))
          / col("n_docs").cast("double"), 6).as("var_tok"))
      .orderBy(col("source"))
  }

  val incrementalAggSql: String =
    """WITH d AS (SELECT source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tc,
      |    n_chars, doc_id FROM documents)
      |SELECT source, count(*) AS n_docs,
      | CAST(sum(tc) AS BIGINT) AS s_tok,
      | CAST(sum(n_chars) AS BIGINT) AS s_chars,
      | min(doc_id) AS min_doc, max(doc_id) AS max_doc,
      | round(CAST(sum(tc) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_tok,
      | round((CAST(sum(tc*tc) AS DOUBLE)
      |   - CAST(sum(tc) AS DOUBLE) * CAST(sum(tc) AS DOUBLE)
      |     / CAST(count(*) AS DOUBLE))
      |   / CAST(count(*) AS DOUBLE), 6) AS var_tok
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** Last-touch attribution (the standard marketing-analytics credit
    * assignment, and a timestamped as-of probe distinct from q38's
    * bid/ask as-of join): every purchase is attributed to the SAME
    * user's most recent strictly-preceding view, bucketed by view→buy
    * latency (<1 h, 1–24 h, 24–72 h, stale, or organic when no view
    * precedes). One window pass in deterministic (ts, event_id) order
    * carries the running max view-time per user — no self-join, no
    * per-purchase scan-back; exact integer microsecond arithmetic end
    * to end (q167's discipline). Scale shape: the window shuffles the
    * events table once on user_id; revenue sums go per-value DECIMAL.
    */
  val lastTouch: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("last_view_us",
        max(when(col("event_type") === "view", col("us"))).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("bucket",
        when(col("last_view_us").isNull, "organic")
          .when(col("us") - col("last_view_us") <= 3600L * 1000000L, "a_lt_1h")
          .when(col("us") - col("last_view_us") <= 86400L * 1000000L, "b_1h_24h")
          .when(col("us") - col("last_view_us") <= 259200L * 1000000L, "c_24h_72h")
          .otherwise("d_stale"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_purchases"),
        decSum(col("value"), 2).as("revenue"),
        min(col("event_id")).as("min_event"))
      .orderBy(col("bucket"))
  }

  val lastTouchSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |a AS (SELECT *, max(CASE WHEN event_type = 'view' THEN us END)
      |    OVER (PARTITION BY user_id ORDER BY us, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
      |  FROM e),
      |p AS (SELECT CASE WHEN lv IS NULL THEN 'organic'
      |    WHEN us - lv <= 3600000000 THEN 'a_lt_1h'
      |    WHEN us - lv <= 86400000000 THEN 'b_1h_24h'
      |    WHEN us - lv <= 259200000000 THEN 'c_24h_72h'
      |    ELSE 'd_stale' END AS bucket, value, event_id
      |  FROM a WHERE event_type = 'purchase')
      |SELECT bucket, count(*) AS n_purchases,
      | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      | min(event_id) AS min_event
      |FROM p GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Exact heavy hitters through a Misra–Gries candidate pass (the
    * bounded-state frequent-items pattern for streams/corpora where a
    * full token groupBy's map side would still emit every distinct
    * token): pass 1 folds the token stream into the custom
    * [[graft.functions.Aggregators.MisraGries]] TypedColumn — O(k)
    * state per partition, O(k) over the wire, guaranteed superset of
    * every item above N/k — and pass 2 re-counts ONLY the ≤ k
    * candidates (broadcast join) and filters on the EXACT counts
    * (share > 0.5%, k = 256 > 1/θ, so the sketch provably missed
    * nothing). The final output is exact and order-independent even
    * though the intermediate candidate set is not — which is why the
    * oracle can be the plain exact formulation. Scale shape: two
    * linear scans, no token-keyed shuffle wider than the candidate
    * list.
    */
  val heavyHitters: Q = (s, dir) => {
    val toks = Dedup.pin(t(s, dir, "documents")
      .select(explode(TextStats.tokens(lower(col("text")))).as("w")))
    val cand = toks
      .agg(graft.functions.Aggregators.misra_gries_256(col("w")).as("cs"))
      .select(explode(split(col("cs"), " ")).as("w"))
      .filter(col("w") =!= "")
    val total = toks.agg(count(lit(1)).as("n"))
    toks.join(broadcast(cand), Seq("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * 200 > col("n"))
      .select(col("w"), col("cnt"),
        round(col("cnt").cast("double") / col("n").cast("double"), 6)
          .as("share"))
      .orderBy(col("cnt").desc, col("w"))
  }

  val heavyHittersSql: String =
    """WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS w
      |  FROM documents),
      |n AS (SELECT count(*) AS n FROM tok),
      |c AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w)
      |SELECT w, cnt,
      | round(CAST(cnt AS DOUBLE) / CAST(n.n AS DOUBLE), 6) AS share
      |FROM c, n WHERE cnt * 200 > n.n
      |ORDER BY cnt DESC, w""".stripMargin

  /** RFM segmentation (recency / frequency / monetary quintiles — the
    * classic customer-value grid): one events pass builds the per-user
    * triple (last-activity time, purchase count, DECIMAL purchase
    * value), each dimension is cut into quintiles by ntile(5) in a
    * deterministic total order (metric desc, user_id tiebreak), and the
    * 125-cell grid reports population and value per segment. The
    * quintile cuts rank the USER table (corpus-sublinear; the events
    * table itself is reduced first) through the two-phase
    * [[Ranks.globalRowNumber]] + [[Ranks.ntileFromRank]] arithmetic —
    * exact SQL-ntile semantics (including deterministic tie-splitting
    * by user_id, which percentile thresholds could NOT reproduce)
    * with NO single-partition window: each dimension is a P-way range
    * shuffle, spill-safe at billions of users (r7 verdict item #5).
    */
  val rfmSegments: Q = (s, dir) => {
    val per = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        coalesce(sum(when(col("event_type") === "purchase", 1L)), lit(0L))
          .as("freq"),
        coalesce(sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(18,2)"))),
          lit(0).cast("decimal(18,2)")).as("mon"))
    // pin the per-user aggregate: the rank range shuffle AND its
    // bounds-sampling job read this frame — uncached, the events
    // scan+agg would recompute per consumer (r8 verdict item #1)
    val pinned = Dedup.pin(per)
    val nTot = pinned.agg(count(lit(1)).as("n_tot"))
    // ONE range shuffle ranks all three dimensions: unpivot to
    // (metric, value) rows on a common exact DECIMAL sort key (longs
    // and DECIMAL(18,2) both embed losslessly in DECIMAL(38,6)), take
    // a single global row_number ordered (metric, value DESC, user),
    // and rebase each metric's ranks by its min — contiguous because
    // metric is the leading sort key. Replaces three chained
    // two-phase rank stages (3 range shuffles + 3 bounded collects)
    // with one of each (r8 verdict item #1 follow-through).
    val tall = pinned.selectExpr("user_id",
      """stack(3,
        | 'r', CAST(last_us AS DECIMAL(38,6)),
        | 'f', CAST(freq    AS DECIMAL(38,6)),
        | 'm', CAST(mon     AS DECIMAL(38,6))) AS (metric, mval)"""
        .stripMargin)
    val ranked = Ranks.globalRowNumber(tall,
      Seq(col("metric"), col("mval").desc, col("user_id")), "grk",
      numPartitions = 32)
    val mins = ranked.groupBy(col("metric")).agg(min(col("grk")).as("mrk"))
    val tiles = ranked.join(broadcast(mins), Seq("metric"))
      .crossJoin(broadcast(nTot))
      .withColumn("tile", Ranks.ntileFromRank(
        col("grk") - col("mrk") + lit(1L), col("n_tot"), 5))
    tiles
      .groupBy(col("user_id"))
      .agg(max(when(col("metric") === "r", col("tile"))).as("r"),
        max(when(col("metric") === "f", col("tile"))).as("f"),
        max(when(col("metric") === "m", col("tile"))).as("m"),
        max(when(col("metric") === "m", col("mval"))).as("mon"))
      .groupBy(col("r"), col("f"), col("m"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("mon")).cast("double").as("total_mon"),
        min(col("user_id")).as("min_user"))
      .orderBy(col("r"), col("f"), col("m"))
  }

  val rfmSegmentsSql: String =
    """WITH per AS (SELECT user_id,
      |    max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us,
      |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
      |      AS BIGINT) AS freq,
      |    coalesce(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS mon
      |  FROM events GROUP BY user_id),
      |sc AS (SELECT user_id, mon,
      |    CAST(ntile(5) OVER (ORDER BY last_us DESC, user_id) AS INTEGER) AS r,
      |    CAST(ntile(5) OVER (ORDER BY freq DESC, user_id) AS INTEGER) AS f,
      |    CAST(ntile(5) OVER (ORDER BY mon DESC, user_id) AS INTEGER) AS m
      |  FROM per)
      |SELECT r, f, m, count(*) AS n_users,
      | CAST(sum(mon) AS DOUBLE) AS total_mon, min(user_id) AS min_user
      |FROM sc GROUP BY r, f, m ORDER BY r, f, m""".stripMargin

  /** Product quantization (Jégou, Douze & Schmid '11, "Product
    * Quantization for Nearest Neighbor Search"): the 64-dim embedding
    * splits into m=4 independent 16-dim subspaces, each quantized
    * against its own 16-entry codebook — a 4-byte code per vector (64×
    * compression) — and the query audits occupancy and reconstruction
    * error per (subspace, code) cell, the codebook-health report a PQ
    * index build emits. All arithmetic is exact integers: floats land
    * on a 1e3 grid once (float→double is exact; the scaled round is
    * half-away-from-zero on both engines), distances are Σ(a−b)² longs,
    * and the argmin tie-breaks on the smaller code via a lexicographic
    * struct min — bit-identical cross-engine. The codebook is the 16
    * lowest-id vectors (the deterministic sampled-codebook convention
    * of q40/q155; k-means training would swap ONLY the literal). Scale
    * shape: the codebook is k×dim driver literals (bounded by the
    * codebook, never the corpus); the corpus pass is one narrow
    * projection evaluating 4×16 codegen'd integer distances per row —
    * no join, no shuffle until the ≤ m·k-cell final aggregation.
    */
  val productQuantize: Q = (s, dir) => {
    val M = 4; val SUB = 16; val K = 16
    val qv = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val base = t(s, dir, "embeddings").select(col("vec_id"), qv.as("qv"))
    val codebook: Array[Array[Long]] = base.orderBy(col("vec_id")).limit(K)
      .collect().map(_.getSeq[Long](1).toArray)
    if (codebook.isEmpty) {
      // empty corpus → empty codebook: emit the schema, zero rows
      base.select(lit(0).as("subspace"), lit(0).as("code"),
        lit(0L).as("n_vectors"), lit(0L).as("total_sqerr"),
        col("vec_id").as("min_vec")).limit(0)
    } else {
      // One scan, HOF distances over a typed-literal K×dim codebook. The
      // first cut — a per-(subspace, code) hand-unrolled getItem tree
      // unioned across subspaces — built a ~4×16×16-node expression that
      // blew past janino's method-size limit (interpreted fallback) and
      // rescanned the parquet per subspace: 4.5 s at sf0.1, an erratic
      // 12–26 s at 10×. This form (explode the 4 subspace indices cheaply,
      // then slice/zip_with/aggregate against the literal) is a compact
      // tree evaluated once per (vector, subspace): 20× faster, linear.
      val cbLit = typedLit(codebook.map(_.toSeq).toSeq)
      val dists = transform(cbLit, (cbv, ci) =>
        struct(
          aggregate(
            zip_with(
              slice(col("qv"), col("subspace") * SUB + 1, lit(SUB)),
              slice(cbv, col("subspace") * SUB + 1, lit(SUB)),
              (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d"),
          ci.as("code")))
      base
        .select(col("vec_id"), col("qv"),
          explode(typedLit(List.range(0, M))).as("subspace"))
        .select(col("vec_id"), col("subspace"), array_min(dists).as("best"))
        .groupBy(col("subspace"), col("best.code").as("code"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(col("best.d")).as("total_sqerr"),
          min(col("vec_id")).as("min_vec"))
        .orderBy(col("subspace"), col("code"))
    }
  }

  val productQuantizeSql: String =
    """WITH q AS (SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, qv
      |  FROM q ORDER BY vec_id LIMIT 16),
      |pairs AS (SELECT q.vec_id, ss.s AS subspace, cb.code,
      |    CAST(list_sum(list_transform(generate_series(1, 16),
      |      i -> (q.qv[ss.s*16 + i] - cb.qv[ss.s*16 + i])
      |         * (q.qv[ss.s*16 + i] - cb.qv[ss.s*16 + i]))) AS BIGINT) AS d
      |  FROM q
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS s) ss
      |  CROSS JOIN cb),
      |best AS (SELECT vec_id, subspace, min([d, code]) AS bc
      |  FROM pairs GROUP BY vec_id, subspace)
      |SELECT CAST(subspace AS INTEGER) AS subspace,
      | CAST(bc[2] AS INTEGER) AS code, count(*) AS n_vectors,
      | CAST(sum(bc[1]) AS BIGINT) AS total_sqerr, min(vec_id) AS min_vec
      |FROM best GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Per-document character-level Shannon entropy ('48) — the
    * compressibility proxy quality stacks use to flag keyboard-mash,
    * repeated-character, and template-like text (low entropy) without
    * running a compressor: H = Σ p·ln(1/p) over the doc's code-point
    * histogram, reported with the histogram's support size. Exact
    * cross-engine: counts are integers, each p·ln(n/c) term evaluates
    * the same two double operations on exact-integer ratios, and the
    * per-term round→DECIMAL sum (the q126/q163 float contract) makes
    * the cross-row total order-independent. Scale shape: one explode +
    * two hash aggregations keyed on (doc_id, char) then doc_id — no
    * joins wider than the per-doc histogram, linear in corpus bytes.
    */
  val charEntropy: Q = (s, dir) => {
    val counts = t(s, dir, "documents")
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(text, '([\\\\s\\\\S])')")).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
    counts.join(totals, Seq("doc_id"))
      .select(col("doc_id"), col("n"), col("n_distinct"),
        round((col("c").cast("double") / col("n").cast("double"))
            * log(col("n").cast("double") / col("c").cast("double")), 8)
          .cast("decimal(18,8)").as("term"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_cp"),
        max(col("n_distinct")).as("n_distinct"),
        sum(col("term")).cast("double").as("entropy_nats"))
      .orderBy(col("doc_id"))
  }

  val charEntropySql: String =
    """WITH ch AS (SELECT doc_id,
      |    unnest(regexp_extract_all(text, '[\s\S]')) AS ch FROM documents),
      |c AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
      |t AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
      |    count(*) AS n_distinct FROM c GROUP BY doc_id),
      |terms AS (SELECT c.doc_id, t.n, t.n_distinct,
      |    CAST(round((CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
      |      * ln(CAST(t.n AS DOUBLE) / CAST(c.c AS DOUBLE)), 8)
      |      AS DECIMAL(18,8)) AS term
      |  FROM c JOIN t USING (doc_id))
      |SELECT doc_id, max(n) AS n_cp,
      | CAST(max(n_distinct) AS BIGINT) AS n_distinct,
      | CAST(sum(term) AS DOUBLE) AS entropy_nats
      |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Streaming/batch parity gate — the first ORACLE-GATED Structured
    * Streaming query (the streaming surface was spec-only through round
    * 6): the engine runs the REAL micro-batch pipeline — file source
    * with an explicit schema, event-time watermark, tumbling-window
    * aggregate, AvailableNow trigger draining to a sink — and emits the
    * final sink table, which must hash-match a plain batch SQL oracle.
    * Complete output mode makes finite-input streaming ≡ batch (append
    * mode would withhold the trailing windows the watermark never
    * passes); summed `value` is cast to DECIMAL *before* entering the
    * stream so per-window totals are merge-order-exact across
    * micro-batches (the decSum contract, applied upstream because the
    * sum happens inside the streaming agg). The ts column goes through
    * the same layout-tolerant normalization as `Tables.events`. Scale
    * shape: watermarked window state is bounded by (watermark horizon ×
    * \|event types\|); the file source shards micro-batches by files, so
    * a 100 TB backfill streams through the identical pipeline the live
    * feed uses — the lambda-architecture unification argument, here
    * verified by hash equality instead of asserted.
    */
  val streamHourly: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}
    val srcDir = scratch("graft_stream_src")
    // stage the source into the stream dir; the table may be a single
    // parquet file (driver testdata) or a directory of parts (ScaleData)
    val srcPath = java.nio.file.Paths.get(s"$dir/events.parquet")
    if (java.nio.file.Files.isDirectory(srcPath)) {
      val listing = java.nio.file.Files.list(srcPath)
      try {
        val it = listing.iterator()
        var i = 0
        while (it.hasNext) {
          val f = it.next()
          if (f.toString.endsWith(".parquet")) {
            java.nio.file.Files.copy(f, srcDir.resolve(s"part-$i.parquet"),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            i += 1
          }
        }
      } finally listing.close()
    } else {
      java.nio.file.Files.copy(srcPath, srcDir.resolve("part-0.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsRaw = s.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsRaw),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val raw = s.readStream.schema(schema).parquet(srcDir.toString)
    val ev = (tsRaw match {
      case LongType      => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }).withColumn("value", col("value").cast("decimal(18,2)"))
    val qname = "graft_stream_hourly_sink"
    val sq = EventStreams.windowedCounts(ev, "1 hour", "2 hours")
      .writeStream.outputMode("complete").format("memory")
      .queryName(qname).trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    s.table(qname)
      .select(col("window_start"), col("event_type"), col("n_events"),
        col("total_value").cast("double").as("total_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val streamHourlySql: String =
    """WITH e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
      |    event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events)
      |SELECT window_start, event_type, count(*) AS n_events,
      | CAST(sum(v) AS DOUBLE) AS total_value
      |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Cross-source quantile normalization of quality scores (the
    * calibration step before mixing corpora whose scorers drift:
    * Bolstad '03's microarray quantile normalization, applied to
    * per-source quality): each document's within-source rank maps onto
    * the GLOBAL score distribution — doc at source-rank r of ns maps to
    * the global value at position ⌈r·N/ns⌉ — so every source's score
    * column acquires the same marginal distribution while preserving
    * within-source order. Rank targets use pure integer arithmetic
    * ((r·N + ns − 1) div ns — a double ceil could flip at exact-integer
    * boundaries), the report means go through DECIMAL sums, and ranks
    * tie-break on doc_id. Scale shape: shuffles carry (source, score,
    * id) triples and the rank-keyed join probes integers — text never
    * moves; the global rank is the TWO-PHASE [[Ranks.globalRowNumber]]
    * (range partitions + broadcast prefix offsets, the `zipWithIndex`
    * pattern) — no corpus-sized single-partition window anywhere in the
    * plan (r7 verdict item #4).
    */
  val quantileNorm: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val scored = Dedup.pin(t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        TextStats.qualityScore(col("text")).as("q")))
    val counts = scored.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val total = scored.agg(count(lit(1)).as("n"))
    val ranked = scored
      .withColumn("rs", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("q"), col("doc_id"))))
      .join(broadcast(counts), Seq("source"))
    // two-phase global rank (range partitions + broadcast prefix
    // offsets) — no corpus-sized single-partition window; see Ranks.
    val globalIdx = Ranks.globalRowNumber(
      scored.select(col("q"), col("doc_id")),
      Seq(col("q"), col("doc_id")), "gk")
      .select(col("q").as("gq"), col("gk"))
    ranked.crossJoin(broadcast(total))
      // integer ceil: Spark's `/` on integers is true division (double)
      .withColumn("gk",
        expr("CAST((rs * n + ns - 1) div ns AS BIGINT)"))
      .join(globalIdx, Seq("gk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("q").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("mean_raw"),
        round(sum(col("gq").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("mean_norm"),
        round(max(abs(col("gq") - col("q"))), 6).as("max_shift"))
      .orderBy(col("source"))
  }

  val quantileNormSql: String = {
    val qExpr =
      """round(
        |      least(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) / 50.0, 1.0) * 0.4
        |    + (1.0 - least(CAST(length(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
        |        / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)) * 0.3
        |    + least(CAST(length(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
        |        / greatest(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 4.0, 1.0) * 0.3,
        |    6)""".stripMargin
    s"""WITH s AS (SELECT doc_id, source, $qExpr AS q FROM documents),
       |ns AS (SELECT source, count(*) AS ns FROM s GROUP BY source),
       |n AS (SELECT count(*) AS n FROM s),
       |r AS (SELECT s.*, row_number()
       |    OVER (PARTITION BY source ORDER BY q, doc_id) AS rs FROM s),
       |g AS (SELECT q AS gq,
       |    row_number() OVER (ORDER BY q, doc_id) AS gk FROM s),
       |p AS (SELECT r.source, r.q, g.gq
       |  FROM r JOIN ns USING (source) CROSS JOIN n
       |  JOIN g ON g.gk = (r.rs * n.n + ns.ns - 1) // ns.ns)
       |SELECT source, count(*) AS n_docs,
       | round(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
       |   AS mean_raw,
       | round(CAST(sum(CAST(gq AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
       |   AS mean_norm,
       | round(max(abs(gq - q)), 6) AS max_shift
       |FROM p GROUP BY source ORDER BY source""".stripMargin
  }

  /** Train/test split-leakage audit — the "dedup BEFORE you split"
    * correctness check (the Lee '22 finding that duplicate text
    * straddling train and eval inflates benchmark scores): combine
    * q120's deterministic hash split with q20's content fingerprints
    * and report how many exact-duplicate clusters span more than one
    * split, how many documents sit in those leaky clusters, and the
    * first offender for triage. Scale shape: one scan computes both
    * the split tag (row-local md5-uniform of doc_id) and the content
    * fingerprint; the only shuffle carries (16-byte fp, split tag) —
    * never text — into one hash aggregation, and the report is a
    * single global reduce. A clean pipeline drives n_leaky_* to zero;
    * because the small-SF corpora carry no natural duplicates, the
    * query re-ingests every 50th document under a shifted id (the
    * q102/q117 planted re-crawl shape) so duplicate clusters exist by
    * construction at every SF — each copy draws an independent hash
    * split, so ~1 in 5 planted clusters straddles the 90/5/5 cut and
    * the leak counters are provably non-trivial.
    */
  val splitLeakage: Q = (s, dir) => {
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(math.pow(2, 60)))
    val docs = t(s, dir, "documents")
    val recrawled = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text")))
    recrawled
      .select(col("doc_id"),
        md5(col("text").cast("binary")).as("fp"),
        when(u < 0.90, "train").when(u < 0.95, "val").otherwise("test")
          .as("split"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("split")).as("n_splits"),
        min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") > 1)
      .agg(count(lit(1)).as("n_dup_clusters"),
        coalesce(sum(when(col("n_splits") > 1, 1L)), lit(0L))
          .as("n_leaky_clusters"),
        coalesce(sum(when(col("n_splits") > 1, col("n_docs"))), lit(0L))
          .as("n_leaky_docs"),
        min(when(col("n_splits") > 1, col("min_doc"))).as("first_leaky_doc"))
  }

  val splitLeakageSql: String =
    """WITH r AS (SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS doc_id, text FROM documents
      |  WHERE doc_id % 50 = 0),
      |d AS (SELECT doc_id, md5(text) AS fp,
      |    CASE WHEN u < 0.90 THEN 'train' WHEN u < 0.95 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM (SELECT doc_id, text,
      |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |        / CAST(pow(2, 60) AS DOUBLE) AS u FROM r)),
      |c AS (SELECT fp, count(*) AS n_docs,
      |    count(DISTINCT split) AS n_splits, min(doc_id) AS min_doc
      |  FROM d GROUP BY fp HAVING count(*) > 1)
      |SELECT count(*) AS n_dup_clusters,
      | CAST(coalesce(sum(CASE WHEN n_splits > 1 THEN 1 END), 0) AS BIGINT)
      |   AS n_leaky_clusters,
      | CAST(coalesce(sum(CASE WHEN n_splits > 1 THEN n_docs END), 0) AS BIGINT)
      |   AS n_leaky_docs,
      | min(CASE WHEN n_splits > 1 THEN min_doc END) AS first_leaky_doc
      |FROM c""".stripMargin

  /** Near-dup detector agreement audit — the method-selection
    * diagnostic a curation pipeline runs before committing to one
    * detector family: the exact blocked token-Jaccard pair set (q23's
    * configuration) and the simhash Hamming-≤8 pair set (q22's) are
    * FULL-OUTER joined on the unordered pair key and bucketed into
    * both / jaccard-only / simhash-only, with pair counts and a sample
    * id for triage. Both constituent pair sets are individually
    * hash-proven against independent oracle formulations (sparse
    * gram join; brute-force Hamming), so this gate verifies the
    * COMPOSITION — the disagreement surface itself. Scale shape: both
    * detectors run their production bucketed/blocked paths (nothing
    * all-pairs); the agreement join is keyed on (id1, id2) integer
    * pairs — output-bounded, never corpus-bounded.
    */
  val detectorAgreement: Q = (s, dir) =>
    detectorAgreementOver(t(s, dir, "documents"))

  private def detectorAgreementOver(docs: DataFrame): DataFrame = {
    val jac = Dedup.blockedJaccardPairs(docs, "text", "doc_id",
      Seq("lang", "n_chars"), threshold = 0.5)
      .select(col("id1"), col("id2"), lit(1).as("in_jac"))
    val withFp = docs.select(col("doc_id").as("id"),
      graft.functions.VectorExpressions.md5_simhash60(
        TextStats.tokens(lower(col("text")))).as("fp"))
      .filter(col("fp").isNotNull)
    val sim = Dedup.simhashPairs(withFp, maxHammingDistance = 8)
      .select(col("id1"), col("id2"), lit(1).as("in_sim"))
    jac.join(sim, Seq("id1", "id2"), "full_outer")
      .select(col("id1"),
        when(col("in_jac").isNotNull && col("in_sim").isNotNull, "both")
          .when(col("in_jac").isNotNull, "jaccard_only")
          .otherwise("simhash_only").as("verdict"))
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n_pairs"), min(col("id1")).as("sample_id1"))
      .orderBy(col("verdict"))
  }

  /** Sampled-stratum detector agreement (VERDICT r6 #5): the same
    * disagreement audit as q180, run on a deterministic hash stratum whose
    * EXPECTED SIZE IS CONSTANT regardless of corpus size — the membership
    * threshold is `least(1, target / n_docs)`, so a 10× (or 10⁶×) corpus
    * yields the same ≈`target`-doc stratum and the audit's pair-native
    * cost stays bounded at any scale. Membership is a pure function of
    * doc_id (q57/q179's md5-u discipline: first 15 md5 hex digits as a
    * 60-bit uniform), so the stratum is reproducible across engines, runs,
    * and partitionings; the corpus count rides a broadcast one-row frame
    * (q181's totals discipline), never a driver collect. This makes the
    * q180 diagnostic safe to point at a raw 100 TB corpus: the full-corpus
    * variant stays available for curated slices, the sampled one is the
    * default production entry.
    */
  val detectorAgreementSampled: Q = (s, dir) => {
    val target = 400.0
    val docsAll = t(s, dir, "documents")
    val tot = docsAll.agg(count(lit(1)).cast("double").as("n_tot"))
    val samp = docsAll.crossJoin(broadcast(tot))
      .withColumn("u",
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("double") / lit(math.pow(2, 60)))
      .filter(col("u") < least(lit(1.0), lit(target) / col("n_tot")))
      .drop("u", "n_tot")
    detectorAgreementOver(samp)
  }

  val detectorAgreementSampledSql: String =
    s"""WITH nt AS (SELECT CAST(count(*) AS DOUBLE) AS n_tot FROM documents),
      |samp AS (SELECT d.* FROM documents d CROSS JOIN nt
      |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |        / CAST(pow(2, 60) AS DOUBLE) < least(1.0, 400.0 / n_tot)),
      |tj AS (
      | SELECT doc_id, lang, n_chars,
      |  list_distinct(regexp_extract_all(lower(text), '\\S+')) AS tok
      | FROM samp WHERE length(regexp_extract_all(lower(text), '\\S+')) > 0),
      |jac AS (SELECT l.doc_id AS id1, r.doc_id AS id2
      | FROM tj l JOIN tj r
      |   ON l.lang = r.lang AND l.n_chars = r.n_chars AND l.doc_id < r.doc_id
      | WHERE CAST(length(list_intersect(l.tok, r.tok)) AS DOUBLE) /
      |       length(list_distinct(list_concat(l.tok, r.tok))) >= 0.5),
      |toks AS (
      |  SELECT doc_id, list_transform(regexp_extract_all(lower(text), '\\S+'),
      |    t -> (('0x'||substr(md5(t),1,15))::BIGINT)) AS hs
      |  FROM samp),
      |fps AS (
      |  SELECT doc_id, list_sum(list_transform(generate_series(0,59),
      |    b -> CASE WHEN list_sum(list_transform(hs, h -> (h >> b) & 1))*2 >= len(hs)
      |         THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS fp
      |  FROM toks WHERE len(hs) > 0),
      |sim AS (SELECT l.doc_id AS id1, r.doc_id AS id2
      | FROM fps l JOIN fps r
      |   ON l.doc_id < r.doc_id AND bit_count(xor(l.fp, r.fp)) <= 8),
      |m AS (SELECT coalesce(j.id1, s.id1) AS id1,
      |   CASE WHEN j.id1 IS NOT NULL AND s.id1 IS NOT NULL THEN 'both'
      |        WHEN j.id1 IS NOT NULL THEN 'jaccard_only'
      |        ELSE 'simhash_only' END AS verdict
      | FROM jac j FULL OUTER JOIN sim s
      |   ON j.id1 = s.id1 AND j.id2 = s.id2)
      |SELECT verdict, count(*) AS n_pairs, min(id1) AS sample_id1
      |FROM m GROUP BY verdict ORDER BY verdict""".stripMargin

  val detectorAgreementSql: String =
    s"""WITH tj AS (
      | SELECT doc_id, lang, n_chars,
      |  list_distinct(regexp_extract_all(lower(text), '\\S+')) AS tok
      | FROM documents WHERE length(regexp_extract_all(lower(text), '\\S+')) > 0),
      |jac AS (SELECT l.doc_id AS id1, r.doc_id AS id2
      | FROM tj l JOIN tj r
      |   ON l.lang = r.lang AND l.n_chars = r.n_chars AND l.doc_id < r.doc_id
      | WHERE CAST(length(list_intersect(l.tok, r.tok)) AS DOUBLE) /
      |       length(list_distinct(list_concat(l.tok, r.tok))) >= 0.5),
      |$md5SimhashCte,
      |sim AS (SELECT l.doc_id AS id1, r.doc_id AS id2
      | FROM fps l JOIN fps r
      |   ON l.doc_id < r.doc_id AND bit_count(xor(l.fp, r.fp)) <= 8),
      |m AS (SELECT coalesce(j.id1, s.id1) AS id1,
      |   CASE WHEN j.id1 IS NOT NULL AND s.id1 IS NOT NULL THEN 'both'
      |        WHEN j.id1 IS NOT NULL THEN 'jaccard_only'
      |        ELSE 'simhash_only' END AS verdict
      | FROM jac j FULL OUTER JOIN sim s
      |   ON j.id1 = s.id1 AND j.id2 = s.id2)
      |SELECT verdict, count(*) AS n_pairs, min(id1) AS sample_id1
      |FROM m GROUP BY verdict ORDER BY verdict""".stripMargin

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
    // engines and the gate stays exact.
    val grams = docs.select(col("doc_id").as("id"),
        explode(TextStats.charNgrams(col("text"), 13)).as("gram"))
      .select(col("id"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long").as("gram"))
      .distinct() // post-hash dedup, mirroring the oracle's DISTINCT-on-hash
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
    val gramHash = gc.select(col("gram")).distinct()
      .withColumn("ha", expr(
        "transform(sequence(0, 31), i -> " +
          "cast(conv(substring(md5(concat(cast(i as string), '|', gram))," +
          " 1, 15), 16, 10) as bigint))"))
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

  /** First-order Markov next-event prediction accuracy — q162's
    * transition census turned into the eval a sequence-model baseline
    * ships with: per current event type, predict the most frequent
    * successor (tiebreak: lexicographic) and measure the hit rate over
    * all observed transitions. Everything is exact integers off one
    * window pass + one types²-bounded count frame; accuracy is a single
    * long/long division. Scale: identical to q162 — one lead() pass,
    * types² counts, |types|-row output.
    */
  val markovAccuracy: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(s, dir)
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    val counts = Dedup.pin(steps.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n")))
    val pred = counts.withColumn("rk", row_number().over(
        Window.partitionBy(col("from_type"))
          .orderBy(col("n").desc, col("to_type"))))
      .filter(col("rk") === 1)
      .select(col("from_type"), col("to_type").as("predicted"),
        col("n").as("n_hits"))
    val totals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("n_total"))
    pred.join(totals, Seq("from_type"))
      .select(col("from_type"), col("predicted"), col("n_total"),
        col("n_hits"),
        round(col("n_hits").cast("double") / col("n_total").cast("double"), 6)
          .as("acc"))
      .orderBy(col("from_type"))
  }

  val markovAccuracySql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |    CAST(ts AS TIMESTAMP) AS ts FROM events),
      |s AS (SELECT user_id, event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type FROM e),
      |c AS (SELECT from_type, to_type, count(*) AS n FROM s
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |p AS (SELECT from_type, to_type AS predicted, n AS n_hits
      |  FROM (SELECT c.*, row_number() OVER (PARTITION BY from_type
      |      ORDER BY n DESC, to_type) AS rk FROM c) WHERE rk = 1),
      |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_total
      |  FROM c GROUP BY 1)
      |SELECT p.from_type, predicted, n_total, n_hits,
      |  round(CAST(n_hits AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS acc
      |FROM p JOIN t ON p.from_type = t.from_type
      |ORDER BY p.from_type""".stripMargin

  /** Replay-idempotent streaming sink parity — the SIXTH oracle-gated
    * streaming query, gating the exactly-once DELIVERY story the
    * in-engine gates (q177–q209) don't touch: events stream through
    * [[EventStreams.idempotentAppendSink]] (foreachBatch anti-join
    * append — the portable MERGE onto plain parquet) TWICE, the second
    * run with a FRESH checkpoint so every micro-batch is re-delivered
    * from scratch — the worst-case duplicate-delivery failure a real
    * pipeline recovers through. The target must still hash-match the
    * batch oracle exactly (no duplicated event survives). Values ride
    * as exact cents so the rollup is all-integer. Scale: the anti-join
    * reads only the id column of the target (column pruning); at 100 TB
    * the existing-ids side is a bucketed key index, same plan.
    */
  val streamReplaySink: Q = (s, dir) => withShufflePartitions(s, 8) {
    val srcDir = scratch("graft_stream_replay_src")
    val tgtDir = scratch("graft_stream_replay_tgt")
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .repartition(4)
      .write.mode("overwrite").parquet(srcDir.toString)
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("cents", LongType)))
    def deliverOnce(cpName: String): Unit = {
      val cp = scratch(cpName)
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      val sq = EventStreams.idempotentAppendSink(
        stream, tgtDir.toString, cp.toString, "event_id", availableNow = true)
      sq.awaitTermination()
    }
    deliverOnce("graft_stream_replay_cp1")
    // fresh checkpoint: the source replays every batch from zero —
    // duplicate delivery end to end; the sink must absorb it
    deliverOnce("graft_stream_replay_cp2")
    s.read.parquet(tgtDir.toString)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("total_cents"))
      .orderBy(col("event_type"))
  }

  val streamReplaySinkSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS total_cents
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Content-addressed shard manifest (the corpus-sync etag: rsync for
    * training shards — compose with q152/q154's CDC and q205's HRW
    * assignment): every doc's md5 fingerprint rolls up into a
    * per-shard digest two levels deep — fingerprints sort and hash
    * within a (shard, first-hex-digit) bucket, bucket digests sort and
    * hash into the shard etag. Two writers that produce the same doc
    * set produce the same etag REGARDLESS of row order (sorted
    * concatenation), and a one-doc change flips exactly one bucket
    * digest — the property a sync planner diffs on. The hierarchy is
    * the scale path: per-group state is \|bucket\|-bounded, and deeper
    * prefix levels bound it at any corpus size (vs one flat
    * sort-concat per shard). Scale: zero-shuffle HRW assignment (q205),
    * two keyed aggs.
    */
  val shardManifest: Q = (s, dir) => {
    val S = 8
    val weights = array((0 until S).map { i =>
      struct(
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":" + i))), 1, 15), 16, 10).cast("long").as("w"),
        lit(i).as("shard"))
    }: _*)
    val assigned = t(s, dir, "documents")
      .select(array_max(weights).getField("shard").as("shard"),
        md5(col("text").cast("binary")).as("fp"))
    val buckets = assigned
      .withColumn("bucket", substring(col("fp"), 1, 1))
      .groupBy(col("shard"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        md5(array_join(sort_array(collect_list(col("fp"))), "")
          .cast("binary")).as("digest"))
    buckets.groupBy(col("shard"))
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_buckets"),
        md5(array_join(sort_array(collect_list(col("digest"))), "")
          .cast("binary")).as("etag"))
      .orderBy(col("shard"))
  }

  val shardManifestSql: String =
    """WITH w AS (SELECT doc_id, md5(text) AS fp,
      |    CAST(r.range AS INTEGER) AS shard,
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||':'
      |      ||CAST(r.range AS VARCHAR)), 1, 15))::BIGINT AS wt
      |  FROM documents CROSS JOIN range(8) r),
      |pick AS (SELECT fp, shard FROM (SELECT fp, shard, row_number()
      |    OVER (PARTITION BY doc_id ORDER BY wt DESC, shard DESC) AS rn
      |  FROM w) WHERE rn = 1),
      |b AS (SELECT shard, substr(fp, 1, 1) AS bucket, count(*) AS n,
      |    md5(string_agg(fp, '' ORDER BY fp)) AS digest
      |  FROM pick GROUP BY shard, bucket)
      |SELECT shard, CAST(sum(n) AS BIGINT) AS n_docs,
      |  count(*) AS n_buckets,
      |  md5(string_agg(digest, '' ORDER BY digest)) AS etag
      |FROM b GROUP BY shard ORDER BY shard""".stripMargin

  /** CCNet-style perplexity bucketing (Wenzek '20 §4.3: split the
    * corpus into head/middle/tail thirds by LM perplexity; the head
    * feeds training, the tail is reviewed): q126's unigram surprisal
    * stands in for the LM, and the tertile cuts are EXACT order
    * statistics computed over the VALUE DOMAIN — distinct 6-dp
    * surprisal values → cumulative counts → first value with
    * 3·cum ≥ k·n (pure integer rank tests, the q123/q181/q199
    * discipline; never a corpus-sized global sort). Docs AT a cut go to
    * the lower bucket (≤, deterministic under ties). Per-bucket mean
    * surprisal re-enters DECIMAL (values are already 6-dp-rounded, so
    * the cast is exact). Scale: one token join (q126), then all
    * bucketing work on the |distinct values| grid.
    */
  val perplexityBuckets: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val toks = Dedup.pin(t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(TextStats.tokens(lower(col("text")))).as("tok")))
    val freqs = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = freqs.agg(sum(col("c")).as("total"))
    val scored = freqs.crossJoin(broadcast(total))
      .select(col("tok"),
        round(-log(col("c").cast("double") / col("total").cast("double")), 8)
          .cast("decimal(18,8)").as("sp"))
    val perDoc = Dedup.pin(toks.join(scored, Seq("tok"))
      .groupBy(col("doc_id"), col("source"))
      .agg(round(sum(col("sp")).cast("double") / count(lit(1)), 6).as("surp")))
    val n1 = perDoc.agg(count(lit(1)).as("n"))
    val wv = Window.partitionBy(lit(1)).orderBy(col("surp"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perDoc.groupBy(col("surp")).agg(count(lit(1)).as("m"))
      .withColumn("cum", sum(col("m")).over(wv))
      .crossJoin(broadcast(n1))
    val cut1 = cum.filter(col("cum") * 3 >= col("n")).agg(min(col("surp")).as("c1"))
    val cut2 = cum.filter(col("cum") * 3 >= col("n") * 2).agg(min(col("surp")).as("c2"))
    perDoc.crossJoin(broadcast(cut1)).crossJoin(broadcast(cut2))
      .select(col("source"),
        when(col("surp") <= col("c1"), "head")
          .when(col("surp") <= col("c2"), "middle")
          .otherwise("tail").as("bucket"),
        col("surp").cast("decimal(18,6)").as("sd"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("sd")).cast("double") / count(lit(1)), 6)
          .as("mean_surprisal"))
      .orderBy(col("source"), col("bucket"))
  }

  val perplexityBucketsSql: String =
    """WITH tk AS (SELECT doc_id, source,
      |    unnest(regexp_extract_all(lower(text), '\S+')) AS tok
      |  FROM documents),
      |f AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
      |tt AS (SELECT sum(c) AS total FROM f),
      |sc AS (SELECT tok, CAST(round(-ln(CAST(c AS DOUBLE)
      |    / CAST(total AS DOUBLE)), 8) AS DECIMAL(18,8)) AS sp FROM f, tt),
      |pd AS (SELECT doc_id, source,
      |    round(CAST(sum(sp) AS DOUBLE) / count(*), 6) AS surp
      |  FROM tk JOIN sc USING (tok) GROUP BY doc_id, source),
      |n1 AS (SELECT count(*) AS n FROM pd),
      |cumt AS (SELECT surp, sum(count(*)) OVER (ORDER BY surp) AS cum
      |  FROM pd GROUP BY surp),
      |c1 AS (SELECT min(surp) AS c1 FROM cumt, n1 WHERE cum * 3 >= n),
      |c2 AS (SELECT min(surp) AS c2 FROM cumt, n1 WHERE cum * 3 >= n * 2)
      |SELECT source,
      |  CASE WHEN surp <= c1 THEN 'head' WHEN surp <= c2 THEN 'middle'
      |    ELSE 'tail' END AS bucket,
      |  count(*) AS n_docs,
      |  round(CAST(sum(CAST(surp AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
      |    AS mean_surprisal
      |FROM pd CROSS JOIN c1 CROSS JOIN c2
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Language-ID confusion matrix (the eval for q28's n-gram
    * classifier against the labeled lang column — the audit run before
    * trusting a detector to route a multilingual crawl): (labeled,
    * predicted) counts plus per-labeled-language recall shares.
    * Everything integer until the single share division; the frame is
    * langs²-bounded after one classification scan.
    */
  val langidConfusion: Q = (s, dir) => {
    val cm = Dedup.pin(t(s, dir, "documents")
      .select(col("lang").as("labeled"),
        TextStats.languageId(col("text")).as("predicted"))
      .groupBy(col("labeled"), col("predicted")).agg(count(lit(1)).as("n")))
    val tot = cm.groupBy(col("labeled")).agg(sum(col("n")).as("n_labeled"))
    cm.join(broadcast(tot), Seq("labeled"))
      .select(col("labeled"), col("predicted"), col("n"),
        round(col("n").cast("double") / col("n_labeled").cast("double"), 6)
          .as("share"))
      .orderBy(col("labeled"), col("predicted"))
  }

  val langidConfusionSql: String = {
    val packs = TextStats.defaultProfiles.toSeq.sortBy(_._1).map {
      case (lang, grams) =>
        s"lpad(CAST(length(regexp_extract_all(lower(text), '${grams.mkString("|")}')) " +
          s"AS VARCHAR), 10, '0') || '$lang'"
    }.mkString(", ")
    s"""WITH p AS (SELECT lang AS labeled,
       |    substr(greatest($packs), 11) AS predicted FROM documents),
       |cm AS (SELECT labeled, predicted, count(*) AS n FROM p
       |  GROUP BY 1, 2),
       |tt AS (SELECT labeled, CAST(sum(n) AS BIGINT) AS n_labeled
       |  FROM cm GROUP BY 1)
       |SELECT cm.labeled, predicted, n,
       |  round(CAST(n AS DOUBLE) / CAST(n_labeled AS DOUBLE), 6) AS share
       |FROM cm JOIN tt ON cm.labeled = tt.labeled
       |ORDER BY cm.labeled, predicted""".stripMargin
  }

  /** Memorization-risk coverage: the share of each source's characters
    * covered by CROSS-DOCUMENT 13-grams (grams appearing in ≥ 2
    * distinct docs) — the statistic behind verbatim-memorization audits
    * (Lee '22 §5 measures dup-substring mass; this is its coverage
    * form). Interval union is computed WITHOUT interval logic: with
    * equal-length K intervals sorted by start, each covered position
    * adds exactly min(K, i − i_prev) new chars (first adds K) — one
    * lag() per doc, all integer. Per-source ratio is a ratio of integer
    * SUMS (covered / total chars), never an average of per-doc floats.
    * Scale: the position explode is the winnowing cost (q132/q145 —
    * ~n_chars rows per doc); gram hashes shuffle, text never does.
    */
  val memorizationCoverage: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val K = 13
    val docs = Dedup.pin(t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        col("text"), length(col("text")).cast("long").as("len")))
    val pos = Dedup.pin(docs.filter(col("len") >= K)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), (col("len") - (K - 1)).cast("int"))).as("i"),
        col("text"))
      .select(col("doc_id"), col("source"), col("i"),
        conv(substring(md5(col("text").substr(col("i"), lit(K))
          .cast("binary")), 1, 15), 16, 10).cast("long").as("h")))
    val freq = pos.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val perDoc = pos.join(freq.select(col("h")), Seq("h"), "left_semi")
      .withColumn("prev", lag(col("i"), 1).over(w))
      .select(col("doc_id"),
        when(col("prev").isNull, lit(K.toLong))
          .otherwise(least(lit(K.toLong), (col("i") - col("prev")).cast("long")))
          .as("add"))
      .groupBy(col("doc_id")).agg(sum(col("add")).as("covered"))
    docs.select(col("doc_id"), col("source"), col("len"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("source"), coalesce(col("covered"), lit(0L)).as("cov"),
        col("len"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("cov")).as("covered_chars"),
        sum(col("len")).as("total_chars"))
      .select(col("source"), col("n_docs"), col("covered_chars"),
        col("total_chars"),
        round(col("covered_chars").cast("double")
          / col("total_chars").cast("double"), 6).as("cov_share"))
      .orderBy(col("source"))
  }

  val memorizationCoverageSql: String =
    """WITH d AS (SELECT doc_id, source, text,
      |    CAST(length(text) AS BIGINT) AS len FROM documents),
      |pos AS (SELECT doc_id, source, i,
      |    ('0x'||substr(md5(substr(text, i, 13)), 1, 15))::BIGINT AS h
      |  FROM d, unnest(generate_series(1, CAST(len - 12 AS INTEGER)))
      |    AS t(i)
      |  WHERE len >= 13),
      |freq AS (SELECT h FROM (SELECT DISTINCT h, doc_id FROM pos)
      |  GROUP BY h HAVING count(*) >= 2),
      |cov AS (SELECT doc_id, i FROM pos WHERE h IN (SELECT h FROM freq)),
      |contrib AS (SELECT doc_id,
      |    CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
      |      THEN 13 ELSE least(13,
      |        i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)) END AS a
      |  FROM cov),
      |pd AS (SELECT doc_id, CAST(sum(a) AS BIGINT) AS covered
      |  FROM contrib GROUP BY doc_id)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(coalesce(covered, 0)) AS BIGINT) AS covered_chars,
      |  CAST(sum(len) AS BIGINT) AS total_chars,
      |  round(CAST(sum(coalesce(covered, 0)) AS DOUBLE)
      |    / CAST(sum(len) AS DOUBLE), 6) AS cov_share
      |FROM d LEFT JOIN pd USING (doc_id)
      |GROUP BY source ORDER BY source""".stripMargin

  /** Pairwise Jensen–Shannon divergence matrix between source language
    * models (Lin '91; the symmetric, bounded complement of q166's
    * per-source-vs-corpus KL — the matrix a mixture designer clusters
    * sources by): smoothed hashed-bigram distributions over B=1024
    * buckets (the q156/q166 model), densified per source, then one
    * bucket-keyed self-join gives every (i<j, b) cell. Each JS term is
    * ONE compound float expression rounded to 8 places → DECIMAL (the
    * q126 ln discipline) so the per-pair sum is exact. Scale: the
    * matrix costs |sources|²·B/2 cells INDEPENDENT of corpus size —
    * the corpus is touched once to build the B-bounded models.
    */
  val jsDivergenceMatrix: Q = (s, dir) => {
    val B = 1024
    val feats = Dedup.pin(t(s, dir, "documents")
      .select(col("source"), TextStats.tokens(lower(col("text"))).as("tok"))
      .filter(size(col("tok")) >= 2)
      .select(col("source"), explode(TextStats.wordBigrams(col("tok"))).as("g"))
      .select(col("source"),
        (conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long") % B)
          .as("b")))
    val srcCounts = feats.groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("cs"))
    val srcTotals = feats.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    // pin the |sources|·B model frame: the self-join would otherwise
    // re-derive the corpus-sized bigram aggregation once per side
    val dense = Dedup.pin(srcTotals
      .select(col("source"), col("ns"),
        explode(sequence(lit(0L), lit((B - 1).toLong))).as("b"))
      .join(srcCounts, Seq("source", "b"), "left")
      .select(col("source"), col("b"),
        ((coalesce(col("cs"), lit(0L)) + 1).cast("double")
          / (col("ns") + B).cast("double")).as("p")))
    def jsTerm(pa: Column, pb: Column): Column =
      lit(0.5) * (pa * log(pa / ((pa + pb) / 2))
        + pb * log(pb / ((pa + pb) / 2)))
    dense.as("a").join(dense.as("c"),
        col("a.b") === col("c.b") && col("a.source") < col("c.source"))
      .select(col("a.source").as("source_a"), col("c.source").as("source_b"),
        round(jsTerm(col("a.p"), col("c.p")), 8).cast("decimal(18,8)")
          .as("term"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(round(sum(col("term")).cast("double"), 8).as("js"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val jsDivergenceMatrixSql: String =
    """WITH toks AS (SELECT source,
      |    regexp_extract_all(lower(text), '\S+') AS tok FROM documents
      |  WHERE length(regexp_extract_all(lower(text), '\S+')) >= 2),
      |g AS (SELECT source, unnest(list_transform(generate_series(1, len(tok)-1),
      |    i -> tok[i] || ' ' || tok[i+1])) AS g FROM toks),
      |f AS (SELECT source,
      |    ('0x'||substr(md5(g),1,15))::BIGINT % 1024 AS b FROM g),
      |sc AS (SELECT source, b, count(*) AS cs FROM f GROUP BY 1, 2),
      |st AS (SELECT source, count(*) AS ns FROM f GROUP BY 1),
      |dense AS (SELECT st.source, gs.b,
      |    CAST(coalesce(cs, 0) + 1 AS DOUBLE) / CAST(ns + 1024 AS DOUBLE)
      |      AS p
      |  FROM st CROSS JOIN (SELECT unnest(generate_series(0, 1023)) AS b) gs
      |  LEFT JOIN sc ON sc.source = st.source AND sc.b = gs.b)
      |SELECT a.source AS source_a, c.source AS source_b,
      |  round(CAST(sum(CAST(round(0.5 * (a.p * ln(a.p / ((a.p + c.p) / 2))
      |    + c.p * ln(c.p / ((a.p + c.p) / 2))), 8) AS DECIMAL(18,8)))
      |    AS DOUBLE), 8) AS js
      |FROM dense a JOIN dense c ON a.b = c.b AND a.source < c.source
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Tokenizer-vocabulary OOV audit: share of token instances per
    * source falling outside the top-500 corpus vocabulary — the
    * coverage check run before freezing a vocab (the fixed-vocab
    * complement of q122's vocab-growth curve and q129's BPE). Vocab
    * selection is a TakeOrdered top-V on (count desc, token) — total
    * order, boundary ties resolved lexicographically, identical in the
    * oracle's ORDER BY/LIMIT. OOV tally via one broadcast join of the
    * V-row vocab; the rate is a single long/long division. Scale: one
    * token-keyed count, top-V never materializes the tail.
    */
  val oovRate: Q = (s, dir) => {
    val toks = Dedup.pin(t(s, dir, "documents")
      .select(col("source"), explode(TextStats.tokens(lower(col("text")))).as("tok")))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(500)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)
          .as("oov_rate"))
      .orderBy(col("source"))
  }

  val oovRateSql: String =
    """WITH tk AS (SELECT source,
      |    unnest(regexp_extract_all(lower(text), '\S+')) AS tok
      |  FROM documents),
      |v AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM tk GROUP BY tok
      |  ORDER BY c DESC, tok LIMIT 500))
      |SELECT source, count(*) AS n_tokens,
      |  CAST(sum(CASE WHEN tk.tok IN (SELECT tok FROM v) THEN 0 ELSE 1 END)
      |    AS BIGINT) AS n_oov,
      |  round(CAST(sum(CASE WHEN tk.tok IN (SELECT tok FROM v) THEN 0
      |      ELSE 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS oov_rate
      |FROM tk GROUP BY source ORDER BY source""".stripMargin

  /** Type–token ratio at a FIXED token budget per source (lexical
    * diversity, Templin '57 — raw TTR is length-biased, so every
    * source is measured on exactly 200 deterministically-sampled token
    * instances): two-phase deterministic sample (q57/q186 discipline) —
    * an md5-u threshold keeps an expected 3× budget, then an exact
    * row_number over (u, doc_id, pos) takes the first 200 — so the
    * sample is a pure function of the data, identical in both engines,
    * and the per-source rank window runs over the THRESHOLDED stream
    * (~3·budget rows), never the corpus. TTR = distinct/sampled, one
    * division. Scale: budget is constant, so per-source work is
    * constant past the threshold scan.
    */
  val ttrBudget: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val N = 200
    val toks = Dedup.pin(t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        posexplode(TextStats.tokens(lower(col("text")))).as(Seq("pos", "tok"))))
    val perSrc = toks.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val u = conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
      col("pos").cast("string"))), 1, 15), 16, 10).cast("long")
    val thresholded = toks.join(broadcast(perSrc), Seq("source"))
      .withColumn("u", u)
      // keep expected 3N of n_s (double compare, the q186 idiom —
      // integer cross-multiply would overflow Long at 2^60 · n_s)
      .filter(col("u").cast("double") / lit(math.pow(2, 60)) <
        least(lit(1.0), lit(3.0 * N) / col("n_s").cast("double")))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("u"), col("doc_id"), col("pos"))
    thresholded.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= N)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"),
        countDistinct(col("tok")).as("n_types"))
      .select(col("source"), col("n_sampled"), col("n_types"),
        round(col("n_types").cast("double") / col("n_sampled").cast("double"), 6)
          .as("ttr"))
      .orderBy(col("source"))
  }

  val ttrBudgetSql: String =
    """WITH tk AS (SELECT doc_id, source, i - 1 AS pos, tok[i] AS tok
      |  FROM (SELECT doc_id, source,
      |      regexp_extract_all(lower(text), '\S+') AS tok FROM documents),
      |    unnest(generate_series(1, len(tok))) AS t(i)),
      |ps AS (SELECT source, count(*) AS n_s FROM tk GROUP BY source),
      |th AS (SELECT tk.*, ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||':'
      |      ||CAST(pos AS VARCHAR)), 1, 15))::BIGINT AS u, n_s
      |  FROM tk JOIN ps USING (source)
      |  WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||':'
      |      ||CAST(pos AS VARCHAR)), 1, 15))::BIGINT
      |      / CAST(pow(2, 60) AS DOUBLE)
      |    < least(1.0, 600.0 / CAST(n_s AS DOUBLE))),
      |rk AS (SELECT source, tok, row_number() OVER (PARTITION BY source
      |    ORDER BY u, doc_id, pos) AS rn FROM th)
      |SELECT source, count(*) AS n_sampled,
      |  CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
      |  round(CAST(count(DISTINCT tok) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS ttr
      |FROM rk WHERE rn <= 200 GROUP BY source ORDER BY source""".stripMargin

  /** Deterministic Poisson bootstrap CI for per-source mean document
    * length (Chamandy '12, "Estimating uncertainty for massive data
    * streams" — the Google large-scale bootstrap: per-replicate
    * Poisson(1) weights instead of resampling, so one pass computes all
    * B replicates): weights come from an md5-keyed uniform pushed
    * through the Poisson(1) inverse CDF at 60-bit integer thresholds —
    * the thresholds are computed ONCE in the builder and inlined
    * IDENTICALLY into both engines, so the "randomness" is a pure
    * function of (doc_id, replicate). Replicate means are exact-integer
    * ratios (Σw·x / Σw, single double division); the 5%/95% CI bounds
    * are order statistics (ranks 2 and B−1 of B=40) — no float
    * accumulates anywhere. Scale: explode ×B multiplies row count, but
    * state is |sources|·B cells — the textbook scalable bootstrap.
    */
  val bootstrapCi: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val B = 40
    val cum = { // Poisson(1) CDF at k = 0..4
      var c = 0.0; var fact = 1.0
      (0 to 4).map { k => if (k > 0) fact *= k; c += math.exp(-1.0) / fact; c }
    }
    val th = cum.map(c => (c * math.pow(2, 60)).toLong)
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("b", explode(sequence(lit(0), lit(B - 1))))
    val u = conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
      col("b").cast("string"))), 1, 15), 16, 10).cast("long")
    val weighted = docs.withColumn("w",
      when(u < th(0), 0L).when(u < th(1), 1L).when(u < th(2), 2L)
        .when(u < th(3), 3L).when(u < th(4), 4L).otherwise(5L))
    val cells = weighted.groupBy(col("source"), col("b"))
      .agg(sum(col("w")).as("sw"),
        sum(col("w") * col("n_chars")).as("swx"))
      .filter(col("sw") > 0)
      .select(col("source"), col("b"),
        (col("swx").cast("double") / col("sw").cast("double")).as("m"))
    val wr = Window.partitionBy(col("source")).orderBy(col("m"), col("b"))
    val ranked = cells.withColumn("rn", row_number().over(wr))
    val lo = ranked.filter(col("rn") === 2)
      .select(col("source"), round(col("m"), 6).as("ci_lo"))
    val hi = ranked.filter(col("rn") === B - 1)
      .select(col("source"), round(col("m"), 6).as("ci_hi"))
    val obs = t(s, dir, "documents").groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 6)
          .as("mean_chars"))
    obs.join(lo, Seq("source")).join(hi, Seq("source"))
      .select(col("source"), col("n_docs"), col("mean_chars"),
        col("ci_lo"), col("ci_hi"))
      .orderBy(col("source"))
  }

  val bootstrapCiSql: String = {
    val cum = {
      var c = 0.0; var fact = 1.0
      (0 to 4).map { k => if (k > 0) fact *= k; c += math.exp(-1.0) / fact; c }
    }
    val th = cum.map(c => (c * math.pow(2, 60)).toLong)
    s"""WITH r AS (SELECT doc_id, source, n_chars,
       |    CAST(rep.range AS INTEGER) AS b,
       |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||':'
       |      ||CAST(rep.range AS VARCHAR)), 1, 15))::BIGINT AS u
       |  FROM documents CROSS JOIN range(40) rep),
       |wtd AS (SELECT source, b, n_chars,
       |    CASE WHEN u < ${th(0)} THEN 0 WHEN u < ${th(1)} THEN 1
       |      WHEN u < ${th(2)} THEN 2 WHEN u < ${th(3)} THEN 3
       |      WHEN u < ${th(4)} THEN 4 ELSE 5 END AS w FROM r),
       |cells AS (SELECT source, b,
       |    CAST(sum(w * n_chars) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS m
       |  FROM wtd GROUP BY source, b HAVING sum(w) > 0),
       |rk AS (SELECT source, b, m, row_number() OVER (PARTITION BY source
       |    ORDER BY m, b) AS rn FROM cells),
       |lo AS (SELECT source, round(m, 6) AS ci_lo FROM rk WHERE rn = 2),
       |hi AS (SELECT source, round(m, 6) AS ci_hi FROM rk WHERE rn = 39),
       |obs AS (SELECT source, count(*) AS n_docs,
       |    round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS mean_chars
       |  FROM documents GROUP BY source)
       |SELECT obs.source, n_docs, mean_chars, ci_lo, ci_hi
       |FROM obs JOIN lo ON obs.source = lo.source
       |JOIN hi ON obs.source = hi.source
       |ORDER BY obs.source""".stripMargin
  }

  /** Group-aware (leakage-safe) train/test split — the fix for q179's
    * measured failure mode: folds assigned per NEAR-DUP CLUSTER, not
    * per document, so a near-duplicate can never straddle train and
    * eval (the contamination channel q179 audits). Clusters come from
    * the q65 operator (blocked Jaccard + min-label components);
    * singletons are their own cluster; fold = md5(cluster_id) % 5 —
    * BY CONSTRUCTION a function of the cluster, so "no cluster spans
    * folds" is structural, and the audit reports the per-fold balance a
    * split consumer actually checks. Scale: q65's cost + one hash.
    */
  val groupSplit: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.blockedJaccardPairs(docs, "text", "doc_id",
      Seq("lang", "n_chars"), threshold = 0.5)
    val cl = Dedup.clusters(pairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
    docs.select(col("doc_id"), col("n_chars"))
      .join(cl, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("cluster_id"), col("doc_id")).as("cid"))
      .withColumn("fold",
        (conv(substring(md5(col("cid").cast("string")), 1, 15), 16, 10)
          .cast("long") % 5).cast("int"))
      .groupBy(col("fold"))
      .agg(countDistinct(col("cid")).as("n_clusters"),
        count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_tot"))
      .orderBy(col("fold"))
  }

  val groupSplitSql: String =
    """WITH RECURSIVE toks AS (
      | SELECT doc_id, lang, n_chars,
      |  list_distinct(regexp_extract_all(lower(text), '\S+')) AS tok
      | FROM documents WHERE length(regexp_extract_all(lower(text), '\S+')) > 0),
      |edges AS (
      | SELECT l.doc_id AS a, r.doc_id AS b
      | FROM toks l JOIN toks r
      |   ON l.lang = r.lang AND l.n_chars = r.n_chars AND l.doc_id < r.doc_id
      | WHERE CAST(length(list_intersect(l.tok, r.tok)) AS DOUBLE) /
      |       length(list_distinct(list_concat(l.tok, r.tok))) >= 0.5),
      |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      |reach AS (SELECT a, b FROM sym
      |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a),
      |cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      |  FROM reach GROUP BY a),
      |f AS (SELECT d.doc_id, d.n_chars,
      |    coalesce(cluster_id, d.doc_id) AS cid
      |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
      |SELECT CAST(('0x'||substr(md5(CAST(cid AS VARCHAR)), 1, 15))::BIGINT
      |    % 5 AS INTEGER) AS fold,
      |  CAST(count(DISTINCT cid) AS BIGINT) AS n_clusters,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars_tot
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  /** Position-based (U-shaped) multi-touch attribution — the 40/20/40
    * credit model between q172's last-touch and a full Shapley: a
    * user's purchase value credits 40% to the first touch, 40% to the
    * last, 20% split over middles. Credit is EXACT-INTEGER basis
    * points: middles get 2000 div (n−2) bp each and the remainder goes
    * one bp apiece to the EARLIEST middles (deterministic water-fill,
    * the q193 discipline) — so Σcredit ≡ 10000 bp per converting user
    * by construction, and the only float is the final /10⁴ rendering.
    * Value rides as exact cents. Scale: one window pass per user + a
    * types-bounded rollup.
    */
  val positionAttribution: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val purch = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(sum(col("cents")).as("v"))
      .filter(col("v") > 0)
    val seq_ = ev.join(purch, Seq("user_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("user_id"))))
    val bp = when(col("n") === 1, lit(10000L))
      .when(col("n") === 2,
        when(col("rn") === 1, 5000L).otherwise(5000L))
      .when(col("rn") === 1, 4000L)
      .when(col("rn") === col("n"), 4000L)
      .otherwise(expr("2000 div (n - 2)")
        + when(col("rn") - 1 <= expr("2000 % (n - 2)"), 1L).otherwise(0L))
    seq_.select(col("event_type"), (bp * col("v")).as("credit"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_touches"), sum(col("credit")).as("bp_cents"))
      .select(col("event_type"), col("n_touches"),
        round(col("bp_cents").cast("double") / 1000000.0, 2)
          .as("attributed_value"))
      .orderBy(col("event_type"))
  }

  val positionAttributionSql: String =
    """WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |p AS (SELECT user_id, CAST(sum(cents) AS BIGINT) AS v FROM ev
      |  WHERE event_type = 'purchase' GROUP BY user_id HAVING sum(cents) > 0),
      |sq AS (SELECT ev.*, v,
      |    row_number() OVER (PARTITION BY ev.user_id
      |      ORDER BY ts, event_id) AS rn,
      |    count(*) OVER (PARTITION BY ev.user_id) AS n
      |  FROM ev JOIN p ON ev.user_id = p.user_id),
      |cr AS (SELECT event_type,
      |    CASE WHEN n = 1 THEN 10000
      |      WHEN n = 2 THEN 5000
      |      WHEN rn = 1 THEN 4000
      |      WHEN rn = n THEN 4000
      |      ELSE 2000 // (n - 2)
      |        + CASE WHEN rn - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END
      |      END * v AS credit
      |  FROM sq)
      |SELECT event_type, count(*) AS n_touches,
      |  round(CAST(sum(credit) AS DOUBLE) / 1000000.0, 2)
      |    AS attributed_value
      |FROM cr GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Dedup savings report — the business case a dedup pipeline ships
    * with: per source, raw vs post-dedup (q20 exact keeper: min doc_id
    * per content fingerprint) document and TOKEN counts and the token
    * savings share. Composes the exact-dedup operator end-to-end and
    * reports the number storage/training budgets are planned on.
    * All integer; one division per source. Scale: fingerprints shuffle
    * (16 bytes), tokens counted row-local before the keeper semi-join.
    */
  val dedupSavings: Q = (s, dir) => {
    val docs = Dedup.pin(t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        TextStats.fingerprint(col("text")).as("fp"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tok")))
    val keep = docs.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val kept = docs.join(keep, Seq("fp", "doc_id"), "left_semi")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("n_tok")).as("kept_tokens"))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("raw_docs"), sum(col("n_tok")).as("raw_tokens"))
      .join(kept, Seq("source"))
      .select(col("source"), col("raw_docs"), col("kept_docs"),
        col("raw_tokens"), col("kept_tokens"),
        round((col("raw_tokens") - col("kept_tokens")).cast("double")
          / col("raw_tokens").cast("double"), 6).as("savings"))
      .orderBy(col("source"))
  }

  val dedupSavingsSql: String =
    """WITH d AS (SELECT doc_id, source,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |    CAST(length(regexp_extract_all(lower(text), '\S+')) AS BIGINT)
      |      AS n_tok
      |  FROM documents),
      |k AS (SELECT fp, min(doc_id) AS doc_id FROM d GROUP BY fp),
      |kept AS (SELECT source, count(*) AS kept_docs,
      |    CAST(sum(n_tok) AS BIGINT) AS kept_tokens
      |  FROM d JOIN k USING (fp, doc_id) GROUP BY source),
      |raw AS (SELECT source, count(*) AS raw_docs,
      |    CAST(sum(n_tok) AS BIGINT) AS raw_tokens FROM d GROUP BY source)
      |SELECT raw.source, raw_docs, kept_docs, raw_tokens, kept_tokens,
      |  round(CAST(raw_tokens - kept_tokens AS DOUBLE)
      |    / CAST(raw_tokens AS DOUBLE), 6) AS savings
      |FROM raw JOIN kept ON raw.source = kept.source
      |ORDER BY raw.source""".stripMargin

  /** Grouped exact OLS (per-source least-squares of char count on
    * token count — the scaling-law-style fit every corpus report draws,
    * done EXACTLY): all five sufficient statistics (n, Σx, Σy, Σxy,
    * Σx²) are exact integers off one scan, so slope = (nΣxy − ΣxΣy) /
    * (nΣx² − (Σx)²) and intercept are single compound float expressions
    * over exact inputs — grouped regression with zero cross-row float
    * accumulation (q85's correlation discipline extended to the fit
    * itself). r² from the same partials. Scale: |sources| rows of
    * state; nothing leaves the keyed agg.
    */
  val groupedOls: Q = (s, dir) => {
    val pts = t(s, dir, "documents")
      .select(col("source"),
        TextStats.tokenCount(col("text")).cast("long").as("x"),
        col("n_chars").as("y"))
    pts.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("source"), col("n"), {
        // compound products in DECIMAL(38,0): n·Σxy and Σx·Σy overflow
        // int64 once per-source sums pass ~3e9 — Spark (non-ANSI) would
        // wrap SILENTLY while DuckDB raises, a latent wrong-answer +
        // parity break at corpus scale (ADVICE r7). The wide-int diff
        // is exact; only then does it drop to double.
        val nD = col("n").cast("decimal(38,0)")
        val sxD = col("sx").cast("decimal(38,0)")
        val syD = col("sy").cast("decimal(38,0)")
        val cov = (nD * col("sxy") - sxD * col("sy")).cast("double")
        val vx = (nD * col("sxx") - sxD * col("sx")).cast("double")
        val vy = (nD * col("syy") - syD * col("sy")).cast("double")
        struct(
          round(cov / vx, 6).as("slope"),
          round((col("sy").cast("double") - cov / vx
            * col("sx").cast("double")) / col("n").cast("double"), 6)
            .as("intercept"),
          round(cov * cov / (vx * vy), 6).as("r2")).as("f")
      })
      .select(col("source"), col("n"), col("f.slope").as("slope"),
        col("f.intercept").as("intercept"), col("f.r2").as("r2"))
      .orderBy(col("source"))
  }

  val groupedOlsSql: String =
    """WITH p AS (SELECT source,
      |    CAST(length(regexp_extract_all(lower(text), '\S+')) AS BIGINT)
      |      AS x,
      |    n_chars AS y FROM documents),
      |st AS (SELECT source, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM p GROUP BY source),
      |w AS (SELECT source, n, sx, sy,
      |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
      |      AS DOUBLE) AS cov,
      |    CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
      |      AS DOUBLE) AS vx,
      |    CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
      |      AS DOUBLE) AS vy
      |  FROM st)
      |SELECT source, n,
      |  round(cov / vx, 6) AS slope,
      |  round((CAST(sy AS DOUBLE) - cov / vx * CAST(sx AS DOUBLE))
      |    / CAST(n AS DOUBLE), 6) AS intercept,
      |  round(cov * cov / (vx * vy), 6) AS r2
      |FROM w ORDER BY source""".stripMargin

  /** Sorted-neighborhood near-dup detection (Hernández–Stolfo '95 — the
    * classic ALTERNATIVE to hash blocking (q128) and LSH banding (q21):
    * sort on a discriminating key and compare each record only with its
    * w−1 successors, O(n·w) comparisons total): docs sort within lang by
    * (n_chars, doc_id); each pairs with its next 2 neighbors via lead()
    * over DISTINCT-token arrays (no self-join at all — the window IS
    * the candidate generator), then exact token-Jaccard ≥ 0.5 verifies.
    * The Jaccard is one integer/integer division. Scale: one sort per
    * lang partition + constant fan-out; the known failure mode (a dup
    * whose key differs sorts far away) is why production composes this
    * WITH q21's LSH — complementary recall. */
  val sortedNeighborhood: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        array_distinct(TextStats.tokens(lower(col("text")))).as("tok"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    val withNb = docs
      .withColumn("nb1_id", lead(col("doc_id"), 1).over(w))
      .withColumn("nb1_tok", lead(col("tok"), 1).over(w))
      .withColumn("nb2_id", lead(col("doc_id"), 2).over(w))
      .withColumn("nb2_tok", lead(col("tok"), 2).over(w))
    def pairOf(idC: String, tokC: String) = withNb
      .filter(col(idC).isNotNull)
      .select(col("doc_id").as("id_a"), col(idC).as("id_b"),
        (size(array_intersect(col("tok"), col(tokC))).cast("double")
          / size(array_union(col("tok"), col(tokC))).cast("double")).as("j"))
    pairOf("nb1_id", "nb1_tok").unionAll(pairOf("nb2_id", "nb2_tok"))
      .filter(col("j") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("j"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val sortedNeighborhoodSql: String =
    """WITH d AS (SELECT doc_id, lang, n_chars,
      |    list_distinct(regexp_extract_all(lower(text), '\S+')) AS tok
      |  FROM documents),
      |nb AS (SELECT doc_id, tok,
      |    lead(doc_id, 1) OVER w AS nb1_id, lead(tok, 1) OVER w AS nb1_tok,
      |    lead(doc_id, 2) OVER w AS nb2_id, lead(tok, 2) OVER w AS nb2_tok
      |  FROM d WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)),
      |p AS (
      |  SELECT doc_id AS id_a, nb1_id AS id_b,
      |    CAST(length(list_intersect(tok, nb1_tok)) AS DOUBLE)
      |      / CAST(length(list_distinct(list_concat(tok, nb1_tok)))
      |        AS DOUBLE) AS j
      |  FROM nb WHERE nb1_id IS NOT NULL
      |  UNION ALL
      |  SELECT doc_id, nb2_id,
      |    CAST(length(list_intersect(tok, nb2_tok)) AS DOUBLE)
      |      / CAST(length(list_distinct(list_concat(tok, nb2_tok)))
      |        AS DOUBLE)
      |  FROM nb WHERE nb2_id IS NOT NULL)
      |SELECT id_a, id_b, round(j, 6) AS jaccard FROM p WHERE j >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** Pareto concentration audit — "how few sources carry 80% of the
    * tokens?": the concentration number a mixture designer reads before
    * deciding whether source-level weights matter at all (complement of
    * q199's key-level Gini). Sources sort by token mass (desc, name
    * tiebreak), the cumulative runs over the |sources|-row frame, and
    * the 80% test is exact integer (5·cum ≥ 4·total). Output one row:
    * how many sources reach 80%, the top source's share, totals.
    */
  val paretoCoverage: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val per = Dedup.pin(t(s, dir, "documents")
      .select(col("source"), TextStats.tokenCount(col("text")).cast("long").as("n_tok"))
      .groupBy(col("source")).agg(sum(col("n_tok")).as("tok")))
    val tot = per.agg(sum(col("tok")).as("total"), count(lit(1)).as("n_sources"))
    val w = Window.partitionBy(lit(1))
      .orderBy(col("tok").desc, col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per.withColumn("cum", sum(col("tok")).over(w))
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("tok").desc, col("source"))))
      .crossJoin(broadcast(tot))
      .select(col("rk"), col("cum"), col("tok"), col("total"), col("n_sources"))
      // the 80% test gates ONLY n_sources_80 (conditional min);
      // top_share reads the UNFILTERED rk=1 row — a frame-level filter
      // here would null top_share whenever the top source alone holds
      // < 80% of the tokens (ADVICE r7)
      .agg(min(when(col("cum") * 5 >= col("total") * 4, col("rk")))
          .as("n_sources_80"),
        max(col("n_sources")).as("n_sources"),
        max(col("total")).as("total_tokens"),
        round(max(when(col("rk") === 1, col("tok"))).cast("double")
          / max(col("total")).cast("double"), 6).as("top_share"))
  }

  val paretoCoverageSql: String =
    """WITH per AS (SELECT source,
      |    CAST(sum(length(regexp_extract_all(lower(text), '\S+')))
      |      AS BIGINT) AS tok
      |  FROM documents GROUP BY source),
      |tt AS (SELECT CAST(sum(tok) AS BIGINT) AS total,
      |    count(*) AS n_sources FROM per),
      |c AS (SELECT source, tok,
      |    sum(tok) OVER (ORDER BY tok DESC, source) AS cum,
      |    row_number() OVER (ORDER BY tok DESC, source) AS rk FROM per)
      |SELECT CAST(min(CASE WHEN cum * 5 >= total * 4 THEN rk END)
      |    AS INTEGER) AS n_sources_80,
      |  max(n_sources) AS n_sources, max(total) AS total_tokens,
      |  round(CAST(max(CASE WHEN rk = 1 THEN tok END) AS DOUBLE)
      |    / CAST(max(total) AS DOUBLE), 6) AS top_share
      |FROM c CROSS JOIN tt""".stripMargin

  /** Shuffle-partition balance audit — q199's key-skew profiler taken
    * to PARTITION granularity: documents hashed to 32 partitions by a
    * portable md5 partitioner (what the fp-keyed dedup shuffle would
    * do), then per-partition row/char loads and a χ² against uniform.
    * Each χ² term is exact-integer-derived ((P·n_b − N)²/(P·N), one
    * float division) and rounded → DECIMAL before the 32-term sum (the
    * q200 Benford discipline). The pre-flight answer to "will this
    * shuffle hot-spot an executor?". Scale: one keyed count over P
    * cells.
    */
  val partitionBalance: Q = (s, dir) => {
    val P = 32
    val cells = t(s, dir, "documents")
      .select(col("n_chars"),
        (conv(substring(md5(TextStats.fingerprint(col("text"))), 1, 15),
          16, 10).cast("long") % P).as("p"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
    val tot = cells.agg(sum(col("n")).as("nt"))
    cells.crossJoin(broadcast(tot))
      .select(col("n"), col("chars"), col("nt"), {
        // the diff P·n − N fits int64 at any scale; its SQUARE does not
        // — square in double (exact for |diff| < 2^26 at gate SF, and
        // non-wrapping at 100 TB; ADVICE r7 overflow sweep)
        val d = (lit(P) * col("n") - col("nt")).cast("double")
        round(d * d / (lit(P) * col("nt")).cast("double"), 8)
          .cast("decimal(18,8)").as("term")
      })
      .agg(count(lit(1)).as("n_partitions"), max(col("nt")).as("n_rows"),
        max(col("n")).as("max_part"), min(col("n")).as("min_part"),
        round(sum(col("term")).cast("double"), 8).as("chi2"))
  }

  val partitionBalanceSql: String =
    """WITH cells AS (SELECT
      |    ('0x'||substr(md5(md5(trim(regexp_replace(lower(text), '\s+',
      |      ' ', 'g')))), 1, 15))::BIGINT % 32 AS p,
      |    count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
      |  FROM documents GROUP BY 1),
      |tt AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells)
      |SELECT count(*) AS n_partitions, max(nt) AS n_rows,
      |  CAST(max(n) AS BIGINT) AS max_part, CAST(min(n) AS BIGINT) AS min_part,
      |  round(CAST(sum(CAST(round(CAST(32 * n - nt AS DOUBLE)
      |    * CAST(32 * n - nt AS DOUBLE)
      |    / CAST(32 * nt AS DOUBLE), 8) AS DECIMAL(18,8)))
      |    AS DOUBLE), 8) AS chi2
      |FROM cells CROSS JOIN tt""".stripMargin

  /** Cross-modality link-integrity audit: does every document have an
    * embedding, and every embedding a document? The join-coverage
    * hygiene check a multimodal pipeline runs after every ingest (the
    * referential-integrity q137 story, applied across modality tables):
    * full outer join on the id space, per-source matched/missing
    * counts (embedding-only ids have no source — reported in the
    * '_orphan_vectors' row). All integer; one id-keyed join where only
    * ids and the source string travel.
    */
  val modalityCoverage: Q = (s, dir) => {
    val d = t(s, dir, "documents").select(col("doc_id"), col("source"))
    val e = t(s, dir, "embeddings").select(col("vec_id"))
    d.join(e, col("doc_id") === col("vec_id"), "full_outer")
      .select(
        when(col("doc_id").isNotNull, col("source"))
          .otherwise(lit("_orphan_vectors")).as("source"),
        when(col("doc_id").isNotNull && col("vec_id").isNotNull, 1L)
          .otherwise(0L).as("m"),
        when(col("doc_id").isNotNull && col("vec_id").isNull, 1L)
          .otherwise(0L).as("d_only"),
        when(col("doc_id").isNull, 1L).otherwise(0L).as("v_only"))
      .groupBy(col("source"))
      .agg(sum(col("m")).as("n_matched"), sum(col("d_only")).as("n_doc_only"),
        sum(col("v_only")).as("n_vec_only"))
      .orderBy(col("source"))
  }

  val modalityCoverageSql: String =
    """SELECT CASE WHEN doc_id IS NOT NULL THEN source
      |    ELSE '_orphan_vectors' END AS source,
      |  CAST(sum(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
      |  CAST(sum(CASE WHEN doc_id IS NOT NULL AND vec_id IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_doc_only,
      |  CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_vec_only
      |FROM documents d FULL JOIN embeddings e ON d.doc_id = e.vec_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** ML feature-store assembly — the wide per-user training frame a
    * churn/propensity model reads, built by JOINING four feature
    * families the engine already computes: recency/frequency/monetary
    * (q174's base), inter-arrival mean (q202's partials), activity-day
    * count and max streak (q184's islands), and event-type breadth. One
    * keyed join tree over |users|-sized frames; every feature is exact
    * integer/decimal until its one rendering division. The point is the
    * COMPOSITION: feature pipelines are joins of audited parts, not a
    * monolith. Scale: all frames key on user_id — one shuffle key, AQE
    * coalesces the small ones to broadcasts.
    */
  val featureAssembly: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Dedup.pin(Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value")))
    val rfm = ev.groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        coalesce(sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(18,2)"))),
          lit(0).cast("decimal(18,2)")).cast("double").as("monetary"),
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = ev
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap_us")).as("sum_gap"))
      .select(col("user_id"),
        round(col("sum_gap").cast("double") / col("n_gaps") / 1000000.0, 2)
          .as("mean_gap_s"))
    val days = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val wD = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val streaks = days
      .withColumn("rn", row_number().over(wD))
      .withColumn("grp", date_sub(col("d"), col("rn")))
      .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("active_days"), max(col("len")).as("max_streak"))
    rfm.join(gaps, Seq("user_id"), "left")
      .join(streaks, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"), col("n_types"),
        col("n_purchases"), round(col("monetary"), 2).as("monetary"),
        col("last_us"), col("mean_gap_s"), col("active_days"),
        col("max_streak"))
      .orderBy(col("user_id"))
  }

  val featureAssemblySql: String =
    """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    event_type, value FROM events),
      |rfm AS (SELECT user_id, max(epoch_us(ts)) AS last_us,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_purchases,
      |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE)
      |      AS monetary,
      |    count(*) AS n_events,
      |    CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
      |  FROM ev GROUP BY user_id),
      |g AS (SELECT user_id, epoch_us(ts)
      |      - epoch_us(lag(ts) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id)) AS gap_us FROM ev),
      |gaps AS (SELECT user_id,
      |    round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000.0, 2)
      |      AS mean_gap_s
      |  FROM g WHERE gap_us IS NOT NULL GROUP BY user_id),
      |days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM ev),
      |isl AS (SELECT user_id, d - CAST(row_number() OVER (PARTITION BY
      |    user_id ORDER BY d) AS INTEGER) AS grp FROM days),
      |st AS (SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
      |    CAST(max(len) AS BIGINT) AS max_streak
      |  FROM (SELECT user_id, grp, count(*) AS len FROM isl
      |    GROUP BY user_id, grp) GROUP BY user_id)
      |SELECT rfm.user_id, n_events, n_types, n_purchases,
      |  round(monetary, 2) AS monetary, last_us, mean_gap_s,
      |  active_days, max_streak
      |FROM rfm LEFT JOIN gaps ON rfm.user_id = gaps.user_id
      |LEFT JOIN st ON rfm.user_id = st.user_id
      |ORDER BY rfm.user_id""".stripMargin

  /** Deterministic negative sampling for recommender/contrastive
    * training (the corpus-side half of q196's triplet mining, on the
    * interaction graph): for each purchasing user, K=4 candidate
    * negatives drawn by md5(user:k) over the part key space, then
    * positives removed by an anti-join — a candidate that collides with
    * a positive is DROPPED, not resampled (documented bias ≤ K·|pos|/N,
    * negligible at catalog scale; resampling would need a loop).
    * Everything is a pure function of the data; the positives anti-join
    * is the only shuffle. Output is the per-user negative count
    * histogram — |users|-bounded.
    */
  val negativeSampling: Q = (s, dir) => {
    val K = 4
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val ords = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val pos = Dedup.pin(li.join(ords, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("user"), col("l_partkey").as("item"))
      .distinct())
    val nParts = t(s, dir, "part").agg(max(col("p_partkey")).as("np"))
    val cands = pos.select(col("user")).distinct()
      .crossJoin(broadcast(nParts))
      .select(col("user"), col("np"),
        explode(sequence(lit(0), lit(K - 1))).as("k"))
      .select(col("user"),
        (conv(substring(md5(concat(col("user").cast("string"), lit(":"),
          col("k").cast("string"))), 1, 15), 16, 10).cast("long")
          % col("np") + 1).as("item"))
      .distinct()
    cands.join(pos, Seq("user", "item"), "left_anti")
      .groupBy(col("user")).agg(count(lit(1)).as("n_negatives"))
      .groupBy(col("n_negatives")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_negatives"))
  }

  val negativeSamplingSql: String =
    """WITH pos AS (SELECT DISTINCT o_custkey AS usr, l_partkey AS item
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |np AS (SELECT max(p_partkey) AS np FROM part),
      |c AS (SELECT DISTINCT usr,
      |    ('0x'||substr(md5(CAST(usr AS VARCHAR)||':'
      |      ||CAST(k.range AS VARCHAR)), 1, 15))::BIGINT % np + 1 AS item
      |  FROM (SELECT DISTINCT usr FROM pos) CROSS JOIN np
      |  CROSS JOIN range(4) k),
      |neg AS (SELECT c.usr, c.item FROM c
      |  WHERE NOT EXISTS (SELECT 1 FROM pos
      |    WHERE pos.usr = c.usr AND pos.item = c.item)),
      |per AS (SELECT usr, count(*) AS n_negatives FROM neg GROUP BY usr)
      |SELECT n_negatives, count(*) AS n_users FROM per
      |GROUP BY n_negatives ORDER BY n_negatives""".stripMargin

  /** Per-user behavioral entropy (how PREDICTABLE is each user's event
    * mix — the personalization-readiness score; the user-level
    * complement of q163's corpus language entropy): Shannon entropy of
    * the per-user event-type distribution, each −p·ln p term rounded →
    * DECIMAL before the ≤|types|-term sum (the q126 ln discipline),
    * then a users-bounded histogram of entropy deciles. Scale: one
    * (user, type) count, terms on the |users|×|types| frame.
    */
  val behaviorEntropy: Q = (s, dir) => {
    val ut = Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tot = ut.groupBy(col("user_id")).agg(sum(col("n")).as("nt"))
    val ent = ut.join(tot, Seq("user_id"))
      .select(col("user_id"),
        round(-(col("n").cast("double") / col("nt").cast("double"))
          * log(col("n").cast("double") / col("nt").cast("double")), 8)
          .cast("decimal(18,8)").as("term"))
      .groupBy(col("user_id"))
      .agg(round(sum(col("term")).cast("double"), 6).as("entropy"))
    ent.select(col("user_id"),
        floor(col("entropy") * 10).cast("int").as("decile"))
      .groupBy(col("decile")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("decile"))
  }

  val behaviorEntropySql: String =
    """WITH ut AS (SELECT user_id, event_type, count(*) AS n FROM events
      |  GROUP BY 1, 2),
      |tt AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS nt FROM ut
      |  GROUP BY 1),
      |ent AS (SELECT ut.user_id,
      |    round(CAST(sum(CAST(round(-(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE))
      |      * ln(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE)), 8)
      |      AS DECIMAL(18,8))) AS DOUBLE), 6) AS entropy
      |  FROM ut JOIN tt ON ut.user_id = tt.user_id GROUP BY ut.user_id)
      |SELECT CAST(floor(entropy * 10) AS INTEGER) AS decile,
      |  count(*) AS n_users
      |FROM ent GROUP BY 1 ORDER BY 1""".stripMargin

  /** Signed-random-projection (SRP) calibration audit — q189's
    * estimator-under-hash-check discipline applied to the COSINE sketch
    * family (Charikar '02 §3: P[sign collision] = 1 − θ/π, the bound
    * q102's embedding LSH relies on): H=16 Rademacher hyperplanes whose
    * ±1 entries come from md5(h:d) — built as a 16×64 TABLE in both
    * engines, no literal matrix (the r6 janino lesson) — project every
    * vector (projection sums go float→STRING→decimal, the q68 route),
    * and for 20 anchors × md5-u-sampled candidates compare the
    * estimated angle (hamming/H) against the exact acos(cosine)/π.
    * Output: per-anchor mean |error| with each per-pair error rounded →
    * DECIMAL before averaging. Scale: projections are N·dims·H
    * row-local work; the pair frame is anchors × sample — both budgets
    * constant.
    */
  val srpCalibration: Q = (s, dir) => {
    val H = 16
    val emb = t(s, dir, "embeddings")
    // ±1 hyperplane entries from md5(h:d) — identical construction in SQL
    val planes = s.range(H.toLong).select(col("id").cast("int").as("h"))
      .crossJoin(s.range(64L).select((col("id") + 1).cast("int").as("d")))
      .select(col("h"), col("d"),
        when(conv(substring(md5(concat(col("h").cast("string"), lit(":"),
          col("d").cast("string"))), 1, 15), 16, 10).cast("long") % 2 === 0,
          1).otherwise(-1).as("sgn"))
    val comps = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).as("d"),
        col("x").cast("string").cast("decimal(18,9)").as("xd"))
    val sig = Dedup.pin(comps.join(broadcast(planes), Seq("d"))
      .groupBy(col("vec_id"), col("h"))
      .agg(sum(col("sgn") * col("xd")).as("proj"))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("proj") >= 0,
        expr("shiftleft(CAST(1 AS BIGINT), h)")).otherwise(0L)).as("sg")))
    val anchors = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("aid"), col("embedding").as("av"))
    // constant-TARGET candidate stratum (q186 discipline): expected 500
    // candidates at any corpus size, so the pair frame never grows
    val nv = emb.agg(count(lit(1)).cast("double").as("n_vecs"))
    val cands = emb.crossJoin(broadcast(nv))
      .filter(conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10)
        .cast("double") / lit(math.pow(2, 60))
        < least(lit(1.0), lit(500.0) / col("n_vecs")))
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val pairs = anchors.join(cands, col("aid") < col("cid"))
      .withColumn("cos", graft.functions.VectorExpressions
        .cosine_similarity(col("av"), col("cv")))
      .join(sig.select(col("vec_id").as("aid"), col("sg").as("sa")), "aid")
      .join(sig.select(col("vec_id").as("cid"), col("sg").as("sc2")), "cid")
    pairs
      .select(col("aid"),
        round(abs(
          bit_count(col("sa").bitwiseXOR(col("sc2"))).cast("double") / H
            - acos(greatest(lit(-1.0), least(lit(1.0), col("cos"))))
              / math.Pi), 8).cast("decimal(18,8)").as("err"))
      .groupBy(col("aid"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("err")).cast("double") / count(lit(1)), 6)
          .as("mean_abs_err"))
      .orderBy(col("aid"))
  }

  val srpCalibrationSql: String =
    """WITH planes AS (SELECT CAST(h.range AS INTEGER) AS h,
      |    CAST(d.range + 1 AS INTEGER) AS d,
      |    CASE WHEN ('0x'||substr(md5(CAST(h.range AS VARCHAR)||':'
      |      ||CAST(d.range + 1 AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
      |      THEN 1 ELSE -1 END AS sgn
      |  FROM range(16) h CROSS JOIN range(64) d),
      |comps AS (SELECT vec_id, CAST(dd.range + 1 AS INTEGER) AS d,
      |    CAST(CAST(embedding[dd.range + 1] AS VARCHAR) AS DECIMAL(18,9))
      |      AS xd
      |  FROM embeddings CROSS JOIN range(64) dd),
      |proj AS (SELECT vec_id, h, sum(sgn * xd) AS proj
      |  FROM comps JOIN planes USING (d) GROUP BY vec_id, h),
      |sig AS (SELECT vec_id,
      |    CAST(sum(CASE WHEN proj >= 0 THEN 1::BIGINT << h ELSE 0 END)
      |      AS BIGINT) AS sg
      |  FROM proj GROUP BY vec_id),
      |v AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |nv AS (SELECT CAST(count(*) AS DOUBLE) AS n_vecs FROM embeddings),
      |cands AS (SELECT vec_id, e FROM v CROSS JOIN nv
      |  WHERE ('0x'||substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
      |    / CAST(pow(2, 60) AS DOUBLE) < least(1.0, 500.0 / n_vecs)),
      |pr AS (SELECT a.vec_id AS aid, c.vec_id AS cid,
      |    list_dot_product(a.e, c.e) / (sqrt(list_dot_product(a.e, a.e))
      |      * sqrt(list_dot_product(c.e, c.e))) AS cos
      |  FROM v a JOIN cands c ON a.vec_id < 20 AND a.vec_id < c.vec_id),
      |err AS (SELECT aid,
      |    CAST(round(abs(
      |      CAST(bit_count(xor(sa.sg, sc.sg)) AS DOUBLE) / 16
      |      - acos(greatest(-1.0, least(1.0, cos))) / pi()), 8)
      |      AS DECIMAL(18,8)) AS err
      |  FROM pr JOIN sig sa ON pr.aid = sa.vec_id
      |  JOIN sig sc ON pr.cid = sc.vec_id)
      |SELECT aid, count(*) AS n_pairs,
      |  round(CAST(sum(err) AS DOUBLE) / count(*), 6) AS mean_abs_err
      |FROM err GROUP BY aid ORDER BY aid""".stripMargin

  /** Workload seasonality profile — the hour-of-week heat map capacity
    * planning reads (and the seasonal baseline q141's anomaly z-scores
    * normalize against): events bucketed into the 168-cell
    * (day-of-week, hour) grid with per-cell counts and the cell's
    * share of its day. dayofweek is normalized to the ISO convention
    * explicitly (Spark 1=Sunday vs DuckDB 0=Sunday — the q69 lesson).
    * All integer until the share division; the grid is fixed-size at
    * any scale.
    */
  val seasonalityProfile: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(dayofweek(col("ts")).as("dow_spark"), hour(col("ts")).as("hod"))
      .select((col("dow_spark") - 1).as("dow"), col("hod"))
    val cells = ev.groupBy(col("dow"), col("hod")).agg(count(lit(1)).as("n"))
    val perDay = cells.groupBy(col("dow")).agg(sum(col("n")).as("day_tot"))
    cells.join(broadcast(perDay), Seq("dow"))
      .select(col("dow"), col("hod"), col("n"),
        round(col("n").cast("double") / col("day_tot").cast("double"), 6)
          .as("day_share"))
      .orderBy(col("dow"), col("hod"))
  }

  val seasonalityProfileSql: String =
    """WITH e AS (SELECT CAST(dayofweek(CAST(ts AS TIMESTAMP)) AS INTEGER)
      |    AS dow, CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hod
      |  FROM events),
      |c AS (SELECT dow, hod, count(*) AS n FROM e GROUP BY 1, 2),
      |d AS (SELECT dow, CAST(sum(n) AS BIGINT) AS day_tot FROM c
      |  GROUP BY 1)
      |SELECT c.dow, hod, n,
      |  round(CAST(n AS DOUBLE) / CAST(day_tot AS DOUBLE), 6) AS day_share
      |FROM c JOIN d ON c.dow = d.dow
      |ORDER BY c.dow, hod""".stripMargin

  /** Per-source scorecard — the "which sources do we keep" composite a
    * curation review reads, assembled (q231's composition discipline,
    * source-side) from three audited families: exact-dup token savings
    * (q225's keeper), mean quality score (decSum contract), and mean
    * doc length. The composite rank is integer: sources order by
    * (low dup savings, high quality) via exact sort keys, no weighted
    * float blend — a blend would demand a justified weighting; the
    * lexicographic rank is the audit-grade default. Scale: three
    * |sources|-row frames joined on one key.
    */
  val sourceScorecard: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Dedup.pin(t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        TextStats.fingerprint(col("text")).as("fp"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tok"),
        TextStats.qualityScore(col("text")).as("q"),
        col("n_chars")))
    val keep = docs.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val kept = docs.join(keep, Seq("fp", "doc_id"), "left_semi")
      .groupBy(col("source")).agg(sum(col("n_tok")).as("kept_tok"))
    val base = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("raw_tok"),
        sum(col("n_chars")).as("chars"),
        sum(round(col("q"), 6).cast("decimal(18,6)")).as("qsum"))
    val joined = base.join(kept, Seq("source"))
      .select(col("source"), col("n_docs"),
        (col("raw_tok") - col("kept_tok")).as("dup_tok"),
        round(col("qsum").cast("double") / col("n_docs"), 6).as("mean_q"),
        round(col("chars").cast("double") / col("n_docs"), 2)
          .as("mean_chars"),
        col("qsum"))
    joined
      .withColumn("rank", row_number().over(Window.partitionBy(lit(1))
        .orderBy(col("dup_tok"), col("qsum").desc, col("source"))))
      .select(col("rank"), col("source"), col("n_docs"), col("dup_tok"),
        col("mean_q"), col("mean_chars"))
      .orderBy(col("rank"))
  }

  val sourceScorecardSql: String =
    """WITH d AS (SELECT doc_id, source,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |    CAST(length(regexp_extract_all(lower(text), '\S+')) AS BIGINT)
      |      AS n_tok,
      |    round(
      |      least(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE)
      |        / 50.0, 1.0) * 0.4
      |    + (1.0 - least(CAST(length(regexp_extract_all(text,
      |        '[[:punct:]]')) AS DOUBLE)
      |        / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0))
      |        * 0.3
      |    + least(CAST(length(regexp_extract_all(lower(text),
      |        '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
      |        / greatest(CAST(length(regexp_extract_all(text, '\S+'))
      |          AS DOUBLE), 1.0) * 4.0, 1.0) * 0.3, 6) AS q,
      |    n_chars FROM documents),
      |k AS (SELECT fp, min(doc_id) AS doc_id FROM d GROUP BY fp),
      |kept AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS kept_tok
      |  FROM d JOIN k USING (fp, doc_id) GROUP BY source),
      |base AS (SELECT source, count(*) AS n_docs,
      |    CAST(sum(n_tok) AS BIGINT) AS raw_tok,
      |    CAST(sum(n_chars) AS BIGINT) AS chars,
      |    sum(CAST(q AS DECIMAL(18,6))) AS qsum
      |  FROM d GROUP BY source),
      |j AS (SELECT base.source, n_docs, raw_tok - kept_tok AS dup_tok,
      |    round(CAST(qsum AS DOUBLE) / n_docs, 6) AS mean_q,
      |    round(CAST(chars AS DOUBLE) / n_docs, 2) AS mean_chars, qsum
      |  FROM base JOIN kept ON base.source = kept.source)
      |SELECT CAST(row_number() OVER (ORDER BY dup_tok, qsum DESC, source)
      |    AS INTEGER) AS rank,
      |  source, n_docs, dup_tok, mean_q, mean_chars
      |FROM j ORDER BY rank""".stripMargin

  /** Watermark-lateness audit under backfill replay — the batch
    * analysis that SIZES the streaming gates' watermarks
    * (q177/q208/q209) for the WORST realistic arrival order: a backfill
    * that replays events md5-shuffled (live ingest is near-ordered —
    * measured lateness 0 on this corpus — but replay/backfill is not,
    * and that is the case a watermark must survive). Arrival order =
    * md5(event_id); each event's lateness is the running max event-time
    * seen so far minus its own — exact integer µs off one window pass —
    * bucketed into power-of-4-minute classes with cumulative share. The
    * report reads directly as "a W-minute watermark passes X% of a
    * shuffled replay". Scale: one arrival-order window — at 100 TB this
    * runs per replay partition (arrival order is only defined within
    * one), which is exactly how the production question is posed.
    */
  val latenessAudit: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    // two-phase global running max over the replay order (r8: the old
    // Window.partitionBy(lit(1)) funneled the whole events corpus
    // through ONE partition — the exact q178 hazard class; see Ranks)
    val late = Ranks.globalRunningMax(
      Tables.events(s, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("arr",
          conv(substring(md5(col("event_id").cast("string")), 1, 15),
            16, 10).cast("long")),
      Seq(col("arr"), col("event_id")), col("us"), "run_max")
      // integer div — `/` is double division in BOTH engines, and the
      // double→int cast then TRUNCATES in Spark but ROUNDS in DuckDB
      .select(expr("(run_max - us) div 60000000").as("late_min"))
      .select(
        when(col("late_min") === 0, 0)
          .when(col("late_min") <= 4, 1)
          .when(col("late_min") <= 16, 2)
          .when(col("late_min") <= 64, 3)
          .when(col("late_min") <= 256, 4).otherwise(5).as("bucket"))
    val cells = late.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val tot = cells.agg(sum(col("n")).as("nt"))
    val wc = Window.partitionBy(lit(1)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.withColumn("cum", sum(col("n")).over(wc))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("n"),
        round(col("cum").cast("double") / col("nt").cast("double"), 6)
          .as("cum_share"))
      .orderBy(col("bucket"))
  }

  val latenessAuditSql: String =
    """WITH l AS (SELECT (max(epoch_us(CAST(ts AS TIMESTAMP)))
      |      OVER (ORDER BY ('0x'||substr(md5(CAST(event_id AS VARCHAR)),
      |        1, 15))::BIGINT, event_id)
      |      - epoch_us(CAST(ts AS TIMESTAMP))) // 60000000 AS late_min
      |  FROM events),
      |b AS (SELECT CASE WHEN late_min = 0 THEN 0 WHEN late_min <= 4 THEN 1
      |    WHEN late_min <= 16 THEN 2 WHEN late_min <= 64 THEN 3
      |    WHEN late_min <= 256 THEN 4 ELSE 5 END AS bucket FROM l),
      |c AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c)
      |SELECT bucket, n,
      |  round(CAST(sum(n) OVER (ORDER BY bucket) AS DOUBLE)
      |    / CAST(nt AS DOUBLE), 6) AS cum_share
      |FROM c CROSS JOIN t ORDER BY bucket""".stripMargin

  /** Split-balance KS audit — the acceptance test for q223's
    * group-aware folds: the max pairwise two-sample KS distance between
    * fold length-distributions (all 10 fold pairs). A leakage-SAFE
    * split can still be length-SKEWED (big near-dup clusters drag whole
    * mass into one fold); this is the check that catches it. Same
    * value-domain discipline as q181: per-(len, fold) counts, dense
    * grid, per-fold cumulative windows — the KS sup runs over distinct
    * lens, never docs. Folds² = 10 pairs, output one row per pair.
    */
  val foldBalance: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val pairs = Dedup.blockedJaccardPairs(docs, "text", "doc_id",
      Seq("lang", "n_chars"), threshold = 0.5)
    val cl = Dedup.clusters(pairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
    val folded = Dedup.pin(docs.select(col("doc_id"), col("n_chars").as("len"))
      .join(cl, Seq("doc_id"), "left")
      .select(col("len"),
        (conv(substring(md5(coalesce(col("cluster_id"), col("doc_id"))
          .cast("string")), 1, 15), 16, 10).cast("long") % 5).cast("int")
          .as("fold")))
    val c = folded.groupBy(col("len"), col("fold")).agg(count(lit(1)).as("cnt"))
    val grid = folded.select(col("len")).distinct()
      .crossJoin(broadcast(folded.select(col("fold")).distinct()))
    val cum = grid.join(c, Seq("len", "fold"), "left")
      .select(col("len"), col("fold"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("fold")).orderBy(col("len"))))
    val ns = folded.groupBy(col("fold")).agg(count(lit(1)).as("n"))
    val withN = cum.join(broadcast(ns), Seq("fold"))
    withN.as("a").join(withN.as("b"),
        col("a.len") === col("b.len") && col("a.fold") < col("b.fold"))
      .groupBy(col("a.fold").as("fold_a"), col("b.fold").as("fold_b"))
      .agg(round(max(abs(
        col("a.cum").cast("double") / col("a.n")
          - col("b.cum").cast("double") / col("b.n"))), 6).as("ks"))
      .orderBy(col("fold_a"), col("fold_b"))
  }

  val foldBalanceSql: String =
    """WITH RECURSIVE toks AS (
      | SELECT doc_id, lang, n_chars,
      |  list_distinct(regexp_extract_all(lower(text), '\S+')) AS tok
      | FROM documents WHERE length(regexp_extract_all(lower(text), '\S+')) > 0),
      |edges AS (
      | SELECT l.doc_id AS a, r.doc_id AS b
      | FROM toks l JOIN toks r
      |   ON l.lang = r.lang AND l.n_chars = r.n_chars AND l.doc_id < r.doc_id
      | WHERE CAST(length(list_intersect(l.tok, r.tok)) AS DOUBLE) /
      |       length(list_distinct(list_concat(l.tok, r.tok))) >= 0.5),
      |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      |reach AS (SELECT a, b FROM sym
      |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a),
      |cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      |  FROM reach GROUP BY a),
      |f AS (SELECT d.n_chars AS len,
      |    CAST(('0x'||substr(md5(CAST(coalesce(cluster_id, d.doc_id)
      |      AS VARCHAR)), 1, 15))::BIGINT % 5 AS INTEGER) AS fold
      |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
      |c AS (SELECT len, fold, count(*) AS cnt FROM f GROUP BY 1, 2),
      |grid AS (SELECT DISTINCT l.len, fo.fold FROM
      |  (SELECT DISTINCT len FROM f) l
      |  CROSS JOIN (SELECT DISTINCT fold FROM f) fo),
      |cum AS (SELECT grid.len, grid.fold,
      |    sum(coalesce(cnt, 0)) OVER (PARTITION BY grid.fold
      |      ORDER BY grid.len) AS cum
      |  FROM grid LEFT JOIN c ON grid.len = c.len AND grid.fold = c.fold),
      |ns AS (SELECT fold, count(*) AS n FROM f GROUP BY fold),
      |wn AS (SELECT cum.*, n FROM cum JOIN ns ON cum.fold = ns.fold)
      |SELECT a.fold AS fold_a, b.fold AS fold_b,
      |  round(max(abs(CAST(a.cum AS DOUBLE) / a.n
      |    - CAST(b.cum AS DOUBLE) / b.n)), 6) AS ks
      |FROM wn a JOIN wn b ON a.len = b.len AND a.fold < b.fold
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Quality-keeper selection within near-dup clusters — the keeper
    * POLICY layer over q65's components (exact-dup groups can't
    * disagree on content policies — identical text — but near-dup
    * clusters can, and "keep the best, not the first" is the Gopher/
    * RefinedWeb practice): per cluster, the argmax of (quality-decimal,
    * −doc_id) via one struct-max, reported against the min-id baseline
    * with the per-cluster quality delta. Quality enters as
    * round→DECIMAL so the argmax key is exact. Output clusters-bounded.
    */
  val clusterKeeper: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.blockedJaccardPairs(docs, "text", "doc_id",
      Seq("lang", "n_chars"), threshold = 0.5)
    val cl = Dedup.clusters(pairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
    val members = docs.join(cl, Seq("doc_id"))
      .select(col("cluster_id"), col("doc_id"),
        round(TextStats.qualityScore(col("text")), 6)
          .cast("decimal(18,6)").as("q"))
    members.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        min(col("doc_id")).as("first_keeper"),
        max(struct(col("q"), (-col("doc_id")).as("nid"))).as("m"),
        min(col("q")).as("q_min"))
      .select(col("cluster_id"), col("n_members"), col("first_keeper"),
        (-col("m.nid")).as("best_keeper"),
        col("m.q").cast("double").as("q_best"),
        (col("m.q") - col("q_min")).cast("double").as("q_spread"),
        (col("first_keeper") =!= -col("m.nid")).as("policy_differs"))
      .orderBy(col("cluster_id"))
  }

  val clusterKeeperSql: String =
    """WITH RECURSIVE toks AS (
      | SELECT doc_id, lang, n_chars,
      |  list_distinct(regexp_extract_all(lower(text), '\S+')) AS tok
      | FROM documents WHERE length(regexp_extract_all(lower(text), '\S+')) > 0),
      |edges AS (
      | SELECT l.doc_id AS a, r.doc_id AS b
      | FROM toks l JOIN toks r
      |   ON l.lang = r.lang AND l.n_chars = r.n_chars AND l.doc_id < r.doc_id
      | WHERE CAST(length(list_intersect(l.tok, r.tok)) AS DOUBLE) /
      |       length(list_distinct(list_concat(l.tok, r.tok))) >= 0.5),
      |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      |reach AS (SELECT a, b FROM sym
      |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a),
      |cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      |  FROM reach GROUP BY a),
      |m AS (SELECT cluster_id, d.doc_id,
      |    CAST(round(
      |      least(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE)
      |        / 50.0, 1.0) * 0.4
      |    + (1.0 - least(CAST(length(regexp_extract_all(text,
      |        '[[:punct:]]')) AS DOUBLE)
      |        / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0))
      |        * 0.3
      |    + least(CAST(length(regexp_extract_all(lower(text),
      |        '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
      |        / greatest(CAST(length(regexp_extract_all(text, '\S+'))
      |          AS DOUBLE), 1.0) * 4.0, 1.0) * 0.3, 6) AS DECIMAL(18,6))
      |      AS q
      |  FROM documents d JOIN cl ON d.doc_id = cl.doc_id),
      |pick AS (SELECT cluster_id, doc_id AS best_keeper, q AS q_best
      |  FROM (SELECT m.*, row_number() OVER (PARTITION BY cluster_id
      |      ORDER BY q DESC, doc_id) AS rn FROM m) WHERE rn = 1)
      |SELECT m.cluster_id, count(*) AS n_members,
      |  CAST(min(m.doc_id) AS BIGINT) AS first_keeper,
      |  CAST(max(best_keeper) AS BIGINT) AS best_keeper,
      |  CAST(max(q_best) AS DOUBLE) AS q_best,
      |  CAST(max(q_best) - min(q) AS DOUBLE) AS q_spread,
      |  min(m.doc_id) <> max(best_keeper) AS policy_differs
      |FROM m JOIN pick ON m.cluster_id = pick.cluster_id
      |GROUP BY m.cluster_id ORDER BY m.cluster_id""".stripMargin

  /** Layout-pruning comparison: WHY z-order beats linear clustering for
    * multi-dimensional range scans, measured analytically (the scan-IO
    * model behind q111's morton key): for a 2-D box predicate on
    * (p_size band, key band), count how many 256-row "files" contain at
    * least one matching row under (a) key-sorted layout and (b)
    * morton-sorted layout. Fewer touched files = more row groups
    * skipped by min/max stats at scan time. File ids are row_number
    * div 256 under each ordering — exact integers; the result is the
    * pruning argument as a hash-checked number, not prose. Scale: the
    * global ranks under each ordering come from the two-phase
    * [[Ranks.globalRowNumber]] (r8 sweep — the old partitionBy(lit(1))
    * window funneled the whole part table through one partition), so
    * both layouts rank as P-way range shuffles.
    */
  val layoutPruning: Q = (s, dir) => {
    val base = Dedup.pin(t(s, dir, "part")
      .select(col("p_partkey"), col("p_size"),
        (col("p_partkey") % 1024).cast("int").as("pk_lo"))
      .withColumn("z", graft.functions.VectorExpressions
        .morton_interleave(col("p_size"), col("pk_lo"))))
    val hit = col("p_size").between(10, 20) && col("pk_lo").between(100, 300)
    def touched(order: Column, label: String) =
      Ranks.globalRowNumber(base, Seq(order, col("p_partkey")), "rn")
      .withColumn("file_id", expr("(rn - 1) div 256"))
      .filter(hit)
      .agg(lit(label).as("layout"),
        countDistinct(col("file_id")).as("files_touched"),
        count(lit(1)).as("rows_matched"))
    touched(col("p_partkey"), "linear_key")
      .unionAll(touched(col("z"), "morton"))
      .orderBy(col("layout"))
  }

  val layoutPruningSql: String =
    """WITH b AS (SELECT p_partkey, p_size,
      |    CAST(p_partkey % 1024 AS INTEGER) AS pk_lo,
      |    CAST(list_sum(list_transform(generate_series(0, 15),
      |      i -> ((p_size >> i) & 1) * (CAST(1 AS BIGINT) << (2*i))
      |        + (((p_partkey % 1024) >> i) & 1)
      |          * (CAST(1 AS BIGINT) << (2*i + 1)))) AS BIGINT) AS z
      |  FROM part),
      |lin AS (SELECT *, (row_number() OVER (ORDER BY p_partkey, p_partkey)
      |    - 1) // 256 AS file_id FROM b),
      |mor AS (SELECT *, (row_number() OVER (ORDER BY z, p_partkey)
      |    - 1) // 256 AS file_id FROM b),
      |u AS (
      |  SELECT 'linear_key' AS layout,
      |    CAST(count(DISTINCT file_id) AS BIGINT) AS files_touched,
      |    count(*) AS rows_matched
      |  FROM lin WHERE p_size BETWEEN 10 AND 20
      |    AND pk_lo BETWEEN 100 AND 300
      |  UNION ALL
      |  SELECT 'morton',
      |    CAST(count(DISTINCT file_id) AS BIGINT), count(*)
      |  FROM mor WHERE p_size BETWEEN 10 AND 20
      |    AND pk_lo BETWEEN 100 AND 300)
      |SELECT layout, files_touched, rows_matched FROM u
      |ORDER BY layout""".stripMargin

  /** Join-cardinality estimation under hash-check — the optimizer-style
    * pre-flight ("how big will this join be?") that decides broadcast
    * vs sort-merge vs salting BEFORE the shuffle ships: a deterministic
    * md5-u key sample (rate 1/8) of the orders⋈lineitem key space
    * estimates |A⋈B| as 8·Σ_sampled n_a(k)·n_b(k) — sampling KEYS (not
    * rows) keeps per-key frequency products unbiased. The gate reports
    * estimate, exact, and signed relative error — the estimator itself
    * under oracle check (q189/q234 discipline, applied to the
    * optimizer's statistic). All integer except the one error division.
    * Scale: per-key counts are the join's own keyed aggs at 1/8 key
    * mass; the estimate never materializes the join.
    */
  val joinCardEstimate: Q = (s, dir) => {
    val ka = Dedup.pin(t(s, dir, "orders")
      .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("na")))
    val kb = Dedup.pin(t(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("nb")))
    val sampled = ka.join(kb, Seq("k"))
      .filter(conv(substring(md5(col("k").cast("string")), 1, 15), 16, 10)
        .cast("long") % 8 === 0)
      .agg(sum(col("na") * col("nb")).as("s"))
      .select((col("s") * 8).as("estimate"))
    val exact = ka.join(kb, Seq("k"))
      .agg(sum(col("na") * col("nb")).as("exact_rows"))
    sampled.crossJoin(exact)
      .select(col("estimate"), col("exact_rows"),
        round((col("estimate") - col("exact_rows")).cast("double")
          / col("exact_rows").cast("double"), 6).as("rel_err"))
  }

  val joinCardEstimateSql: String =
    """WITH ka AS (SELECT o_orderkey AS k, count(*) AS na FROM orders
      |  GROUP BY 1),
      |kb AS (SELECT l_orderkey AS k, count(*) AS nb FROM lineitem
      |  GROUP BY 1),
      |j AS (SELECT ka.k, na, nb FROM ka JOIN kb ON ka.k = kb.k),
      |est AS (SELECT CAST(sum(na * nb) * 8 AS BIGINT) AS estimate FROM j
      |  WHERE ('0x'||substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT
      |    % 8 = 0),
      |ex AS (SELECT CAST(sum(na * nb) AS BIGINT) AS exact_rows FROM j)
      |SELECT estimate, exact_rows,
      |  round(CAST(estimate - exact_rows AS DOUBLE)
      |    / CAST(exact_rows AS DOUBLE), 6) AS rel_err
      |FROM est CROSS JOIN ex""".stripMargin

  /** Incremental JOIN-view maintenance — the delta-join algebra that
    * completes q171's aggregate-IVM story: a materialized
    * orders⋈customer view updated for a day-2 delta batch as
    * V' = V ∪ (ΔA⋈B) (customer dimension static here; the general form
    * adds A⋈ΔB ∪ ΔA⋈ΔB — same plan shape, delta-keyed joins only).
    * Day-1 view = orders with o_orderkey % 10 ≠ 0; the delta = the
    * held-out tenth. The gate hash-checks the MAINTAINED view against a
    * full recompute — maintenance ≡ recompute, the IVM contract, per
    * (nation, status) rollup with decimal money. Scale: day-2 cost is
    * |Δ|-keyed work only — the full fact table is never rescanned.
    */
  val joinIvm: Q = (s, dir) => {
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val orders = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
    def viewOf(o: org.apache.spark.sql.DataFrame) =
      o.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("price")).as("rev"))
    val day1 = viewOf(orders.filter(col("o_orderkey") % 10 =!= 0))
    val deltaV = viewOf(orders.filter(col("o_orderkey") % 10 === 0))
    // maintenance: merge the delta view into the materialized partials
    val maintained = day1
      .unionByName(deltaV)
      .groupBy(col("c_nationkey"), col("o_orderstatus"))
      .agg(sum(col("n")).as("n"), sum(col("rev")).as("rev"))
    maintained
      .select(col("c_nationkey"), col("o_orderstatus"), col("n"),
        col("rev").cast("double").as("revenue"))
      .orderBy(col("c_nationkey"), col("o_orderstatus"))
  }

  val joinIvmSql: String =
    """SELECT c_nationkey, o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Dedup-threshold sensitivity sweep — the tuning curve read before
    * committing a near-dup threshold fleet-wide ("how many pairs does
    * each threshold admit?"): the blocked exact-Jaccard pair frame is
    * computed ONCE at the lowest threshold of interest (0.3) and each
    * candidate threshold's admitted-pair count and mean similarity come
    * from bucketing that single frame — never one pair pass per
    * threshold. Mean similarity re-enters DECIMAL from per-pair rounded
    * values. Output |thresholds| rows; scale = one q23-shaped blocked
    * pair computation.
    */
  val thresholdSweep: Q = (s, dir) => {
    val pairs = Dedup.pin(Dedup.blockedJaccardPairs(
        t(s, dir, "documents"), "text", "doc_id",
        Seq("lang", "n_chars"), threshold = 0.3)
      .select(round(col("jaccard"), 6).cast("decimal(18,6)").as("j")))
    val th = Seq(0.3, 0.5, 0.7, 0.9)
    th.map { t0 =>
      pairs.filter(col("j") >= t0)
        .agg(lit(t0).as("threshold"), count(lit(1)).as("n_pairs"),
          round(coalesce(sum(col("j")).cast("double")
            / count(lit(1)), lit(0.0)), 6).as("mean_j"))
    }.reduce(_ unionAll _).orderBy(col("threshold"))
  }

  val thresholdSweepSql: String =
    """WITH toks AS (
      | SELECT doc_id, lang, n_chars,
      |  list_distinct(regexp_extract_all(lower(text), '\S+')) AS tok
      | FROM documents WHERE length(regexp_extract_all(lower(text), '\S+')) > 0),
      |p AS (
      | SELECT CAST(round(
      |     CAST(length(list_intersect(l.tok, r.tok)) AS DOUBLE) /
      |     length(list_distinct(list_concat(l.tok, r.tok))), 6)
      |   AS DECIMAL(18,6)) AS j
      | FROM toks l JOIN toks r
      |   ON l.lang = r.lang AND l.n_chars = r.n_chars AND l.doc_id < r.doc_id
      | WHERE CAST(length(list_intersect(l.tok, r.tok)) AS DOUBLE) /
      |       length(list_distinct(list_concat(l.tok, r.tok))) >= 0.3),
      |th AS (SELECT CAST(unnest([0.3, 0.5, 0.7, 0.9]) AS DOUBLE)
      |  AS threshold)
      |SELECT threshold, count(j) AS n_pairs,
      |  round(coalesce(CAST(sum(j) AS DOUBLE) / count(j), 0.0), 6)
      |    AS mean_j
      |FROM th LEFT JOIN p ON j >= threshold
      |GROUP BY threshold ORDER BY threshold""".stripMargin

  /** Cohort LTV curves — q139's retention matrix upgraded to MONEY (the
    * curve an acquisition budget is set against): users cohorted by
    * first-activity week, cumulative purchase value per cohort at each
    * week-age. Money rides DECIMAL cents end-to-end; the cumulative is
    * a window over the cohorts×ages grid (≤ 5×5 here), never over
    * events; ages derive from exact integer week arithmetic on
    * epoch-days (no float date math). Scale: one per-user min, one
    * (cohort, age) rollup, windows on the tiny grid.
    */
  val ltvCurves: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val raw = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    // anchor weeks at the DATA's min date (no wall clock, no hardcoded
    // corpus date — the q198 recency-anchor discipline)
    val anchor = raw.agg(min(to_date(col("ts"))).as("d0"))
    val ev = raw.crossJoin(broadcast(anchor))
      .withColumn("week",
        expr("CAST(datediff(to_date(ts), d0) AS INT) div 7"))
    val first = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
    val cells = ev.filter(col("event_type") === "purchase")
      .join(first, Seq("user_id"))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("age"))
      .agg(sum(col("cents")).as("cents"),
        countDistinct(col("user_id")).as("n_buyers"))
    val sizes = first.groupBy(col("cohort")).agg(count(lit(1)).as("n_users"))
    cells.join(broadcast(sizes), Seq("cohort"))
      .withColumn("cum_cents", sum(col("cents")).over(
        Window.partitionBy(col("cohort")).orderBy(col("age"))))
      .select(col("cohort"), col("age"), col("n_users"), col("n_buyers"),
        round(col("cum_cents").cast("double")
          / (col("n_users") * 100).cast("double"), 4).as("ltv_per_user"))
      .orderBy(col("cohort"), col("age"))
  }

  val ltvCurvesSql: String =
    """WITH a AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
      |ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    CAST(datediff('day', d0, CAST(ts AS DATE))
      |      AS INTEGER) // 7 AS week
      |  FROM events CROSS JOIN a),
      |f AS (SELECT user_id, CAST(min(week) AS INTEGER) AS cohort FROM ev
      |  GROUP BY user_id),
      |c AS (SELECT cohort, CAST(week - cohort AS INTEGER) AS age,
      |    CAST(sum(cents) AS BIGINT) AS cents,
      |    CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_buyers
      |  FROM ev JOIN f ON ev.user_id = f.user_id
      |  WHERE event_type = 'purchase' GROUP BY 1, 2),
      |sz AS (SELECT cohort, count(*) AS n_users FROM f GROUP BY 1)
      |SELECT c.cohort, age, n_users, n_buyers,
      |  round(CAST(sum(cents) OVER (PARTITION BY c.cohort ORDER BY age)
      |    AS DOUBLE) / CAST(n_users * 100 AS DOUBLE), 4) AS ltv_per_user
      |FROM c JOIN sz ON c.cohort = sz.cohort
      |ORDER BY c.cohort, age""".stripMargin

  /** Hill tail-index estimator (Hill '75) for the document-length
    * distribution — the heavy-tail diagnostic that decides whether
    * max-length truncation budgets can be set from means or must use
    * quantiles (q130's Zipf slope is the RANK law; Hill is the TAIL
    * law): α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the k=100 largest lengths.
    * The top-(k+1) order statistics come from one TakeOrdered; each ln
    * ratio is rounded → DECIMAL before the k-term sum (the q126 ln
    * discipline), so the estimator is bit-stable. Output one row with
    * the implied tail exponent. Scale: TakeOrdered never sorts the
    * corpus; all arithmetic on k+1 rows.
    */
  val hillTail: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val k = 100
    val top = t(s, dir, "documents")
      .select(col("n_chars").cast("double").as("x"), col("doc_id"))
      .orderBy(col("x").desc, col("doc_id")).limit(k + 1)
    val ranked = top.withColumn("rn", row_number().over(
      Window.partitionBy(lit(1)).orderBy(col("x").desc, col("doc_id"))))
    val xk1 = ranked.filter(col("rn") === k + 1)
      .select(col("x").as("xk"))
    ranked.filter(col("rn") <= k).crossJoin(broadcast(xk1))
      .select(round(log(col("x") / col("xk")), 8)
        .cast("decimal(18,8)").as("term"))
      .agg(count(lit(1)).as("k"),
        round(sum(col("term")).cast("double"), 8).as("sum_ln"),
        round(lit(k.toDouble) / sum(col("term")).cast("double"), 6)
          .as("alpha_hat"))
  }

  val hillTailSql: String =
    """WITH top AS (SELECT CAST(n_chars AS DOUBLE) AS x, doc_id,
      |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
      |  FROM documents),
      |xk AS (SELECT x AS xk FROM top WHERE rn = 101),
      |terms AS (SELECT CAST(round(ln(x / xk), 8) AS DECIMAL(18,8)) AS term
      |  FROM top CROSS JOIN xk WHERE rn <= 100)
      |SELECT count(*) AS k,
      |  round(CAST(sum(term) AS DOUBLE), 8) AS sum_ln,
      |  round(100.0 / CAST(sum(term) AS DOUBLE), 6) AS alpha_hat
      |FROM terms""".stripMargin

  /** Week-over-week event-mix drift (χ² homogeneity of each week's
    * event-type distribution against the pooled corpus — the
    * weekly-cadence complement of q181's KS and q166's KL: the alarm a
    * pipeline owner pages on when a release shifts the event mix):
    * weeks anchor at the data's min date (q198 discipline), the
    * weeks×types cell grid is fixed-size, and each χ² term
    * (n_wt − E)²/E with E = n_w·n_t/N derives from exact integers as
    * ((N·n_wt − n_w·n_t)²)/(N·n_w·n_t) — one float division per cell,
    * rounded → DECIMAL before the per-week sum (the q200/q229
    * discipline). Scale: one keyed count over the grid.
    */
  val typeDrift: Q = (s, dir) => {
    val raw = Tables.events(s, dir).select(col("ts"), col("event_type"))
    val anchor = raw.agg(min(to_date(col("ts"))).as("d0"))
    val cells = Dedup.pin(raw.crossJoin(broadcast(anchor))
      .withColumn("week", expr("CAST(datediff(to_date(ts), d0) AS INT) div 7"))
      .groupBy(col("week"), col("event_type")).agg(count(lit(1)).as("n")))
    val perW = cells.groupBy(col("week")).agg(sum(col("n")).as("nw"))
    val perT = cells.groupBy(col("event_type")).agg(sum(col("n")).as("nt"))
    val tot = cells.agg(sum(col("n")).as("ntot"))
    cells.join(broadcast(perW), Seq("week"))
      .join(broadcast(perT), Seq("event_type"))
      .crossJoin(broadcast(tot))
      .select(col("week"), {
        // N·n_wt − n_w·n_t in DECIMAL(38,0) (int64 wraps silently at
        // corpus scale while DuckDB raises — ADVICE r7); the square and
        // the triple-product denominator run in double, where neither
        // can wrap and both engines agree bit-for-bit
        val d = (col("ntot").cast("decimal(38,0)") * col("n")
          - col("nw").cast("decimal(38,0)") * col("nt")).cast("double")
        round(d * d / (col("ntot").cast("double") * col("nw").cast("double")
          * col("nt").cast("double")), 8)
          .cast("decimal(18,8)").as("term")
      })
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_types"),
        round(sum(col("term")).cast("double"), 8).as("chi2"))
      .orderBy(col("week"))
  }

  val typeDriftSql: String =
    """WITH a AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
      |c AS (SELECT CAST(datediff('day', d0, CAST(ts AS DATE)) AS INTEGER)
      |    // 7 AS week, event_type, count(*) AS n
      |  FROM events CROSS JOIN a GROUP BY 1, 2),
      |pw AS (SELECT week, CAST(sum(n) AS BIGINT) AS nw FROM c GROUP BY 1),
      |pt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nt FROM c
      |  GROUP BY 1),
      |tt AS (SELECT CAST(sum(n) AS BIGINT) AS ntot FROM c)
      |SELECT c.week, count(*) AS n_types,
      |  round(CAST(sum(CAST(round(
      |    CAST(CAST(ntot AS HUGEINT) * n - CAST(nw AS HUGEINT) * nt
      |      AS DOUBLE)
      |    * CAST(CAST(ntot AS HUGEINT) * n - CAST(nw AS HUGEINT) * nt
      |      AS DOUBLE)
      |    / (CAST(ntot AS DOUBLE) * CAST(nw AS DOUBLE)
      |      * CAST(nt AS DOUBLE)), 8) AS DECIMAL(18,8)))
      |    AS DOUBLE), 8) AS chi2
      |FROM c JOIN pw ON c.week = pw.week
      |JOIN pt ON c.event_type = pt.event_type CROSS JOIN tt
      |GROUP BY c.week ORDER BY c.week""".stripMargin

  // ======================================= round-8 additions (q247+)

  /** The quality-score SQL twin (TextStats.qualityScore verbatim) shared
    * by the round-8 oracles — same expression the q178/q239 oracles
    * inline.
    */
  private val qScoreSql: String =
    """round(
      |      least(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE) / 50.0, 1.0) * 0.4
      |    + (1.0 - least(CAST(length(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
      |        / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)) * 0.3
      |    + least(CAST(length(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
      |        / greatest(CAST(length(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0) * 4.0, 1.0) * 0.3,
      |    6)""".stripMargin

  /** Classifier-calibration audit (reliability diagram + per-bin Brier
    * terms + the ECE decomposition; Naeini '15 / Guo '17 framing): the
    * quality score read as a pseudo-probability that a document is
    * English, binned into deciles, each bin reporting population,
    * confidence (mean score), empirical accuracy (share actually en),
    * the |acc − conf| gap, its N-weighted ECE contribution, and the
    * bin's Brier mean. The go/no-go read before a score is used as a
    * sampling weight (a mis-calibrated score silently re-weights the
    * corpus). Determinism: score is round(·,6) at source; per-row
    * (s−y)² rounds → DECIMAL before the bin sum; bin means divide
    * exact DECIMAL sums and round last. Scale: one scan, 10 rows of
    * state — the agg is the whole query; nothing is corpus-sized after
    * the map side.
    */
  val calibrationAudit: Q = (s, dir) => {
    val scored = t(s, dir, "documents")
      .select(TextStats.qualityScore(col("text")).as("sc"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .select(col("sc"), col("y"),
        least(floor(col("sc") * 10).cast("int"), lit(9)).as("bin"),
        round((col("sc") - col("y")) * (col("sc") - col("y")), 8)
          .cast("decimal(18,8)").as("sq"))
    // the 10-row binned aggregate is pinned: its two consumers (the
    // grand total and the final projection) must not re-scan and
    // re-regex the corpus (q183 lesson)
    val binned = Dedup.pin(scored.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("sc").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("conf"),
        round(sum(col("y")).cast("double") / count(lit(1)), 6).as("acc"),
        round(sum(col("sq")).cast("double") / count(lit(1)), 6)
          .as("brier_bin")))
    val tot = binned.agg(sum(col("n_docs")).as("n_all"))
    binned
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("n_docs"), col("conf"), col("acc"),
        round(abs(col("acc") - col("conf")), 6).as("abs_gap"),
        round(col("n_docs").cast("double") / col("n_all").cast("double")
          * abs(col("acc") - col("conf")), 6).as("ece_term"),
        col("brier_bin"))
      .orderBy(col("bin"))
  }

  val calibrationAuditSql: String =
    s"""WITH sc AS (SELECT $qScoreSql AS sc,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
       |b AS (SELECT sc, y,
       |    least(CAST(floor(sc * 10) AS INTEGER), 9) AS bin,
       |    CAST(round((sc - y) * (sc - y), 8) AS DECIMAL(18,8)) AS sq
       |  FROM sc),
       |tt AS (SELECT count(*) AS n_all FROM b),
       |g AS (SELECT bin, count(*) AS n_docs,
       |    round(CAST(sum(CAST(sc AS DECIMAL(18,6))) AS DOUBLE)
       |      / count(*), 6) AS conf,
       |    round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS acc,
       |    round(CAST(sum(sq) AS DOUBLE) / count(*), 6) AS brier_bin
       |  FROM b GROUP BY bin)
       |SELECT bin, n_docs, conf, acc,
       |  round(abs(acc - conf), 6) AS abs_gap,
       |  round(CAST(n_docs AS DOUBLE) / CAST(n_all AS DOUBLE)
       |    * abs(acc - conf), 6) AS ece_term,
       |  brier_bin
       |FROM g CROSS JOIN tt ORDER BY bin""".stripMargin

  /** Mann–Whitney U rank-sum test (Mann & Whitney '47, with the tie
    * correction): are English documents drawn from the same length
    * distribution as the rest? The distribution-free two-sample test a
    * corpus comparison reaches for before any parametric assumption
    * (q181's KS gives the max-gap view; U gives the rank-sum view with
    * an asymptotic z). EVERYTHING until the final z is exact integer
    * via the VALUE-DOMAIN discipline (q123/q216): ranks come from the
    * distinct n_chars domain — avg rank of a tied value kept as the
    * DOUBLED integer 2·cum_before + cnt + 1, so Σranks of group A is
    * an exact integer sum over |domain| rows, never a corpus window.
    * Tie correction Σ(t³−t) in DECIMAL(38,0). Scale: the only window
    * runs over the distinct-value frame (bounded by the n_chars
    * domain), shuffles carry (value, group) counts.
    */
  val mannWhitney: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val per = t(s, dir, "documents")
      .select(col("n_chars"),
        when(col("lang") === "en", 1L).otherwise(0L).as("isA"))
      .groupBy(col("n_chars"))
      .agg(sum(col("isA")).as("ca"), count(lit(1)).as("ct"))
    // bounded partition-less window: input is the per-DISTINCT-n_chars
    // aggregate — value-domain-sized (≤ max doc length rows), never the
    // corpus (r8 verdict #5 allowlist)
    val w = Window.orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = per
      .withColumn("cum", sum(col("ct")).over(w))
      // doubled average rank of this tied value: 2·(cum−ct) + ct + 1
      .withColumn("r2", lit(2) * (col("cum") - col("ct")) + col("ct") + 1)
    ranked.agg(
        sum(col("ca")).as("na"),
        sum(col("ct") - col("ca")).as("nb"),
        // ca·r2 ~ N² wraps int64 at corpus scale — DECIMAL(38,0)
        // through the whole rank-sum (HUGEINT on the oracle side)
        sum(col("ca").cast("decimal(38,0)") * col("r2")).as("ra2"),
        sum((col("ct").cast("decimal(38,0)") * col("ct") * col("ct")
          - col("ct"))).as("ties"))
      .select(col("na"), col("nb"), {
        // U_A = R_A − n_A(n_A+1)/2, carried doubled until the final /2
        val u2 = col("ra2") - col("na").cast("decimal(38,0)") * (col("na") + 1)
        val n = col("na") + col("nb")
        val mu2 = col("na").cast("decimal(38,0)") * col("nb") // 2·µ_U
        val varU = col("na").cast("double") * col("nb").cast("double") / 12.0 *
          ((n + 1).cast("double") -
            col("ties").cast("double")
              / (n.cast("double") * (n - 1).cast("double")))
        struct(
          round(u2.cast("double") / 2.0, 1).as("u_stat"),
          round((u2 - mu2).cast("double") / 2.0 / sqrt(varU), 6).as("z"))
          .as("f")
      })
      .select(col("na"), col("nb"), col("f.u_stat").as("u_stat"),
        col("f.z").as("z"))
  }

  val mannWhitneySql: String =
    """WITH per AS (SELECT n_chars,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ca,
      |    count(*) AS ct
      |  FROM documents GROUP BY n_chars),
      |r AS (SELECT ca, ct,
      |    2 * (sum(ct) OVER (ORDER BY n_chars
      |      ROWS UNBOUNDED PRECEDING) - ct) + ct + 1 AS r2
      |  FROM per),
      |agg AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
      |    CAST(sum(ct - ca) AS BIGINT) AS nb,
      |    sum(CAST(ca AS HUGEINT) * r2) AS ra2,
      |    CAST(sum(CAST(ct AS HUGEINT) * ct * ct - ct) AS DOUBLE) AS ties
      |  FROM r)
      |SELECT na, nb,
      |  round(CAST(ra2 - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE)
      |    / 2.0, 1) AS u_stat,
      |  round(CAST(ra2 - CAST(na AS HUGEINT) * (na + 1)
      |      - CAST(na AS HUGEINT) * nb AS DOUBLE) / 2.0
      |    / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
      |      * (CAST(na + nb + 1 AS DOUBLE)
      |        - ties / (CAST(na + nb AS DOUBLE)
      |          * CAST(na + nb - 1 AS DOUBLE)))), 6) AS z
      |FROM agg""".stripMargin

  /** First-order Markov transition matrix of user event streams (the
    * behavioral fingerprint a product-analytics team reads for "what
    * follows what": transition counts and row-conditional probabilities
    * P(next=to | cur=from) over each user's time-ordered sequence).
    * Ordering is total per user (ts, event_id tiebreak); the lead()
    * window is PARTITIONED BY user — thousands of parallel partitions,
    * never a global sort. State after the map side: |types|² cells.
    * Probabilities divide exact integer counts, rounded once.
    */
  val markovTransitions: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val seq = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("to_type").isNotNull)
    val cells = Dedup.pin(seq.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans")))
    val rowTot = cells.groupBy(col("from_type"))
      .agg(sum(col("n_trans")).as("n_from"))
    cells.join(broadcast(rowTot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        round(col("n_trans").cast("double") / col("n_from").cast("double"),
          6).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val markovTransitionsSql: String =
    """WITH s AS (SELECT user_id, event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
      |  FROM events),
      |c AS (SELECT from_type, to_type, count(*) AS n_trans FROM s
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |rt AS (SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS n_from
      |  FROM c GROUP BY 1)
      |SELECT c.from_type, to_type, n_trans,
      |  round(CAST(n_trans AS DOUBLE) / CAST(n_from AS DOUBLE), 6) AS p
      |FROM c JOIN rt ON c.from_type = rt.from_type
      |ORDER BY c.from_type, to_type""".stripMargin

  /** Kaplan–Meier survival of time-to-first-error in EVENT STEPS
    * (Kaplan & Meier '58, product-limit estimator with right
    * censoring): for each user, t = the 1-based position of the first
    * `error` event in their time-ordered stream, censored at the
    * stream's end for users who never error — "how many actions does a
    * user get through before the first failure", with censoring handled
    * correctly (a naive failure-rate-per-position over-counts for
    * short streams; calendar-day lifetime is degenerate on this corpus
    * — every user spans the full window, so day-granularity churn has
    * zero uncensored deaths). S(t) = Π_{t'≤t} (1 − deaths_{t'}/risk_{t'}).
    * Exactness: deaths/risk are exact integers (at-risk =
    * reverse-cumulative over the position domain); each step's
    * ln(1−d/r) rounds → DECIMAL before the cumulative sum (q126's ln
    * discipline); one exp at the end. Scale: the per-user position
    * window is user-partitioned; after the per-user reduce every frame
    * is POSITION-domain-sized (≤ max events per user), so the two
    * unpartitioned windows run over a bounded domain, never the corpus.
    */
  val kmRetention: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val seqd = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        row_number().over(Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))).as("pos"))
    val per = seqd.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "error", col("pos"))).as("terr"),
        max(col("pos")).as("nev"))
      .select(coalesce(col("terr"), col("nev")).as("t"),
        col("terr").isNull.as("censored"))
    val byT = per.groupBy(col("t"))
      .agg(sum(when(col("censored"), 0L).otherwise(1L)).as("deaths"),
        count(lit(1)).as("n_at"))
    // bounded partition-less windows: input is the per-DISTINCT-t
    // aggregate (one row per distinct event time in the study grid),
    // never the subject corpus (r8 verdict #5 allowlist)
    val wRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("risk", sum(col("n_at")).over(wRisk))
      .filter(col("deaths") > 0)
      // deaths == risk is the absorbing state (everyone remaining dies:
      // S hits exactly 0 and ln(0) diverges — DuckDB raises, Spark
      // nulls): flag it cumulatively and pin surv to 0.0 from there on
      .withColumn("gone",
        max(when(col("deaths") === col("risk"), 1).otherwise(0)).over(wCum))
      .withColumn("lnterm",
        when(col("deaths") < col("risk"),
          round(log(lit(1.0) - col("deaths").cast("double")
            / col("risk").cast("double")), 8).cast("decimal(18,8)")))
      .withColumn("surv",
        when(col("gone") === 1, lit(0.0))
          .otherwise(round(exp(sum(col("lnterm")).over(wCum)
            .cast("double")), 6)))
      .select(col("t"), col("deaths"), col("risk"), col("surv"))
      .orderBy(col("t"))
  }

  val kmRetentionSql: String =
    """WITH s AS (SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS pos
      |  FROM events),
      |u AS (SELECT user_id,
      |    min(CASE WHEN event_type = 'error' THEN pos END) AS terr,
      |    max(pos) AS nev FROM s GROUP BY user_id),
      |lt AS (SELECT coalesce(terr, nev) AS t, terr IS NULL AS censored
      |  FROM u),
      |bt AS (SELECT t,
      |    CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT)
      |      AS deaths,
      |    count(*) AS n_at FROM lt GROUP BY t),
      |r AS (SELECT t, deaths,
      |    CAST(sum(n_at) OVER (ORDER BY t DESC
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS risk FROM bt),
      |tm AS (SELECT t, deaths, risk,
      |    max(CASE WHEN deaths = risk THEN 1 ELSE 0 END)
      |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS gone,
      |    CASE WHEN deaths < risk THEN
      |      CAST(round(ln(1.0 - CAST(deaths AS DOUBLE)
      |        / CAST(risk AS DOUBLE)), 8) AS DECIMAL(18,8)) END AS lnterm
      |  FROM r WHERE deaths > 0)
      |SELECT t, deaths, risk,
      |  CASE WHEN gone = 1 THEN 0.0
      |    ELSE round(exp(CAST(sum(lnterm) OVER (ORDER BY t
      |      ROWS UNBOUNDED PRECEDING) AS DOUBLE)), 6) END AS surv
      |FROM tm ORDER BY t""".stripMargin

  /** Importance reweighting to a TARGET mixture (uniform over sources —
    * the Xie '23 DoReMi-style "reweight, don't resample" first step)
    * with the effective-sample-size diagnostic (Kish '65): per-source
    * weight w_s = N/(S·n_s) normalizes the corpus to equal source mass;
    * ESS/N = S²/(N·Σ 1/n_s) says how much statistical power the
    * reweighting costs (1.0 = already uniform; → 0 as one source
    * dominates). All per-source quantities derive from exact counts;
    * the only cross-row float sum (Σ 1/n_s, one term per SOURCE) goes
    * per-value round → DECIMAL. Scale: one keyed count; |sources| rows
    * of state; nothing corpus-sized leaves the map side.
    */
  val importanceReweight: Q = (s, dir) => {
    val per = Dedup.pin(t(s, dir, "documents").groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs")))
    val tot = per.agg(sum(col("n_docs")).as("n_all"),
      count(lit(1)).as("n_sources"),
      sum(round(lit(1.0) / col("n_docs"), 14).cast("decimal(18,14)"))
        .as("inv_sum"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        round(col("n_docs").cast("double") / col("n_all").cast("double"), 6)
          .as("share"),
        round(col("n_all").cast("double")
          / (col("n_sources").cast("double") * col("n_docs").cast("double")),
          6).as("weight"),
        round(col("n_sources").cast("double") * col("n_sources").cast("double")
          / (col("n_all").cast("double") * col("inv_sum").cast("double")), 6)
          .as("ess_ratio"))
      .orderBy(col("source"))
  }

  val importanceReweightSql: String =
    """WITH per AS (SELECT source, count(*) AS n_docs FROM documents
      |  GROUP BY source),
      |tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_all,
      |    count(*) AS n_sources,
      |    sum(CAST(round(1.0 / n_docs, 14) AS DECIMAL(18,14))) AS inv_sum
      |  FROM per)
      |SELECT source, n_docs,
      |  round(CAST(n_docs AS DOUBLE) / CAST(n_all AS DOUBLE), 6) AS share,
      |  round(CAST(n_all AS DOUBLE)
      |    / (CAST(n_sources AS DOUBLE) * CAST(n_docs AS DOUBLE)), 6)
      |    AS weight,
      |  round(CAST(n_sources AS DOUBLE) * CAST(n_sources AS DOUBLE)
      |    / (CAST(n_all AS DOUBLE) * CAST(inv_sum AS DOUBLE)), 6)
      |    AS ess_ratio
      |FROM per CROSS JOIN tt ORDER BY source""".stripMargin

  /** LSH banding-parameter calibration against OBSERVED similarities
    * (the S-curve 1−(1−s^r)^b of Broder/Indyk–Motwani banding theory,
    * evaluated where it matters — on this corpus's actual near-neighbor
    * similarity profile, not a textbook grid): candidate pairs come
    * from the q227 sorted-neighborhood generator (O(n·w), no
    * threshold), bucket by exact-Jaccard decile, and each decile
    * reports its pair mass, mean Jaccard, and the probability the
    * SHIPPED (b=16, r=4) MinHash banding would surface such a pair —
    * the table a dedup owner reads to see which similarity range the
    * current banding misses. Determinism: per-pair j rounds → DECIMAL
    * before the decile mean; the S-curve is a single compound float on
    * the rounded mean. Scale: the window IS the candidate generator
    * (q227); deciles are 10 rows of state.
    */
  val lshCalibration: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        array_distinct(TextStats.tokens(lower(col("text")))).as("tok"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    val withNb = docs
      .withColumn("nb1_tok", lead(col("tok"), 1).over(w))
      .withColumn("nb2_tok", lead(col("tok"), 2).over(w))
    def jOf(tokC: String) = withNb.filter(col(tokC).isNotNull)
      .select(round(size(array_intersect(col("tok"), col(tokC))).cast("double")
        / size(array_union(col("tok"), col(tokC))).cast("double"), 6).as("j"))
    jOf("nb1_tok").unionAll(jOf("nb2_tok"))
      .select(col("j"), least(floor(col("j") * 10).cast("int"), lit(9))
        .as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("j").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("mean_j"))
      .withColumn("p_candidate",
        round(lit(1.0) - pow(lit(1.0) - pow(col("mean_j"), 4), 16), 6))
      .orderBy(col("decile"))
  }

  val lshCalibrationSql: String =
    """WITH d AS (SELECT doc_id, lang, n_chars,
      |    list_distinct(regexp_extract_all(lower(text), '\S+')) AS tok
      |  FROM documents),
      |nb AS (SELECT tok,
      |    lead(tok, 1) OVER w AS nb1_tok, lead(tok, 2) OVER w AS nb2_tok
      |  FROM d WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)),
      |p AS (
      |  SELECT round(CAST(length(list_intersect(tok, nb1_tok)) AS DOUBLE)
      |    / CAST(length(list_distinct(list_concat(tok, nb1_tok)))
      |      AS DOUBLE), 6) AS j
      |  FROM nb WHERE nb1_tok IS NOT NULL
      |  UNION ALL
      |  SELECT round(CAST(length(list_intersect(tok, nb2_tok)) AS DOUBLE)
      |    / CAST(length(list_distinct(list_concat(tok, nb2_tok)))
      |      AS DOUBLE), 6)
      |  FROM nb WHERE nb2_tok IS NOT NULL),
      |g AS (SELECT least(CAST(floor(j * 10) AS INTEGER), 9) AS decile,
      |    count(*) AS n_pairs,
      |    round(CAST(sum(CAST(j AS DECIMAL(18,6))) AS DOUBLE)
      |      / count(*), 6) AS mean_j
      |  FROM p GROUP BY 1)
      |SELECT decile, n_pairs, mean_j,
      |  round(1.0 - pow(1.0 - pow(mean_j, 4), 16), 6) AS p_candidate
      |FROM g ORDER BY decile""".stripMargin

  /** Embedding-space drift matrix: pairwise cosine between per-LABEL
    * centroids — "are class regions collapsing or drifting apart", the
    * geometry check run after any re-embedding before similarity
    * thresholds are trusted again (complements q153's PCA variance
    * view with a direct between-class angle view). Centroids follow
    * the q41 float→STRING→DECIMAL discipline per dimension; the 45
    * label-pair cosines derive from rounded centroid cells with
    * per-dim product rounds → DECIMAL sums. Scale: one posexplode scan
    * reduces to |labels|×64 cells; everything after is
    * labels²-bounded.
    */
  val centroidDrift: Q = (s, dir) => {
    val cells = t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(round(sum(col("v").cast("string").cast("decimal(18,9)"))
        .cast("double") / count(lit(1)), 6).as("c"))
    val pairs = cells.as("a").join(cells.as("b"),
        col("a.pos") === col("b.pos") && col("a.label") < col("b.label"))
      .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
        round(col("a.c") * col("b.c"), 10).cast("decimal(20,10)").as("ab"),
        round(col("a.c") * col("a.c"), 10).cast("decimal(20,10)").as("aa"),
        round(col("b.c") * col("b.c"), 10).cast("decimal(20,10)").as("bb"))
    pairs.groupBy(col("label_a"), col("label_b"))
      .agg(round(sum(col("ab")).cast("double")
        / sqrt(sum(col("aa")).cast("double") * sum(col("bb")).cast("double")),
        6).as("cosine"))
      .orderBy(col("label_a"), col("label_b"))
  }

  val centroidDriftSql: String =
    """WITH cells AS (SELECT label, CAST(d.dim AS INTEGER) AS pos,
      |    round(CAST(sum(CAST(CAST(embedding[d.dim] AS VARCHAR)
      |      AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6) AS c
      |  FROM embeddings CROSS JOIN
      |    (SELECT unnest(generate_series(1, 64)) AS dim) d
      |  GROUP BY 1, 2)
      |SELECT a.label AS label_a, b.label AS label_b,
      |  round(CAST(sum(CAST(round(a.c * b.c, 10) AS DECIMAL(20,10)))
      |      AS DOUBLE)
      |    / sqrt(CAST(sum(CAST(round(a.c * a.c, 10) AS DECIMAL(20,10)))
      |        AS DOUBLE)
      |      * CAST(sum(CAST(round(b.c * b.c, 10) AS DECIMAL(20,10)))
      |        AS DOUBLE)), 6) AS cosine
      |FROM cells a JOIN cells b ON a.pos = b.pos AND a.label < b.label
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Unseen-species estimation per source (Good '53 / Chao '84): the
    * Good–Turing unseen-probability mass p₀ = n₁/N (share of the NEXT
    * token drawn that will be a never-seen type) and the bias-corrected
    * Chao1 richness floor V + n₁(n₁−1)/(2(n₂+1)) — "how much vocabulary
    * is the next crawl of this source going to add", the planning
    * number behind tokenizer-budget and dedup-priority calls (q221's
    * TTR says what IS there; this says what ISN'T yet). Everything is
    * exact integer (N, V, n₁, n₂ off one token-keyed agg) with two
    * final float divisions. Scale: the q129/q188 gram discipline —
    * shuffle carries (source, token) once; state is |sources| rows.
    */
  val unseenSpecies: Q = (s, dir) => {
    val cnt = t(s, dir, "documents")
      .select(col("source"),
        explode(TextStats.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    cnt.groupBy(col("source"))
      .agg(sum(col("c")).as("n_tok"), count(lit(1)).as("vocab"),
        coalesce(sum(when(col("c") === 1, 1L)), lit(0L)).as("n1"),
        coalesce(sum(when(col("c") === 2, 1L)), lit(0L)).as("n2"))
      .select(col("source"), col("n_tok"), col("vocab"), col("n1"),
        col("n2"),
        round(col("n1").cast("double") / col("n_tok").cast("double"), 6)
          .as("p_unseen"),
        round(col("vocab").cast("double")
          + col("n1").cast("double") * (col("n1") - 1).cast("double")
            / (lit(2.0) * (col("n2") + 1).cast("double")), 2).as("chao1"))
      .orderBy(col("source"))
  }

  val unseenSpeciesSql: String =
    """WITH tk AS (SELECT source,
      |    unnest(regexp_extract_all(lower(text), '\S+')) AS tok
      |  FROM documents),
      |c AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2)
      |SELECT source, CAST(sum(c) AS BIGINT) AS n_tok,
      |  count(*) AS vocab,
      |  CAST(coalesce(sum(CASE WHEN c = 1 THEN 1 END), 0) AS BIGINT) AS n1,
      |  CAST(coalesce(sum(CASE WHEN c = 2 THEN 1 END), 0) AS BIGINT) AS n2,
      |  round(CAST(coalesce(sum(CASE WHEN c = 1 THEN 1 END), 0) AS DOUBLE)
      |    / CAST(sum(c) AS DOUBLE), 6) AS p_unseen,
      |  round(CAST(count(*) AS DOUBLE)
      |    + CAST(coalesce(sum(CASE WHEN c = 1 THEN 1 END), 0) AS DOUBLE)
      |      * CAST(coalesce(sum(CASE WHEN c = 1 THEN 1 END), 0) - 1
      |        AS DOUBLE)
      |      / (2.0 * CAST(coalesce(sum(CASE WHEN c = 2 THEN 1 END), 0) + 1
      |        AS DOUBLE)), 2) AS chao1
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  /** Heaps'-law fit (Heaps '78, V = k·N^β): log-log OLS of vocabulary
    * size on token count across sources — the sublinear-growth exponent
    * every tokenizer-capacity and storage projection extrapolates with
    * (q221/vocabGrowth gives the raw per-source points; this fits the
    * law and reports how well it holds). The fit runs on |sources|
    * points: ln's round → DECIMAL per point (the q126 ln discipline),
    * the five OLS moments are DECIMAL sums, slope/intercept/r² are
    * single compound float expressions over exact sums (q226's grouped
    * OLS shape, one group). Scale: input is the (source, token)-keyed
    * agg; the regression itself is |sources|-bounded.
    */
  val heapsFit: Q = (s, dir) => {
    val pts = t(s, dir, "documents")
      .select(col("source"),
        explode(TextStats.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
      .select(round(log(col("n").cast("double")), 8)
          .cast("decimal(18,8)").as("x"),
        round(log(col("v").cast("double")), 8).cast("decimal(18,8)").as("y"))
      .select(col("x"), col("y"),
        round(col("x") * col("y"), 10).cast("decimal(24,10)").as("xy"),
        round(col("x") * col("x"), 10).cast("decimal(24,10)").as("xx"),
        round(col("y") * col("y"), 10).cast("decimal(24,10)").as("yy"))
    pts.agg(count(lit(1)).as("n_sources"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("xy")).as("sxy"), sum(col("xx")).as("sxx"),
        sum(col("yy")).as("syy"))
      .select(col("n_sources"), {
        val n = col("n_sources").cast("double")
        // operators TRAIL the line (a LEADING '-' in a brace block is a
        // new unary-minus statement in Scala and silently drops the
        // subtrahend — caught by the sf0.01 oracle on first contact)
        val cov = n * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")
        val vx = n * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")
        val vy = n * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double")
        struct(
          round(cov / vx, 6).as("beta"),
          round(exp((col("sy").cast("double") - cov / vx
            * col("sx").cast("double")) / n), 4).as("k_hat"),
          round(cov * cov / (vx * vy), 6).as("r2")).as("f")
      })
      .select(col("n_sources"), col("f.beta").as("beta"),
        col("f.k_hat").as("k_hat"), col("f.r2").as("r2"))
  }

  val heapsFitSql: String =
    """WITH tk AS (SELECT source,
      |    unnest(regexp_extract_all(lower(text), '\S+')) AS tok
      |  FROM documents),
      |c AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2),
      |p0 AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
      |    count(*) AS v FROM c GROUP BY source),
      |p AS (SELECT CAST(round(ln(CAST(n AS DOUBLE)), 8) AS DECIMAL(18,8))
      |      AS x,
      |    CAST(round(ln(CAST(v AS DOUBLE)), 8) AS DECIMAL(18,8)) AS y
      |  FROM p0),
      |m AS (SELECT x, y,
      |    CAST(round(x * y, 10) AS DECIMAL(24,10)) AS xy,
      |    CAST(round(x * x, 10) AS DECIMAL(24,10)) AS xx,
      |    CAST(round(y * y, 10) AS DECIMAL(24,10)) AS yy FROM p),
      |a AS (SELECT count(*) AS n_sources,
      |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(xy) AS DOUBLE) AS sxy, CAST(sum(xx) AS DOUBLE) AS sxx,
      |    CAST(sum(yy) AS DOUBLE) AS syy FROM m)
      |SELECT n_sources,
      |  round((n_sources * sxy - sx * sy)
      |    / (n_sources * sxx - sx * sx), 6) AS beta,
      |  round(exp((sy - (n_sources * sxy - sx * sy)
      |      / (n_sources * sxx - sx * sx) * sx) / n_sources), 4) AS k_hat,
      |  round((n_sources * sxy - sx * sy) * (n_sources * sxy - sx * sy)
      |    / ((n_sources * sxx - sx * sx)
      |      * (n_sources * syy - sy * sy)), 6) AS r2
      |FROM a""".stripMargin

  /** Offline CUSUM changepoint detection (Page '54's cumulative-sum
    * statistic in its retrospective max-|S| form): daily event totals,
    * centered cumulative sum S_d = Σ_{d'≤d}(x − μ), and the changepoint
    * estimate argmax|S_d| with the σ√n-normalized magnitude — the
    * level-shift detector that catches what q246's week-mix χ² (share
    * drift) and the rolling z (local spikes) both miss: a sustained
    * volume step. EXACTNESS: S is carried ×n as n·S_d = n·cum_d −
    * d_idx·N (pure integers in DECIMAL(38,0) — no float until the two
    * final divisions), so the argmax is an exact integer argmax with a
    * min-day tiebreak. Scale: day-domain-bounded after the daily
    * reduce; the cumulative window runs over |days| rows.
    */
  val cusumChangepoint: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Dedup.pin(Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")))
    val tot = daily.agg(count(lit(1)).as("nd"), sum(col("x")).as("nx"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("nxx"))
    // bounded partition-less windows (this and idx below): input is the
    // per-DAY aggregate — calendar-sized, never events (r8 verdict #5)
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("cum", sum(col("x")).over(wCum))
      .withColumn("idx", row_number().over(Window.orderBy(col("day"))))
      .crossJoin(broadcast(tot))
      // n·S_d, exact in DECIMAL(38,0)
      .withColumn("ns", col("nd").cast("decimal(38,0)") * col("cum")
        - col("idx").cast("decimal(38,0)") * col("nx"))
      .withColumn("absns", abs(col("ns")))
    val top = cum.orderBy(col("absns").desc, col("day")).limit(1)
    top.select(col("nd").as("n_days"), col("day").as("cp_day"),
      round((col("ns").cast("double") / col("nd").cast("double")), 2)
        .as("s_at_cp"),
      round(abs(col("ns")).cast("double") / col("nd").cast("double")
        / (sqrt((col("nd").cast("double") * col("nxx").cast("double")
          - col("nx").cast("double") * col("nx").cast("double"))
          / (col("nd").cast("double") * col("nd").cast("double")))
          * sqrt(col("nd").cast("double"))), 6).as("stat"))
  }

  val cusumChangepointSql: String =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS x
      |  FROM events GROUP BY 1),
      |tt AS (SELECT count(*) AS nd, CAST(sum(x) AS BIGINT) AS nx,
      |    sum(CAST(x AS HUGEINT) * x) AS nxx FROM daily),
      |c AS (SELECT day,
      |    CAST(sum(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cum,
      |    row_number() OVER (ORDER BY day) AS idx FROM daily),
      |ns AS (SELECT day,
      |    CAST(nd AS HUGEINT) * cum - CAST(idx AS HUGEINT) * nx AS ns,
      |    nd, nx, nxx FROM c CROSS JOIN tt),
      |top AS (SELECT * FROM ns ORDER BY abs(ns) DESC, day LIMIT 1)
      |SELECT nd AS n_days, day AS cp_day,
      |  round(CAST(ns AS DOUBLE) / CAST(nd AS DOUBLE), 2) AS s_at_cp,
      |  round(CAST(abs(ns) AS DOUBLE) / CAST(nd AS DOUBLE)
      |    / (sqrt((CAST(nd AS DOUBLE) * CAST(nxx AS DOUBLE)
      |      - CAST(nx AS DOUBLE) * CAST(nx AS DOUBLE))
      |      / (CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE)))
      |      * sqrt(CAST(nd AS DOUBLE))), 6) AS stat
      |FROM top""".stripMargin

  /** Classifier ranking-quality battery: EXACT ROC-AUC via the
    * rank-sum identity AUC = U/(n₊·n₋) (Hanley–McNeil '82 — so the AUC
    * needs no curve integration and no corpus sort: it reuses q248's
    * value-domain doubled-rank machinery on the score domain), plus the
    * precision/recall/F1 operating table at the 11 decile thresholds —
    * the companion readout to q247's calibration: q247 says whether the
    * score MEANS its value, this says how well it RANKS (and where to
    * cut it). Positives = lang-en documents, score = quality. All
    * counts exact integers; divisions happen once per output cell;
    * zero-denominator cells are NULL on both engines. Scale: one scan
    * to score-value counts (≤10⁶ distinct rounded scores), then
    * 11-row and 1-row frames.
    */
  val rocPr: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val per = Dedup.pin(t(s, dir, "documents")
      .select(TextStats.qualityScore(col("text")).as("sc"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .groupBy(col("sc"))
      .agg(sum(col("y")).as("ca"), count(lit(1)).as("ct")))
    // bounded partition-less window: input is the per-DISTINCT-score
    // aggregate — score-domain-sized, never the corpus (r8 verdict #5)
    val w = Window.orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val auc = per
      .withColumn("cum", sum(col("ct")).over(w))
      .withColumn("r2", lit(2) * (col("cum") - col("ct")) + col("ct") + 1)
      .agg(sum(col("ca")).as("na"), sum(col("ct") - col("ca")).as("nb"),
        sum(col("ca").cast("decimal(38,0)") * col("r2")).as("ra2"))
      .select(round((col("ra2")
        - col("na").cast("decimal(38,0)") * (col("na") + 1)).cast("double")
        / 2.0
        / (col("na").cast("double") * col("nb").cast("double")), 6)
        .as("auc"))
    val grid = spark_range_thresholds(s)
    per.crossJoin(broadcast(grid))
      .groupBy(col("thresh"))
      .agg(
        coalesce(sum(when(col("sc") >= col("thresh").cast("double") / 10.0,
          col("ca"))), lit(0L)).as("tp"),
        coalesce(sum(when(col("sc") >= col("thresh").cast("double") / 10.0,
          col("ct") - col("ca"))), lit(0L)).as("fp"),
        coalesce(sum(when(col("sc") < col("thresh").cast("double") / 10.0,
          col("ca"))), lit(0L)).as("fn"))
      .select(col("thresh"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double")
            / (col("tp") + col("fp")).cast("double"), 6)).as("precision"),
        when(col("tp") + col("fn") > 0,
          round(col("tp").cast("double")
            / (col("tp") + col("fn")).cast("double"), 6)).as("recall"),
        when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
          round(lit(2.0) * col("tp").cast("double")
            / (lit(2) * col("tp") + col("fp") + col("fn")).cast("double"),
            6)).as("f1"))
      .crossJoin(broadcast(auc))
      .orderBy(col("thresh"))
  }

  private def spark_range_thresholds(s: SparkSession): DataFrame =
    s.range(0, 11).select(col("id").cast("int").as("thresh"))

  val rocPrSql: String =
    s"""WITH sc AS (SELECT $qScoreSql AS sc,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
       |per AS (SELECT sc, CAST(sum(y) AS BIGINT) AS ca, count(*) AS ct
       |  FROM sc GROUP BY sc),
       |r AS (SELECT sc, ca, ct,
       |    2 * (sum(ct) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) - ct)
       |      + ct + 1 AS r2 FROM per),
       |a AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
       |    CAST(sum(ct - ca) AS BIGINT) AS nb,
       |    sum(CAST(ca AS HUGEINT) * r2) AS ra2 FROM r),
       |auc AS (SELECT round(CAST(ra2 - CAST(na AS HUGEINT) * (na + 1)
       |      AS DOUBLE) / 2.0
       |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS auc FROM a),
       |g AS (SELECT CAST(t.range AS INTEGER) AS thresh FROM range(11) t),
       |cells AS (SELECT thresh,
       |    CAST(coalesce(sum(CASE WHEN sc >= CAST(thresh AS DOUBLE) / 10.0
       |      THEN ca END), 0) AS BIGINT) AS tp,
       |    CAST(coalesce(sum(CASE WHEN sc >= CAST(thresh AS DOUBLE) / 10.0
       |      THEN ct - ca END), 0) AS BIGINT) AS fp,
       |    CAST(coalesce(sum(CASE WHEN sc < CAST(thresh AS DOUBLE) / 10.0
       |      THEN ca END), 0) AS BIGINT) AS fn
       |  FROM per CROSS JOIN g GROUP BY thresh)
       |SELECT thresh, tp, fp, fn,
       |  CASE WHEN tp + fp > 0 THEN round(CAST(tp AS DOUBLE)
       |    / CAST(tp + fp AS DOUBLE), 6) END AS precision,
       |  CASE WHEN tp + fn > 0 THEN round(CAST(tp AS DOUBLE)
       |    / CAST(tp + fn AS DOUBLE), 6) END AS recall,
       |  CASE WHEN 2 * tp + fp + fn > 0 THEN round(2.0 * CAST(tp AS DOUBLE)
       |    / CAST(2 * tp + fp + fn AS DOUBLE), 6) END AS f1,
       |  auc
       |FROM cells CROSS JOIN auc ORDER BY thresh""".stripMargin

  /** Watermark-lateness audit: the measurement that SIZES
    * `withWatermark` for the streaming family (q177/q194/q208/q209) —
    * how much event-time disorder does the arrival stream actually
    * carry, and what fraction of events would each candidate watermark
    * drop? Arrival disorder is PLANTED deterministically (the
    * q102/q117 planted-construction idiom: this corpus's event_id
    * arrival order is perfectly time-sorted, so a real audit needs
    * jitter): arrival = event time + md5-uniform jitter in [0, 120 s).
    * Per user, the running event-time max over arrival order (exactly
    * Spark's per-key watermark state) flags events arriving more than
    * W behind it, for W ∈ {1 s, 10 s, 60 s}. All comparisons exact
    * integer µs. Scale: ONE user-partitioned window (thousands of
    * parallel partitions), then a global one-row reduce.
    */
  val watermarkAudit: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("arrival",
        col("us") + conv(substring(md5(col("event_id").cast("string")),
          1, 15), 16, 10).cast("long") % 120000000L)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("arrival"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = ev
      .withColumn("pm", max(col("us")).over(w))
      .withColumn("late_us",
        greatest(lit(0L), coalesce(col("pm") - col("us"), lit(0L))))
    late.agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 1000000L, 1L).otherwise(0L)).as("late_1s"),
        sum(when(col("late_us") > 10000000L, 1L).otherwise(0L))
          .as("late_10s"),
        sum(when(col("late_us") > 60000000L, 1L).otherwise(0L))
          .as("late_60s"),
        max(col("late_us")).as("max_late_us"))
      .select(col("n_events"), col("late_1s"), col("late_10s"),
        col("late_60s"),
        round(col("late_1s").cast("double") / col("n_events").cast("double"),
          6).as("share_1s"),
        round(col("late_10s").cast("double")
          / col("n_events").cast("double"), 6).as("share_10s"),
        round(col("late_60s").cast("double")
          / col("n_events").cast("double"), 6).as("share_60s"),
        col("max_late_us"))
  }

  val watermarkAuditSql: String =
    """WITH e AS (SELECT user_id, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      |j AS (SELECT user_id, event_id, us,
      |    us + ('0x'||substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
      |      % 120000000 AS arrival FROM e),
      |l AS (SELECT us,
      |    greatest(0, coalesce(max(us) OVER (PARTITION BY user_id
      |      ORDER BY arrival, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - us, 0))
      |      AS late_us FROM j)
      |SELECT count(*) AS n_events,
      |  CAST(sum(CASE WHEN late_us > 1000000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS late_1s,
      |  CAST(sum(CASE WHEN late_us > 10000000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS late_10s,
      |  CAST(sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS late_60s,
      |  round(CAST(sum(CASE WHEN late_us > 1000000 THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS share_1s,
      |  round(CAST(sum(CASE WHEN late_us > 10000000 THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS share_10s,
      |  round(CAST(sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS share_60s,
      |  CAST(max(late_us) AS BIGINT) AS max_late_us
      |FROM l""".stripMargin

  /** Leave-one-out k-NN label accuracy on sampled anchors (the Cover &
    * Hart '67 1-NN risk bound generalized to k=5 majority vote): does
    * the embedding space actually SEPARATE the labels the similarity
    * ops assume it does — the fitness check run before any
    * SemDeDup-style (q155) semantic pruning trusts cosine
    * neighborhoods. Anchors are the 50 lowest vec_ids (FIXED count, so
    * the pair frame is 50·n — linear in the corpus, never n²; the
    * production path for all-points coverage is the LSH-bucketed kNN,
    * q25). Vote: top-5 by (cosine desc, vec_id), majority with
    * smallest-label tiebreak, scored against the anchor's own label.
    * Cosines use the q24 double-dot formulation both engines share
    * bit-for-bit. Output: per-label anchor counts and accuracy.
    */
  val knnAccuracy: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val anchors = emb.orderBy(col("vec_id")).limit(50)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))
    val scored = emb.crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
        (graft.functions.VectorExpressions.dot_product(col("qe"),
          col("embedding"))
          / (sqrt(graft.functions.VectorExpressions.dot_product(col("qe"),
            col("qe")))
            * sqrt(graft.functions.VectorExpressions.dot_product(
              col("embedding"), col("embedding"))))).as("score"))
    val top = scored.withColumn("rk",
        row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rk") <= 5)
    val votes = top.groupBy(col("qid"), col("qlabel"), col("label"))
      .agg(count(lit(1)).as("v"))
    val winner = votes.withColumn("rv",
        row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("v").desc, col("label"))))
      .filter(col("rv") === 1)
    winner.groupBy(col("qlabel"))
      .agg(count(lit(1)).as("n_anchors"),
        sum(when(col("label") === col("qlabel"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("qlabel").as("label"), col("n_anchors"), col("n_correct"),
        round(col("n_correct").cast("double")
          / col("n_anchors").cast("double"), 6).as("acc"))
      .orderBy(col("label"))
  }

  val knnAccuracySql: String =
    """WITH v AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |a AS (SELECT vec_id AS qid, label AS qlabel, e AS qe FROM v
      |  ORDER BY vec_id LIMIT 50),
      |scored AS (SELECT qid, qlabel, vec_id, label,
      |    list_dot_product(qe, e) / (sqrt(list_dot_product(qe, qe))
      |      * sqrt(list_dot_product(e, e))) AS score
      |  FROM v CROSS JOIN a WHERE vec_id <> qid),
      |top AS (SELECT * FROM (SELECT qid, qlabel, label, score,
      |    row_number() OVER (PARTITION BY qid
      |      ORDER BY score DESC, vec_id) AS rk FROM scored)
      |  WHERE rk <= 5),
      |votes AS (SELECT qid, qlabel, label, count(*) AS v FROM top
      |  GROUP BY 1, 2, 3),
      |w AS (SELECT * FROM (SELECT qid, qlabel, label,
      |    row_number() OVER (PARTITION BY qid ORDER BY v DESC, label)
      |      AS rv FROM votes) WHERE rv = 1)
      |SELECT qlabel AS label, count(*) AS n_anchors,
      |  CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_correct,
      |  round(CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS acc
      |FROM w GROUP BY qlabel ORDER BY label""".stripMargin

  /** NATIVE session_window sessionization, batch mode (the Spark 3.2+
    * built-in that replaces hand-rolled gaps-and-islands when gap
    * semantics suffice — q42/q209 build sessions manually; this gates
    * the ENGINE's own session operator against the same islands
    * oracle): 30-minute-gap user sessions, session end = last event +
    * gap by definition of the operator. Values ride as exact cents
    * (q209 discipline). Sessions merge when the next event starts at
    * or before the current session end (ts ≤ prev + gap), mirrored in
    * the oracle's strict `>` break predicate. Scale: one user-keyed
    * agg — the operator's merging iterator is the same shuffle shape
    * as any groupBy(user).
    */
  val sessionWindowBatch: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("double").as("cents"))
    ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("c"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"), col("c").cast("long").as("total_cents"))
      .orderBy(col("user_id"), col("start_us"))
  }

  val sessionWindowBatchSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |b AS (SELECT user_id, ts, cents,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |      THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |g AS (SELECT user_id, ts, cents,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS sid FROM b)
      |SELECT user_id, epoch_us(min(ts)) AS start_us,
      |  epoch_us(max(ts)) + 1800000000 AS end_us,
      |  count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS total_cents
      |FROM g GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin

  /** NATIVE session_window sessionization, STREAMING (the seventh
    * streaming parity gate; the built-in-state complement of q209's
    * flatMapGroupsWithState — same 30-minute-gap semantics, state
    * managed by the engine's session-merging aggregation instead of
    * custom code): 5-batch time-partitioned file stream (q209 staging:
    * monotone modtimes so arrival = event-time order), 2 h watermark,
    * append mode — closed sessions emit when the watermark passes
    * session end, and the far-future sentinel (user −1) flushes every
    * open session at end-of-stream. Hash-matched against the identical
    * islands oracle as the batch twin, so the gate proves the
    * streaming state machinery changes NOTHING about the answer.
    * Scale: state = active sessions only, evicted at watermark.
    */
  val streamSessionWindow: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = scratch("graft_stream_swin_src")
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("double").as("cents"))
    val bounds = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0L, 4L)
      else (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(hi - lo, 4L)
    Staging.stageSlices(ev, unix_micros(col("ts")), 4, lo, span, srcDir,
      scratch("graft_stream_swin_stage"), Seq(col("event_id")))
    Staging.stageOne(s.range(1).select(lit(-1L).as("event_id"),
      timestamp_micros(lit(hi + 30L * 86400L * 1000000L)).as("ts"),
      lit(-1L).as("user_id"), lit(0.0).as("cents")), 4, srcDir,
      scratch("graft_stream_swin_sent"))
    val stream = s.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir.toString)
    val sessions = stream
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("c"))
    val qname = "graft_stream_swin_sink"
    val sq = sessions
      .writeStream.outputMode("append").format("memory")
      .queryName(qname).trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    s.table(qname)
      .filter(col("user_id") >= 0)
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"), col("c").cast("long").as("total_cents"))
      .orderBy(col("user_id"), col("start_us"))
  }

  val streamSessionWindowSql: String = sessionWindowBatchSql

  /** Curation attrition waterfall — the per-stage survivor report every
    * dataset paper publishes (Gopher table A1, Dolma, RefinedWeb all
    * lead with one): the corpus flows through exact-dedup keeper →
    * word-count band → mean-word-length band → stopword floor (q20's
    * dedup + q158's rule battery, applied CUMULATIVELY in the order a
    * production pipeline runs them), and each stage reports rows in,
    * rows dropped, rows out, and surviving token mass. The one
    * artifact that tells an owner WHERE the corpus is going and which
    * rule to re-tune. Plan shape: one scan computes every rule bit
    * row-locally; the only shuffle is the 16-byte-fingerprint keeper
    * group (q20); the waterfall itself is ONE global aggregate
    * unpivoted to 4 rows. Counts exact; no floats cross rows.
    */
  val curationWaterfall: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val nW = TextStats.tokenCount(col("text"))
    val mwl = length(regexp_replace(col("text"), "\\s", "")).cast("double") /
      greatest(nW, lit(1)).cast("double")
    val stw = TextStats.stopwordCount(col("text"), TextStats.defaultStopwords)
    // every rule bit + the dedup fingerprint off ONE scan
    val base = Dedup.pin(docs.select(col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"),
      nW.cast("long").as("tok"),
      nW.between(20, 80).as("rw"),
      (mwl >= 3.0 && mwl <= 10.0).as("rm"),
      (stw >= 2).as("rs")))
    val keepers = base.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
    val flags = base.join(keepers, Seq("fp"))
      .select(col("tok"),
        (col("doc_id") === col("keep_id")).as("c1"),
        col("rw"), col("rm"), col("rs"))
      .select(col("tok"), col("c1"),
        (col("c1") && col("rw")).as("c2"),
        (col("c1") && col("rw") && col("rm")).as("c3"),
        (col("c1") && col("rw") && col("rm") && col("rs")).as("c4"))
    def n(c: String) = sum(when(col(c), 1L).otherwise(0L))
    def tk(c: String) = coalesce(sum(when(col(c), col("tok"))), lit(0L))
    flags.agg(count(lit(1)).as("n0"),
        n("c1").as("n1"), tk("c1").as("t1"),
        n("c2").as("n2"), tk("c2").as("t2"),
        n("c3").as("n3"), tk("c3").as("t3"),
        n("c4").as("n4"), tk("c4").as("t4"))
      .select(expr(
        "stack(4, 1, 'exact_dedup', n0, n1, t1," +
          " 2, 'word_count', n1, n2, t2," +
          " 3, 'word_length', n2, n3, t3," +
          " 4, 'stopwords', n3, n4, t4)" +
          " AS (stage, rule, n_in, n_out, tok_out)"))
      .select(col("stage"), col("rule"), col("n_in"),
        (col("n_in") - col("n_out")).as("n_dropped"), col("n_out"),
        col("tok_out"))
      .orderBy(col("stage"))
  }

  val curationWaterfallSql: String =
    """WITH b AS (SELECT doc_id,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |    CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok,
      |    length(regexp_extract_all(text, '\S+')) BETWEEN 20 AND 80 AS rw,
      |    CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
      |      / greatest(length(regexp_extract_all(text, '\S+')), 1)
      |      BETWEEN 3.0 AND 10.0 AS rm,
      |    length(regexp_extract_all(lower(text),
      |      '\b(the|a|an|and|of|to|in|is|it)\b')) >= 2 AS rs
      |  FROM documents),
      |k AS (SELECT fp, min(doc_id) AS keep_id FROM b GROUP BY fp),
      |f AS (SELECT tok, b.doc_id = keep_id AS c1, rw, rm, rs
      |  FROM b JOIN k USING (fp)),
      |c AS (SELECT tok, c1, c1 AND rw AS c2, c1 AND rw AND rm AS c3,
      |    c1 AND rw AND rm AND rs AS c4 FROM f),
      |a AS (SELECT count(*) AS n0,
      |    CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(coalesce(sum(CASE WHEN c1 THEN tok END), 0) AS BIGINT) AS t1,
      |    CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(coalesce(sum(CASE WHEN c2 THEN tok END), 0) AS BIGINT) AS t2,
      |    CAST(sum(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
      |    CAST(coalesce(sum(CASE WHEN c3 THEN tok END), 0) AS BIGINT) AS t3,
      |    CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
      |    CAST(coalesce(sum(CASE WHEN c4 THEN tok END), 0) AS BIGINT) AS t4
      |  FROM c)
      |SELECT * FROM (
      |  SELECT 1 AS stage, 'exact_dedup' AS rule, n0 AS n_in,
      |    n0 - n1 AS n_dropped, n1 AS n_out, t1 AS tok_out FROM a
      |  UNION ALL SELECT 2, 'word_count', n1, n1 - n2, n2, t2 FROM a
      |  UNION ALL SELECT 3, 'word_length', n2, n2 - n3, n3, t3 FROM a
      |  UNION ALL SELECT 4, 'stopwords', n3, n3 - n4, n4, t4 FROM a)
      |ORDER BY stage""".stripMargin

  /** transformWithState running-totals parity — the EIGHTH streaming
    * gate, and the first on Spark 4's NEW arbitrary-state API
    * (StatefulProcessor + ValueState + the RocksDB state store, the
    * surface that supersedes q209's flatMapGroupsWithState): per-user
    * cumulative (event count, cent total) emitted per event across a
    * 5-file time-partitioned stream, hash-matched against the batch
    * cumulative-window oracle. Parity engineering: the q209 staging
    * (arrival = event-time order) plus in-batch (µs, event_id)
    * sort inside the processor make the fold order exactly the
    * oracle's window order; cents are whole doubles so sums are exact.
    * The RocksDB provider is set for THIS query and restored after —
    * the other streaming gates stay on the default provider. Scale:
    * state is one (n, cents) pair per user (TTL-expirable).
    */
  val streamRunningTotals: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val srcDir = scratch("graft_stream_tws_src")
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
    Staging.stageSlices(ev, unix_micros(col("ts")), 4, lo, span, srcDir,
      scratch("graft_stream_tws_stage"), Seq(col("event_id")))
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = s.conf.getOption(providerKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = s.readStream
        .schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString)
        .as[graft.streaming.EventStreams.Event]
      val totals = graft.streaming.EventStreams.runningTotals(stream)(s)
      val qname = "graft_stream_tws_sink"
      val sq = totals.toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName(qname).trigger(Trigger.AvailableNow()).start()
      sq.awaitTermination()
      s.table(qname)
        .select(col("user_id"), col("event_id"), col("cum_n"),
          col("cum_cents"))
        .orderBy(col("user_id"), col("event_id"))
    } finally {
      prevProvider match {
        case Some(p) => s.conf.set(providerKey, p)
        case None    => s.conf.unset(providerKey)
      }
    }
  }

  val streamRunningTotalsSql: String =
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events)
      |SELECT user_id, event_id,
      |  CAST(row_number() OVER w AS BIGINT) AS cum_n,
      |  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
      |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** Join-strategy parity battery: the SAME customer⋈orders aggregate
    * executed under the engine's three equi-join strategies — broadcast
    * hash, shuffled hash, sort-merge — selected by hints, with the
    * results proven identical (one oracle row per strategy). The gate
    * that demonstrates plan CONTROL: Catalyst picks a default, but a
    * 100 TB operator must be able to force the right strategy when
    * statistics mislead (a broadcast that OOMs the driver, a sort that
    * spills). PlanShapeSpec pins each hinted plan to its exec node.
    * Values are decSum-exact so all three strategies hash identically.
    */
  val joinStrategies: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    val o = t(s, dir, "orders").select(col("o_custkey"), col("o_totalprice"))
    def run(hint: String, label: String): DataFrame =
      o.join(c.hint(hint), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice"), 2)
          .as("total"))
        .select(lit(label).as("strategy"), col("c_mktsegment"),
          col("n_orders"), col("total"))
    run("broadcast", "broadcast_hash")
      .unionAll(run("shuffle_hash", "shuffled_hash"))
      .unionAll(run("merge", "sort_merge"))
      .orderBy(col("strategy"), col("c_mktsegment"))
  }

  val joinStrategiesSql: String =
    """WITH a AS (SELECT c_mktsegment, count(*) AS n_orders,
      |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
      |      2) AS total
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_mktsegment)
      |SELECT s.strategy, a.c_mktsegment, a.n_orders, a.total
      |FROM a CROSS JOIN (SELECT unnest(['broadcast_hash', 'shuffled_hash',
      |  'sort_merge']) AS strategy) s
      |ORDER BY s.strategy, a.c_mktsegment""".stripMargin

  /** Day-2 incremental MinHash/LSH maintenance
    * ([[Dedup.incrementalMinhashPairs]] — the near-dup analog of q117's
    * exact incremental screen, completing the IVM family q171/q242/
    * q154/q117 with the APPROXIMATE index): docs with id % 10 == 0
    * arrive as the new batch; only pairs INVOLVING the batch are
    * discovered, by probing the band table from the new side — no
    * old×old work. The oracle is the exact all-pairs shingle Jaccard
    * (the q21 recall harness) restricted to new-involving pairs, so
    * the gate simultaneously proves day-2 completeness (LSH missed
    * nothing) and day-2 scope (nothing outside the Δ neighborhood is
    * touched). Scale: Δ signatures are the only new map work; the
    * probe is Δ-bands × bucket width.
    *
    * Gate scope (r8 advice #5): the operator screens at threshold 0.7,
    * but BOTH sides of the gate keep only pairs with exact j ≥ 0.85 —
    * above the (b=16, r=4) S-curve's high-recall knee. At j = 0.70 a
    * true pair agrees in no band with probability (1−0.7⁴)¹⁶ ≈ 1.2%,
    * so exact-set equality at the operating threshold would hold only
    * while the fixed corpus happens to miss nothing and any testdata
    * regeneration could flip the gate red with no code change; at
    * j = 0.85 the per-pair miss probability is (1−0.85⁴)¹⁶ ≈ 7·10⁻⁶.
    * The 0.7-threshold recall itself is measured (not gated) by q189's
    * calibration harness.
    */
  val incrementalLsh: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    val index = docs.filter(col("doc_id") % 10 =!= 0)
    Dedup.incrementalMinhashPairs(index, fresh, "text", "doc_id",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.7)
      .filter(col("jaccard") >= 0.85)
      .orderBy(col("id1"), col("id2"))
  }

  val incrementalLshSql: String =
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
      |    JOIN sh r ON i.id2 = r.doc_id)
      |SELECT id1, id2, round(j, 6) AS jaccard
      |FROM p WHERE j >= 0.85 AND (id1 % 10 = 0 OR id2 % 10 = 0)
      |ORDER BY id1, id2""".stripMargin

  /** Welch's unequal-variance t-test (Welch '47 with the
    * Welch–Satterthwaite df): the parametric twin of q248's
    * Mann–Whitney on the SAME contrast (en vs rest document lengths),
    * so an analyst can read both the rank-based and the moment-based
    * verdicts off comparable gates. All five sufficient statistics are
    * exact integers off one conditional agg (Σx and Σx² per group in
    * DECIMAL(38,0) — n_chars² sums wrap int64 at corpus scale); the
    * t statistic and df are single compound float expressions. Scale:
    * one scan, two rows of state.
    */
  val welchT: Q = (s, dir) => {
    val base = t(s, dir, "documents")
      .select(col("n_chars"),
        when(col("lang") === "en", 1L).otherwise(0L).as("g"))
    base.agg(
        sum(col("g")).as("na"), sum(lit(1L) - col("g")).as("nb"),
        sum(when(col("g") === 1, col("n_chars")).otherwise(0L)
          .cast("decimal(38,0)")).as("sa"),
        sum(when(col("g") === 0, col("n_chars")).otherwise(0L)
          .cast("decimal(38,0)")).as("sb"),
        sum(when(col("g") === 1,
          col("n_chars").cast("decimal(38,0)") * col("n_chars"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("qa"),
        sum(when(col("g") === 0,
          col("n_chars").cast("decimal(38,0)") * col("n_chars"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("qb"))
      .select(col("na"), col("nb"), {
        val na = col("na").cast("double"); val nb = col("nb").cast("double")
        val ma = col("sa").cast("double") / na
        val mb = col("sb").cast("double") / nb
        // sample variance via the exact sums: (nΣx² − (Σx)²)/(n(n−1))
        val va = (na * col("qa").cast("double")
          - col("sa").cast("double") * col("sa").cast("double")) /
          (na * (na - 1))
        val vb = (nb * col("qb").cast("double")
          - col("sb").cast("double") * col("sb").cast("double")) /
          (nb * (nb - 1))
        val sea = va / na; val seb = vb / nb
        struct(
          round(ma, 4).as("mean_a"), round(mb, 4).as("mean_b"),
          round((ma - mb) / sqrt(sea + seb), 6).as("t_stat"),
          round((sea + seb) * (sea + seb)
            / (sea * sea / (na - 1) + seb * seb / (nb - 1)), 2).as("df"))
          .as("f")
      })
      .select(col("na"), col("nb"), col("f.mean_a").as("mean_a"),
        col("f.mean_b").as("mean_b"), col("f.t_stat").as("t_stat"),
        col("f.df").as("df"))
  }

  val welchTSql: String =
    """WITH a AS (SELECT
      |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS na,
      |    CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS nb,
      |    sum(CASE WHEN lang = 'en' THEN CAST(n_chars AS HUGEINT)
      |      ELSE 0 END) AS sa,
      |    sum(CASE WHEN lang <> 'en' THEN CAST(n_chars AS HUGEINT)
      |      ELSE 0 END) AS sb,
      |    sum(CASE WHEN lang = 'en'
      |      THEN CAST(n_chars AS HUGEINT) * n_chars ELSE 0 END) AS qa,
      |    sum(CASE WHEN lang <> 'en'
      |      THEN CAST(n_chars AS HUGEINT) * n_chars ELSE 0 END) AS qb
      |  FROM documents),
      |m AS (SELECT na, nb,
      |    CAST(sa AS DOUBLE) / na AS ma, CAST(sb AS DOUBLE) / nb AS mb,
      |    (na * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE)
      |      * CAST(sa AS DOUBLE)) / (na * CAST(na - 1 AS DOUBLE)) / na
      |      AS sea,
      |    (nb * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE)
      |      * CAST(sb AS DOUBLE)) / (nb * CAST(nb - 1 AS DOUBLE)) / nb
      |      AS seb
      |  FROM a)
      |SELECT na, nb, round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
      |  round((ma - mb) / sqrt(sea + seb), 6) AS t_stat,
      |  round((sea + seb) * (sea + seb)
      |    / (sea * sea / (na - 1) + seb * seb / (nb - 1)), 2) AS df
      |FROM m""".stripMargin

  /** Seasonal-naive forecast backtest with MASE (Hyndman & Koehler '06
    * — the scale-free forecast-accuracy metric): per event type,
    * "predict day d by day d−7" is scored against the actual daily
    * count, scaled by the in-sample naive-1 mean absolute difference —
    * MASE < 1 means the weekly-seasonal rule beats the naive
    * random-walk, the go/no-go before anyone ships a fancier forecast.
    * Errors are exact integer |x_d − x_{d−7}| sums; the two means and
    * their ratio are the only floats. Scale: day-domain frames per
    * type after the daily reduce; lag() windows partitioned by type.
    */
  val maseBacktest: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("f7", lag(col("x"), 7).over(w))
      .withColumn("f1", lag(col("x"), 1).over(w))
      .filter(col("f7").isNotNull && col("f1").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("x") - col("f7"))).as("ae7"),
        sum(abs(col("x") - col("f1"))).as("ae1"))
      .select(col("event_type"), col("n_days"),
        round(col("ae7").cast("double") / col("n_days").cast("double"), 4)
          .as("mae_seasonal"),
        round(col("ae1").cast("double") / col("n_days").cast("double"), 4)
          .as("mae_naive"),
        round(col("ae7").cast("double") / col("ae1").cast("double"), 6)
          .as("mase"))
      .orderBy(col("event_type"))
  }

  val maseBacktestSql: String =
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    count(*) AS x FROM events GROUP BY 1, 2),
      |l AS (SELECT event_type, x,
      |    lag(x, 7) OVER w AS f7, lag(x, 1) OVER w AS f1
      |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day))
      |SELECT event_type, count(*) AS n_days,
      |  round(CAST(sum(abs(x - f7)) AS DOUBLE) / count(*), 4)
      |    AS mae_seasonal,
      |  round(CAST(sum(abs(x - f1)) AS DOUBLE) / count(*), 4)
      |    AS mae_naive,
      |  round(CAST(sum(abs(x - f7)) AS DOUBLE)
      |    / CAST(sum(abs(x - f1)) AS DOUBLE), 6) AS mase
      |FROM l WHERE f7 IS NOT NULL AND f1 IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Neyman optimal stratified-sampling allocation (Neyman '34): for a
    * fixed inspection budget of 1000 documents, how many to draw from
    * each language stratum — n_h ∝ N_h·σ_h (big AND variable strata
    * get more) vs the proportional baseline N_h/N — the sample-design
    * table behind every human-eval and labeling budget. σ_h from exact
    * integer moments; the Σ N_h·σ_h normalizer sums per-stratum
    * round→DECIMAL terms (q126 discipline). Scale: one keyed agg,
    * |strata| rows.
    */
  val neymanAllocation: Q = (s, dir) => {
    val B = 1000
    val per = Dedup.pin(t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("nh"),
        sum(col("n_chars").cast("decimal(38,0)")).as("sx"),
        sum(col("n_chars").cast("decimal(38,0)") * col("n_chars"))
          .as("sxx"))
      .select(col("lang"), col("nh"), {
        val n = col("nh").cast("double")
        round(sqrt((n * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
          / (n * n)), 6).as("sigma")
      }))
    val tot = per.agg(sum(col("nh")).as("n_all"),
      sum(round(col("nh") * col("sigma"), 4).cast("decimal(28,4)"))
        .as("wsum"))
    per.crossJoin(broadcast(tot))
      .select(col("lang"), col("nh"), round(col("sigma"), 2).as("sigma"),
        round(lit(B) * round(col("nh") * col("sigma"), 4)
          .cast("double") / col("wsum").cast("double"), 2)
          .as("alloc_neyman"),
        round(lit(B) * col("nh").cast("double")
          / col("n_all").cast("double"), 2).as("alloc_prop"))
      .orderBy(col("lang"))
  }

  val neymanAllocationSql: String =
    """WITH per AS (SELECT lang, count(*) AS nh,
      |    sum(CAST(n_chars AS HUGEINT)) AS sx,
      |    sum(CAST(n_chars AS HUGEINT) * n_chars) AS sxx
      |  FROM documents GROUP BY lang),
      |sg AS (SELECT lang, nh,
      |    round(sqrt((nh * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
      |      * CAST(sx AS DOUBLE))
      |      / (CAST(nh AS DOUBLE) * CAST(nh AS DOUBLE))), 6) AS sigma
      |  FROM per),
      |tt AS (SELECT CAST(sum(nh) AS BIGINT) AS n_all,
      |    sum(CAST(round(nh * sigma, 4) AS DECIMAL(28,4))) AS wsum
      |  FROM sg)
      |SELECT lang, nh, round(sigma, 2) AS sigma,
      |  round(1000 * CAST(CAST(round(nh * sigma, 4) AS DECIMAL(28,4))
      |    AS DOUBLE) / CAST(wsum AS DOUBLE), 2) AS alloc_neyman,
      |  round(1000 * CAST(nh AS DOUBLE) / CAST(n_all AS DOUBLE), 2)
      |    AS alloc_prop
      |FROM sg CROSS JOIN tt ORDER BY lang""".stripMargin

  /** Lincoln–Petersen capture–recapture population estimate (Petersen
    * 1896 / Lincoln '30, with Chapman '51's bias correction): two
    * deterministic md5 "crawls" each capture ~60% of the corpus, and
    * the overlap estimates the TOTAL population — the estimator a crawl
    * operator uses to size the web they have NOT yet fetched, here run
    * against a corpus whose true size is known so the estimator's
    * error is itself hash-checked. Capture flags are row-local
    * md5-uniform tests (independent per crawl by key salt); counts
    * exact; both estimators and the error are final-step floats.
    * Scale: one scan, one row of state.
    */
  val captureRecapture: Q = (s, dir) => {
    def u(salt: String) =
      (conv(substring(md5(concat(col("doc_id").cast("string"), lit(salt))),
        1, 15), 16, 10).cast("long").cast("double") / lit(math.pow(2, 60)))
    t(s, dir, "documents")
      .select((u(":a") < 0.6).as("ia"), (u(":b") < 0.6).as("ib"))
      .agg(count(lit(1)).as("n_true"),
        sum(when(col("ia"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("ib"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("ia") && col("ib"), 1L).otherwise(0L)).as("m"))
      .select(col("n_a"), col("n_b"), col("m"), col("n_true"),
        round(col("n_a").cast("double") * col("n_b").cast("double")
          / col("m").cast("double"), 2).as("n_hat_lp"),
        round((col("n_a") + 1).cast("double")
          * (col("n_b") + 1).cast("double")
          / (col("m") + 1).cast("double") - 1.0, 2).as("n_hat_chapman"),
        round(((col("n_a") + 1).cast("double")
          * (col("n_b") + 1).cast("double")
          / (col("m") + 1).cast("double") - 1.0
          - col("n_true").cast("double"))
          / col("n_true").cast("double"), 6).as("chapman_err"))
  }

  val captureRecaptureSql: String =
    """WITH f AS (SELECT
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||':a'), 1, 15))::BIGINT
      |      / CAST(pow(2, 60) AS DOUBLE) < 0.6 AS ia,
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||':b'), 1, 15))::BIGINT
      |      / CAST(pow(2, 60) AS DOUBLE) < 0.6 AS ib
      |  FROM documents),
      |a AS (SELECT count(*) AS n_true,
      |    CAST(sum(CASE WHEN ia THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN ib THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN ia AND ib THEN 1 ELSE 0 END) AS BIGINT) AS m
      |  FROM f)
      |SELECT n_a, n_b, m, n_true,
      |  round(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      |    / CAST(m AS DOUBLE), 2) AS n_hat_lp,
      |  round(CAST(n_a + 1 AS DOUBLE) * CAST(n_b + 1 AS DOUBLE)
      |    / CAST(m + 1 AS DOUBLE) - 1.0, 2) AS n_hat_chapman,
      |  round((CAST(n_a + 1 AS DOUBLE) * CAST(n_b + 1 AS DOUBLE)
      |    / CAST(m + 1 AS DOUBLE) - 1.0 - CAST(n_true AS DOUBLE))
      |    / CAST(n_true AS DOUBLE), 6) AS chapman_err
      |FROM a""".stripMargin

  /** End-to-end curated export — the pipeline the whole catalog exists
    * to run, as ONE gate: q262's cumulative keep-set (exact-dedup
    * keeper + the Gopher rule battery) → q205's row-local HRW shard
    * assignment (4 shards) → a REAL partitioned parquet write → read
    * the files back and emit the shard manifest (docs, token mass,
    * integrity triple min/max/Σ of ids — exact integers, so any row
    * the write dropped or duplicated flips the manifest). The oracle
    * computes the same manifest from the logical pipeline alone, so
    * the hash-match proves the physical round-trip byte-preserved the
    * keep-set. Scale: the write IS the shuffle (partitionBy on the
    * 4-value shard column); everything else is row-local or
    * |shards|-bounded.
    */
  val curatedExport: Q = (s, dir) => {
    val tmp = scratch("graft_export_gate").toString
    val docs = t(s, dir, "documents")
    val nW = TextStats.tokenCount(col("text"))
    val mwl = length(regexp_replace(col("text"), "\\s", "")).cast("double") /
      greatest(nW, lit(1)).cast("double")
    val stw = TextStats.stopwordCount(col("text"), TextStats.defaultStopwords)
    val base = docs.select(col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"),
      nW.cast("long").as("tok"),
      (nW.between(20, 80) && mwl >= 3.0 && mwl <= 10.0 && (stw >= 2))
        .as("rules"))
    val keepers = base.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
    val weights = array((0 until 4).map { i =>
      struct(
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":" + i))), 1, 15), 16, 10).cast("long").as("w"),
        lit(i).as("shard"))
    }: _*)
    val kept = base.join(keepers, Seq("fp"))
      .filter(col("doc_id") === col("keep_id") && col("rules"))
      .select(col("doc_id"), col("tok"),
        array_max(weights).getField("shard").as("shard"))
    Writers.parquet(kept, s"$tmp/export", partitionBy = Seq("shard"))
    Readers.parquetWithSchema(s, s"$tmp/export", kept.schema)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tok_sum"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
        sum(col("doc_id")).as("id_sum"))
      .select(col("shard").cast("int").as("shard"), col("n_docs"),
        col("tok_sum"), col("min_id"), col("max_id"), col("id_sum"))
      .orderBy(col("shard"))
  }

  val curatedExportSql: String =
    """WITH b AS (SELECT doc_id,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |    CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok,
      |    (length(regexp_extract_all(text, '\S+')) BETWEEN 20 AND 80)
      |      AND (CAST(length(regexp_replace(text, '\s', '', 'g'))
      |        AS DOUBLE)
      |        / greatest(length(regexp_extract_all(text, '\S+')), 1)
      |        BETWEEN 3.0 AND 10.0)
      |      AND length(regexp_extract_all(lower(text),
      |        '\b(the|a|an|and|of|to|in|is|it)\b')) >= 2 AS rules
      |  FROM documents),
      |k AS (SELECT fp, min(doc_id) AS keep_id FROM b GROUP BY fp),
      |kept AS (SELECT b.doc_id, tok FROM b JOIN k USING (fp)
      |  WHERE b.doc_id = keep_id AND rules),
      |w AS (SELECT doc_id, tok, CAST(r.range AS INTEGER) AS shard,
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)||':'
      |      ||CAST(r.range AS VARCHAR)), 1, 15))::BIGINT AS wt
      |  FROM kept CROSS JOIN range(4) r),
      |pick AS (SELECT doc_id, tok, shard FROM (SELECT doc_id, tok, shard,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY wt DESC, shard DESC) AS rn FROM w) WHERE rn = 1)
      |SELECT shard, count(*) AS n_docs,
      |  CAST(sum(tok) AS BIGINT) AS tok_sum,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM pick GROUP BY shard ORDER BY shard""".stripMargin

  /** Time-RANGE window frame (the frame variety the catalog's other
    * 30+ windows don't exercise — every prior frame is ROWS-based):
    * for every event, the count and cent mass of the SAME user's
    * events in the preceding hour, frame = RANGE [−1h, current] over
    * the µs axis — the sliding-context feature a fraud/burst scorer
    * computes per event, where a ROWS frame would be WRONG whenever
    * event density varies (k rows ≠ one hour). Exact integer µs
    * bounds; cents sum exactly. Scale: user-partitioned range frames —
    * Spark evaluates them with a sliding two-pointer over each
    * partition's sort, O(n) per user.
    */
  val rangeFrame: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("n_hour", count(lit(1)).over(w))
      .withColumn("cents_hour", sum(col("cents")).over(w))
      .select(col("event_id"), col("user_id"), col("n_hour"),
        col("cents_hour"))
      .orderBy(col("event_id"))
  }

  val rangeFrameSql: String =
    """WITH e AS (SELECT event_id, user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events)
      |SELECT event_id, user_id,
      |  count(*) OVER w AS n_hour,
      |  CAST(sum(cents) OVER w AS BIGINT) AS cents_hour
      |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Typed Dataset mapGroups pipeline (the `KeyValueGroupedDataset`
    * batch surface — the catalog uses its streaming siblings in
    * q209/q263; this gates the TYPED per-key escape hatch itself):
    * per-user stream shape via case-class groups — event count, span,
    * and the LONGEST inter-event gap, computed imperatively over the
    * sorted group. The pattern for per-key logic that genuinely
    * doesn't decompose into window functions (here it does — which is
    * exactly what makes it oracle-checkable). Scale: one user-keyed
    * shuffle; each group folds in memory (per-user streams, not the
    * corpus).
    */
  val typedGroups: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .as[(Long, Long, Long)]
    ev.groupByKey(_._1)
      .mapGroups { (uid, it) =>
        val times = it.map(e => (e._2, e._3)).toArray.sortBy(identity)
        var maxGap = 0L
        var i = 1
        while (i < times.length) {
          val g = times(i)._1 - times(i - 1)._1
          if (g > maxGap) maxGap = g
          i += 1
        }
        (uid, times.length.toLong, times.last._1 - times.head._1, maxGap)
      }
      .toDF("user_id", "n_events", "span_us", "max_gap_us")
      .orderBy(col("user_id"))
  }

  val typedGroupsSql: String =
    """WITH e AS (SELECT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id FROM events),
      |g AS (SELECT user_id, us,
      |    us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |      AS gap FROM e)
      |SELECT user_id, count(*) AS n_events,
      |  CAST(max(us) - min(us) AS BIGINT) AS span_us,
      |  CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_us
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Consistent-hash ring assignment + the consistency property
    * MEASURED (Karger '97; 4 nodes × 16 vnodes): the ring is 64
    * md5 positions computed ONCE and shipped as a broadcast literal
    * array sorted by position, so per-doc assignment is a ROW-LOCAL
    * first-position-≥-hash probe (wraparound to ring[0]) — zero
    * shuffle, the q205 HRW discipline for the ring family. The gate
    * then REMOVES node 3 and re-assigns: per node, docs before, docs
    * after, docs gained — consistent hashing's whole selling point
    * ("only the removed node's keys move") as hash-checked integers
    * rather than prose. Scale: assignment is row-local against a
    * 64-struct constant.
    */
  val consistentRing: Q = (s, dir) => {
    def md5pos(key: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      var v = 0L
      (0 until 7).foreach(i => v = (v << 8) | (d(i) & 0xffL))
      (v << 4) | ((d(7) & 0xf0L) >>> 4)
    }
    val ring = (for (n <- 0 until 4; v <- 0 until 16)
      yield (md5pos(s"node:$n:$v"), n)).sortBy(_._1)
    val ringSans3 = ring.filter(_._2 != 3)
    def assign(r: Seq[(Long, Int)], p: Column): Column = {
      // first ring position >= p, else wraparound to the smallest
      val hit = r.foldRight(lit(r.head._2)) { case ((pos, node), acc) =>
        when(p <= pos, lit(node)).otherwise(acc)
      }
      hit
    }
    val p = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
      16, 10).cast("long")
    val assigned = t(s, dir, "documents")
      .select(col("doc_id"),
        assign(ring, p).as("node_before"),
        assign(ringSans3, p).as("node_after"))
    assigned.groupBy(col("node_before").as("node"))
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("node_after") === col("node_before"), 1L).otherwise(0L))
          .as("n_stayed"))
      .join(
        assigned.filter(col("node_after") =!= col("node_before"))
          .groupBy(col("node_after").as("node"))
          .agg(count(lit(1)).as("n_gained")),
        Seq("node"), "left")
      .select(col("node"), col("n_before"), col("n_stayed"),
        coalesce(col("n_gained"), lit(0L)).as("n_gained"))
      .orderBy(col("node"))
  }

  val consistentRingSql: String = {
    // the same driver-computed ring inlined into the oracle: the ring
    // is a CONSTANT of the algorithm (md5 of "node:n:v"), so both
    // engines must agree on it by construction
    def md5pos(key: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      var v = 0L
      (0 until 7).foreach(i => v = (v << 8) | (d(i) & 0xffL))
      (v << 4) | ((d(7) & 0xf0L) >>> 4)
    }
    val ring = (for (n <- 0 until 4; v <- 0 until 16)
      yield (md5pos(s"node:$n:$v"), n)).sortBy(_._1)
    def values(r: Seq[(Long, Int)]) =
      r.map { case (pos, node) => s"($pos, $node)" }.mkString(", ")
    s"""WITH ring AS (SELECT * FROM (VALUES ${values(ring)}) r(pos, node)),
       |ring2 AS (SELECT * FROM ring WHERE node <> 3),
       |d AS (SELECT doc_id,
       |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS p
       |  FROM documents),
       |a AS (SELECT doc_id, p,
       |    coalesce((SELECT node FROM ring WHERE pos >= p
       |        ORDER BY pos LIMIT 1),
       |      (SELECT node FROM ring ORDER BY pos LIMIT 1)) AS node_before,
       |    coalesce((SELECT node FROM ring2 WHERE pos >= p
       |        ORDER BY pos LIMIT 1),
       |      (SELECT node FROM ring2 ORDER BY pos LIMIT 1)) AS node_after
       |  FROM d),
       |b AS (SELECT node_before AS node, count(*) AS n_before,
       |    CAST(sum(CASE WHEN node_after = node_before THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_stayed
       |  FROM a GROUP BY node_before),
       |g AS (SELECT node_after AS node, count(*) AS n_gained FROM a
       |  WHERE node_after <> node_before GROUP BY node_after)
       |SELECT b.node, n_before, n_stayed,
       |  CAST(coalesce(n_gained, 0) AS BIGINT) AS n_gained
       |FROM b LEFT JOIN g ON b.node = g.node ORDER BY b.node""".stripMargin
  }

  /** Time-series gap fill by linear interpolation, with the recovery
    * error MEASURED: every 5th day of each event type's daily-count
    * series is removed (a planted outage — the corpus has no natural
    * gaps, the q102/q258 planting idiom), the holes are filled by
    * exact-rational linear interpolation between the surviving
    * neighbors, and the gate reports per type how close the fill came
    * to the KNOWN truth — gap-filling quality as a hash-checked
    * number. Neighbors come from a portable day-domain non-equi join
    * (max surviving day < gap < min surviving day), not engine-specific
    * IGNORE NULLS forms. Scale: day-domain frames per type throughout.
    */
  val gapFill: Q = (s, dir) => {
    val daily = Dedup.pin(Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("di", datediff(col("day"), to_date(lit("2024-01-01")))))
    val kept = daily.filter(col("di") % 5 =!= 2)
    val holes = daily.filter(col("di") % 5 === 2)
      .select(col("event_type"), col("di").as("hd"), col("x").as("truth"))
    val prevN = holes.join(kept.select(col("event_type"),
        col("di").as("pd"), col("x").as("pv")), Seq("event_type"))
      .filter(col("pd") < col("hd"))
      .groupBy(col("event_type"), col("hd"), col("truth"))
      .agg(max(struct(col("pd"), col("pv"))).as("p"))
    val nextN = holes.join(kept.select(col("event_type"),
        col("di").as("nd"), col("x").as("nv")), Seq("event_type"))
      .filter(col("nd") > col("hd"))
      .groupBy(col("event_type"), col("hd"))
      .agg(min(struct(col("nd"), col("nv"))).as("n"))
    prevN.join(nextN, Seq("event_type", "hd"))
      .select(col("event_type"), col("hd"), col("truth"),
        round(col("p.pv").cast("double")
          + (col("n.nv") - col("p.pv")).cast("double")
          * (col("hd") - col("p.pd")).cast("double")
          / (col("n.nd") - col("p.pd")).cast("double"), 4).as("filled"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        round(sum(round(abs(col("filled") - col("truth")), 4)
          .cast("decimal(18,4)")).cast("double")
          / count(lit(1)), 4).as("mae"),
        round(max(abs(col("filled") - col("truth"))), 4).as("max_err"))
      .orderBy(col("event_type"))
  }

  val gapFillSql: String =
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    count(*) AS x,
      |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS di
      |  FROM events GROUP BY 1, 2),
      |kept AS (SELECT * FROM d WHERE di % 5 <> 2),
      |holes AS (SELECT event_type, di AS hd, x AS truth FROM d
      |  WHERE di % 5 = 2),
      |p AS (SELECT h.event_type, hd, truth,
      |    max_by(k.x, k.di) AS pv, max(k.di) AS pd
      |  FROM holes h JOIN kept k ON h.event_type = k.event_type
      |    AND k.di < h.hd
      |  GROUP BY 1, 2, 3),
      |n AS (SELECT h.event_type, hd,
      |    min_by(k.x, k.di) AS nv, min(k.di) AS nd
      |  FROM holes h JOIN kept k ON h.event_type = k.event_type
      |    AND k.di > h.hd
      |  GROUP BY 1, 2),
      |f AS (SELECT p.event_type, p.hd, truth,
      |    round(CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE)
      |      * CAST(p.hd - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE), 4)
      |      AS filled
      |  FROM p JOIN n ON p.event_type = n.event_type AND p.hd = n.hd)
      |SELECT event_type, count(*) AS n_gaps,
      |  round(CAST(sum(CAST(round(abs(filled - truth), 4)
      |    AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS mae,
      |  round(max(abs(filled - truth)), 4) AS max_err
      |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Revenue mix-shift decomposition (the Laspeyres-convention
    * volume/rate attribution every BI review runs on a metric change):
    * purchase cents per event type, week 1 vs week 2 (anchored at the
    * data's min date — q198 discipline), with Δrevenue split EXACTLY
    * into volume effect Δn·r₀ and rate effect n₁·Δr — the identity
    * volume + rate = Δ holds algebraically, so the gate's rounded
    * columns must reconcile to the cent. All inputs exact integers;
    * the two effects are single compound float expressions. Scale:
    * |types| rows after one filtered scan.
    */
  val mixShift: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val anchor = ev.agg(min(to_date(col("ts"))).as("d0"))
    val base = ev.filter(col("event_type") === "purchase")
      .crossJoin(broadcast(anchor))
      .withColumn("wk", expr("CAST(datediff(to_date(ts), d0) AS INT) div 7"))
      .filter(col("wk") <= 1)
      .groupBy(col("wk"))
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("c"))
    val w0 = base.filter(col("wk") === 0)
      .select(col("n").as("n0"), col("c").as("c0"))
    val w1 = base.filter(col("wk") === 1)
      .select(col("n").as("n1"), col("c").as("c1"))
    w0.crossJoin(w1)
      .select(col("n0"), col("n1"), col("c0"), col("c1"), {
        val r0 = col("c0").cast("double") / col("n0").cast("double")
        val r1 = col("c1").cast("double") / col("n1").cast("double")
        struct(
          round((col("n1") - col("n0")).cast("double") * r0, 2)
            .as("volume_effect"),
          round(col("n1").cast("double") * (r1 - r0), 2).as("rate_effect"))
          .as("f")
      })
      .select(col("n0"), col("n1"), col("c0"), col("c1"),
        col("f.volume_effect").as("volume_effect"),
        col("f.rate_effect").as("rate_effect"))
  }

  val mixShiftSql: String =
    """WITH a AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
      |b AS (SELECT CAST(datediff('day', d0, CAST(ts AS DATE)) AS INTEGER)
      |      // 7 AS wk,
      |    count(*) AS n,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS c
      |  FROM events CROSS JOIN a WHERE event_type = 'purchase'
      |  GROUP BY 1 HAVING wk <= 1),
      |w0 AS (SELECT n AS n0, c AS c0 FROM b WHERE wk = 0),
      |w1 AS (SELECT n AS n1, c AS c1 FROM b WHERE wk = 1)
      |SELECT n0, n1, c0, c1,
      |  round(CAST(n1 - n0 AS DOUBLE) * (CAST(c0 AS DOUBLE)
      |    / CAST(n0 AS DOUBLE)), 2) AS volume_effect,
      |  round(CAST(n1 AS DOUBLE) * (CAST(c1 AS DOUBLE)
      |    / CAST(n1 AS DOUBLE) - CAST(c0 AS DOUBLE)
      |    / CAST(n0 AS DOUBLE)), 2) AS rate_effect
      |FROM w0 CROSS JOIN w1""".stripMargin

  /** Mid-stream checkpoint RESUME — the production failure mode q214's
    * replay gate does NOT cover (q214 proves a re-delivered source is
    * absorbed idempotently from a FRESH checkpoint; this gate proves a
    * stopped query restarted on its EXISTING checkpoint recovers both
    * its source offsets and its operator state). Harness: phase 1
    * streams the even-doc_id half of the corpus (one file per
    * micro-batch) through dropDuplicates + a complete-mode aggregate
    * and stops; phase 2 appends the odd half PLUS a re-delivery of
    * every doc_id % 10 == 0 document (all even → all already consumed
    * in phase 1) and restarts on the SAME checkpoint. The re-delivered
    * docs appear exactly once in phase-2 input, so ONLY the recovered
    * dropDuplicates state can drop them — a fresh-state restart would
    * overcount n_unique, and a restart that re-read phase-1 files
    * would double-process (offsets proof). The batch oracle is the
    * whole-corpus distinct count: equality proves state AND offset
    * recovery in one hash. [[graft.streaming.CheckpointResumeSpec]]
    * additionally pins that phase-2 batchIds CONTINUE phase-1's
    * sequence (the restart consumed the existing write-ahead log, not
    * a new one). Scale: state is (source, fp-16-bytes) pairs; the
    * checkpoint is the standard HDFS-backed WAL — exactly the
    * machinery a 1000-executor recovery uses.
    */
  private[graft] def checkpointResumeRun(s: SparkSession, dir: String)
      : (DataFrame, Long, Long) = withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val srcDir = scratch("graft_ckpt_resume_src")
    val ckptDir = scratch("graft_ckpt_resume_ckpt")
    val docs = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    docs.filter(col("doc_id") % 2 === 0).repartition(4)
      .write.mode("overwrite").parquet(srcDir.toString)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    def run(qname: String) = {
      val sq = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.toString)
        .select(col("source"), md5(col("text").cast("binary")).as("fp"))
        .dropDuplicates("source", "fp")
        .groupBy(col("source")).agg(count(lit(1)).as("n_unique"))
        .writeStream.outputMode("complete").format("memory")
        .option("checkpointLocation", ckptDir.toString)
        .queryName(qname).trigger(Trigger.AvailableNow()).start()
      sq.awaitTermination()
      Option(sq.lastProgress).map(_.batchId).getOrElse(-1L)
    }
    val p1Last = run("graft_ckpt_resume_p1")
    docs.filter(col("doc_id") % 2 === 1)
      .unionByName(docs.filter(col("doc_id") % 10 === 0))
      .repartition(4)
      .write.mode("append").parquet(srcDir.toString)
    val p2Last = run("graft_ckpt_resume_p2")
    val out = s.table("graft_ckpt_resume_p2")
      .select(col("source"), col("n_unique"))
      .orderBy(col("source"))
    (out, p1Last, p2Last)
  }

  val checkpointResume: Q = (s, dir) => checkpointResumeRun(s, dir)._1

  val checkpointResumeSql: String =
    """SELECT source, count(DISTINCT md5(text)) AS n_unique
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Image near-duplicate detection via perceptual dHash — the VISUAL
    * analog of q21's text MinHash gate (r8 verdict "what's missing"
    * #2: multimodal beyond header metadata). Fixture: every document
    * plants an 18×16 raw grayscale image whose 288 pixel bytes are the
    * doc_id's md5 stream (block i = md5("<id>|<i>")); docs with
    * doc_id % 7 == 0 additionally plant a VARIANT copy (media_id
    * offset +10⁷) identical except the last 16-byte block — a
    * localized edit confined to pooled row 7, so base↔variant pairs
    * land within a few bits of each other while unrelated images sit
    * at ~32. The engine side is the real multimodal path: decode the
    * raw buffer with [[graft.functions.ImageExpressions.gray_dhash64]]
    * (integer box-pool to 9×8 + gradient-sign bits, generated code per
    * row), then find all pairs within Hamming radius 6 through the
    * pigeonhole-bucketed [[Dedup.simhashPairs]] machinery — never an
    * all-pairs product. The oracle recomputes every pixel, cell, bit,
    * and pairwise Hamming distance from the same md5 arithmetic in
    * pure SQL, so the gate is exact: both engines define the answer as
    * "hamming ≤ 6", with no probabilistic recall clause (the bucketing
    * is pigeonhole-COMPLETE at its radius). Scale: hashes are 8 bytes
    * per image; the bucket join is the same machinery q22 runs on
    * 64-bit text fingerprints.
    */
  /** 288-byte 18×16 planted grayscale buffer: block i of the pixel
    * stream is md5("<id>|<i>") (the variant swaps block 17's tag for
    * "17v" — a localized edit confined to pooled row 7). Shared by the
    * q277 dHash pair gate and the q279 aHash report.
    */
  private def plantedImagePixels(idCol: Column, variant: Boolean): Column = {
    def block(tag: String): Column =
      unhex(md5(concat(idCol.cast("string"), lit("|" + tag))
        .cast("binary")))
    concat(((0 until 17).map(i => block(i.toString)) :+
      block(if (variant) "17v" else "17")): _*)
  }

  val imageDhashPairs: Q = (s, dir) => {
    import graft.functions.ImageExpressions
    val docs = t(s, dir, "documents")
    val baseImgs = docs.select(col("doc_id").as("id"),
      plantedImagePixels(col("doc_id"), variant = false).as("px"))
    val varImgs = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 10000000L).as("id"),
        plantedImagePixels(col("doc_id"), variant = true).as("px"))
    val withFp = baseImgs.unionByName(varImgs)
      .select(col("id"),
        ImageExpressions.gray_dhash64(col("px"), 18, 16).as("fp"))
    Dedup.simhashPairs(withFp, maxHammingDistance = 6)
      .orderBy(col("id1"), col("id2"))
  }

  val imageDhashPairsSql: String =
    """WITH ids AS (
      |  SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS s,
      |    FALSE AS v FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000, CAST(doc_id AS VARCHAR), TRUE
      |  FROM documents WHERE doc_id % 7 = 0),
      |px AS (SELECT media_id, list_transform(generate_series(0, 287), k ->
      |    ('0x' || substr(md5(s || '|' ||
      |        CASE WHEN v AND k // 16 = 17 THEN '17v'
      |          ELSE CAST(k // 16 AS VARCHAR) END),
      |      (k % 16) * 2 + 1, 2))::BIGINT) AS p
      |  FROM ids),
      |cells AS (SELECT media_id, list_transform(generate_series(0, 71), g ->
      |    (p[(g // 9) * 2 * 18 + (g % 9) * 2 + 1]
      |     + p[(g // 9) * 2 * 18 + (g % 9) * 2 + 2]
      |     + p[((g // 9) * 2 + 1) * 18 + (g % 9) * 2 + 1]
      |     + p[((g // 9) * 2 + 1) * 18 + (g % 9) * 2 + 2]) // 4) AS cell
      |  FROM px),
      |bits AS (SELECT media_id, list_transform(generate_series(0, 63), b ->
      |    cell[(b // 8) * 9 + (b % 8) + 2] > cell[(b // 8) * 9 + (b % 8) + 1])
      |    AS bit FROM cells),
      |h AS (SELECT a.media_id AS id1, b.media_id AS id2,
      |    CAST(list_sum(list_transform(generate_series(1, 64), i ->
      |      CASE WHEN a.bit[i] <> b.bit[i] THEN 1 ELSE 0 END)) AS INTEGER)
      |      AS hamming
      |  FROM bits a JOIN bits b ON a.media_id < b.media_id)
      |SELECT id1, id2, hamming FROM h WHERE hamming <= 6
      |ORDER BY id1, id2""".stripMargin

  /** aHash (average hash) next to dHash over the q277 image fixtures —
    * the second standard perceptual hash, reported per image as a
    * 16-char hex fingerprint plus its Hamming distance to the dHash.
    * The hex rendering makes the FULL 64-bit value oracle-checkable
    * without signed-overflow gymnastics (bit 63 cannot ride a BIGINT
    * sum), and the cross-hash Hamming column pins the two hash
    * implementations against each other under one gate: the DuckDB
    * twin recomputes every pixel, both cell grids (8×8 mean-threshold
    * for aHash, 9×8 gradient for dHash), the global mean, each bit,
    * and the hex digits from the same md5 integer arithmetic. Scale:
    * row-local codegen per image, one pass, no joins.
    */
  val imageAhashReport: Q = (s, dir) => {
    import graft.functions.ImageExpressions
    val px = plantedImagePixels(col("doc_id"), variant = false)
    t(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        ImageExpressions.gray_ahash64(px, 18, 16).as("ah"),
        ImageExpressions.gray_dhash64(px, 18, 16).as("dh"))
      .select(col("media_id"),
        lpad(lower(hex(col("ah"))), 16, "0").as("ahash_hex"),
        bit_count(col("ah").bitwiseXOR(col("dh"))).as("ad_hamming"))
      .orderBy(col("media_id"))
  }

  val imageAhashReportSql: String =
    """WITH px AS (SELECT doc_id AS media_id,
      |    list_transform(generate_series(0, 287), k ->
      |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
      |          CAST(k // 16 AS VARCHAR)), (k % 16) * 2 + 1, 2))::BIGINT)
      |      AS p
      |  FROM documents),
      |cells AS (SELECT media_id,
      |  list_transform(generate_series(0, 63), g ->
      |    (p[(g // 8) * 2 * 18 + (g % 8) * 2 + 1]
      |     + p[(g // 8) * 2 * 18 + (g % 8) * 2 + 2]
      |     + p[((g // 8) * 2 + 1) * 18 + (g % 8) * 2 + 1]
      |     + p[((g // 8) * 2 + 1) * 18 + (g % 8) * 2 + 2]) // 4) AS acell,
      |  list_transform(generate_series(0, 71), g ->
      |    (p[(g // 9) * 2 * 18 + (g % 9) * 2 + 1]
      |     + p[(g // 9) * 2 * 18 + (g % 9) * 2 + 2]
      |     + p[((g // 9) * 2 + 1) * 18 + (g % 9) * 2 + 1]
      |     + p[((g // 9) * 2 + 1) * 18 + (g % 9) * 2 + 2]) // 4) AS dcell
      |  FROM px),
      |bits AS (SELECT media_id,
      |    list_transform(generate_series(0, 63), i ->
      |      acell[i + 1] > (list_sum(acell) // 64)) AS abit,
      |    list_transform(generate_series(0, 63), b ->
      |      dcell[(b // 8) * 9 + (b % 8) + 2] > dcell[(b // 8) * 9 + (b % 8) + 1])
      |      AS dbit
      |  FROM cells)
      |SELECT media_id,
      |  array_to_string(list_transform(generate_series(1, 16), j ->
      |    substr('0123456789abcdef',
      |      (CASE WHEN abit[4 * (16 - j) + 1] THEN 1 ELSE 0 END)
      |      + (CASE WHEN abit[4 * (16 - j) + 2] THEN 2 ELSE 0 END)
      |      + (CASE WHEN abit[4 * (16 - j) + 3] THEN 4 ELSE 0 END)
      |      + (CASE WHEN abit[4 * (16 - j) + 4] THEN 8 ELSE 0 END) + 1, 1)),
      |    '') AS ahash_hex,
      |  CAST(list_sum(list_transform(generate_series(1, 64), i ->
      |    CASE WHEN abit[i] <> dbit[i] THEN 1 ELSE 0 END)) AS INTEGER)
      |    AS ad_hamming
      |FROM bits ORDER BY media_id""".stripMargin

  /** Audio near-duplicate detection via the PCM16 energy-envelope sign
    * hash — the AUDIO analog of the q277 image gate, completing content
    * fingerprinting across both non-text modalities ([[graft.functions
    * .AudioExpressions.pcm16_energy_sign_hash]]: 65-frame integer
    * energy envelope, consecutive-frame gradient signs — the 1-band
    * reduction of Haitsma–Kalker '02). Fixture: 264 planted PCM16LE
    * samples per document from the doc_id's md5 stream (block i =
    * md5("<id>|a<i>")); docs with doc_id % 9 == 0 plant a VARIANT
    * (media_id +2·10⁷) identical except blocks 30–32 — an edit
    * confined to the last five frames, so base↔variant pairs sit
    * within ≤5 bits while unrelated envelopes sit near 32. Pairs
    * within Hamming radius 4 via the pigeonhole [[Dedup.simhashPairs]]
    * machinery; the oracle recomputes every sample, frame energy, bit,
    * and distance from the same md5 arithmetic — exact on both sides.
    */
  val audioFingerprintPairs: Q = (s, dir) => {
    import graft.functions.AudioExpressions
    def block(idCol: Column, tag: String): Column =
      unhex(md5(concat(idCol.cast("string"), lit("|a" + tag))
        .cast("binary")))
    def pcm(idCol: Column, variant: Boolean): Column =
      concat((0 until 33).map(i =>
        block(idCol, if (variant && i >= 30) i + "v" else i.toString)): _*)
    val docs = t(s, dir, "documents")
    val base = docs.select(col("doc_id").as("id"),
      pcm(col("doc_id"), variant = false).as("px"))
    val vars = docs.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 20000000L).as("id"),
        pcm(col("doc_id"), variant = true).as("px"))
    val withFp = base.unionByName(vars)
      .select(col("id"),
        AudioExpressions.pcm16_energy_sign_hash(col("px")).as("fp"))
    Dedup.simhashPairs(withFp, maxHammingDistance = 4)
      .orderBy(col("id1"), col("id2"))
  }

  val audioFingerprintPairsSql: String =
    """WITH ids AS (
      |  SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS s,
      |    FALSE AS v FROM documents
      |  UNION ALL
      |  SELECT doc_id + 20000000, CAST(doc_id AS VARCHAR), TRUE
      |  FROM documents WHERE doc_id % 9 = 0),
      |px AS (SELECT media_id, list_transform(generate_series(0, 527), k ->
      |    ('0x' || substr(md5(s || '|a' || CAST(k // 16 AS VARCHAR) ||
      |        CASE WHEN v AND k // 16 >= 30 THEN 'v' ELSE '' END),
      |      (k % 16) * 2 + 1, 2))::BIGINT) AS p
      |  FROM ids),
      |en AS (SELECT media_id, list_transform(generate_series(0, 64), w ->
      |    list_sum(list_transform(generate_series(0, 3), j ->
      |      abs(CASE WHEN p[2 * (w * 4 + j) + 2] >= 128
      |        THEN (p[2 * (w * 4 + j) + 2] - 256) * 256
      |          + p[2 * (w * 4 + j) + 1]
      |        ELSE p[2 * (w * 4 + j) + 2] * 256
      |          + p[2 * (w * 4 + j) + 1] END))) // 4) AS e
      |  FROM px),
      |bits AS (SELECT media_id, list_transform(generate_series(0, 63), w ->
      |    e[w + 2] > e[w + 1]) AS bit FROM en),
      |h AS (SELECT a.media_id AS id1, b.media_id AS id2,
      |    CAST(list_sum(list_transform(generate_series(1, 64), i ->
      |      CASE WHEN a.bit[i] <> b.bit[i] THEN 1 ELSE 0 END)) AS INTEGER)
      |      AS hamming
      |  FROM bits a JOIN bits b ON a.media_id < b.media_id)
      |SELECT id1, id2, hamming FROM h WHERE hamming <= 4
      |ORDER BY id1, id2""".stripMargin

  /** Streaming multimodal dedup-at-ingest (TENTH streaming gate): the
    * q194 stateful-dedup shape with the dedup key computed by a CUSTOM
    * CODEGEN EXPRESSION inside the micro-batch pipeline —
    * [[graft.functions.ImageExpressions.gray_dhash64]] over planted
    * image buffers — proving the engine's native expressions run
    * unchanged under Structured Streaming (same plan fragment, same
    * generated code, state keyed by the 8-byte perceptual hash, never
    * the 288-byte payload). Fixture: every document's base image plus
    * an EXACT byte-copy (media_id +3·10⁷) for doc_id % 4 == 0 — the
    * copies hash identically, so only dropDuplicates state collapses
    * them across micro-batches. Oracle: distinct dHash count per
    * source, every hash recomputed bit-for-bit in SQL (the q279 cell
    * machinery). Scale: state is (source, hash) pairs — 8 bytes of
    * content state per retained image.
    */
  val streamImageDedup: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
    import graft.functions.ImageExpressions
    val srcDir = scratch("graft_stream_img_src")
    val docs = t(s, dir, "documents")
    val base = docs.select(col("doc_id").as("media_id"), col("source"),
      plantedImagePixels(col("doc_id"), variant = false).as("px"))
    val copies = docs.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 30000000L).as("media_id"), col("source"),
        plantedImagePixels(col("doc_id"), variant = false).as("px"))
    base.unionByName(copies).repartition(4)
      .write.mode("overwrite").parquet(srcDir.toString)
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("source", StringType),
      StructField("px", BinaryType)))
    val qname = "graft_stream_img_dedup_sink"
    val sq = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir.toString)
      .select(col("source"),
        ImageExpressions.gray_dhash64(col("px"), 18, 16).as("fp"))
      .dropDuplicates("source", "fp")
      .groupBy(col("source")).agg(count(lit(1)).as("n_unique_img"))
      .writeStream.outputMode("complete").format("memory")
      .queryName(qname).trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    s.table(qname)
      .select(col("source"), col("n_unique_img"))
      .orderBy(col("source"))
  }

  val streamImageDedupSql: String =
    """WITH px AS (SELECT doc_id AS media_id, source,
      |    list_transform(generate_series(0, 287), k ->
      |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
      |          CAST(k // 16 AS VARCHAR)), (k % 16) * 2 + 1, 2))::BIGINT)
      |      AS p
      |  FROM documents),
      |cells AS (SELECT media_id, source,
      |  list_transform(generate_series(0, 71), g ->
      |    (p[(g // 9) * 2 * 18 + (g % 9) * 2 + 1]
      |     + p[(g // 9) * 2 * 18 + (g % 9) * 2 + 2]
      |     + p[((g // 9) * 2 + 1) * 18 + (g % 9) * 2 + 1]
      |     + p[((g // 9) * 2 + 1) * 18 + (g % 9) * 2 + 2]) // 4) AS cell
      |  FROM px),
      |bits AS (SELECT media_id, source,
      |    array_to_string(list_transform(generate_series(0, 63), b ->
      |      CASE WHEN cell[(b // 8) * 9 + (b % 8) + 2]
      |          > cell[(b // 8) * 9 + (b % 8) + 1] THEN '1' ELSE '0' END),
      |      '') AS h
      |  FROM cells)
      |SELECT source, count(DISTINCT h) AS n_unique_img
      |FROM bits GROUP BY source ORDER BY source""".stripMargin

  /** Image near-dup CLUSTERS — q277's pair gate routed through the
    * cluster-native operator instead ([[Dedup.simhashClusters]]:
    * connected components of the radius-6 Hamming graph via per-node
    * min-label propagation, pairs existing only as register-level probe
    * hits — one output row per image at any corpus scale, the same
    * scale answer q94 gives for text). Exact-fingerprint collapse
    * makes the planted byte-identical duplicates free before the
    * fixpoint. Oracle: recursive-CTE transitive closure over the
    * brute-force Hamming pair set on SQL-recomputed dHashes — exact
    * component-level equivalence per row, base AND variant images.
    */
  val imageClusters: Q = (s, dir) => {
    import graft.functions.ImageExpressions
    val docs = t(s, dir, "documents")
    val base = docs.select(col("doc_id").as("id"),
      plantedImagePixels(col("doc_id"), variant = false).as("px"))
    val vars = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 10000000L).as("id"),
        plantedImagePixels(col("doc_id"), variant = true).as("px"))
    val withFp = base.unionByName(vars)
      .select(col("id"),
        ImageExpressions.gray_dhash64(col("px"), 18, 16).as("fp"))
    Dedup.simhashClusters(withFp, maxHammingDistance = 6)
      .select(col("id").as("media_id"), col("cluster_id"))
      .orderBy(col("media_id"))
  }

  val imageClustersSql: String =
    """WITH RECURSIVE ids AS (
      |  SELECT doc_id AS media_id, CAST(doc_id AS VARCHAR) AS s,
      |    FALSE AS v FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000, CAST(doc_id AS VARCHAR), TRUE
      |  FROM documents WHERE doc_id % 7 = 0),
      |px AS (SELECT media_id, list_transform(generate_series(0, 287), k ->
      |    ('0x' || substr(md5(s || '|' ||
      |        CASE WHEN v AND k // 16 = 17 THEN '17v'
      |          ELSE CAST(k // 16 AS VARCHAR) END),
      |      (k % 16) * 2 + 1, 2))::BIGINT) AS p
      |  FROM ids),
      |cells AS (SELECT media_id, list_transform(generate_series(0, 71), g ->
      |    (p[(g // 9) * 2 * 18 + (g % 9) * 2 + 1]
      |     + p[(g // 9) * 2 * 18 + (g % 9) * 2 + 2]
      |     + p[((g // 9) * 2 + 1) * 18 + (g % 9) * 2 + 1]
      |     + p[((g // 9) * 2 + 1) * 18 + (g % 9) * 2 + 2]) // 4) AS cell
      |  FROM px),
      |bits AS (SELECT media_id, list_transform(generate_series(0, 63), b ->
      |    cell[(b // 8) * 9 + (b % 8) + 2] > cell[(b // 8) * 9 + (b % 8) + 1])
      |    AS bit FROM cells),
      |edges AS (SELECT a.media_id AS a, b.media_id AS b
      |  FROM bits a JOIN bits b ON a.media_id < b.media_id
      |  WHERE list_sum(list_transform(generate_series(1, 64), i ->
      |    CASE WHEN a.bit[i] <> b.bit[i] THEN 1 ELSE 0 END)) <= 6),
      |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      |reach AS (SELECT a, b FROM sym
      |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
      |  WHERE s.b <> r.a),
      |cl AS (SELECT a AS media_id, least(a, min(b)) AS cluster_id
      |  FROM reach GROUP BY a)
      |SELECT i.media_id, coalesce(cl.cluster_id, i.media_id) AS cluster_id
      |FROM ids i LEFT JOIN cl ON i.media_id = cl.media_id
      |ORDER BY i.media_id""".stripMargin

  /** JSON-lines SOURCE: the corpus round-trips through an actual
    * `.json` write + schema'd `spark.read.json` scan (the third source
    * family next to CSV and parquet — semi-structured feeds are how
    * most scraped corpora land). The aggregate reads ALL columns back
    * through the JSON parser — including the free-text body with its
    * full escaping surface (quotes, backslashes, newlines, emoji/CJK
    * from the corpus) — and the distinct-md5 column proves the text
    * survived byte-exactly, because the oracle hashes the ORIGINAL
    * table: any escaping loss changes the hash set. Scale: JSON scan
    * is splittable by line; schema is EXPLICIT (no inference pass —
    * at 100 TB schema inference is a full extra scan).
    */
  val jsonlScan: Q = (s, dir) => {
    val srcDir = scratch("graft_jsonl_src")
    t(s, dir, "documents").repartition(4)
      .write.mode("overwrite").json(srcDir.toString)
    val schema = t(s, dir, "documents").schema
    s.read.schema(schema).json(srcDir.toString)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(md5(col("text").cast("binary"))).as("n_unique_text"))
      .orderBy(col("lang"))
  }

  val jsonlScanSql: String =
    """SELECT lang, count(*) AS n,
      | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      | count(DISTINCT md5(text)) AS n_unique_text
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** In-row JSON functions: `to_json` → `from_json` → `get_json_object`
    * round-trip inside one projection — the row-local JSON surface
    * (event payloads, API envelopes) as opposed to q283's file-level
    * source. Every field is recovered FROM the serialized string by
    * two independent parser paths (struct re-parse and JSONPath
    * probe), and the output equals the original columns only if
    * serialization, parsing, and path extraction all agree — which is
    * the gate. Scale: pure row-local codegen'd expressions, no
    * shuffle beyond the final order.
    */
  val jsonRoundTrip: Q = (s, dir) => {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val j = to_json(struct(col("doc_id"), col("lang"), col("n_chars")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    t(s, dir, "documents")
      .select(col("doc_id").as("orig_id"), j.as("payload"))
      .select(col("orig_id"),
        from_json(col("payload"), schema).as("p"),
        get_json_object(col("payload"), "$.lang").as("path_lang"),
        get_json_object(col("payload"), "$.n_chars").cast("long")
          .as("path_chars"))
      .select(col("orig_id"), col("p.doc_id").as("doc_id"),
        col("p.lang").as("lang"), col("p.n_chars").as("n_chars"),
        col("path_lang"), col("path_chars"))
      .orderBy(col("orig_id"))
  }

  val jsonRoundTripSql: String =
    """SELECT doc_id AS orig_id, doc_id, lang, n_chars,
      | lang AS path_lang, n_chars AS path_chars
      |FROM documents ORDER BY orig_id""".stripMargin

  /** ORC SOURCE/SINK round-trip: the columnar-format sibling of the
    * parquet path (Spark ships the ORC reader/writer natively) —
    * write the orders table as ORC, scan it back, and aggregate with
    * the DECIMAL discipline. Proves the engine is not parquet-bound:
    * a lakehouse migration (ORC→parquet or mixed estates) runs through
    * the same DataFrame surface. Scale: ORC scans are splittable with
    * predicate pushdown, same as parquet.
    */
  val orcRoundTrip: Q = (s, dir) => {
    val srcDir = scratch("graft_orc_src")
    t(s, dir, "orders").repartition(4)
      .write.mode("overwrite").orc(srcDir.toString)
    s.read.orc(srcDir.toString)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total"))
      .orderBy(col("o_orderpriority"))
  }

  val orcRoundTripSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** BUCKETED co-located join — the shuffle-elimination technique the
    * 100 TB design leans on for repeated fact↔dim joins: both tables
    * are written `bucketBy(8, key)` + `sortBy(key)` as managed parquet
    * tables (metastore DB rooted in scratch, not the repo cwd), and
    * the merge-hinted equi-join then reads bucket files ALREADY
    * hash-partitioned and sorted on the key, so the SortMergeJoin
    * executes with NO ShuffleExchange under either side
    * ([[graft.plans.PlanShapeSpec]] pins that structurally). On a
    * cluster this is the difference between re-shuffling 100 TB per
    * join and reading co-located files; the write-side cost is paid
    * once at ingest. Oracle: the same join aggregate from the plain
    * tables — bucketing must be semantically invisible.
    */
  val bucketedJoin: Q = (s, dir) => {
    val dbDir = scratch("graft_bucket_db")
    // DROP first: CREATE ... IF NOT EXISTS would silently keep the
    // FIRST invocation's scratch location within a JVM, so a re-run
    // would rewrite tables under a path that may already be swept —
    // the drop makes every invocation self-contained.
    s.sql("DROP DATABASE IF EXISTS graft_bucket CASCADE")
    s.sql(s"CREATE DATABASE graft_bucket LOCATION '$dbDir'")
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .format("parquet").saveAsTable("graft_bucket.orders_b")
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .format("parquet").saveAsTable("graft_bucket.customer_b")
    s.table("graft_bucket.orders_b").hint("merge")
      .join(s.table("graft_bucket.customer_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total"))
      .orderBy(col("c_mktsegment"))
  }

  val bucketedJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Population Stability Index (PSI — the standard production drift
    * monitor for score/feature distributions; Siddiqi '06 credit-risk
    * formulation): purchase values binned into a fixed value-domain
    * grid, week-0 (reference) vs week-1 (comparison) shares, PSI term
    * per bin = (p−q)·ln(p/q) with +1 Laplace smoothing so empty bins
    * stay finite AND deterministic on both engines. Per-bin ln rounds
    * through DECIMAL before the sum (the cross-row float-sum
    * discipline); counts are exact integers. The conventional
    * thresholds (0.1 / 0.25) make the summed index directly
    * actionable. Scale: one scan into a 10-bin × 2-week aggregate —
    * state is the grid, never the events.
    */
  val psiDrift: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
    val d0 = ev.agg(min(to_date(col("ts"))).as("d0"))
    val binned = ev.crossJoin(broadcast(d0))
      .withColumn("wk", expr("datediff(CAST(ts AS DATE), d0) div 7"))
      .filter(col("wk") <= 1)
      .withColumn("bin",
        least(floor(col("value") / 50.0), lit(9.0)).cast("int"))
    val grid = binned.groupBy(col("bin"))
      .agg(sum(when(col("wk") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("wk") === 1, 1L).otherwise(0L)).as("n1"))
    val tot = grid.agg(sum(col("n0")).as("t0"), sum(col("n1")).as("t1"))
    grid.crossJoin(broadcast(tot))
      .select(col("bin"), col("n0"), col("n1"), {
        // Laplace-smoothed shares: (n+1)/(t+10) — 10 bins
        val p = (col("n0") + 1).cast("double") / (col("t0") + 10)
        val q = (col("n1") + 1).cast("double") / (col("t1") + 10)
        round((p - q) * log(p / q), 8).as("psi_term")
      })
      .orderBy(col("bin"))
  }

  val psiDriftSql: String =
    """WITH a AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events
      |  WHERE event_type = 'purchase'),
      |b AS (SELECT least(floor(value / 50.0), 9)::INTEGER AS bin,
      |    datediff('day', d0, CAST(ts AS DATE)) // 7 AS wk
      |  FROM events CROSS JOIN a
      |  WHERE event_type = 'purchase'
      |    AND datediff('day', d0, CAST(ts AS DATE)) // 7 <= 1),
      |g AS (SELECT bin,
      |    CAST(coalesce(sum(CASE WHEN wk = 0 THEN 1 END), 0) AS BIGINT)
      |      AS n0,
      |    CAST(coalesce(sum(CASE WHEN wk = 1 THEN 1 END), 0) AS BIGINT)
      |      AS n1
      |  FROM b GROUP BY bin),
      |t AS (SELECT CAST(sum(n0) AS BIGINT) AS t0,
      |    CAST(sum(n1) AS BIGINT) AS t1 FROM g)
      |SELECT bin, n0, n1,
      | round((CAST(n0 + 1 AS DOUBLE) / (t0 + 10)
      |      - CAST(n1 + 1 AS DOUBLE) / (t1 + 10))
      |   * ln((CAST(n0 + 1 AS DOUBLE) / (t0 + 10))
      |      / (CAST(n1 + 1 AS DOUBLE) / (t1 + 10))), 8) AS psi_term
      |FROM g CROSS JOIN t ORDER BY bin""".stripMargin

  /** Pearson r + Spearman ρ between document length and token count in
    * ONE exact-integer pipeline: raw moments are integer sums in
    * DECIMAL(38,0) (Σx² wraps int64 at corpus scale), and Spearman's
    * tie-corrected AVERAGE ranks ride the value-domain trick — per
    * DISTINCT value, 2·avgrank = 2·(# smaller) + (# ties) + 1 stays an
    * exact INTEGER (the ×2 factors cancel in ρ), computed by a
    * cumulative window over the distinct-value grid (value-domain
    * bounded, never the corpus — the q248 shape) and broadcast-joined
    * back. Both correlations leave integer space only at the two final
    * divisions. Scale: two value-domain aggregates + one corpus scan.
    */
  val rankCorrelation: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = Dedup.pin(t(s, dir, "documents")
      .select(col("n_chars").as("x"),
        size(TextStats.tokens(lower(col("text")))).cast("long").as("y")))
    def ranks2(c: String): DataFrame = {
      // bounded partition-less window: per-DISTINCT-value grid only
      val w = Window.orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, -1)
      d.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .withColumn("r2",
          lit(2) * coalesce(sum(col("cnt")).over(w), lit(0L))
            + col("cnt") + 1)
        .select(col(c), col("r2").as(c + "_r2"))
    }
    val withRanks = d
      .join(broadcast(ranks2("x")), Seq("x"))
      .join(broadcast(ranks2("y")), Seq("y"))
    val m = withRanks.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
      sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"),
      sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
      sum(col("x_r2").cast("decimal(38,0)")).as("rx"),
      sum(col("y_r2").cast("decimal(38,0)")).as("ry"),
      sum(col("x_r2").cast("decimal(38,0)") * col("x_r2")).as("rxx"),
      sum(col("y_r2").cast("decimal(38,0)") * col("y_r2")).as("ryy"),
      sum(col("x_r2").cast("decimal(38,0)") * col("y_r2")).as("rxy"))
    def corr(n: Column, sx: Column, sy: Column, sxx: Column, syy: Column,
             sxy: Column): Column = {
      val nd = n.cast("double")
      val cov = nd * sxy.cast("double") - sx.cast("double") * sy.cast("double")
      val vx = nd * sxx.cast("double") - sx.cast("double") * sx.cast("double")
      val vy = nd * syy.cast("double") - sy.cast("double") * sy.cast("double")
      round(cov / sqrt(vx * vy), 6)
    }
    m.select(col("n"),
      corr(col("n"), col("sx"), col("sy"), col("sxx"), col("syy"),
        col("sxy")).as("pearson_r"),
      corr(col("n"), col("rx"), col("ry"), col("rxx"), col("ryy"),
        col("rxy")).as("spearman_rho"))
  }

  val rankCorrelationSql: String =
    """WITH d AS (SELECT n_chars AS x,
      |    CAST(length(regexp_extract_all(lower(text), '\S+')) AS BIGINT)
      |      AS y
      |  FROM documents),
      |xg AS (SELECT x, count(*) AS cnt FROM d GROUP BY x),
      |xr AS (SELECT x, 2 * coalesce(sum(cnt) OVER (ORDER BY x
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + cnt + 1 AS x_r2 FROM xg),
      |yg AS (SELECT y, count(*) AS cnt FROM d GROUP BY y),
      |yr AS (SELECT y, 2 * coalesce(sum(cnt) OVER (ORDER BY y
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + cnt + 1 AS y_r2 FROM yg),
      |j AS (SELECT d.x, d.y, xr.x_r2, yr.y_r2
      |  FROM d JOIN xr ON d.x = xr.x JOIN yr ON d.y = yr.y),
      |m AS (SELECT count(*) AS n,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(x_r2 AS HUGEINT)) AS rx,
      |    sum(CAST(y_r2 AS HUGEINT)) AS ry,
      |    sum(CAST(x_r2 AS HUGEINT) * x_r2) AS rxx,
      |    sum(CAST(y_r2 AS HUGEINT) * y_r2) AS ryy,
      |    sum(CAST(x_r2 AS HUGEINT) * y_r2) AS rxy
      |  FROM j)
      |SELECT n,
      | round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |   / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS pearson_r,
      | round((CAST(n AS DOUBLE) * CAST(rxy AS DOUBLE)
      |     - CAST(rx AS DOUBLE) * CAST(ry AS DOUBLE))
      |   / sqrt((CAST(n AS DOUBLE) * CAST(rxx AS DOUBLE)
      |       - CAST(rx AS DOUBLE) * CAST(rx AS DOUBLE))
      |     * (CAST(n AS DOUBLE) * CAST(ryy AS DOUBLE)
      |       - CAST(ry AS DOUBLE) * CAST(ry AS DOUBLE))), 6)
      |   AS spearman_rho
      |FROM m""".stripMargin

  /** Cohen's kappa inter-annotator agreement (Cohen '60) between two
    * deterministic document "raters": a char-length rubric and a
    * token-count rubric, each bucketing into 3 classes. The classic
    * label-quality audit for annotation pipelines — kappa corrects raw
    * agreement for the agreement two marginally-faithful random raters
    * would reach by chance. Everything is exact integers until three
    * final divisions: N·po = Σ diagonal, N²·pe = Σ_k row_k·col_k
    * (marginal products ride DECIMAL(38,0) — N² wraps int64 at corpus
    * scale), kappa = (N·diag − Σrc)/(N² − Σrc). Scale: one corpus scan
    * into two ≤3-row marginal frames + one 1-row moment aggregate —
    * state is the class grid, never the corpus.
    */
  val cohenKappa: Q = (s, dir) => {
    val d = Dedup.pin(t(s, dir, "documents").select(
      when(col("n_chars") < 220, 0).when(col("n_chars") < 380, 1)
        .otherwise(2).as("ra"),
      {
        val tok = size(TextStats.tokens(lower(col("text")))).cast("long")
        when(tok < 40, 0).when(tok < 70, 1).otherwise(2).as("rb")
      }))
    val base = d.agg(count(lit(1)).as("n"),
      sum(when(col("ra") === col("rb"), 1L).otherwise(0L)).as("diag"))
    val margA = d.groupBy(col("ra").as("k")).agg(count(lit(1)).as("na"))
    val margB = d.groupBy(col("rb").as("k")).agg(count(lit(1)).as("nb"))
    val exp = margA.join(margB, Seq("k"))
      .agg(coalesce(sum(col("na").cast("decimal(38,0)") * col("nb")),
        lit(0).cast("decimal(38,0)")).as("src"))
    val r = base.crossJoin(broadcast(exp))
    // n=0 (empty corpus) ⇒ every denominator is 0 under ANSI division;
    // emit NULL instead of DIVIDE_BY_ZERO (the q176/q250 empty-input
    // convention — the EmptyInputSpec sweep requires it catalog-wide).
    val kDen = (col("n").cast("decimal(38,0)") * col("n")) - col("src")
    r.select(col("n"), col("diag"),
      round(when(col("n") === 0, lit(null))
        .otherwise(col("diag").cast("double") / col("n")), 6).as("po"),
      round(when(col("n") === 0, lit(null)).otherwise(col("src").cast("double")
        / (col("n").cast("decimal(38,0)") * col("n")).cast("double")), 6)
        .as("pe"),
      round(when(kDen === 0, lit(null)).otherwise(
        (col("n").cast("decimal(38,0)") * col("diag") - col("src"))
          .cast("double") / kDen.cast("double")), 6).as("kappa"))
  }

  val cohenKappaSql: String =
    """WITH d AS (SELECT
      |    CASE WHEN n_chars < 220 THEN 0
      |         WHEN n_chars < 380 THEN 1 ELSE 2 END AS ra,
      |    CASE WHEN CAST(length(regexp_extract_all(lower(text), '\S+'))
      |             AS BIGINT) < 40 THEN 0
      |         WHEN CAST(length(regexp_extract_all(lower(text), '\S+'))
      |             AS BIGINT) < 70 THEN 1 ELSE 2 END AS rb
      |  FROM documents),
      |base AS (SELECT count(*) AS n,
      |    CAST(coalesce(sum(CASE WHEN ra = rb THEN 1 END), 0) AS BIGINT)
      |      AS diag FROM d),
      |ma AS (SELECT ra AS k, count(*) AS na FROM d GROUP BY ra),
      |mb AS (SELECT rb AS k, count(*) AS nb FROM d GROUP BY rb),
      |e AS (SELECT coalesce(sum(CAST(na AS HUGEINT) * nb), 0) AS src
      |  FROM ma JOIN mb USING (k))
      |SELECT n, diag,
      | round(CAST(diag AS DOUBLE) / n, 6) AS po,
      | round(CAST(src AS DOUBLE)
      |   / CAST(CAST(n AS HUGEINT) * n AS DOUBLE), 6) AS pe,
      | round(CAST(CAST(n AS HUGEINT) * diag - src AS DOUBLE)
      |   / CAST(CAST(n AS HUGEINT) * n - src AS DOUBLE), 6) AS kappa
      |FROM base CROSS JOIN e""".stripMargin

  /** k-anonymity / l-diversity privacy audit (Sweeney '02; Machanavajjhala
    * '07): equivalence classes over the quasi-identifier pair
    * (nation, market segment), k = class size, l = distinct values of
    * the sensitive attribute (account-in-debt flag) inside the class.
    * The release-readiness gate for any dataset leaving a trust
    * boundary: % of ROWS in classes below k=5 and % of CLASSES with
    * l<2 (attribute-disclosure risk), both as exact-integer basis
    * points (`div`, never float-and-cast — the q237 lesson). Scale:
    * one keyed aggregate over the QI grid (bounded by the QI domain,
    * never the corpus) + one 1-row reduce.
    */
  val kAnonymityAudit: Q = (s, dir) => {
    val classes = t(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        (col("c_acctbal") < 0).cast("int").as("sens"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("k"), countDistinct(col("sens")).as("l"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("k")).as("n_rows"),
      min(col("k")).as("k_min"),
      sum(when(col("k") < 5, col("k")).otherwise(0L)).as("rows_at_risk"),
      sum(when(col("l") < 2, 1L).otherwise(0L)).as("classes_low_l"))
      .select(col("n_classes"), col("n_rows"), col("k_min"),
        col("rows_at_risk"),
        expr("rows_at_risk * 10000 div n_rows").as("risk_bp"),
        col("classes_low_l"),
        expr("classes_low_l * 10000 div n_classes").as("low_l_bp"))
  }

  val kAnonymityAuditSql: String =
    """WITH c AS (SELECT c_nationkey, c_mktsegment,
      |    count(*) AS k,
      |    count(DISTINCT CAST(c_acctbal < 0 AS INTEGER)) AS l
      |  FROM customer GROUP BY c_nationkey, c_mktsegment),
      |a AS (SELECT count(*) AS n_classes,
      |    CAST(sum(k) AS BIGINT) AS n_rows,
      |    CAST(min(k) AS BIGINT) AS k_min,
      |    CAST(coalesce(sum(CASE WHEN k < 5 THEN k END), 0) AS BIGINT)
      |      AS rows_at_risk,
      |    CAST(coalesce(sum(CASE WHEN l < 2 THEN 1 END), 0) AS BIGINT)
      |      AS classes_low_l
      |  FROM c)
      |SELECT n_classes, n_rows, k_min, rows_at_risk,
      | rows_at_risk * 10000 // n_rows AS risk_bp,
      | classes_low_l,
      | classes_low_l * 10000 // n_classes AS low_l_bp
      |FROM a""".stripMargin

  /** Exact Shapley-value channel attribution (Shapley '53 applied to
    * the conversion-credit game; the axiomatic alternative to q172
    * last-touch / q224 position-based): players are the four
    * non-purchase channels, a converting user's exposure set is the
    * bitmask of channels they emitted STRICTLY BEFORE their first
    * purchase (pre-conversion touchpoints — all 16 masks occur in the
    * testdata), and coalition value v(S) = # of converting users whose
    * exposure set ⊆ S. With |C|=4 the whole game lives on a 16-row
    * grid, so the exact formula is affordable:
    * φ_i·4! = Σ_{S∌i} |S|!·(3−|S|)!·(v(S∪i)−v(S)) stays an exact
    * integer (weights 6/2/2/6), one final /24 division per channel.
    * Efficiency axiom Σφ_i = v(C)−v(∅) is part of the output (spec
    * asserts it). Scale: one corpus scan → user-keyed window + agg on
    * the SAME key (one shuffle) → ≤16-row pattern frame; every joint
    * below that is broadcast-local.
    */
  val shapleyAttribution: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    val users = Tables.events(s, dir)
      .withColumn("fp",
        min(when(col("event_type") === "purchase", col("ts"))).over(w))
      .filter(col("fp").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        (max(when(col("event_type") === "click"
            && col("ts") < col("fp"), 1).otherwise(0))
          + max(when(col("event_type") === "error"
            && col("ts") < col("fp"), 2).otherwise(0))
          + max(when(col("event_type") === "signup"
            && col("ts") < col("fp"), 4).otherwise(0))
          + max(when(col("event_type") === "view"
            && col("ts") < col("fp"), 8).otherwise(0))).as("mask"))
    val patterns = users.groupBy(col("mask")).agg(count(lit(1)).as("nconv"))
    val coalitions = s.range(16).select(col("id").cast("int").as("cs"))
    val v = broadcast(coalitions)
      .join(broadcast(patterns),
        col("mask").bitwiseAND(col("cs")) === col("mask"), "left")
      .groupBy(col("cs"))
      .agg(coalesce(sum(col("nconv")), lit(0L)).as("v"))
    val channels = Seq(("click", 1), ("error", 2), ("signup", 4),
      ("view", 8)).toDF("channel", "bit")
    val vWith = v.select(col("cs").as("cs_w"), col("v").as("v_w"))
    val terms = broadcast(channels)
      .join(broadcast(v), col("cs").bitwiseAND(col("bit")) === 0)
      .join(broadcast(vWith), col("cs_w") === col("cs") + col("bit"))
      .withColumn("w",
        when(bit_count(col("cs")) === 0, 6L)
          .when(bit_count(col("cs")) === 1, 2L)
          .when(bit_count(col("cs")) === 2, 2L).otherwise(6L))
    terms.groupBy(col("channel"))
      .agg(sum(col("w") * (col("v_w") - col("v"))).as("shap24"))
      .select(col("channel"), col("shap24"),
        round(col("shap24").cast("double") / 24.0, 6).as("shapley"))
      .orderBy(col("channel"))
  }

  val shapleyAttributionSql: String =
    """WITH f AS (SELECT user_id,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
      |  FROM events GROUP BY user_id),
      |u AS (SELECT e.user_id,
      |    max(CASE WHEN event_type = 'click' AND e.ts < f.fp
      |        THEN 1 ELSE 0 END)
      |    + max(CASE WHEN event_type = 'error' AND e.ts < f.fp
      |        THEN 2 ELSE 0 END)
      |    + max(CASE WHEN event_type = 'signup' AND e.ts < f.fp
      |        THEN 4 ELSE 0 END)
      |    + max(CASE WHEN event_type = 'view' AND e.ts < f.fp
      |        THEN 8 ELSE 0 END) AS mask
      |  FROM events e JOIN f USING (user_id)
      |  WHERE f.fp IS NOT NULL GROUP BY e.user_id),
      |p AS (SELECT mask, count(*) AS nconv FROM u GROUP BY mask),
      |g AS (SELECT range AS cs FROM range(16)),
      |v AS (SELECT cs, CAST(coalesce(sum(p.nconv), 0) AS BIGINT) AS v
      |  FROM g LEFT JOIN p ON (p.mask & g.cs) = p.mask GROUP BY cs),
      |ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
      |    ('signup', 4), ('view', 8)) AS t(channel, bit)),
      |terms AS (SELECT ch.channel,
      |    CASE bit_count(v.cs) WHEN 0 THEN 6 WHEN 1 THEN 2
      |         WHEN 2 THEN 2 ELSE 6 END AS w,
      |    vw.v - v.v AS delta
      |  FROM ch JOIN v ON (v.cs & ch.bit) = 0
      |  JOIN v vw ON vw.cs = v.cs + ch.bit)
      |SELECT channel, CAST(sum(w * delta) AS BIGINT) AS shap24,
      | round(CAST(sum(w * delta) AS DOUBLE) / 24.0, 6) AS shapley
      |FROM terms GROUP BY channel ORDER BY channel""".stripMargin

  /** Wilson score 95% confidence interval (Wilson '27) on a per-source
    * proportion — the interval that stays inside [0,1] and behaves at
    * small n, i.e. what a quality dashboard should show instead of the
    * naive ±1.96·√(p(1−p)/n): share of "substantial" documents
    * (n_chars ≥ 300) per source. k and n are exact integers from one
    * keyed aggregate; the bound is ONE compound float expression from
    * those integers, written in the identical operation order in both
    * engines (the q287 psi_term precedent), rendered once at scale 6.
    * Scale: one scan into a |sources|-row grid.
    */
  val wilsonInterval: Q = (s, dir) => {
    val g = t(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("n_chars") >= 300, 1L).otherwise(0L)).as("k"))
    // 1.96² as the same double LITERAL the oracle uses — 1.96*1.96
    // in binary is NOT the double nearest 3.8416
    val z2 = lit(3.8416)
    val nd = col("n").cast("double"); val kd = col("k").cast("double")
    val p = kd / nd
    val center = p + z2 / (lit(2.0) * nd)
    val spread = lit(1.96) * sqrt(p * (lit(1.0) - p) / nd
      + z2 / (lit(4.0) * nd * nd))
    val denom = lit(1.0) + z2 / nd
    g.select(col("source"), col("n"), col("k"),
      round(p, 6).as("p_hat"),
      round((center - spread) / denom, 6).as("wilson_low"),
      round((center + spread) / denom, 6).as("wilson_high"))
      .orderBy(col("source"))
  }

  val wilsonIntervalSql: String =
    """WITH g AS (SELECT source, count(*) AS n,
      |    CAST(coalesce(sum(CASE WHEN n_chars >= 300 THEN 1 END), 0)
      |      AS BIGINT) AS k
      |  FROM documents GROUP BY source)
      |SELECT source, n, k,
      | round(CAST(k AS DOUBLE) / n, 6) AS p_hat,
      | round(((CAST(k AS DOUBLE) / n + 3.8416 / (2.0 * n))
      |     - 1.96 * sqrt((CAST(k AS DOUBLE) / n)
      |         * (1.0 - CAST(k AS DOUBLE) / n) / n
      |       + 3.8416 / (4.0 * n * n)))
      |   / (1.0 + 3.8416 / n), 6) AS wilson_low,
      | round(((CAST(k AS DOUBLE) / n + 3.8416 / (2.0 * n))
      |     + 1.96 * sqrt((CAST(k AS DOUBLE) / n)
      |         * (1.0 - CAST(k AS DOUBLE) / n) / n
      |       + 3.8416 / (4.0 * n * n)))
      |   / (1.0 + 3.8416 / n), 6) AS wilson_high
      |FROM g ORDER BY source""".stripMargin

  /** SQL-string entry point (r8 verdict "what's missing" #3): the gate
    * runs ENTIRELY through `spark.sql` text — temp-view registration +
    * the [[GraftExtensions]]-registered native expressions
    * (`dot_product`, `cosine_similarity`) resolved by the SQL parser
    * and function registry, not the Scala DSL — proving a SQL-only
    * user of the library gets the same engine: custom codegen
    * expressions, broadcastable 1-row anchor, decimal-disciplined
    * aggregate. [[graft.GraftExtensionsSpec]] pins DSL↔SQL hash
    * equality for the expression surface; this gate pins the
    * end-to-end statement against the DuckDB oracle.
    */
  val sqlEntry: Q = (s, dir) => {
    GraftExtensions.install(s)
    t(s, dir, "embeddings").createOrReplaceTempView("graft_sql_embeddings")
    s.sql("""
      WITH a AS (SELECT embedding AS ae FROM graft_sql_embeddings
                 WHERE vec_id = (SELECT min(vec_id)
                                 FROM graft_sql_embeddings))
      SELECT label, count(*) AS n,
        round(CAST(sum(CAST(round(sqrt(dot_product(embedding, embedding)),
            6) AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_norm,
        round(CAST(sum(CAST(round(cosine_similarity(embedding, ae), 6)
            AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_cos
      FROM graft_sql_embeddings CROSS JOIN a
      GROUP BY label ORDER BY label""")
  }

  val sqlEntrySql: String =
    """WITH v AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |a AS (SELECT e AS ae FROM v
      |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings))
      |SELECT label, count(*) AS n,
      | round(CAST(sum(CAST(round(sqrt(list_dot_product(e, e)), 6)
      |     AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_norm,
      | round(CAST(sum(CAST(round(list_dot_product(e, ae) /
      |       (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(ae, ae))),
      |     6) AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_cos
      |FROM v CROSS JOIN a
      |GROUP BY label ORDER BY label""".stripMargin

  /** Stream-stream LEFT OUTER interval join — the ELEVENTH oracle-gated
    * Structured Streaming query, and the first OUTER stream-stream
    * shape: q208's click-to-conversion attribution with the unconverted
    * views KEPT (the production funnel actually needs the misses — an
    * inner join silently drops the denominator). Outer null emission is
    * watermark-DRIVEN: an unmatched view row is released only when the
    * watermark proves no purchase can still arrive (l_ts + 2 h), so
    * unlike q208 the gate cannot hide behind an eviction-free horizon.
    * Parity engineering: files staged time-partitioned (the q209
    * stager — cross-batch arrival is event-time order, so with ANY
    * delay no real match is ever evicted early: a stored view expires
    * at l_ts + 2 h ≥ any joinable r_ts, and cross-batch left-probes of
    * right state are impossible by the ordering), watermark delay a
    * realistic 2 h, and a far-future sentinel pair (one per side — the
    * global watermark is the MIN across both inputs) forces the
    * trailing no-data batch to flush every pending unmatched view.
    * Scale: state is the 2 h + delay band per side, evicted
    * continuously — this is the shape that survives an unbounded
    * stream.
    */
  val streamOuterJoin: Q = (s, dir) => withShufflePartitions(s, 8) {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = scratch("graft_stream_ssouter_src")
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
      scratch("graft_stream_ssouter_stage"), Seq(col("event_id")))
    // sentinel PAIR: the stream watermark is min over BOTH filtered
    // inputs, so each side needs its own far-future row to advance
    val sentinelUs = hi + 30L * 86400L * 1000000L
    Staging.stageOne(s.range(2).select(
      (lit(-1L) - col("id")).as("event_id"),
      timestamp_micros(lit(sentinelUs)).as("ts"),
      lit(-1L).as("user_id"),
      when(col("id") === 0, lit("view")).otherwise(lit("purchase"))
        .as("event_type"),
      lit(0.0).as("value")), 4, srcDir, scratch("graft_stream_ssouter_sent"))
    def side(tpe: String) = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      .filter(col("event_type") === tpe)
    val joined = EventStreams.joinWithinWindow(
      side("view"), side("purchase"), "user_id", "2 hours", "2 hours",
      "left_outer")
    val qname = "graft_stream_ssouter_sink"
    val sq = joined
      .select(col("user_id"), col("l_id"), col("r_id"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))).as("gap_us"))
      .writeStream.outputMode("append").format("memory")
      .queryName(qname).trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    s.table(qname)
      .filter(col("user_id") >= 0)
      .groupBy(col("user_id"))
      .agg(count(col("r_id")).as("n_pairs"),
        sum(when(col("r_id").isNull, 1L).otherwise(0L))
          .as("n_unconverted"),
        sum(col("gap_us")).as("sum_gap_us"))
      .orderBy(col("user_id"))
  }

  val streamOuterJoinSql: String =
    """WITH v AS (SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'view'),
      |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT v.user_id,
      |  CAST(count(p.ts) AS BIGINT) AS n_pairs,
      |  CAST(coalesce(sum(CASE WHEN p.ts IS NULL THEN 1 END), 0)
      |    AS BIGINT) AS n_unconverted,
      |  CAST(sum(epoch_us(p.ts) - epoch_us(v.ts)) AS BIGINT)
      |    AS sum_gap_us
      |FROM v LEFT JOIN p ON v.user_id = p.user_id
      |  AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 2 HOUR
      |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin

  /** Kendall's tau-b rank correlation (Kendall '38, tau-b tie
    * correction '45) between document length band and token-count band
    * — completing the correlation trio with q288's Pearson/Spearman:
    * tau is the pair-concordance view, the one robust to monotone
    * re-binning. The O(n²) pair enumeration never happens: on a
    * BOUNDED ordinal grid (10×10 bands) concordant/discordant pair
    * counts are cell-pair sums over the ≤100-row contingency frame —
    * C = Σ n_ab·n_cd over (c>a, d>b), D over (c>a, d<b), tie terms
    * from the marginals — so the corpus is scanned once and all pair
    * algebra runs on the grid self-join (≤10⁴ cell pairs at ANY corpus
    * size). Everything is exact integers in DECIMAL(38,0) (pair counts
    * are ~n²/2 — wraps int64 at 100 TB); the single division and two
    * sqrts happen once, in the same op order both engines.
    */
  val kendallTau: Q = (s, dir) => {
    val cells = Dedup.pin(t(s, dir, "documents")
      .select(col("n_chars"),
        size(TextStats.tokens(lower(col("text")))).cast("long").as("tok"))
      .select(least(expr("n_chars div 200"), lit(9)).as("i"),
        least(expr("tok div 40"), lit(9)).as("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("cnt")))
    val zero = lit(0).cast("decimal(38,0)")
    val pairs = cells.as("a")
      .join(broadcast(cells).as("b"), col("b.i") > col("a.i"))
      .agg(
        coalesce(sum(when(col("b.j") > col("a.j"),
          col("a.cnt") * col("b.cnt")).otherwise(zero)), zero)
          .as("c_pairs"),
        coalesce(sum(when(col("b.j") < col("a.j"),
          col("a.cnt") * col("b.cnt")).otherwise(zero)), zero)
          .as("d_pairs"))
    val m = cells.agg(sum(col("cnt")).as("n"))
    // t(t-1) is always even, so /2 is exact; re-anchor to scale 0
    val rowt = cells.groupBy(col("i")).agg(sum(col("cnt")).as("t"))
      .agg((sum(col("t") * (col("t") - 1)) / 2)
        .cast("decimal(38,0)").as("n1"))
    val colt = cells.groupBy(col("j")).agg(sum(col("cnt")).as("u"))
      .agg((sum(col("u") * (col("u") - 1)) / 2)
        .cast("decimal(38,0)").as("n2"))
    val one = broadcast(m).crossJoin(broadcast(rowt))
      .crossJoin(broadcast(colt)).crossJoin(broadcast(pairs))
    val n0 = (col("n") * (col("n") - 1)) / 2
    one.select(
      col("n").cast("long").as("n"),
      col("c_pairs").cast("long").as("c_pairs"),
      col("d_pairs").cast("long").as("d_pairs"),
      col("n1").cast("long").as("ties_x"),
      col("n2").cast("long").as("ties_y"),
      round((col("c_pairs") - col("d_pairs")).cast("double")
        / (sqrt((n0 - col("n1")).cast("double"))
          * sqrt((n0 - col("n2")).cast("double"))), 6).as("tau_b"))
  }

  val kendallTauSql: String =
    """WITH d AS (SELECT least(n_chars // 200, 9) AS i,
      |    least(CAST(length(regexp_extract_all(lower(text), '\S+'))
      |      AS BIGINT) // 40, 9) AS j
      |  FROM documents),
      |cells AS (SELECT i, j, CAST(count(*) AS HUGEINT) AS cnt
      |  FROM d GROUP BY i, j),
      |p AS (SELECT
      |    coalesce(sum(CASE WHEN b.j > a.j THEN a.cnt * b.cnt END), 0)
      |      AS c_pairs,
      |    coalesce(sum(CASE WHEN b.j < a.j THEN a.cnt * b.cnt END), 0)
      |      AS d_pairs
      |  FROM cells a JOIN cells b ON b.i > a.i),
      |m AS (SELECT sum(cnt) AS n FROM cells),
      |rt AS (SELECT sum(t * (t - 1) // 2) AS n1 FROM
      |  (SELECT sum(cnt) AS t FROM cells GROUP BY i)),
      |ct AS (SELECT sum(u * (u - 1) // 2) AS n2 FROM
      |  (SELECT sum(cnt) AS u FROM cells GROUP BY j))
      |SELECT CAST(n AS BIGINT) AS n,
      |  CAST(c_pairs AS BIGINT) AS c_pairs,
      |  CAST(d_pairs AS BIGINT) AS d_pairs,
      |  CAST(n1 AS BIGINT) AS ties_x, CAST(n2 AS BIGINT) AS ties_y,
      |  round(CAST(c_pairs - d_pairs AS DOUBLE)
      |    / (sqrt(CAST(n * (n - 1) // 2 - n1 AS DOUBLE))
      |      * sqrt(CAST(n * (n - 1) // 2 - n2 AS DOUBLE))), 6) AS tau_b
      |FROM m CROSS JOIN rt CROSS JOIN ct CROSS JOIN p""".stripMargin

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
  private def plantedVideoFrame(idCol: Column, j: Int, nfCol: Column,
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

  // ============================================================== catalog

  val all: Map[String, Q] = Map(
    "q01_gold_flagship" -> goldFlagship,
    "q02_canonicalize" -> canonicalize,
    "q03_split_getitem" -> splitGetItem,
    "q04_when_isin" -> whenIsinRemap,
    "q05_union_harmonize" -> unionHarmonize,
    "q06_rename_normalize" -> renameNormalize,
    "q07_cast_commafix" -> castCommaFix,
    "q08_dq_violations" -> dqViolations,
    "q09_upper_length" -> upperLength,
    "q10_pretty_report" -> prettyReport,
    "q11_filter_pushdown" -> filterPushdown,
    "q12_left_join_nulls" -> leftJoinNulls,
    "q13_window_topk" -> windowTopK,
    "q14_sort_limit" -> sortLimit,
    "q15_distinct" -> distinctFlags,
    "q16_hourly_events" -> hourlyEvents,
    "q17_json_extract" -> jsonExtract,
    "q18_agg_stats" -> aggStats,
    "q19_except_nonbuyers" -> exceptNonBuyers,
    "q20_dedup_exact" -> dedupExact,
    "q21_dedup_minhash" -> dedupMinhash,
    "q22_dedup_simhash" -> dedupSimhash,
    "q23_dedup_jaccard" -> dedupJaccard,
    "q24_simsearch_brute" -> simsearchBrute,
    "q25_simsearch_lsh" -> simsearchLsh,
    "q26_text_stats" -> textStats,
    "q27_token_histogram" -> tokenHistogram,
    "q28_lang_id" -> langId,
    "q29_fingerprints" -> fingerprints,
    "q30_multimodal_meta" -> multimodalMeta,
    "q31_embedding_norms" -> embeddingNorms,
    "q32_rollup" -> rollupOrders,
    "q33_cube" -> cubeFlags,
    "q34_join_semi" -> joinSemi,
    "q35_join_anti" -> joinAnti,
    "q36_intersect" -> intersectBuyers,
    "q37_pivot" -> pivotStatus,
    "q38_asof_join" -> asofJoin,
    "q39_function_battery" -> functionBattery,
    "q40_simsearch_ivf" -> simsearchIvf,
    "q41_curation" -> curationPipeline,
    "q42_sessionize" -> sessionizeBatch,
    "q43_percentiles" -> percentiles,
    "q44_collect" -> collectArrays,
    "q45_topk_native" -> topkNative,
    "q46_hof_arrays" -> hofArrays,
    "q47_null_semantics" -> nullSemantics,
    "q48_string_agg" -> stringAgg,
    "q49_date_arith" -> dateArithmetic,
    "q50_revenue_by_nation" -> revenueByNation,
    "q51_unicode_normalize" -> unicodeNormalize,
    "q52_approx_sketches" -> approxSketches,
    "q54_endash_roundtrip" -> endashReport,
    "q55_window_battery" -> windowBattery,
    "q56_grouping_sets" -> groupingSetsQ,
    "q57_hash_sample" -> hashSample,
    "q58_range_join" -> rangeJoinBursts,
    "q59_unpivot" -> unpivotMetrics,
    "q60_merge_upsert" -> mergeUpsert,
    "q61_anonymize" -> anonymize,
    "q62_from_json" -> fromJsonStruct,
    "q63_map_ops" -> mapOps,
    "q64_minby_maxby" -> minByMaxBy,
    "q65_dedup_clusters" -> dedupClusters,
    "q66_quality_band" -> qualityBand,
    "q67_tfidf" -> tfidfTerms,
    "q68_embedding_centroids" -> embeddingCentroids,
    "q69_date_battery" -> dateBattery,
    "q70_fuzzy_strings" -> fuzzyStrings,
    "q71_cond_aggs" -> condAggs,
    "q72_exact_stddev" -> exactStddev,
    "q73_profiler" -> profileColumns,
    "q74_exists_forall" -> existsForall,
    "q75_date_densify" -> dateDensify,
    "q76_range_join_binned" -> rangeJoinBinned,
    "q77_approx_quantiles" -> approxQuantiles,
    "q78_bit_scalars" -> bitScalars,
    "q79_encode_battery" -> encodeBattery,
    "q80_struct_ops" -> structOps,
    "q81_explode_outer" -> explodeOuter,
    "q82_regex_backrefs" -> regexBackrefs,
    "q83_window_values" -> windowValues,
    "q84_union_distinct" -> unionDistinct,
    "q85_exact_corr" -> exactCorr,
    "q86_percentile_disc" -> percentileDisc,
    "q87_embedding_neardup" -> embeddingNearDup,
    "q88_pack_shards" -> packShards,
    "q89_cluster_canonical" -> clusterCanonical,
    "q90_strip_boilerplate" -> stripBoilerplate,
    "q91_contamination" -> contamination,
    "q92_reservoir_sample" -> reservoirSample,
    "q93_bigram_topk" -> bigramTopK,
    "q94_simhash_clusters" -> simhashClusterQ,
    "q99_dq_checkpoint" -> dqCheckpoint,
    "q100_boilerplate_ngrams" -> boilerplateNgrams,
    "q101_embedding_quantize" -> embeddingQuantize,
    "q102_embedding_neardup_lsh" -> embeddingNearDupLsh,
    "q103_fs_roundtrip" -> fsRoundtrip,
    "q95_csv_tsv" -> csvTsvRoundtrip,
    "q96_csv_pipe" -> csvPipeRoundtrip,
    "q97_csv_quoted" -> csvQuotedRoundtrip,
    "q98_csv_quarantine" -> csvQuarantine,
    "q104_repetition_signals" -> repetitionSignals,
    "q105_domain_mix" -> domainMix,
    "q106_ngram_novelty" -> ngramNovelty,
    "q107_partitioned_pruning" -> partitionedPruning,
    "q108_jsonl_roundtrip" -> jsonlRoundtrip,
    "q109_orc_roundtrip" -> orcRoundtrip,
    "q110_salted_join" -> saltedJoinQ,
    "q111_morton_zorder" -> mortonZorder,
    "q112_compact" -> compactRoundtrip,
    "q113_salted_agg" -> saltedAgg,
    "q114_merge_schema" -> mergeSchemaRead,
    "q115_weighted_quality" -> weightedQuality,
    "q116_length_batches" -> lengthBatches,
    "q117_incremental_dedup" -> incrementalDedup,
    "q118_passage_dedup" -> passageDedup,
    "q119_temperature_mix" -> temperatureMix,
    "q120_stratified_split" -> stratifiedSplit,
    "q121_rag_chunks" -> ragChunks,
    "q122_vocab_growth" -> vocabGrowth,
    "q123_winsorize_quality" -> winsorizeQuality,
    "q124_bloom_semi_join" -> bloomSemiJoin,
    "q125_audio_meta" -> audioMeta,
    "q126_token_surprisal" -> tokenSurprisal,
    "q127_snapshot_diff" -> snapshotDiff,
    "q128_fuzzy_match" -> fuzzyBlockedMatch,
    "q129_bpe_merges" -> bpeMerges,
    "q130_zipf_slope" -> zipfSlope,
    "q131_jsonl_quarantine" -> jsonlQuarantine,
    "q132_winnow_overlap" -> winnowOverlap,
    "q133_curation_funnel" -> curationFunnel,
    "q134_bpe_encode" -> bpeEncode,
    "q135_scd2_history" -> scd2History,
    "q136_forget_keys" -> forgetKeys,
    "q137_integrity_audit" -> integrityAudit,
    "q138_conversion_funnel" -> conversionFunnel,
    "q139_cohort_retention" -> cohortRetention,
    "q140_market_basket" -> marketBasket,
    "q141_hourly_anomalies" -> hourlyAnomalies,
    "q142_embedding_drift" -> embeddingDrift,
    "q143_copurchase_rank" -> copurchaseRank,
    "q144_csv_gzip" -> csvGzipRoundtrip,
    "q145_winnow_clusters" -> winnowClustersQ,
    "q146_append_bronze" -> appendBronze,
    "q147_pii_scrub" -> piiScrub,
    "q148_sequence_pack" -> sequencePack,
    "q149_token_budget_mix" -> tokenBudgetMix,
    "q150_dynamic_overwrite" -> dynamicPartitionOverwrite,
    "q151_domain_blocklist" -> domainBlocklist,
    "q152_cdc_chunks" -> cdcChunks,
    "q153_embedding_pca" -> embeddingPca,
    "q154_cdc_sync" -> cdcSync,
    "q155_semantic_dedup" -> semanticDedupGate,
    "q156_dsir_weights" -> dsirWeights,
    "q157_triangle_census" -> triangleCensus,
    "q158_gopher_filter" -> gopherFilter,
    "q159_domain_quota" -> domainQuota,
    "q160_bfs_levels" -> bfsLevelsQ,
    "q161_kcore" -> kCoreQ,
    "q162_event_transitions" -> eventTransitions,
    "q163_corpus_datasheet" -> corpusDatasheet,
    "q164_mad_outliers" -> madOutliers,
    "q165_cross_source_overlap" -> crossSourceOverlap,
    "q166_source_divergence" -> sourceDivergence,
    "q167_time_to_convert" -> timeToConvert,
    "q168_skyline" -> skylineUsers,
    "q169_pmi_collocations" -> pmiCollocations,
    "q170_weighted_sample" -> weightedSample,
    "q171_incremental_agg" -> incrementalAgg,
    "q172_last_touch" -> lastTouch,
    "q173_heavy_hitters" -> heavyHitters,
    "q174_rfm_segments" -> rfmSegments,
    "q175_product_quantize" -> productQuantize,
    "q176_char_entropy" -> charEntropy,
    "q177_stream_hourly" -> streamHourly,
    "q178_quantile_norm" -> quantileNorm,
    "q179_split_leakage" -> splitLeakage,
    "q180_detector_agreement" -> detectorAgreement,
    "q181_ks_drift" -> ksDrift,
    "q182_quality_lift" -> qualityLift,
    "q183_token_keyness" -> tokenKeyness,
    "q184_activity_streaks" -> activityStreaks,
    "q185_weighted_median" -> weightedMedian,
    "q186_detector_agreement_sampled" -> detectorAgreementSampled,
    "q187_hll_distinct" -> hllDistinct,
    "q188_containment_pairs" -> containmentPairs,
    "q189_minhash_calibration" -> minhashCalibration,
    "q190_cluster_size_histogram" -> clusterSizeHistogram,
    "q191_cms_overcount" -> cmsOvercount,
    "q192_kmv_distinct" -> kmvDistinct,
    "q193_epoch_planner" -> epochPlanner,
    "q194_stream_dedup" -> streamDedup,
    "q195_bm25_topk" -> bm25TopK,
    "q196_contrastive_triplets" -> contrastiveTriplets,
    "q197_kmv_overlap_matrix" -> kmvOverlapMatrix,
    "q198_decay_engagement" -> decayEngagement,
    "q199_join_skew_profile" -> joinSkewProfile,
    "q200_benford_audit" -> benfordAudit,
    "q201_event_lift_matrix" -> eventLiftMatrix,
    "q202_burstiness_audit" -> burstinessAudit,
    "q203_stream_enrich" -> streamEnrich,
    "q204_rrf_fusion" -> rrfFusion,
    "q205_rendezvous_shards" -> rendezvousShards,
    "q206_rank_agreement" -> rankAgreement,
    "q207_rolling_active_users" -> rollingActiveUsers,
    "q208_stream_interval_join" -> streamIntervalJoin,
    "q209_stream_sessions" -> streamSessions,
    "q210_label_separability" -> labelSeparability,
    "q211_ndcg_eval" -> ndcgEval,
    "q212_modularity_audit" -> modularityAudit,
    "q213_markov_accuracy" -> markovAccuracy,
    "q214_stream_replay_sink" -> streamReplaySink,
    "q215_shard_manifest" -> shardManifest,
    "q216_perplexity_buckets" -> perplexityBuckets,
    "q217_langid_confusion" -> langidConfusion,
    "q218_memorization_coverage" -> memorizationCoverage,
    "q219_js_divergence_matrix" -> jsDivergenceMatrix,
    "q220_oov_rate" -> oovRate,
    "q221_ttr_budget" -> ttrBudget,
    "q222_bootstrap_ci" -> bootstrapCi,
    "q223_group_split" -> groupSplit,
    "q224_position_attribution" -> positionAttribution,
    "q225_dedup_savings" -> dedupSavings,
    "q226_grouped_ols" -> groupedOls,
    "q227_sorted_neighborhood" -> sortedNeighborhood,
    "q228_pareto_coverage" -> paretoCoverage,
    "q229_partition_balance" -> partitionBalance,
    "q230_modality_coverage" -> modalityCoverage,
    "q231_feature_assembly" -> featureAssembly,
    "q232_negative_sampling" -> negativeSampling,
    "q233_behavior_entropy" -> behaviorEntropy,
    "q234_srp_calibration" -> srpCalibration,
    "q235_seasonality_profile" -> seasonalityProfile,
    "q236_source_scorecard" -> sourceScorecard,
    "q237_lateness_audit" -> latenessAudit,
    "q238_fold_balance" -> foldBalance,
    "q239_cluster_keeper" -> clusterKeeper,
    "q240_layout_pruning" -> layoutPruning,
    "q241_join_card_estimate" -> joinCardEstimate,
    "q242_join_ivm" -> joinIvm,
    "q243_threshold_sweep" -> thresholdSweep,
    "q244_ltv_curves" -> ltvCurves,
    "q245_hill_tail" -> hillTail,
    "q246_type_drift" -> typeDrift,
    "q247_calibration_audit" -> calibrationAudit,
    "q248_mann_whitney" -> mannWhitney,
    "q249_markov_transitions" -> markovTransitions,
    "q250_km_retention" -> kmRetention,
    "q251_importance_reweight" -> importanceReweight,
    "q252_lsh_calibration" -> lshCalibration,
    "q253_centroid_drift" -> centroidDrift,
    "q254_unseen_species" -> unseenSpecies,
    "q255_heaps_fit" -> heapsFit,
    "q256_cusum_changepoint" -> cusumChangepoint,
    "q257_roc_pr" -> rocPr,
    "q258_watermark_audit" -> watermarkAudit,
    "q259_knn_accuracy" -> knnAccuracy,
    "q260_session_window_batch" -> sessionWindowBatch,
    "q261_stream_session_window" -> streamSessionWindow,
    "q262_curation_waterfall" -> curationWaterfall,
    "q263_stream_running_totals" -> streamRunningTotals,
    "q264_join_strategies" -> joinStrategies,
    "q265_incremental_lsh" -> incrementalLsh,
    "q266_welch_t" -> welchT,
    "q267_mase_backtest" -> maseBacktest,
    "q268_neyman_allocation" -> neymanAllocation,
    "q269_capture_recapture" -> captureRecapture,
    "q270_curated_export" -> curatedExport,
    "q271_range_frame" -> rangeFrame,
    "q272_typed_groups" -> typedGroups,
    "q273_consistent_ring" -> consistentRing,
    "q274_gap_fill" -> gapFill,
    "q275_mix_shift" -> mixShift,
    "q276_checkpoint_resume" -> checkpointResume,
    "q277_image_dhash_pairs" -> imageDhashPairs,
    "q278_sql_entry" -> sqlEntry,
    "q279_image_ahash" -> imageAhashReport,
    "q280_audio_fingerprint_pairs" -> audioFingerprintPairs,
    "q281_stream_image_dedup" -> streamImageDedup,
    "q282_image_clusters" -> imageClusters,
    "q283_jsonl_scan" -> jsonlScan,
    "q284_json_roundtrip" -> jsonRoundTrip,
    "q285_orc_roundtrip" -> orcRoundTrip,
    "q286_bucketed_join" -> bucketedJoin,
    "q287_psi_drift" -> psiDrift,
    "q288_rank_correlation" -> rankCorrelation,
    "q289_cohen_kappa" -> cohenKappa,
    "q290_k_anonymity" -> kAnonymityAudit,
    "q291_shapley_attribution" -> shapleyAttribution,
    "q292_wilson_interval" -> wilsonInterval,
    "q293_stream_outer_join" -> streamOuterJoin,
    "q294_kendall_tau" -> kendallTau,
    "q295_acf_daily" -> acfDaily,
    "q296_mutual_information" -> mutualInformation,
    "q297_theil_decomposition" -> theilDecomposition,
    "q298_ivf_trained" -> ivfTrained,
    "q299_incremental_semdedup" -> incrementalSemdedup,
    "q300_stream_dropped_late" -> streamDroppedLate,
    "q301_ivf_partitioned" -> ivfPartitioned,
    "q302_zorder_layout" -> zorderLayout,
    "q303_dpp_pruning" -> dppPruning,
    "q304_cbo_reorder" -> cboReorder,
    "q305_stream_full_outer" -> streamFullOuterJoin,
    "q306_aqe_skew_join" -> aqeSkewJoin,
    "q307_video_framesample" -> videoFrameSample,
    "q308_image_resize" -> imageResize,
    "q53_regex_extract" -> regexExtract)

  val oracles: Map[String, String] = Map(
    "q01_gold_flagship" -> goldFlagshipSql,
    "q02_canonicalize" -> canonicalizeSql,
    "q03_split_getitem" -> splitGetItemSql,
    "q04_when_isin" -> whenIsinRemapSql,
    "q05_union_harmonize" -> unionHarmonizeSql,
    "q06_rename_normalize" -> renameNormalizeSql,
    "q07_cast_commafix" -> castCommaFixSql,
    "q08_dq_violations" -> dqViolationsSql,
    "q09_upper_length" -> upperLengthSql,
    "q10_pretty_report" -> prettyReportSql,
    "q11_filter_pushdown" -> filterPushdownSql,
    "q12_left_join_nulls" -> leftJoinNullsSql,
    "q13_window_topk" -> windowTopKSql,
    "q14_sort_limit" -> sortLimitSql,
    "q15_distinct" -> distinctFlagsSql,
    "q16_hourly_events" -> hourlyEventsSql,
    "q17_json_extract" -> jsonExtractSql,
    "q18_agg_stats" -> aggStatsSql,
    "q19_except_nonbuyers" -> exceptNonBuyersSql,
    "q20_dedup_exact" -> dedupExactSql,
    "q21_dedup_minhash" -> dedupMinhashSql,
    "q22_dedup_simhash" -> dedupSimhashSql,
    "q23_dedup_jaccard" -> dedupJaccardSql,
    "q24_simsearch_brute" -> simsearchBruteSql,
    "q25_simsearch_lsh" -> simsearchLshSql,
    "q40_simsearch_ivf" -> simsearchIvfSql,
    "q26_text_stats" -> textStatsSql,
    "q27_token_histogram" -> tokenHistogramSql,
    "q28_lang_id" -> langIdSql,
    "q29_fingerprints" -> fingerprintsSql,
    "q30_multimodal_meta" -> multimodalMetaSql,
    "q31_embedding_norms" -> embeddingNormsSql,
    "q32_rollup" -> rollupOrdersSql,
    "q33_cube" -> cubeFlagsSql,
    "q34_join_semi" -> joinSemiSql,
    "q35_join_anti" -> joinAntiSql,
    "q36_intersect" -> intersectBuyersSql,
    "q37_pivot" -> pivotStatusSql,
    "q38_asof_join" -> asofJoinSql,
    "q39_function_battery" -> functionBatterySql,
    "q41_curation" -> curationPipelineSql,
    "q42_sessionize" -> sessionizeBatchSql,
    "q43_percentiles" -> percentilesSql,
    "q44_collect" -> collectArraysSql,
    "q45_topk_native" -> topkNativeSql,
    "q46_hof_arrays" -> hofArraysSql,
    "q47_null_semantics" -> nullSemanticsSql,
    "q48_string_agg" -> stringAggSql,
    "q49_date_arith" -> dateArithmeticSql,
    "q50_revenue_by_nation" -> revenueByNationSql,
    "q51_unicode_normalize" -> unicodeNormalizeSql,
    "q52_approx_sketches" -> approxSketchesSql,
    "q53_regex_extract" -> regexExtractSql,
    "q54_endash_roundtrip" -> endashReportSql,
    "q55_window_battery" -> windowBatterySql,
    "q56_grouping_sets" -> groupingSetsSql,
    "q57_hash_sample" -> hashSampleSql,
    "q58_range_join" -> rangeJoinBurstsSql,
    "q59_unpivot" -> unpivotMetricsSql,
    "q60_merge_upsert" -> mergeUpsertSql,
    "q61_anonymize" -> anonymizeSql,
    "q62_from_json" -> fromJsonStructSql,
    "q63_map_ops" -> mapOpsSql,
    "q64_minby_maxby" -> minByMaxBySql,
    "q65_dedup_clusters" -> dedupClustersSql,
    "q66_quality_band" -> qualityBandSql,
    "q67_tfidf" -> tfidfTermsSql,
    "q68_embedding_centroids" -> embeddingCentroidsSql,
    "q69_date_battery" -> dateBatterySql,
    "q70_fuzzy_strings" -> fuzzyStringsSql,
    "q71_cond_aggs" -> condAggsSql,
    "q72_exact_stddev" -> exactStddevSql,
    "q73_profiler" -> profileColumnsSql,
    "q74_exists_forall" -> existsForallSql,
    "q75_date_densify" -> dateDensifySql,
    "q76_range_join_binned" -> rangeJoinBinnedSql,
    "q77_approx_quantiles" -> approxQuantilesSql,
    "q78_bit_scalars" -> bitScalarsSql,
    "q79_encode_battery" -> encodeBatterySql,
    "q80_struct_ops" -> structOpsSql,
    "q81_explode_outer" -> explodeOuterSql,
    "q82_regex_backrefs" -> regexBackrefsSql,
    "q83_window_values" -> windowValuesSql,
    "q84_union_distinct" -> unionDistinctSql,
    "q85_exact_corr" -> exactCorrSql,
    "q86_percentile_disc" -> percentileDiscSql,
    "q87_embedding_neardup" -> embeddingNearDupSql,
    "q88_pack_shards" -> packShardsSql,
    "q89_cluster_canonical" -> clusterCanonicalSql,
    "q90_strip_boilerplate" -> stripBoilerplateSql,
    "q91_contamination" -> contaminationSql,
    "q92_reservoir_sample" -> reservoirSampleSql,
    "q93_bigram_topk" -> bigramTopKSql,
    "q94_simhash_clusters" -> simhashClusterSql,
    "q95_csv_tsv" -> csvTsvRoundtripSql,
    "q96_csv_pipe" -> csvPipeRoundtripSql,
    "q97_csv_quoted" -> csvQuotedRoundtripSql,
    "q98_csv_quarantine" -> csvQuarantineSql,
    "q99_dq_checkpoint" -> dqCheckpointSql,
    "q100_boilerplate_ngrams" -> boilerplateNgramsSql,
    "q101_embedding_quantize" -> embeddingQuantizeSql,
    "q102_embedding_neardup_lsh" -> embeddingNearDupLshSql,
    "q103_fs_roundtrip" -> fsRoundtripSql,
    "q104_repetition_signals" -> repetitionSignalsSql,
    "q105_domain_mix" -> domainMixSql,
    "q106_ngram_novelty" -> ngramNoveltySql,
    "q107_partitioned_pruning" -> partitionedPruningSql,
    "q108_jsonl_roundtrip" -> jsonlRoundtripSql,
    "q109_orc_roundtrip" -> orcRoundtripSql,
    "q110_salted_join" -> saltedJoinSql,
    "q111_morton_zorder" -> mortonZorderSql,
    "q112_compact" -> compactRoundtripSql,
    "q113_salted_agg" -> saltedAggSql,
    "q114_merge_schema" -> mergeSchemaReadSql,
    "q115_weighted_quality" -> weightedQualitySql,
    "q116_length_batches" -> lengthBatchesSql,
    "q117_incremental_dedup" -> incrementalDedupSql,
    "q118_passage_dedup" -> passageDedupSql,
    "q119_temperature_mix" -> temperatureMixSql,
    "q120_stratified_split" -> stratifiedSplitSql,
    "q121_rag_chunks" -> ragChunksSql,
    "q122_vocab_growth" -> vocabGrowthSql,
    "q123_winsorize_quality" -> winsorizeQualitySql,
    "q124_bloom_semi_join" -> bloomSemiJoinSql,
    "q125_audio_meta" -> audioMetaSql,
    "q126_token_surprisal" -> tokenSurprisalSql,
    "q127_snapshot_diff" -> snapshotDiffSql,
    "q128_fuzzy_match" -> fuzzyBlockedMatchSql,
    "q129_bpe_merges" -> bpeMergesSql,
    "q130_zipf_slope" -> zipfSlopeSql,
    "q131_jsonl_quarantine" -> jsonlQuarantineSql,
    "q132_winnow_overlap" -> winnowOverlapSql,
    "q133_curation_funnel" -> curationFunnelSql,
    "q134_bpe_encode" -> bpeEncodeSql,
    "q135_scd2_history" -> scd2HistorySql,
    "q136_forget_keys" -> forgetKeysSql,
    "q137_integrity_audit" -> integrityAuditSql,
    "q138_conversion_funnel" -> conversionFunnelSql,
    "q139_cohort_retention" -> cohortRetentionSql,
    "q140_market_basket" -> marketBasketSql,
    "q141_hourly_anomalies" -> hourlyAnomaliesSql,
    "q142_embedding_drift" -> embeddingDriftSql,
    "q143_copurchase_rank" -> copurchaseRankSql,
    "q144_csv_gzip" -> csvGzipRoundtripSql,
    "q145_winnow_clusters" -> winnowClustersSql,
    "q146_append_bronze" -> appendBronzeSql,
    "q147_pii_scrub" -> piiScrubSql,
    "q148_sequence_pack" -> sequencePackSql,
    "q149_token_budget_mix" -> tokenBudgetMixSql,
    "q150_dynamic_overwrite" -> dynamicPartitionOverwriteSql,
    "q151_domain_blocklist" -> domainBlocklistSql,
    "q152_cdc_chunks" -> cdcChunksSql,
    "q153_embedding_pca" -> embeddingPcaSql,
    "q154_cdc_sync" -> cdcSyncSql,
    "q155_semantic_dedup" -> semanticDedupGateSql,
    "q156_dsir_weights" -> dsirWeightsSql,
    "q157_triangle_census" -> triangleCensusSql,
    "q158_gopher_filter" -> gopherFilterSql,
    "q159_domain_quota" -> domainQuotaSql,
    "q160_bfs_levels" -> bfsLevelsSql,
    "q161_kcore" -> kCoreSql,
    "q162_event_transitions" -> eventTransitionsSql,
    "q163_corpus_datasheet" -> corpusDatasheetSql,
    "q164_mad_outliers" -> madOutliersSql,
    "q165_cross_source_overlap" -> crossSourceOverlapSql,
    "q166_source_divergence" -> sourceDivergenceSql,
    "q167_time_to_convert" -> timeToConvertSql,
    "q168_skyline" -> skylineUsersSql,
    "q169_pmi_collocations" -> pmiCollocationsSql,
    "q170_weighted_sample" -> weightedSampleSql,
    "q171_incremental_agg" -> incrementalAggSql,
    "q172_last_touch" -> lastTouchSql,
    "q173_heavy_hitters" -> heavyHittersSql,
    "q174_rfm_segments" -> rfmSegmentsSql,
    "q175_product_quantize" -> productQuantizeSql,
    "q176_char_entropy" -> charEntropySql,
    "q177_stream_hourly" -> streamHourlySql,
    "q178_quantile_norm" -> quantileNormSql,
    "q179_split_leakage" -> splitLeakageSql,
    "q180_detector_agreement" -> detectorAgreementSql,
    "q181_ks_drift" -> ksDriftSql,
    "q182_quality_lift" -> qualityLiftSql,
    "q183_token_keyness" -> tokenKeynessSql,
    "q184_activity_streaks" -> activityStreaksSql,
    "q185_weighted_median" -> weightedMedianSql,
    "q186_detector_agreement_sampled" -> detectorAgreementSampledSql,
    "q187_hll_distinct" -> hllDistinctSql,
    "q188_containment_pairs" -> containmentPairsSql,
    "q189_minhash_calibration" -> minhashCalibrationSql,
    "q190_cluster_size_histogram" -> clusterSizeHistogramSql,
    "q191_cms_overcount" -> cmsOvercountSql,
    "q192_kmv_distinct" -> kmvDistinctSql,
    "q193_epoch_planner" -> epochPlannerSql,
    "q194_stream_dedup" -> streamDedupSql,
    "q195_bm25_topk" -> bm25TopKSql,
    "q196_contrastive_triplets" -> contrastiveTripletsSql,
    "q197_kmv_overlap_matrix" -> kmvOverlapMatrixSql,
    "q198_decay_engagement" -> decayEngagementSql,
    "q199_join_skew_profile" -> joinSkewProfileSql,
    "q200_benford_audit" -> benfordAuditSql,
    "q201_event_lift_matrix" -> eventLiftMatrixSql,
    "q202_burstiness_audit" -> burstinessAuditSql,
    "q203_stream_enrich" -> streamEnrichSql,
    "q204_rrf_fusion" -> rrfFusionSql,
    "q205_rendezvous_shards" -> rendezvousShardsSql,
    "q206_rank_agreement" -> rankAgreementSql,
    "q207_rolling_active_users" -> rollingActiveUsersSql,
    "q208_stream_interval_join" -> streamIntervalJoinSql,
    "q209_stream_sessions" -> streamSessionsSql,
    "q210_label_separability" -> labelSeparabilitySql,
    "q211_ndcg_eval" -> ndcgEvalSql,
    "q212_modularity_audit" -> modularityAuditSql,
    "q213_markov_accuracy" -> markovAccuracySql,
    "q214_stream_replay_sink" -> streamReplaySinkSql,
    "q215_shard_manifest" -> shardManifestSql,
    "q216_perplexity_buckets" -> perplexityBucketsSql,
    "q217_langid_confusion" -> langidConfusionSql,
    "q218_memorization_coverage" -> memorizationCoverageSql,
    "q219_js_divergence_matrix" -> jsDivergenceMatrixSql,
    "q220_oov_rate" -> oovRateSql,
    "q221_ttr_budget" -> ttrBudgetSql,
    "q222_bootstrap_ci" -> bootstrapCiSql,
    "q223_group_split" -> groupSplitSql,
    "q224_position_attribution" -> positionAttributionSql,
    "q225_dedup_savings" -> dedupSavingsSql,
    "q226_grouped_ols" -> groupedOlsSql,
    "q227_sorted_neighborhood" -> sortedNeighborhoodSql,
    "q228_pareto_coverage" -> paretoCoverageSql,
    "q229_partition_balance" -> partitionBalanceSql,
    "q230_modality_coverage" -> modalityCoverageSql,
    "q231_feature_assembly" -> featureAssemblySql,
    "q232_negative_sampling" -> negativeSamplingSql,
    "q233_behavior_entropy" -> behaviorEntropySql,
    "q234_srp_calibration" -> srpCalibrationSql,
    "q235_seasonality_profile" -> seasonalityProfileSql,
    "q236_source_scorecard" -> sourceScorecardSql,
    "q237_lateness_audit" -> latenessAuditSql,
    "q238_fold_balance" -> foldBalanceSql,
    "q239_cluster_keeper" -> clusterKeeperSql,
    "q240_layout_pruning" -> layoutPruningSql,
    "q241_join_card_estimate" -> joinCardEstimateSql,
    "q242_join_ivm" -> joinIvmSql,
    "q243_threshold_sweep" -> thresholdSweepSql,
    "q244_ltv_curves" -> ltvCurvesSql,
    "q245_hill_tail" -> hillTailSql,
    "q246_type_drift" -> typeDriftSql,
    "q247_calibration_audit" -> calibrationAuditSql,
    "q248_mann_whitney" -> mannWhitneySql,
    "q249_markov_transitions" -> markovTransitionsSql,
    "q250_km_retention" -> kmRetentionSql,
    "q251_importance_reweight" -> importanceReweightSql,
    "q252_lsh_calibration" -> lshCalibrationSql,
    "q253_centroid_drift" -> centroidDriftSql,
    "q254_unseen_species" -> unseenSpeciesSql,
    "q255_heaps_fit" -> heapsFitSql,
    "q256_cusum_changepoint" -> cusumChangepointSql,
    "q257_roc_pr" -> rocPrSql,
    "q258_watermark_audit" -> watermarkAuditSql,
    "q259_knn_accuracy" -> knnAccuracySql,
    "q260_session_window_batch" -> sessionWindowBatchSql,
    "q261_stream_session_window" -> streamSessionWindowSql,
    "q262_curation_waterfall" -> curationWaterfallSql,
    "q263_stream_running_totals" -> streamRunningTotalsSql,
    "q264_join_strategies" -> joinStrategiesSql,
    "q265_incremental_lsh" -> incrementalLshSql,
    "q266_welch_t" -> welchTSql,
    "q267_mase_backtest" -> maseBacktestSql,
    "q268_neyman_allocation" -> neymanAllocationSql,
    "q269_capture_recapture" -> captureRecaptureSql,
    "q270_curated_export" -> curatedExportSql,
    "q271_range_frame" -> rangeFrameSql,
    "q272_typed_groups" -> typedGroupsSql,
    "q273_consistent_ring" -> consistentRingSql,
    "q274_gap_fill" -> gapFillSql,
    "q275_mix_shift" -> mixShiftSql,
    "q276_checkpoint_resume" -> checkpointResumeSql,
    "q277_image_dhash_pairs" -> imageDhashPairsSql,
    "q278_sql_entry" -> sqlEntrySql,
    "q279_image_ahash" -> imageAhashReportSql,
    "q280_audio_fingerprint_pairs" -> audioFingerprintPairsSql,
    "q281_stream_image_dedup" -> streamImageDedupSql,
    "q282_image_clusters" -> imageClustersSql,
    "q283_jsonl_scan" -> jsonlScanSql,
    "q284_json_roundtrip" -> jsonRoundTripSql,
    "q285_orc_roundtrip" -> orcRoundTripSql,
    "q286_bucketed_join" -> bucketedJoinSql,
    "q287_psi_drift" -> psiDriftSql,
    "q288_rank_correlation" -> rankCorrelationSql,
    "q289_cohen_kappa" -> cohenKappaSql,
    "q290_k_anonymity" -> kAnonymityAuditSql,
    "q291_shapley_attribution" -> shapleyAttributionSql,
    "q292_wilson_interval" -> wilsonIntervalSql,
    "q293_stream_outer_join" -> streamOuterJoinSql,
    "q294_kendall_tau" -> kendallTauSql,
    "q295_acf_daily" -> acfDailySql,
    "q296_mutual_information" -> mutualInformationSql,
    "q297_theil_decomposition" -> theilDecompositionSql,
    "q298_ivf_trained" -> ivfTrainedSql,
    "q299_incremental_semdedup" -> incrementalSemdedupSql,
    "q300_stream_dropped_late" -> streamDroppedLateSql,
    "q301_ivf_partitioned" -> ivfPartitionedSql,
    "q302_zorder_layout" -> zorderLayoutSql,
    "q303_dpp_pruning" -> dppPruningSql,
    "q304_cbo_reorder" -> cboReorderSql,
    "q305_stream_full_outer" -> streamFullOuterJoinSql,
    "q306_aqe_skew_join" -> aqeSkewJoinSql,
    "q307_video_framesample" -> videoFrameSampleSql,
    "q308_image_resize" -> imageResizeSql)
}
