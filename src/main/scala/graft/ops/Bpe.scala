package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction (Sennrich et al. '16 "Neural
  * Machine Translation of Rare Words with Subword Units", §3.2) — the
  * tokenizer-training step of an LLM data pipeline, expressed as a fixed
  * number of fully declarative merge rounds.
  *
  * Scale shape: all per-round work runs on the WORD VOCABULARY (word,
  * freq) — sublinear in the corpus (the q128 distinct-first discipline;
  * the corpus is scanned exactly once to build it). Each round is
  * pair-count aggregation → global argmax as a ONE-ROW frame
  * (packed-string max, ties to the lexicographically largest pair) →
  * broadcast cross join → non-regex `replace` of the winning pair. No
  * driver-side loop state: the rounds chain inside one logical plan, so
  * the whole merge table is a single job, and the per-round shuffle is
  * (distinct pairs)-sized.
  *
  * Symbol sequences are space-joined characters padded with sentinel
  * spaces (" c o l d "); `replace(seq, " a b ", " ab ")` is leftmost
  * non-overlapping on every engine, matching BPE's left-to-right merge
  * order with ONE documented deviation: consecutive occurrences of the
  * winning pair share the sentinel space (" a b a b " — the first match
  * consumes the space the second needs), so runs of the same pair merge
  * only at alternating positions in that round, where reference Sennrich
  * BPE merges every occurrence. The deviation affects merge counts only
  * on words with immediately repeated pairs; it is applied identically in
  * [[mergesOracleSql]] / [[encodeSymbols]], so both engines agree. (A
  * fixpoint re-replace per round would restore exact Sennrich semantics
  * at the cost of a data-dependent loop; not worth it for a frequency
  * statistic.) End-of-word markers are omitted (a documented
  * simplification: merges never cross word boundaries regardless, because
  * sequences are per-word).
  */
object Bpe {

  /** The merge table for `rounds` BPE rounds over whitespace-tokenized,
    * lowercased `textCol`: one row per round — (merge_round, pair,
    * pair_freq), where pair_freq is the pair's corpus frequency (weighted
    * by word frequency) at the time it was merged.
    */
  def merges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    // pinned: every round's pair aggregation replays the plan from here —
    // without the pin the corpus scan + tokenize would re-run once per
    // round (measured 5.8 s → ~2 s at sf0.1). Cluster analog: write the
    // vocabulary table once, iterate over it.
    val vocab = Dedup.pin(docs
      .select(explode(TextStats.tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "),
        concat_ws(" ", regexp_extract_all(col("w"), lit("."), lit(0))),
        lit(" ")).as("seq"), col("freq")))

    var cur = vocab
    var out: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val best = bestPair(cur).select(lit(r).as("merge_round"),
        col("pair"), col("pair_freq"))
      out = Some(out.fold(best)(_.unionAll(best)))
      // lineage truncation per round (the Dedup.clusters superstep
      // pattern): without it, round r's broadcast replays rounds 1..r-1,
      // whose broadcasts replay THEIR predecessors — the pair aggregation
      // count grows 2^rounds (measured ~10 s for 6 rounds at sf0.1 vs
      // ~1.5 s truncated). The checkpointed frame is vocabulary-sized;
      // the cluster analog is writing the merged vocab per round.
      // lazy cut (round 7): plan still truncates per round, but the
      // vocabulary-sized frames materialize inside the FINAL job's
      // computation (each lazy localCheckpoint caches on first compute,
      // so round r's state is computed exactly once) — R fewer jobs.
      cur = applyMerge(cur, best.select(col("pair"))).transform(Lineage.cutLazy)
    }
    out.get.orderBy(col("merge_round"))
  }

  /** Global most-frequent adjacent symbol pair as a ONE-ROW frame:
    * (pair, pair_freq). Deterministic tie-break — max frequency, then the
    * lexicographically largest pair — via a zero-padded packed-string max.
    */
  private def bestPair(cur: DataFrame): DataFrame = {
    val counted = cur
      .select(col("freq"), TextStats.tokens(col("seq")).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("freq"), explode(TextStats.wordBigrams(col("tk"))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("pf"))
    counted
      .agg(max(concat(lpad(col("pf").cast("string"), 12, "0"), col("pair")))
        .as("pk"))
      .select(
        col("pk").substr(lit(13), length(col("pk")) - 12).as("pair"),
        substring(col("pk"), 1, 12).cast("long").as("pair_freq"))
  }

  /** Merge the (broadcast, one-row) winning pair into every sequence,
    * preserving all other columns.
    */
  private def applyMerge(cur: DataFrame, pair: DataFrame): DataFrame =
    cur.crossJoin(broadcast(pair))
      .withColumn("seq", call_function("replace", col("seq"),
        concat(lit(" "), col("pair"), lit(" ")),
        concat(lit(" "),
          call_function("replace", col("pair"), lit(" "), lit("")),
          lit(" "))))
      .drop("pair")

  /** ENCODE with the learned merges: per distinct word, the symbol count
    * after applying `rounds` BPE merges — the apply side of [[merges]].
    * The merge table is derived from the same corpus and pinned (6 tiny
    * rows); application is per-DISTINCT-word (sublinear), so scoring a
    * corpus is one keyed join per occurrence, never a per-document
    * re-merge. Returns (w, n_sym).
    */
  def encodeSymbols(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val mergeTable = Dedup.pin(merges(docs, textCol, rounds))
    var cur = Dedup.pin(docs
      .select(explode(TextStats.tokens(lower(col(textCol)))).as("w"))
      .distinct()
      .select(col("w"), concat(lit(" "),
        concat_ws(" ", regexp_extract_all(col("w"), lit("."), lit(0))),
        lit(" ")).as("seq")))
    for (r <- 1 to rounds)
      cur = applyMerge(cur,
        mergeTable.filter(col("merge_round") === r).select(col("pair")))
    cur.select(col("w"),
      size(TextStats.tokens(col("seq"))).cast("long").as("n_sym"))
  }

  /** The unrolled DuckDB twin of [[merges]] (the driver-gate oracle is a
    * static SQL string, so the rounds are generated as chained CTEs that
    * each recompute their own argmax — nothing Spark-derived is embedded).
    */
  def mergesOracleSql(rounds: Int): String = {
    val head =
      """WITH wv AS (SELECT tok AS w, count(*) AS freq
        |  FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        |        FROM documents) GROUP BY tok),
        |s0 AS (SELECT ' ' || array_to_string(regexp_extract_all(w, '.'), ' ')
        |         || ' ' AS seq, freq FROM wv)""".stripMargin
    val stages = (1 to rounds).map { r =>
      s"""p$r AS (SELECT unnest(list_transform(generate_series(1, len(tk)-1),
         |    i -> tk[i] || ' ' || tk[i+1])) AS pair, freq
         |  FROM (SELECT regexp_extract_all(seq, '\\S+') AS tk, freq
         |        FROM s${r - 1}) WHERE len(tk) >= 2),
         |a$r AS (SELECT max(lpad(CAST(pf AS VARCHAR), 12, '0') || pair) AS pk
         |  FROM (SELECT pair, CAST(sum(freq) AS BIGINT) AS pf
         |        FROM p$r GROUP BY pair)),
         |b$r AS (SELECT $r AS merge_round, substr(pk, 13) AS pair,
         |    CAST(substr(pk, 1, 12) AS BIGINT) AS pair_freq FROM a$r),
         |s$r AS (SELECT replace(seq, ' ' || pair || ' ',
         |    ' ' || replace(pair, ' ', '') || ' ') AS seq, freq
         |  FROM s${r - 1}, b$r)""".stripMargin
    }
    val union = (1 to rounds).map(r => s"SELECT * FROM b$r")
      .mkString(" UNION ALL ")
    (head +: stages).mkString(",\n") +
      s"\nSELECT merge_round, pair, pair_freq FROM ($union) ORDER BY merge_round"
  }

  /** The unrolled DuckDB twin of [[encodeSymbols]] + per-source scoring:
    * the same stage chain but carrying the word through every merge, then
    * joining the encoded vocab back to the token stream.
    */
  def encodeOracleSql(rounds: Int): String = {
    val head =
      """WITH wv AS (SELECT tok AS w, count(*) AS freq
        |  FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS tok
        |        FROM documents) GROUP BY tok),
        |s0 AS (SELECT w, ' ' || array_to_string(regexp_extract_all(w, '.'), ' ')
        |         || ' ' AS seq, freq FROM wv)""".stripMargin
    val stages = (1 to rounds).map { r =>
      s"""p$r AS (SELECT unnest(list_transform(generate_series(1, len(tk)-1),
         |    i -> tk[i] || ' ' || tk[i+1])) AS pair, freq
         |  FROM (SELECT regexp_extract_all(seq, '\\S+') AS tk, freq
         |        FROM s${r - 1}) WHERE len(tk) >= 2),
         |a$r AS (SELECT max(lpad(CAST(pf AS VARCHAR), 12, '0') || pair) AS pk
         |  FROM (SELECT pair, CAST(sum(freq) AS BIGINT) AS pf
         |        FROM p$r GROUP BY pair)),
         |b$r AS (SELECT substr(pk, 13) AS pair FROM a$r),
         |s$r AS (SELECT w, replace(seq, ' ' || pair || ' ',
         |    ' ' || replace(pair, ' ', '') || ' ') AS seq, freq
         |  FROM s${r - 1}, b$r)""".stripMargin
    }
    val tail =
      s"""enc AS (SELECT w,
         |    CAST(len(regexp_extract_all(seq, '\\S+')) AS BIGINT) AS n_sym
         |  FROM s$rounds),
         |tk AS (SELECT source, unnest(regexp_extract_all(lower(text), '\\S+')) AS w
         |       FROM documents)
         |SELECT source, count(*) AS n_tokens,
         | CAST(sum(length(w)) AS BIGINT) AS n_chars,
         | CAST(sum(n_sym) AS BIGINT) AS n_symbols,
         | round(sum(n_sym) / CAST(sum(length(w)) AS DOUBLE), 6) AS sym_per_char
         |FROM tk JOIN enc USING (w)
         |GROUP BY source ORDER BY source""".stripMargin
    ((head +: stages) :+ tail).mkString(",\n")
  }
}
