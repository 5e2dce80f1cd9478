package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** North-star text-analysis operators over a document table
  * (BASELINE.json "north_star"; the reference itself has no text analytics —
  * its closest surface is the regex canonicalization, SURVEY.md §2.7 X1).
  *
  * Everything here is built from codegen'd `functions._` expressions — no
  * UDFs — so the whole per-document pass is one narrow map stage: at 100 TB
  * it scans each document exactly once and shuffles nothing.
  */
object TextStats {

  /** Tokens = maximal runs of non-whitespace. `split` on `\s+` would emit a
    * leading "" for leading whitespace; regexp_count of `\S+` has no such
    * edge and stays a single codegen'd expression.
    */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** Whitespace-word tokens as an array (empty tokens dropped). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  /** A BPE-ish subword proxy: alphanumeric runs, digits, or single
    * non-space punctuation — the usual pre-tokenizer regex shape.
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  def charCount(text: Column): Column = length(text)

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[\\p{Punct}]"))

  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    regexp_count(lower(text), lit(stopwords.mkString("\\b(", "|", ")\\b")))

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it")

  /** Heuristic quality score in [0,1]: length sweet-spot, low punctuation
    * density, healthy stopword ratio — the standard cheap pre-filter shape
    * for LLM training corpora. Deterministic, expression-only.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = charCount(text).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(nChar, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio * lit(4.0), lit(1.0))
    val stopRatio = stopwordCount(text, stopwords).cast("double") / greatest(nTok, lit(1.0))
    val stopScore = least(stopRatio * lit(4.0), lit(1.0))
    round((lenScore * lit(0.4) + punctScore * lit(0.3) + stopScore * lit(0.3)), 6)
  }

  /** Per-document stats frame (doc table contract: `doc_id`, `text`). */
  def documentStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      charCount(t).as("n_chars_m"),
      tokenCount(t).as("n_tokens"),
      subwordCount(t).as("n_subwords"),
      punctCount(t).as("n_punct"),
      stopwordCount(t, defaultStopwords).as("n_stopwords"),
      qualityScore(t).as("quality"))
  }

  /** Distinct character n-grams of a document as an array — the unit of
    * benchmark-contamination checks and shingle-based dedup. Guarded for
    * short texts (Spark's `sequence(a, b)` DESCENDS when a > b, so the
    * unguarded expression would emit garbage windows for len < n).
    */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(transform(
        sequence(lit(1), length(text) - lit(n - 1)),
        i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Token-budget shard assignment: within each `groupCol` stream, docs in
    * `orderCol` order go to shard `start_offset div budget` of their
    * running token count — the layout step before tokenized training
    * shards are written. Adds `n_tok`, `cum`, `shard_id`. Pure integer
    * arithmetic (bit-identical on any engine); the window parallelizes
    * across groups, so no global sort at scale.
    */
  def packIntoShards(docs: DataFrame, groupCol: String, orderCol: String,
                     nTok: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.withColumn("n_tok", nTok.cast("long"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("shard_id", expr(s"(cum - n_tok) div ${budget}L"))
  }

  /** Adjacent word bigrams ("a b") of a token array, index-sequence form:
    * the lambda interior touches only `element_at` on the (cheap) array
    * reference, never re-derives the array — see the HOF recompute note on
    * [[md5Simhash]]. Callers should pass a MATERIALIZED token column (an
    * attribute, not the tokenizer expression) so nothing expensive sits
    * under the per-element evaluation. Empty for fewer than 2 tokens.
    */
  def wordBigrams(tok: Column): Column =
    when(size(tok) >= 2,
      transform(sequence(lit(1), size(tok) - 1),
        i => concat(element_at(tok, i), lit(" "), element_at(tok, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Normalized-content fingerprint: lowercase, collapse whitespace, trim,
    * md5. Identical content up to spacing/case hashes identically — the
    * exact-dedup key for `Dedup.byFingerprint`.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")).cast("binary"))

  /** 60-bit SimHash (Charikar '02 majority-vote construction) whose
    * per-token hash is the top 15 hex digits of md5 — deliberately built
    * from ONLY cross-engine primitives (md5, hex→int, shift, mask), so a
    * SQL oracle can recompute the fingerprint bit-for-bit. 60 bits (not
    * 64) because 15 hex digits are the most that fit a signed long
    * without overflow on either engine. Ties in the per-bit vote go to 1
    * (`2·ones ≥ n`). Empty token lists → NULL (no content to hash).
    *
    * READABLE REFERENCE ONLY — the nested higher-order functions
    * re-derive the token-hash array once per bit (lambda-interior
    * expressions re-evaluate per element, ~60× the md5 work; measured
    * 74 s vs ~2 s for q22 at sf0.1). Production queries use the
    * single-pass native twin
    * [[graft.functions.VectorExpressions.md5_simhash60]]; bit-equivalence
    * between the two (and hence with the SQL oracle) is asserted in
    * Round4OpsSpec.
    */
  def md5Simhash(tok: Column): Column = {
    val hs = transform(tok,
      t => conv(substring(md5(t.cast("binary")), 1, 15), 16, 10).cast("long"))
    val fp = aggregate(
      sequence(lit(0), lit(59)), lit(0L),
      (acc, b) => acc + when(
        aggregate(hs, lit(0L),
          (c, h) => c + call_function("shiftright", h, b).bitwiseAND(1L)) * 2
          >= size(hs).cast("long"),
        call_function("shiftleft", lit(1L), b)).otherwise(0L))
    when(size(tok) > 0, fp)
  }

  /** Character n-gram language-ID. Profiles are tiny (langs × grams) and are
    * broadcast as a literal map expression — scoring is a narrow map, no
    * shuffle, no UDF. Heuristic: count profile-gram hits per language,
    * highest wins (ties → lexicographic for determinism).
    */
  def languageId(text: Column,
                 profiles: Map[String, Seq[String]] = defaultProfiles): Column = {
    val scored: Seq[(Column, Column)] = profiles.toSeq.sortBy(_._1).map {
      case (lang, grams) =>
        val pat = grams.map(java.util.regex.Pattern.quote).mkString("(", "|", ")")
        (regexp_count(lower(text), lit(pat)), lit(lang))
    }
    // argmax via a single greatest(struct(score, lang)) — deterministic.
    val packed = scored.map { case (s, l) => struct(s.as("s"), l.as("l")) }
    greatest(packed: _*).getField("l")
  }

  /** Marker-gram profiles for a few languages (function words / diacritic
    * patterns — standard n-gram-profile trick, kept deliberately small).
    */
  val defaultProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", "ing ", " is "),
    "es" -> Seq(" el ", " la ", " de ", " que ", "ción"),
    "pt" -> Seq(" o ", " da ", " de ", " não ", "ção"),
    "fr" -> Seq(" le ", " la ", " et ", " les ", " des "),
    "de" -> Seq(" der ", " die ", " und ", " ist ", "sch"),
    "it" -> Seq(" il ", " di ", " che ", " per ", "zione"))
}
