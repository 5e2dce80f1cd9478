package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{MinHashSignature, VectorExpressions}

/** SQL-surface registration for the engine's native expressions, via the
  * standard `SparkSessionExtensions` hook:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)           // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * After registration these work from plain SQL, e.g.
  * `SELECT cosine_similarity(a.embedding, b.embedding) FROM ...`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "cosine_similarity(a, b) - cosine of two float vectors in double"),
      (args: Seq[Expression]) =>
        VectorExpressions.CosineSimilarity(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot of two float vectors"),
      (args: Seq[Expression]) =>
        VectorExpressions.DotProduct(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => VectorExpressions.SimHash64(args.head)))
    e.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(shingles, k) - k-permutation MinHash signature"),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"minhash_signature k must be a literal, got $other")
        }
        MinHashSignature(args.head, k)
      }))
    e.injectFunction((FunctionIdentifier("srp_bucket"),
      info("srp_bucket",
        "srp_bucket(vec, planes[, seed]) - sign-random-projection LSH bucket id"),
      (args: Seq[Expression]) => GraftExtensions.srpFromArgs(args)))
    e.injectFunction((FunctionIdentifier("morton_interleave"),
      info("morton_interleave",
        "morton_interleave(a, b) - Z-order bit interleave of two 32-bit keys"),
      (args: Seq[Expression]) =>
        VectorExpressions.MortonInterleave(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("md5_simhash60"),
      info("md5_simhash60",
        "md5_simhash60(tokens) - 60-bit md5-based SimHash (SQL-recomputable)"),
      (args: Seq[Expression]) => VectorExpressions.Md5Simhash60(args.head)))
    e.injectFunction((FunctionIdentifier("image_dims_packed"),
      info("image_dims_packed",
        "image_dims_packed(bin) - PNG/JPEG dims as fmt(2b)|w(31b)|h(31b), NULL if unrecognized"),
      (args: Seq[Expression]) =>
        graft.functions.ImageExpressions.ImageDimsPacked(args.head)))
    e.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(text, k, w) - Schleimer '03 winnowing fingerprint array"),
      (args: Seq[Expression]) =>
        graft.functions.WinnowFingerprints(args.head,
          GraftExtensions.litInt(args(1), "winnow k").toInt,
          GraftExtensions.litInt(args(2), "winnow w").toInt)))
    e.injectFunction((FunctionIdentifier("audio_meta_packed"),
      info("audio_meta_packed",
        "audio_meta_packed(bin) - WAV meta as dataBytes(33b)|rate(20b)|bits(6b)|ch(4b), NULL if unrecognized"),
      (args: Seq[Expression]) =>
        graft.functions.AudioExpressions.AudioMetaPacked(args.head)))
    e.injectFunction((FunctionIdentifier("gray_dhash64"),
      info("gray_dhash64",
        "gray_dhash64(bin, w, h) - 64-bit dHash of a raw w*h grayscale buffer"),
      (args: Seq[Expression]) =>
        graft.functions.ImageExpressions.GrayDhash64(args.head,
          GraftExtensions.litInt(args(1), "dhash w").toInt,
          GraftExtensions.litInt(args(2), "dhash h").toInt)))
    e.injectFunction((FunctionIdentifier("gray_ahash64"),
      info("gray_ahash64",
        "gray_ahash64(bin, w, h) - 64-bit aHash of a raw w*h grayscale buffer"),
      (args: Seq[Expression]) =>
        graft.functions.ImageExpressions.GrayAhash64(args.head,
          GraftExtensions.litInt(args(1), "ahash w").toInt,
          GraftExtensions.litInt(args(2), "ahash h").toInt)))
    e.injectFunction((FunctionIdentifier("pcm16_energy_sign_hash"),
      info("pcm16_energy_sign_hash",
        "pcm16_energy_sign_hash(bin) - 64-bit energy-envelope sign hash of raw PCM16LE"),
      (args: Seq[Expression]) =>
        graft.functions.AudioExpressions.Pcm16EnergySignHash(args.head)))
    e.injectFunction((FunctionIdentifier("bloom_agg"),
      info("bloom_agg",
        "bloom_agg(key, expectedItems) - bloom filter (binary) over xxhash64(key)"),
      (args: Seq[Expression]) => GraftExtensions.bloomAggFromArgs(args)))
    e.injectFunction((FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(bloom, key) - containment probe; false = definitely absent"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0),
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args(1))))))
  }
}

object GraftExtensions {
  // Sessions already installed — keyed weakly so a stopped session can be
  // collected. Re-running install per query invocation is harmless
  // semantically but each createOrReplaceTempFunction logs a WARN
  // ("function replaced..."), and ~20 of those per session flood the
  // stderr tail the driver's bench capture depends on (VERDICT r6 #2).
  private val installed = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]()))

  /** Register the same functions on an ALREADY-RUNNING session (extensions
    * passed to the builder only bind when the session is first created —
    * `getOrCreate()` against a live session silently skips them).
    * Idempotent per session: repeat calls are no-ops, so the registry
    * never logs "replaced" WARNs after the first installation.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!installed.add(spark)) return
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    }
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity",
      (args: Seq[Expression]) =>
        VectorExpressions.CosineSimilarity(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      (args: Seq[Expression]) =>
        VectorExpressions.DotProduct(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      (args: Seq[Expression]) => VectorExpressions.SimHash64(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"minhash_signature k must be a literal, got $other")
        }
        MinHashSignature(args.head, k)
      }, "scala_udf")
    reg.createOrReplaceTempFunction("srp_bucket",
      (args: Seq[Expression]) => srpFromArgs(args), "scala_udf")
    reg.createOrReplaceTempFunction("morton_interleave",
      (args: Seq[Expression]) =>
        VectorExpressions.MortonInterleave(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("md5_simhash60",
      (args: Seq[Expression]) => VectorExpressions.Md5Simhash60(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("image_dims_packed",
      (args: Seq[Expression]) =>
        graft.functions.ImageExpressions.ImageDimsPacked(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("winnow_fingerprints",
      (args: Seq[Expression]) =>
        graft.functions.WinnowFingerprints(args.head,
          litInt(args(1), "winnow k").toInt,
          litInt(args(2), "winnow w").toInt), "scala_udf")
    reg.createOrReplaceTempFunction("audio_meta_packed",
      (args: Seq[Expression]) =>
        graft.functions.AudioExpressions.AudioMetaPacked(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("gray_dhash64",
      (args: Seq[Expression]) =>
        graft.functions.ImageExpressions.GrayDhash64(args.head,
          litInt(args(1), "dhash w").toInt,
          litInt(args(2), "dhash h").toInt), "scala_udf")
    reg.createOrReplaceTempFunction("gray_ahash64",
      (args: Seq[Expression]) =>
        graft.functions.ImageExpressions.GrayAhash64(args.head,
          litInt(args(1), "ahash w").toInt,
          litInt(args(2), "ahash h").toInt), "scala_udf")
    reg.createOrReplaceTempFunction("pcm16_energy_sign_hash",
      (args: Seq[Expression]) =>
        graft.functions.AudioExpressions.Pcm16EnergySignHash(args.head),
      "scala_udf")
    reg.createOrReplaceTempFunction("bloom_agg",
      (args: Seq[Expression]) => bloomAggFromArgs(args), "scala_udf")
    reg.createOrReplaceTempFunction("bloom_might_contain",
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0),
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args(1)))),
      "scala_udf")
    // custom typed AGGREGATE (Aggregator via udaf) — a different
    // registration path than expression injection
    spark.udf.register("weighted_mean", graft.functions.Aggregators.weighted_mean)
  }

  private def litInt(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
      v.toString.toLong
    case other =>
      throw new IllegalArgumentException(s"$what must be a literal, got $other")
  }

  private[graft] def bloomAggFromArgs(args: Seq[Expression]): Expression =
    new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args.head)),
      litInt(args(1), "bloom_agg expectedItems"))

  private[graft] def srpFromArgs(args: Seq[Expression]): Expression =
    VectorExpressions.SrpBucket(args.head,
      litInt(args(1), "srp_bucket planes").toInt,
      if (args.length > 2) litInt(args(2), "srp_bucket seed") else 0x5eedL)
}
