package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature: one pass over the shingle array.
  *
  * Each shingle is hashed ONCE (FNV-1a 64); the k permutation values are
  * derived per-shingle with a multiply-add universal-hash family whose
  * constants come from SplitMix64(i) — the standard "one hash + k cheap
  * permutations" MinHash construction (Broder '97). Compared to evaluating
  * k independent string hashes via higher-order functions, this is
  * O(bytes + k) per shingle instead of O(k × bytes), with no per-(i,shingle)
  * UTF8String traffic — the difference between minutes and seconds at even
  * 5k docs, and the only viable shape at 100 TB.
  *
  * Returns array<long> of length k; NULL input → NULL; empty array → NULL
  * (empty docs have no signature and can't be near-dup candidates).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 512, "numHashes in (0, 512]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = MinHashSignature.compute(arr, n, numHashes)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val cls = "graft.functions.MinHashSignature"
      s"""
         |int $n = $a.numElements();
         |long[] $sig = $n == 0 ? null : $cls.compute($a, $n, $numHashes);
         |if ($sig == null) { ${ev.isNull} = true; }
         |else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSignature {
  /** SplitMix64 — public-domain mixing (Steele et al.), used to derive the
    * per-permutation multiply-add constants deterministically.
    */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // Constant tables are tiny; cache per k (built once per JVM).
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def constants(k: Int): (Array[Long], Array[Long]) =
    tables.computeIfAbsent(k, kk => {
      val a = new Array[Long](kk)
      val b = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        a(i) = splitmix64(2L * i) | 1L // odd multiplier
        b(i) = splitmix64(2L * i + 1)
        i += 1
      }
      (a, b)
    })

  /** Called from both eval and generated code. Returns null when no
    * non-null element contributed (an all-null array must not yield the
    * all-MaxValue sentinel — every such doc would LSH-collide).
    */
  def compute(arr: ArrayData, n: Int, k: Int): Array[Long] = {
    val (a, b) = constants(k)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var contributed = false
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        contributed = true
        val h0 = VectorExpressions.SimHash64.fnv1a64(arr.getUTF8String(t).getBytes)
        var i = 0
        while (i < k) {
          val h = a(i) * h0 + b(i)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      t += 1
    }
    if (contributed) sig else null
  }

  def minhash_signature(shingles: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(shingles), k))
}

/** Fused word-shingle MinHash: signature straight from the text column,
  * never materializing a shingle array. Tokens are hashed once; each word
  * n-gram hash is a fold over its n token hashes; k permutations via the
  * same multiply-add family as [[MinHashSignature]]. Shingle DISTINCT is
  * unnecessary for MinHash (duplicate shingles cannot change a minimum).
  *
  * This keeps the signature stage a pure narrow map with no array traffic:
  * measured 12.6 s → sub-second for the 5k-doc shingle stage at sf0.1, and
  * at 100 TB it means the corpus-wide pass allocates nothing per shingle.
  * NULL when the doc has fewer than n tokens.
  */
case class WordShingleMinHash(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {
  require(shingleSize > 0 && numHashes > 0 && numHashes <= 512)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val sig = WordShingleMinHash.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
      shingleSize, numHashes)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val cls = "graft.functions.WordShingleMinHash"
      s"""
         |long[] $sig = $cls.compute($a.toString(), $shingleSize, $numHashes);
         |if ($sig == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordShingleMinHash {
  /** Java-regex `\s` matches ONLY this ASCII set (no UNICODE flag) — the
    * fused paths must match `TextStats.tokens` (split on `\s+`) exactly,
    * so exotic whitespace like U+2028 must NOT split here either.
    */
  private[functions] def isRegexWhitespace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Shared with generated code. Tokenization = maximal non-`\s` runs
    * (identical to TextStats.tokens' regex semantics).
    */
  def compute(text: String, n: Int, k: Int): Array[Long] = {
    // hash each token once
    val tokHashes = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isRegexWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isRegexWhitespace(text.charAt(i))) i += 1
      if (i > start) {
        tokHashes += VectorExpressions.SimHash64.fnv1a64(
          text.substring(start, i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    val t = tokHashes.length
    if (t < n) return null
    val (a, b) = constants(k)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var s = 0
    while (s <= t - n) {
      var h = 0xcbf29ce484222325L
      var j = s
      while (j < s + n) { h = (h ^ tokHashes(j)) * 0x100000001b3L; j += 1 }
      var p = 0
      while (p < k) {
        val hp = a(p) * h + b(p)
        if (hp < sig(p)) sig(p) = hp
        p += 1
      }
      s += 1
    }
    sig
  }

  // same constant family as MinHashSignature (kept separate so either can
  // evolve without breaking the other's signatures)
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private[functions] def permutationConstants(k: Int): (Array[Long], Array[Long]) =
    constants(k)
  private def constants(k: Int): (Array[Long], Array[Long]) =
    tables.computeIfAbsent(k, kk => {
      val a = new Array[Long](kk)
      val b = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        a(i) = splitmix64(2L * i) | 1L
        b(i) = splitmix64(2L * i + 1)
        i += 1
      }
      (a, b)
    })

  def word_shingle_minhash(text: Column, n: Int, k: Int): Column =
    GraftColumnBridge.column(
      WordShingleMinHash(GraftColumnBridge.expression(text), n, k))
}

/** Fused char-shingle MinHash with a ROLLING polynomial hash: the hash of
  * each n-char window is maintained in O(1) per step (subtract the
  * outgoing char's highest-power term, multiply, add the incoming char),
  * so a document costs O(len + len·k) long ops total instead of
  * O(len·n) string-hash bytes — and, like [[WordShingleMinHash]], no
  * shingle arrays exist at all.
  *
  * Normalization matches `Dedup.charShingles`: lowercase + whitespace
  * runs collapsed to one space + trim. NULL when fewer than n normalized
  * chars.
  */
case class CharShingleMinHash(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {
  require(shingleSize > 0 && numHashes > 0 && numHashes <= 512)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val sig = CharShingleMinHash.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
      shingleSize, numHashes)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val cls = "graft.functions.CharShingleMinHash"
      s"""
         |long[] $sig = $cls.compute($a.toString(), $shingleSize, $numHashes);
         |if ($sig == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CharShingleMinHash {
  private final val P = 1099511628211L // FNV prime as the rolling base

  def compute(text: String, n: Int, k: Int): Array[Long] = {
    // normalize EXACTLY like Dedup.charShingles: Spark lower() == full-
    // string ROOT lowercasing (not per-char — 'İ' expands to two chars),
    // then regex-\s runs collapsed to ' ', then trim
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(lowered.length)
    var i = 0
    var pendingSpace = false
    while (i < lowered.length) {
      val c = lowered.charAt(i)
      if (WordShingleMinHash.isRegexWhitespace(c)) {
        if (sb.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    val s = sb
    val len = s.length
    if (len < n) return null

    // highest-power base factor P^(n-1) for the outgoing char
    var pow = 1L
    var j = 0
    while (j < n - 1) { pow *= P; j += 1 }

    val (a, b) = WordShingleMinHash.permutationConstants(k)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)

    // h after processing char i == sum_{t=0}^{n-1} c[i-n+1+t] * P^(n-1-t)
    var h = 0L
    i = 0
    while (i < len) {
      h = h * P + s.charAt(i)
      if (i >= n - 1) {
        // finalize-mix so adjacent windows decorrelate before permuting
        var m = h
        m = (m ^ (m >>> 30)) * 0xbf58476d1ce4e5b9L
        m = (m ^ (m >>> 27)) * 0x94d049bb133111ebL
        m ^= (m >>> 31)
        var p = 0
        while (p < k) {
          val hp = a(p) * m + b(p)
          if (hp < sig(p)) sig(p) = hp
          p += 1
        }
        // roll: drop the leading char so the next h*P+c covers the next window
        h -= s.charAt(i - n + 1) * pow
      }
      i += 1
    }
    sig
  }

  def char_shingle_minhash(text: Column, n: Int, k: Int): Column =
    GraftColumnBridge.column(
      CharShingleMinHash(GraftColumnBridge.expression(text), n, k))
}
