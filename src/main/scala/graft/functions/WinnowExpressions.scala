package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (Schleimer et al. '03, the MOSS
  * document-fingerprint sampler) as ONE fused generated-code pass:
  *
  *  - k-gram hashes by a ROLLING polynomial hash over the UTF-8 bytes —
  *    O(1) per position after the first gram, vs O(k) per position for
  *    independent gram hashing (and vs one md5 call per gram in the
  *    oracle-twin formulation, ~30× more per-byte work);
  *  - per-window minima by a MONOTONIC DEQUE — O(n) total, vs the
  *    composed `array_min(slice(...))` formulation's O(n·w);
  *  - consecutive duplicate selections collapsed on the fly (winnowing
  *    emits each selected position once), so no intermediate n-element
  *    array is ever materialized — the expression allocates the hash
  *    ring and deque (w longs/ints) plus the output only.
  *
  * Emits the ordered selected-minima values (callers wanting the set
  * apply array_distinct). Texts shorter than k+w−1 bytes → NULL. The
  * winnowing guarantee (any shared run of ≥ k+w−1 bytes shares a
  * selected fingerprint) holds per hash scheme; this FNV-flavoured
  * rolling hash is the production default, while q132's md5 formulation
  * remains the cross-engine oracle gate (the q22 FNV-vs-md5 pattern).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && k <= 256, "k in [2, 256]")
  require(w >= 2 && w <= 256, "w in [2, 256]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val out = WinnowFingerprints.winnow(input.asInstanceOf[UTF8String], k, w)
    if (out == null) null else new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val out = ctx.freshName("fps")
      val cls = "graft.functions.WinnowFingerprints"
      s"""
         |long[] $out = $cls.winnow($s, $k, $w);
         |if ($out == null) { ${ev.isNull} = true; }
         |else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WinnowFingerprints {
  private final val B = 0x100000001b3L // FNV-64 prime as the rolling base

  /** One-pass rolling-hash + monotonic-deque winnow over the UTF-8 bytes.
    * Returns the selected minima in order (consecutive re-selections of
    * the same position collapsed), or null when bytes < k + w - 1.
    */
  def winnow(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k + w - 1) return null
    val m = n - k + 1 // gram count
    // B^(k-1) for the rolling subtraction
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk *= B; i += 1 }
    // ring of the last w hashes + monotonic deque of candidate indices
    val ring = new Array[Long](w)
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // deque[head until tail], increasing hash
    val out = new Array[Long](m - w + 1)
    var outN = 0
    var lastSel = -1
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    var g = 0 // gram index of h
    while (g < m) {
      if (g > 0) h = (h - (bytes(g - 1) & 0xff) * bk) * B + (bytes(g + k - 1) & 0xff)
      ring(g % w) = h
      // pop larger-or-equal tail entries: keeping the RIGHTMOST minimum
      // (strict '>' would keep the leftmost; rightmost is the paper's
      // robust-winnowing tie rule)
      while (tail > head && ring(deque(tail - 1) % w) >= h) tail -= 1
      deque(tail) = g; tail += 1
      // evict out-of-window head
      while (deque(head) <= g - w) head += 1
      if (g >= w - 1 && deque(head) != lastSel) {
        lastSel = deque(head)
        out(outN) = ring(lastSel % w)
        outN += 1
      }
      g += 1
    }
    java.util.Arrays.copyOf(out, outN)
  }

  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(
      WinnowFingerprints(GraftColumnBridge.expression(text), k, w))

  def md5_winnow_set(text: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(
      Md5WinnowSet(GraftColumnBridge.expression(text), k, w))
}

/** The md5-spec winnow twin, fused: EXACTLY the value semantics of the
  * composed q132 formulation
  *
  * {{{
  * array_distinct(transform(sequence(1, n-(w-1)),
  *   j => array_min(slice(transform(sequence(1, n-(k-1)),
  *     i => conv(substring(md5(substr(text,i,k) cast binary),1,15),16,10)
  *       cast long), j, w))))
  * }}}
  *
  * i.e. per CHAR-position k-gram, the first 60 bits of md5 over the
  * gram's UTF-8 bytes, window-minima over w grams, first-occurrence
  * distinct — but in ONE generated-code pass: char byte-offsets computed
  * once, one thread-local MessageDigest reused for every gram (no hex
  * string, no conv parse, no n-element Catalyst arrays), window minima
  * by monotonic deque. md5 is not rollable, so the O(n·k) digest work is
  * inherent to the SPEC; what this removes is the ~10× expression-tree
  * overhead around it. Keeps q132's DuckDB oracle valid verbatim while
  * taking the Spark side off the bench's top-cost row (VERDICT r7 #3).
  */
case class Md5WinnowSet(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && k <= 256, "k in [2, 256]")
  // w = 1 degenerates to the DISTINCT md5 k-gram set (every window is a
  // single gram, so the "window minimum" is the gram itself) — the exact
  // value semantics of explode(charNgrams)+md5+conv+distinct, fused into
  // one pass; q188/q165 use it that way (r14 optimization).
  require(w >= 1 && w <= 256, "w in [1, 256]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val out = Md5WinnowSet.winnowMd5(input.asInstanceOf[UTF8String], k, w)
    if (out == null) null else new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val out = ctx.freshName("fps")
      val cls = "graft.functions.Md5WinnowSet"
      s"""
         |long[] $out = $cls.winnowMd5($s, $k, $w);
         |if ($out == null) { ${ev.isNull} = true; }
         |else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Md5WinnowSet {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Distinct window-min md5-gram hashes in first-occurrence order, or
    * null when the text has fewer than k + w - 1 CHARS (matching the
    * composed formulation's sequence() emptiness, which the catalog
    * pre-filters anyway).
    */
  def winnowMd5(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val bytes = s.getBytes
    val nChars = s.numChars()
    if (nChars < k + w - 1) return null
    // byte offset of each char start (+ end sentinel): one linear scan
    val off = new Array[Int](nChars + 1)
    var b = 0; var c = 0
    while (c < nChars) {
      off(c) = b
      val first = bytes(b) & 0xff
      b += (if (first < 0x80) 1 else if (first < 0xe0) 2
            else if (first < 0xf0) 3 else 4)
      c += 1
    }
    off(nChars) = bytes.length
    val m = nChars - k + 1
    val md = digests.get()
    val hashes = new Array[Long](m)
    var g = 0
    while (g < m) {
      md.reset()
      md.update(bytes, off(g), off(g + k) - off(g))
      val d = md.digest()
      // first 15 hex digits = digest[0..6] + high nibble of digest[7],
      // identical to conv(substring(hex,1,15),16,10) in the oracle
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      hashes(g) = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      g += 1
    }
    // window minima via monotonic deque; distinct VALUES kept in
    // first-occurrence order (array_distinct semantics)
    val deque = new Array[Int](m)
    var head = 0; var tail = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](m - w + 1)
    var outN = 0
    g = 0
    while (g < m) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(g)) tail -= 1
      deque(tail) = g; tail += 1
      while (deque(head) <= g - w) head += 1
      if (g >= w - 1) {
        val v = hashes(deque(head))
        if (seen.add(v)) { out(outN) = v; outN += 1 }
      }
      g += 1
    }
    java.util.Arrays.copyOf(out, outN)
  }
}
