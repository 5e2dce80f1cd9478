package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the north-star vector/text operators
  * (BASELINE.json "north_star"; not present in the reference — the
  * reference has no UDF/extension surface at all, SURVEY.md §2.8).
  *
  * Implemented as native expressions with `doGenCode` (whole-stage-codegen
  * friendly) rather than Scala UDFs: no Row boxing, no serialization, and
  * the JIT sees a tight primitive loop — the difference between usable and
  * not at 100 TB of embeddings.
  */
object VectorExpressions {

  private def elementsAreFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** Cosine similarity between two float vectors, accumulated in double.
    * NULL if either side is NULL, lengths differ, or either norm is 0.
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (elementsAreFloat(left.dataType) && elementsAreFloat(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_similarity needs array<float> inputs, got " +
            s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements() || n == 0) null
      else {
        var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
        while (i < n) {
          val xi = x.getFloat(i).toDouble
          val yi = y.getFloat(i).toDouble
          dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
        }
        if (nx == 0.0 || ny == 0.0) null
        else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
      }
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny"); val xi = ctx.freshName("xi")
        val yi = ctx.freshName("yi")
        s"""
           |int $n = $x.numElements();
           |if ($n != $y.numElements() || $n == 0) { ${ev.isNull} = true; }
           |else {
           |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $xi = (double) $x.getFloat($i);
           |    double $yi = (double) $y.getFloat($i);
           |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
           |  }
           |  if ($nx == 0.0 || $ny == 0.0) { ${ev.isNull} = true; }
           |  else { ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny)); }
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Dot product of two float vectors in double (building block for IVF /
    * re-ranking where norms are precomputed). NULL on length mismatch.
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) null
      else {
        var dot = 0.0; var i = 0
        while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
        java.lang.Double.valueOf(dot)
      }
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        s"""
           |int $n = $x.numElements();
           |if ($n != $y.numElements()) { ${ev.isNull} = true; }
           |else {
           |  double $dot = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $dot += (double) $x.getFloat($i) * (double) $y.getFloat($i);
           |  }
           |  ${ev.value} = $dot;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** 64-bit SimHash over an array<string> of tokens: per-token 64-bit FNV-1a
    * hash; each bit votes +1/-1; sign of the vote vector is the fingerprint.
    * Near-duplicate docs differ in few bits (compare via bit_count(xor)).
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      val n = arr.numElements()
      var t = 0
      while (t < n) {
        if (!arr.isNullAt(t)) {
          val h = SimHash64.fnv1a64(arr.getUTF8String(t).getBytes)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        t += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      java.lang.Long.valueOf(out)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val votes = ctx.freshName("votes"); val n = ctx.freshName("n")
        val t = ctx.freshName("t"); val h = ctx.freshName("h")
        val b = ctx.freshName("b"); val out = ctx.freshName("out")
        val cls = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |int[] $votes = new int[64];
           |int $n = $a.numElements();
           |for (int $t = 0; $t < $n; $t++) {
           |  if (!$a.isNullAt($t)) {
           |    long $h = $cls.fnv1a64($a.getUTF8String($t).getBytes());
           |    for (int $b = 0; $b < 64; $b++) {
           |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
           |    }
           |  }
           |}
           |long $out = 0L;
           |for (int $b = 0; $b < 64; $b++) {
           |  if ($votes[$b] > 0) $out |= (1L << $b);
           |}
           |${ev.value} = $out;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  object SimHash64 {
    /** FNV-1a 64-bit — public-domain hash, stable across JVMs. */
    def fnv1a64(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL)
        h *= 0x100000001b3L
        i += 1
      }
      h
    }
  }

  /** 60-bit SimHash whose per-token hash is the TOP 15 HEX DIGITS OF MD5 —
    * bit-identical to the SQL formulation
    * `('0x'||substr(md5(t),1,15))::BIGINT` (15 nibbles = the big-endian
    * first 8 digest bytes shifted right 4), so a DuckDB oracle can
    * recompute every fingerprint. Native single-pass evaluation: one md5
    * per token, 60 bit-votes, majority with ties→1 (`2·ones ≥ n`). The
    * expression-composed twin ([[graft.ops.TextStats.md5Simhash]]) is the
    * readable cross-engine REFERENCE but re-derives the token-hash array
    * once per bit inside its lambda (~60× the md5 work — measured 74 s vs
    * ~2 s for q22 at sf0.1); this is the production evaluator, equivalence
    * asserted in Round4OpsSpec. NULL for empty arrays or NULL tokens.
    */
  case class Md5Simhash60(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      Md5Simhash60.eval(input.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val out = ctx.freshName("fp")
        val cls = Md5Simhash60.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |java.lang.Long $out = (java.lang.Long) $cls.eval($a);
           |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out.longValue(); }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  object Md5Simhash60 {
    private val digestTl =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))

    /** Top 60 bits of md5: big-endian first 8 bytes >>> 4. */
    def md5Top60(bytes: Array[Byte]): Long = {
      val d = digestTl.get()
      d.reset()
      val h = d.digest(bytes)
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
      v >>> 4
    }

    def eval(arr: ArrayData): java.lang.Long = {
      val n = arr.numElements()
      if (n == 0) return null
      val ones = new Array[Int](60)
      var t = 0
      while (t < n) {
        if (arr.isNullAt(t)) return null
        val h = md5Top60(arr.getUTF8String(t).getBytes)
        var b = 0
        while (b < 60) {
          ones(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        t += 1
      }
      var out = 0L
      var b = 0
      while (b < 60) {
        if (2 * ones(b) >= n) out |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(out)
    }
  }

  /** Integer squared L2 distance between two long-grid vectors, over the
    * full arrays (`prefix = 0`) or their first `prefix` elements — the
    * fused twin of `aggregate(zip_with([slice(a,1,p)], [slice(b,1,p)],
    * (x,y) -> (x-y)*(x-y)), 0L, +)`, the exact-re-rank hot loop of the
    * IVF-PQ gates (interpreted lambda + per-row slice allocation in the
    * HOF form). Identical integer arithmetic and null semantics: NULL
    * when either input is NULL, when the (clipped) lengths differ
    * (zip_with pads the shorter side with nulls, poisoning the sum), or
    * when any touched element is null.
    */
  case class GridL2Sq(left: Expression, right: Expression, prefix: Int)
      extends BinaryExpression {
    require(prefix >= 0)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    def dist(a: ArrayData, b: ArrayData): java.lang.Long = {
      val la = if (prefix == 0) a.numElements()
        else math.min(prefix, a.numElements())
      val lb = if (prefix == 0) b.numElements()
        else math.min(prefix, b.numElements())
      if (la != lb) return null
      var total = 0L
      var i = 0
      while (i < la) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val d = a.getLong(i) - b.getLong(i)
        total += d * d
        i += 1
      }
      total
    }

    override def nullSafeEval(x: Any, y: Any): Any = {
      val r = dist(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])
      if (r == null) null else r.longValue()
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("l2", this, classOf[GridL2Sq].getName)
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val boxed = ctx.freshName("boxed")
        s"""
           |java.lang.Long $boxed = $ref.dist($a, $b);
           |if ($boxed == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $boxed.longValue(); }
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** k md5-keyed hash values for one string: value i is the 15-hex-nibble
    * prefix of md5("i|" + s) as a long — the per-hash-function MinHash
    * component family whose every value a SQL oracle can recompute
    * (`('0x'||substr(md5(i||'|'||s),1,15))::BIGINT`). Fused twin of the
    * former `transform(sequence(0,k-1), i ->
    * conv(substring(md5(concat(i,'|',s)),1,15),16,10))` tree: the HOF
    * path pays an interpreted lambda, a string concat, a hex-string
    * materialization and a radix parse PER (i, row); this runs k digests
    * over one reused buffer with a thread-local MessageDigest and reads
    * the value straight off the digest bytes (identical 60-bit value:
    * 15 nibbles = big-endian first 8 bytes >>> 4).
    */
  case class Md5KeyedHashes(child: Expression, k: Int)
      extends UnaryExpression {
    require(k >= 1 && k <= 512, "k in [1, 512]")
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      Md5KeyedHashes.eval(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val cls = Md5KeyedHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData)" +
          s" $cls.eval($a, $k);"
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  object Md5KeyedHashes {
    private val digestTl =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))

    def eval(s: org.apache.spark.unsafe.types.UTF8String,
             k: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
      val sb = s.getBytes
      val d = digestTl.get()
      val out = new Array[Long](k)
      var i = 0
      while (i < k) {
        d.reset()
        // prefix "i|" in ASCII, then the string bytes — identical bytes
        // to md5(concat(cast(i as string), '|', s)) on UTF-8 input
        val prefix = Integer.toString(i)
        var p = 0
        while (p < prefix.length) { d.update(prefix.charAt(p).toByte); p += 1 }
        d.update('|'.toByte)
        d.update(sb)
        val h = d.digest()
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (h(j) & 0xffL); j += 1 }
        out(i) = v >>> 4
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** Sign-random-projection bucket id (Charikar '02): bit p = sign of
    * <v, plane_p>. The hyperplane matrix is derived deterministically from
    * (seed, plane, dim) via SplitMix64 (Steele et al. '14, public domain)
    * and materialized ONCE per expression instance per executor — not per
    * row. The round-1 formulation recomputed an md5-derived component per
    * (plane × dim) per row, which made the LSH "fast path" slower than
    * brute force (VERDICT r1 #2).
    */
  case class SrpBucket(child: Expression, numPlanes: Int, seed: Long)
      extends UnaryExpression {
    require(numPlanes >= 1 && numPlanes <= 63, "numPlanes must be in [1, 63]")
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable

    // Plane matrix cache: built on first vector seen, keyed by its dim.
    // One dim per dataset in practice; rebuilt only if the dim changes.
    @transient private var cachedDim: Int = -1
    @transient private var planes: Array[Array[Double]] = _

    def bucket(arr: ArrayData): Long = {
      val dim = arr.numElements()
      if (planes == null || cachedDim != dim) {
        planes = SrpBucket.buildPlanes(numPlanes, dim, seed)
        cachedDim = dim
      }
      var out = 0L
      var p = 0
      while (p < numPlanes) {
        val row = planes(p)
        var dot = 0.0
        var d = 0
        while (d < dim) { dot += arr.getFloat(d).toDouble * row(d); d += 1 }
        if (dot >= 0.0) out |= (1L << p)
        p += 1
      }
      out
    }

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(bucket(input.asInstanceOf[ArrayData]))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("srp", this, classOf[SrpBucket].getName)
      nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.bucket($x);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  object SrpBucket {
    /** SplitMix64 finalizer — public-domain mixing function. */
    def mix64(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    /** Deterministic plane matrix, components uniform in [-1, 1). */
    def buildPlanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
      Array.tabulate(numPlanes, dim) { (p, d) =>
        (mix64(seed ^ (p.toLong << 32) ^ d.toLong) >>> 11) *
          (2.0 / (1L << 53)) - 1.0
      }
  }

  /** Top-n nearest IVF cells for a vector: cell ids ordered by cosine
    * similarity to the codebook centroids (desc, cell-id tiebreak). The
    * codebook is bounded (fixed k) and carried as plain arrays with
    * centroid norms precomputed once — no per-row array-of-struct
    * allocation + sort_array, which is what made round-1's IVF assignment
    * slower than a brute-force scan (VERDICT r1 #2/#3).
    */
  case class NearestCells(child: Expression, cellIds: Array[Long],
                          centroids: Array[Array[Float]], n: Int)
      extends UnaryExpression {
    require(cellIds.length == centroids.length && centroids.nonEmpty)
    require(n >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    @transient private lazy val norms: Array[Double] =
      centroids.map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
        math.sqrt(s)
      }

    def cells(arr: ArrayData): ArrayData = {
      val dim = arr.numElements()
      val m = math.min(n, cellIds.length)
      // selection by repeated scan over k (k and n are tiny by construction)
      val bestIds = new Array[Long](m)
      val bestScores = new Array[Double](m)
      var filled = 0
      var c = 0
      while (c < centroids.length) {
        val cent = centroids(c)
        if (cent.length == dim && norms(c) > 0.0) {
          var dot = 0.0; var vn = 0.0; var d = 0
          while (d < dim) {
            val x = arr.getFloat(d).toDouble
            dot += x * cent(d).toDouble; vn += x * x; d += 1
          }
          if (vn > 0.0) {
            val score = dot / (math.sqrt(vn) * norms(c))
            // insertion sort into the bounded top-m (desc score, asc id)
            var pos = filled
            while (pos > 0 && (bestScores(pos - 1) < score ||
              (bestScores(pos - 1) == score && bestIds(pos - 1) > cellIds(c)))) pos -= 1
            if (pos < m) {
              val last = math.min(filled, m - 1)
              var j = last
              while (j > pos) {
                bestScores(j) = bestScores(j - 1); bestIds(j) = bestIds(j - 1); j -= 1
              }
              bestScores(pos) = score; bestIds(pos) = cellIds(c)
              if (filled < m) filled += 1
            }
          }
        }
        c += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        java.util.Arrays.copyOf(bestIds, filled))
    }

    override def nullSafeEval(input: Any): Any =
      cells(input.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ivf", this, classOf[NearestCells].getName)
      nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.cells($x);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Native PQ encoder: per m×sub-grid subspace, the argmin codeword by
    * squared integer grid distance, ties to the smaller code — the fused
    * twin of the former higher-order formulation
    * `transform(range(m), s -> array_min(transform(cb, (cbv, ci) ->
    * struct(Σ (v-cbv)², ci))).code)`. Higher-order functions evaluate
    * through interpreted lambda machinery with a fresh `slice` allocation
    * per (codeword, subspace) — measured as the single hottest job of
    * every IVF-PQ gate (3.8 s of q323's 9.8 s at sf0.1). This expression
    * runs the identical integer arithmetic in one codegen'd pass:
    * O(m·k·sub) long ops, zero allocation beyond the output array.
    *
    * Exact-parity edge semantics (verified against the HOF tree): a
    * subspace whose two slices CLIP to different lengths (or touch a
    * null element) has a NULL distance, and a null-distance codeword
    * sorts FIRST in the struct-min (Spark's nulls-first struct
    * ordering), code tiebreak ascending. Equal-length short slices sum
    * the fewer terms. NULL vec → NULL (the HOF tree yields all-zero
    * codes there; no caller feeds null vectors — embeddings are
    * non-null by schema).
    */
  case class PqCodes(child: Expression, codebook: Array[Array[Long]],
                     m: Int, sub: Int)
      extends UnaryExpression {
    require(codebook.nonEmpty && m >= 1 && sub >= 1)
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true

    def codes(vec: ArrayData): ArrayData = {
      val vLen = vec.numElements()
      val out = new Array[Int](m)
      var sIdx = 0
      while (sIdx < m) {
        val off = sIdx * sub
        var bestCode = -1
        var bestD = Long.MaxValue
        var bestNullCode = -1 // null distance sorts first (nulls-first)
        var ci = 0
        while (ci < codebook.length) {
          val cb = codebook(ci)
          val lenA = math.max(0, math.min(sub, vLen - off))
          val lenB = math.max(0, math.min(sub, cb.length - off))
          if (lenA != lenB) {
            if (bestNullCode < 0) bestNullCode = ci
          } else {
            var d = 0L
            var j = 0
            var sawNull = false
            while (j < lenA && !sawNull) {
              if (vec.isNullAt(off + j)) sawNull = true
              else {
                val diff = vec.getLong(off + j) - cb(off + j)
                d += diff * diff
              }
              j += 1
            }
            if (sawNull) { if (bestNullCode < 0) bestNullCode = ci }
            else if (d < bestD) { bestD = d; bestCode = ci }
          }
          ci += 1
        }
        out(sIdx) = if (bestNullCode >= 0) bestNullCode else bestCode
        sIdx += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      codes(input.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pq", this, classOf[PqCodes].getName)
      nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.codes($x);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Native asymmetric PQ distance: Σ over subspaces of the squared
    * integer grid distance between the query's exact subvector and the
    * codeword its candidate's code names — the fused twin of the former
    * `aggregate(transform(range(m), ...zip_with(slice(q),
    * slice(cb[code]))...))` tree (same interpreted-lambda cost profile
    * as [[PqCodes]]; this is the per-candidate-pair hot loop of every
    * serve path). Identical integer arithmetic; NULL when either input
    * is NULL, when a code is out of codebook range (unreachable from
    * [[PqCodes]] output; the HOF tree THREW there under ANSI element_at
    * — NULL is the safer total behavior), when the two slices clip to
    * different lengths, or when any touched element is null.
    */
  case class AdcDist(left: Expression, right: Expression,
                     codebook: Array[Array[Long]], m: Int, sub: Int)
      extends BinaryExpression {
    require(codebook.nonEmpty && m >= 1 && sub >= 1)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    // boxed so generated code can represent the NULL outcome
    def dist(q: ArrayData, codes: ArrayData): java.lang.Long = {
      val qLen = q.numElements()
      var total = 0L
      var sIdx = 0
      while (sIdx < m) {
        if (sIdx >= codes.numElements() || codes.isNullAt(sIdx)) return null
        val code = codes.getInt(sIdx)
        if (code < 0 || code >= codebook.length) return null
        val cb = codebook(code)
        val off = sIdx * sub
        val lenA = math.max(0, math.min(sub, qLen - off))
        val lenB = math.max(0, math.min(sub, cb.length - off))
        if (lenA != lenB) return null
        var j = 0
        while (j < lenA) {
          if (q.isNullAt(off + j)) return null
          val diff = q.getLong(off + j) - cb(off + j)
          total += diff * diff
          j += 1
        }
        sIdx += 1
      }
      total
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val r = dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      if (r == null) null else r.longValue()
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("adc", this, classOf[AdcDist].getName)
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val boxed = ctx.freshName("boxed")
        s"""
           |java.lang.Long $boxed = $ref.dist($a, $b);
           |if ($boxed == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $boxed.longValue(); }
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Morton (Z-order) interleave of two 32-bit keys into one long: bit i
    * of `a` lands at position 2i, bit i of `b` at 2i+1. Sorting data by
    * this key before writing clusters rows so parquet row-group min/max
    * stats stay tight on BOTH dimensions — range filters on either column
    * prune row groups, where a lexicographic (a, b) sort only serves `a`.
    * Use with `Writers.compact(sortCols = Seq(<morton col>))`.
    */
  case class MortonInterleave(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable

    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.valueOf(MortonInterleave.interleave(
        a.asInstanceOf[Number].longValue(), b.asInstanceOf[Number].longValue()))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = MortonInterleave.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = $cls.interleave((long) $a, (long) $b);")
    }

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case IntegerType | LongType | ShortType | ByteType => true
        case _                                             => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"morton_interleave needs integral inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  object MortonInterleave {
    /** Spread the low 32 bits of x to even bit positions (textbook
      * bit-twiddling dilation, public domain).
      */
    def spread(x0: Long): Long = {
      var x = x0 & 0xffffffffL
      x = (x | (x << 16)) & 0x0000ffff0000ffffL
      x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
      x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
      x = (x | (x << 2)) & 0x3333333333333333L
      x = (x | (x << 1)) & 0x5555555555555555L
      x
    }

    def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
  }

  /** 3-D Morton interleave: bit i of `a` lands at position 3i, of `b`
    * at 3i+1, of `c` at 3i+2 — 21 bits per dimension fill 63 bits of
    * the long. The 3-D sibling of [[MortonInterleave]], for corpus
    * layouts clustered on THREE independent dimensions at once
    * (date × source × length): a 2-D key leaves the third dimension
    * unserved exactly the way a lexicographic sort leaves the second
    * unserved (q314 measures both degenerations).
    */
  case class MortonInterleave3(first: Expression, second: Expression,
                               third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean =
      first.nullable || second.nullable || third.nullable

    override def nullSafeEval(a: Any, b: Any, c: Any): Any =
      java.lang.Long.valueOf(MortonInterleave3.interleave3(
        a.asInstanceOf[Number].longValue(),
        b.asInstanceOf[Number].longValue(),
        c.asInstanceOf[Number].longValue()))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = MortonInterleave3.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (a, b, c) =>
        s"${ev.value} = $cls.interleave3((long) $a, (long) $b, (long) $c);")
    }

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(first, second, third).forall(_.dataType match {
        case IntegerType | LongType | ShortType | ByteType => true
        case _                                             => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"morton_interleave3 needs integral inputs, got " +
          s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString}")
    }

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  object MortonInterleave3 {
    /** Spread the low 21 bits of x so bit i lands at position 3i (the
      * textbook 64-bit 3-D dilation masks, public domain).
      */
    def spread3(x0: Long): Long = {
      var x = x0 & 0x1fffffL
      x = (x | (x << 32)) & 0x1f00000000ffffL
      x = (x | (x << 16)) & 0x1f0000ff0000ffL
      x = (x | (x << 8)) & 0x100f00f00f00f00fL
      x = (x | (x << 4)) & 0x10c30c30c30c30c3L
      x = (x | (x << 2)) & 0x1249249249249249L
      x
    }

    def interleave3(a: Long, b: Long, c: Long): Long =
      spread3(a) | (spread3(b) << 1) | (spread3(c) << 2)
  }

  // Column-facing wrappers.
  def cosine_similarity(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))
  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))
  def md5_simhash60(tokens: Column): Column =
    GraftColumnBridge.column(Md5Simhash60(GraftColumnBridge.expression(tokens)))
  def md5_keyed_hashes(s: Column, k: Int): Column =
    GraftColumnBridge.column(Md5KeyedHashes(GraftColumnBridge.expression(s), k))
  def grid_l2sq(a: Column, b: Column, prefix: Int = 0): Column =
    GraftColumnBridge.column(GridL2Sq(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b), prefix))
  def srp_bucket(vec: Column, numPlanes: Int, seed: Long = 0x5eedL): Column =
    GraftColumnBridge.column(SrpBucket(GraftColumnBridge.expression(vec),
      numPlanes, seed))
  def nearest_cells(vec: Column, cellIds: Array[Long],
                    centroids: Array[Array[Float]], n: Int): Column =
    GraftColumnBridge.column(NearestCells(GraftColumnBridge.expression(vec),
      cellIds, centroids, n))
  def pq_codes(vec: Column, codebook: Array[Array[Long]],
               m: Int, sub: Int): Column =
    GraftColumnBridge.column(PqCodes(GraftColumnBridge.expression(vec),
      codebook, m, sub))
  def adc_dist(q: Column, codes: Column, codebook: Array[Array[Long]],
               m: Int, sub: Int): Column =
    GraftColumnBridge.column(AdcDist(GraftColumnBridge.expression(q),
      GraftColumnBridge.expression(codes), codebook, m, sub))
  def morton_interleave(a: Column, b: Column): Column =
    GraftColumnBridge.column(MortonInterleave(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))
  def morton_interleave3(a: Column, b: Column, c: Column): Column =
    GraftColumnBridge.column(MortonInterleave3(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      GraftColumnBridge.expression(c)))
}
