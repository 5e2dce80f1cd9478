package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  // Column-facing wrappers.
  def cosine_similarity(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))
  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))
}
