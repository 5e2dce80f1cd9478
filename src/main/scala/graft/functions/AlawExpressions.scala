package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** G.711 A-law codec — the OTHER half of the telephony standard
  * ([[MulawExpressions]] is the µ-law half): the E1/European trunk and
  * WAV format-6 payload. Like µ-law, A-law expansion is a pure
  * per-byte integer formula (XOR 0x55 toggle, segment/mantissa
  * expansion — the public-domain g711.c chain), so the oracle can
  * recompute the decode of ARBITRARY bytes directly in SQL; every one
  * of the 256 codes is a fixed point of encode∘decode (`AlawSpec`
  * pins the full involution table — A-law has no double-zero, unlike
  * µ-law's +0/−0 pair).
  *
  * decode(code): a = code ^ 0x55; t = (a & 0xF) << 4; seg =
  * (a >> 4) & 7; t += seg == 0 ? 8 : 0x108; t <<= max(seg - 1, 0);
  * sample = (a & 0x80) ? t : -t. encode is the matching segment
  * search with the -pcm-8 negative bias.
  */
object AlawExpressions {

  /** One A-law byte → linear sample (exact G.711 expansion). */
  def alawToLinear(code: Int): Int = {
    val a = (code ^ 0x55) & 0xff
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else { t += 0x108; t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  /** Linear sample → A-law byte (segment search, -pcm-8 bias). */
  def linearToAlaw(sample: Int): Int = {
    var pcm = sample
    var mask = 0xd5
    if (pcm < 0) { mask = 0x55; pcm = -pcm - 8; if (pcm < 0) pcm = 0 }
    var seg = 0
    var end = 0xff
    while (seg < 8 && pcm > end) { seg += 1; end = (end << 1) | 1 }
    if (seg >= 8) 0x7f ^ mask
    else {
      val shift = if (seg < 2) 4 else seg + 3
      (((seg << 4) | ((pcm >> shift) & 0x0f)) ^ mask) & 0xff
    }
  }

  /** A-law bytes → PCM16LE (every byte is a valid code; null input only
    * on null/empty).
    */
  def alawDecode(bin: Array[Byte]): Array[Byte] = {
    if (bin == null || bin.length == 0) return null
    val out = new Array[Byte](bin.length * 2)
    var i = 0
    while (i < bin.length) {
      val v = alawToLinear(bin(i) & 0xff)
      out(2 * i) = (v & 0xff).toByte
      out(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** PCM16LE → A-law bytes; null when the byte count is odd. */
  def alawEncode(pcm: Array[Byte]): Array[Byte] = {
    if (pcm == null || pcm.length == 0 || pcm.length % 2 != 0) return null
    val out = new Array[Byte](pcm.length / 2)
    var i = 0
    while (i < out.length) {
      val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      out(i) = linearToAlaw(s).toByte
      i += 1
    }
    out
  }

  private def cls: String =
    AlawExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"

  case class AlawDecode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      AlawExpressions.alawDecode(input.asInstanceOf[Array[Byte]])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val r = ctx.freshName("pcm")
        s"""
           |byte[] $r = $cls.alawDecode($bin);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class AlawEncode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      AlawExpressions.alawEncode(input.asInstanceOf[Array[Byte]])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val r = ctx.freshName("al")
        s"""
           |byte[] $r = $cls.alawEncode($bin);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def alaw_decode(bin: Column): Column =
    GraftColumnBridge.column(AlawDecode(GraftColumnBridge.expression(bin)))

  def alaw_encode(pcm: Column): Column =
    GraftColumnBridge.column(AlawEncode(GraftColumnBridge.expression(pcm)))
}
