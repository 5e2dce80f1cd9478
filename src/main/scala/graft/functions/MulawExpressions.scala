package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** G.711 µ-law codec over opaque `binary` audio columns — the
  * telephony/speech-corpus codec (ITU-T G.711, 1972; the `.au`/WAV
  * format-7 payload). Unlike every other codec in the engine, µ-law
  * decode is a PURE INTEGER FORMULA per byte — sign/segment/mantissa
  * expansion with no cross-byte state — so the oracle can recompute the
  * decode of ARBITRARY bytes in SQL: q345 is the one codec gate whose
  * oracle coverage is fully general rather than constructed-fixture.
  *
  * decode(code): u = ~code; t = ((u & 0xF) << 3 | +0x84) << seg;
  * sample = sign ? 0x84 - t : t - 0x84 (the public-domain g711.c
  * expansion). encode is the matching segment search with the 32635
  * clip. decode(encode(x)) quantizes; encode(decode(c)) == c for every
  * code EXCEPT the two zero representations (+0 and -0 both decode to
  * 0, which re-encodes to one canonical code) — `MulawSpec` pins the
  * involution table and the javax.sound interop.
  */
object MulawExpressions {

  /** One µ-law byte → linear sample (exact G.711 expansion). */
  def ulawToLinear(code: Int): Int = {
    val u = ~code & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** Linear sample → µ-law byte (segment search, 32635 clip). */
  def linearToUlaw(sample: Int): Int = {
    var pcm = sample
    val sign = if (pcm < 0) { pcm = -pcm; 0x80 } else 0
    if (pcm > 32635) pcm = 32635
    pcm += 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (pcm & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (pcm >> (exp + 3)) & 0x0f
    ~(sign | (exp << 4) | mant) & 0xff
  }

  /** µ-law bytes → PCM16LE (every byte is a valid code; null input only
    * on null/empty).
    */
  def mulawDecode(bin: Array[Byte]): Array[Byte] = {
    if (bin == null || bin.length == 0) return null
    val out = new Array[Byte](bin.length * 2)
    var i = 0
    while (i < bin.length) {
      val v = ulawToLinear(bin(i) & 0xff)
      out(2 * i) = (v & 0xff).toByte
      out(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** PCM16LE → µ-law bytes; null when the byte count is odd. */
  def mulawEncode(pcm: Array[Byte]): Array[Byte] = {
    if (pcm == null || pcm.length == 0 || pcm.length % 2 != 0) return null
    val out = new Array[Byte](pcm.length / 2)
    var i = 0
    while (i < out.length) {
      val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      out(i) = linearToUlaw(s).toByte
      i += 1
    }
    out
  }

  private def cls: String =
    MulawExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"

  case class MulawDecode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      MulawExpressions.mulawDecode(input.asInstanceOf[Array[Byte]])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val r = ctx.freshName("pcm")
        s"""
           |byte[] $r = $cls.mulawDecode($bin);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class MulawEncode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      MulawExpressions.mulawEncode(input.asInstanceOf[Array[Byte]])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val r = ctx.freshName("ul")
        s"""
           |byte[] $r = $cls.mulawEncode($bin);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def mulaw_decode(bin: Column): Column =
    GraftColumnBridge.column(MulawDecode(GraftColumnBridge.expression(bin)))

  def mulaw_encode(pcm: Column): Column =
    GraftColumnBridge.column(MulawEncode(GraftColumnBridge.expression(pcm)))
}
