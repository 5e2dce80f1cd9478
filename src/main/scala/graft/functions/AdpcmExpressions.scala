package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** IMA/DVI ADPCM codec over opaque `binary` audio columns — the
  * compressed-AUDIO sibling of [[PngExpressions]]/[[JpegExpressions]]:
  * real 4-bit adaptive-step ADPCM (the public IMA Digital Audio focus
  * group algorithm, 1992 — the codec inside WAV format 0x11 and AIFF-C
  * "ima4"), not a header parse. A crawl's speech/telephony corpora ship
  * ADPCM-in-RIFF constantly; decoding it is a row-local integer chain,
  * which is exactly what belongs inside whole-stage codegen next to the
  * scan.
  *
  * Container (the WAV-IMA block layout, mono): 20-byte blocks of
  * `predictor:int16le  stepIndex:u8  reserved:0u8` then 16 nibble bytes
  * (low nibble first) = 1 header sample + 32 coded samples per block.
  * PCM side is 16-bit little-endian mono. Decode VALIDATES: length a
  * positive multiple of 20, stepIndex ≤ 88, reserved byte 0 — anything
  * else (e.g. a truncated tail) decodes to NULL, never a throw.
  *
  * Determinism note (the q326 construction): a block whose 33 samples
  * are all equal is encoded EXACTLY — the encoder emits nibble 0
  * (diff 0), and at stepIndex 0 the decoder's magnitude term
  * `step >> 3 = 7 >> 3 = 0` adds nothing while `indexTable[0] = -1`
  * clamps the index back to 0 — so constant-block fixtures round-trip
  * losslessly and an oracle can recompute every decoded sample from the
  * generator formula. General content is pinned against an independent
  * reference decode in `AdpcmSpec`.
  */
object AdpcmExpressions {

  final val SamplesPerBlock = 33 // 1 header + 32 nibbles
  final val BlockBytes = 20

  private val stepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val indexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  private def clampSample(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v

  private def clampIndex(v: Int): Int =
    if (v < 0) 0 else if (v > 88) 88 else v

  /** The decoder's reconstruction step — shared by encode (predictor
    * tracking MUST mirror the decoder exactly or the codec drifts) and
    * decode. Returns the new predictor; magnitude chain is the IMA
    * integer formula: step>>3 + (n&4 ? step) + (n&2 ? step>>1) +
    * (n&1 ? step>>2), sign bit 8 subtracts.
    */
  private def reconstruct(pred: Int, nibble: Int, step: Int): Int = {
    var diff = step >> 3
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 1) != 0) diff += step >> 2
    clampSample(if ((nibble & 8) != 0) pred - diff else pred + diff)
  }

  /** PCM16LE mono → IMA blocks; null when the sample count is not a
    * positive multiple of [[SamplesPerBlock]] (the codec is defined on
    * whole blocks; padding policy belongs to the caller).
    */
  def adpcmEncode(pcm: Array[Byte]): Array[Byte] = {
    if (pcm == null || pcm.length == 0 || pcm.length % 2 != 0) return null
    val n = pcm.length / 2
    if (n % SamplesPerBlock != 0) return null
    def sample(i: Int): Int =
      ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
    val nBlocks = n / SamplesPerBlock
    val out = new Array[Byte](nBlocks * BlockBytes)
    var index = 0
    var i = 0
    var b = 0
    while (b < nBlocks) {
      var pred = sample(i); i += 1
      val base = b * BlockBytes
      out(base) = (pred & 0xff).toByte
      out(base + 1) = ((pred >> 8) & 0xff).toByte
      out(base + 2) = index.toByte
      out(base + 3) = 0
      var k = 0
      while (k < SamplesPerBlock - 1) {
        val s = sample(i); i += 1
        val step = stepTable(index)
        var diff = s - pred
        val sign = if (diff < 0) 8 else 0
        if (diff < 0) diff = -diff
        var delta = 0
        var temp = step
        if (diff >= temp) { delta |= 4; diff -= temp }
        temp >>= 1
        if (diff >= temp) { delta |= 2; diff -= temp }
        temp >>= 1
        if (diff >= temp) delta |= 1
        val nibble = sign | delta
        pred = reconstruct(pred, nibble, step)
        index = clampIndex(index + indexTable(nibble))
        val pos = base + 4 + k / 2
        if (k % 2 == 0) out(pos) = (nibble & 0xf).toByte
        else out(pos) = (out(pos) | ((nibble & 0xf) << 4)).toByte
        k += 1
      }
      b += 1
    }
    out
  }

  /** IMA blocks → PCM16LE mono; null on malformed input (length not a
    * positive multiple of 20, stepIndex > 88, reserved byte set).
    */
  def adpcmDecode(bin: Array[Byte]): Array[Byte] = {
    if (bin == null || bin.length == 0 || bin.length % BlockBytes != 0)
      return null
    val nBlocks = bin.length / BlockBytes
    val out = new Array[Byte](nBlocks * SamplesPerBlock * 2)
    var o = 0
    var b = 0
    while (b < nBlocks) {
      val base = b * BlockBytes
      var pred = ((bin(base) & 0xff) | (bin(base + 1) << 8)).toShort.toInt
      var index = bin(base + 2) & 0xff
      if (index > 88 || bin(base + 3) != 0) return null
      out(o) = (pred & 0xff).toByte
      out(o + 1) = ((pred >> 8) & 0xff).toByte
      o += 2
      var k = 0
      while (k < SamplesPerBlock - 1) {
        val byte = bin(base + 4 + k / 2) & 0xff
        val nibble = if (k % 2 == 0) byte & 0xf else (byte >> 4) & 0xf
        val step = stepTable(index)
        pred = reconstruct(pred, nibble, step)
        index = clampIndex(index + indexTable(nibble))
        out(o) = (pred & 0xff).toByte
        out(o + 1) = ((pred >> 8) & 0xff).toByte
        o += 2
        k += 1
      }
      b += 1
    }
    out
  }

  private def cls: String =
    AdpcmExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"

  case class AdpcmEncode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      AdpcmExpressions.adpcmEncode(input.asInstanceOf[Array[Byte]])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val r = ctx.freshName("enc")
        s"""
           |byte[] $r = $cls.adpcmEncode($bin);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class AdpcmDecode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      AdpcmExpressions.adpcmDecode(input.asInstanceOf[Array[Byte]])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val r = ctx.freshName("dec")
        s"""
           |byte[] $r = $cls.adpcmDecode($bin);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def adpcm_encode(pcm: Column): Column =
    GraftColumnBridge.column(AdpcmEncode(GraftColumnBridge.expression(pcm)))

  def adpcm_decode(bin: Column): Column =
    GraftColumnBridge.column(AdpcmDecode(GraftColumnBridge.expression(bin)))
}
