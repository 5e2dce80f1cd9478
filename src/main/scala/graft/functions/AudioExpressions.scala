package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WAV/RIFF header decoding over opaque `binary` media columns — the audio
  * sibling of [[ImageExpressions]]: the RIFF container is a public byte
  * layout (Microsoft/IBM WAVE spec, RIFF 1991), so rate/channels/width
  * extraction needs no codec library.
  *
  * Layout: "RIFF" + u32le riffSize + "WAVE", then a chunk walk —
  * id(4) + u32le size + payload (padded to even length) — for the
  * "fmt " chunk (audioFormat u16le, channels u16le, sampleRate u32le,
  * byteRate u32le, blockAlign u16le, bitsPerSample u16le) and the "data"
  * chunk, whose DECLARED size is read from the chunk header (the payload
  * itself is never touched — header sniffing must work on a first-bytes
  * prefix of a 100 MB file).
  *
  * The parse runs once per row in generated code and packs
  * (dataBytes, rate, bits, channels) into one long —
  * `dataBytes(33 bits) | rate(20) | bits(6) | channels(4)` — decoded back
  * with plain bit-op expressions, so the whole decode stays inside
  * whole-stage codegen with a single custom expression. Unrecognized /
  * truncated / out-of-range payloads → NULL.
  */
object AudioExpressions {

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** Parse a WAV header; 0 when unrecognized (maps to NULL). */
  def metaPacked(b: Array[Byte]): Long = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return 0L
    var i = 12
    var rate = 0L; var channels = 0; var bits = 0; var haveFmt = false
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (tag(b, i, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return 0L
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
        bits = le16(b, i + 22)
        haveFmt = true
      } else if (tag(b, i, "data")) {
        // declared size only; payload may be absent from the prefix
        if (!haveFmt) return 0L
        if (rate <= 0 || rate >= (1L << 20) || channels <= 0 || channels >= 16 ||
            bits <= 0 || bits >= 64 || size >= (1L << 33)) return 0L
        return (size << 30) | (rate << 10) | (bits.toLong << 4) | channels.toLong
      }
      // chunk payloads are padded to even length; the advance must stay
      // in Long arithmetic — a malformed u32 size near 2^32 truncated to
      // Int would step backwards (ArrayIndexOutOfBounds) or not at all
      // (infinite loop) instead of ending the walk
      val next = i.toLong + 8L + size + (size & 1L)
      if (next <= i || next > b.length) return 0L
      i = next.toInt
    }
    0L
  }

  /** The fmt chunk's audioFormat code (1 = PCM, 6 = A-law, 7 = µ-law…)
    * — the dispatch key an audio INGEST needs before it can pick a
    * decoder; -1 when the container is unrecognized (maps to NULL).
    */
  def formatCode(b: Array[Byte]): Int = {
    if (b == null || metaPacked(b) == 0L) return -1
    var i = 12
    while (i + 8 <= b.length) {
      if (tag(b, i, "fmt ")) return le16(b, i + 8)
      val size = le32(b, i + 4)
      val next = i.toLong + 8L + size + (size & 1L)
      if (next <= i || next > b.length) return -1
      i = next.toInt
    }
    -1
  }

  /** The data chunk's PAYLOAD bytes (bounded by the declared size and
    * what is actually present — a prefix-truncated file yields NULL,
    * never a short read silently passed downstream); NULL when the
    * container is unrecognized. This is the extraction step between
    * container sniffing (metaPacked) and sample decoding
    * (MulawExpressions / AdpcmExpressions): ingest = walk the RIFF,
    * pull the payload, dispatch on formatCode.
    */
  def dataPayload(b: Array[Byte]): Array[Byte] = {
    if (b == null || metaPacked(b) == 0L) return null
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (tag(b, i, "data")) {
        if (size > (1L << 26) || i + 8 + size > b.length) return null
        return java.util.Arrays.copyOfRange(b, i + 8, i + 8 + size.toInt)
      }
      val next = i.toLong + 8L + size + (size & 1L)
      if (next <= i || next > b.length) return null
      i = next.toInt
    }
    null
  }

  case class WavFormatCode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val c = AudioExpressions.formatCode(input.asInstanceOf[Array[Byte]])
      if (c < 0) null else java.lang.Integer.valueOf(c)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val c = ctx.freshName("fmtcode")
        val cls = AudioExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |int $c = $cls.formatCode($bin);
           |if ($c < 0) { ${ev.isNull} = true; } else { ${ev.value} = $c; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class WavData(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      AudioExpressions.dataPayload(input.asInstanceOf[Array[Byte]])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val v = ctx.freshName("wavdata")
        val cls = AudioExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |byte[] $v = $cls.dataPayload($bin);
           |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** fmt audioFormat code (1 PCM, 6 A-law, 7 µ-law); NULL when not WAV. */
  def wav_format_code(bin: Column): Column =
    GraftColumnBridge.column(WavFormatCode(GraftColumnBridge.expression(bin)))

  /** data-chunk payload bytes; NULL when not WAV or payload truncated. */
  def wav_data(bin: Column): Column =
    GraftColumnBridge.column(WavData(GraftColumnBridge.expression(bin)))

  /** binary → packed (dataBytes|rate|bits|channels) long; NULL otherwise. */
  case class AudioMetaPacked(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val packed = AudioExpressions.metaPacked(input.asInstanceOf[Array[Byte]])
      if (packed == 0L) null else java.lang.Long.valueOf(packed)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val packed = ctx.freshName("packed")
        val cls = AudioExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |long $packed = $cls.metaPacked($bin);
           |if ($packed == 0L) { ${ev.isNull} = true; } else { ${ev.value} = $packed; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  private def packedCol(bin: Column): Column =
    GraftColumnBridge.column(AudioMetaPacked(GraftColumnBridge.expression(bin)))

  def audio_format(bin: Column): Column =
    when(packedCol(bin).isNotNull, "wav")

  def audio_sample_rate(bin: Column): Column =
    shiftrightunsigned(packedCol(bin), 10).bitwiseAND((1L << 20) - 1).cast("int")

  def audio_channels(bin: Column): Column =
    packedCol(bin).bitwiseAND(0xfL).cast("int")

  def audio_bits(bin: Column): Column =
    shiftrightunsigned(packedCol(bin), 4).bitwiseAND(0x3fL).cast("int")

  def audio_data_bytes(bin: Column): Column =
    shiftrightunsigned(packedCol(bin), 30)

  /** Declared-payload duration in ms: bytes·8000 div (rate·channels·bits),
    * exact integer arithmetic (Catalyst `IntegralDivide`, same semantics
    * as SQL `div` / DuckDB `//` — Column `/` would be double division,
    * whose float rounding can cross an integer boundary).
    */
  def audio_duration_ms(bin: Column): Column = {
    val p = packedCol(bin)
    val rate = shiftrightunsigned(p, 10).bitwiseAND((1L << 20) - 1)
    val ch = p.bitwiseAND(0xfL)
    val bits = shiftrightunsigned(p, 4).bitwiseAND(0x3fL)
    val bytes = shiftrightunsigned(p, 30)
    GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftColumnBridge.expression(bytes * 8000L),
        GraftColumnBridge.expression(rate * ch * bits)))
  }

  // ------------------------------------------------- content fingerprint

  /** Energy-envelope sign hash over a RAW PCM16LE sample buffer — the
    * audio analog of [[ImageExpressions.grayDhash64]] (the public
    * "acoustic fingerprint" shape: Haitsma–Kalker '02 fingerprints sign
    * energy DIFFERENCES between consecutive frames; this is the 1-band,
    * 65-frame reduction of that construction):
    *
    *   1. the buffer is nSamples = len div 2 little-endian signed
    *      16-bit samples; split into 65 frames of `nSamples div 65`
    *      samples (trailing remainder ignored; NULL when < 65 samples);
    *   2. frame energy = integer-div mean of |sample| over the frame
    *      (|−32768| = 32768 stays exact in int);
    *   3. bit w (0..63) set iff energy(w+1) > energy(w).
    *
    * Exact integer arithmetic end to end, so a SQL oracle recomputes
    * the hash bit-for-bit from the same byte stream — which makes the
    * audio near-dup gate (Hamming bucketing over these hashes) exactly
    * checkable, same as the q277 image gate. Amplitude-scale edits
    * (uniform gain) and local edits move few bits; unrelated signals
    * sit near 32.
    */
  def pcm16EnergySignHash(b: Array[Byte]): java.lang.Long = {
    val nSamples = b.length / 2
    val win = nSamples / 65
    if (win < 1) return null
    val energy = new Array[Int](65)
    var w = 0
    while (w < 65) {
      var sum = 0L
      var i = w * win
      val end = i + win
      while (i < end) {
        val lo = b(2 * i) & 0xff
        val hi = b(2 * i + 1).toInt // sign-extends
        val s = (hi << 8) | lo
        sum += Math.abs(s)
        i += 1
      }
      energy(w) = (sum / win).toInt
      w += 1
    }
    var hash = 0L
    w = 0
    while (w < 64) {
      if (energy(w + 1) > energy(w)) hash |= 1L << w
      w += 1
    }
    java.lang.Long.valueOf(hash)
  }

  case class Pcm16EnergySignHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      AudioExpressions.pcm16EnergySignHash(input.asInstanceOf[Array[Byte]])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val v = ctx.freshName("eh")
        val cls = AudioExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |java.lang.Long $v = $cls.pcm16EnergySignHash($bin);
           |if ($v == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $v.longValue(); }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** 64-bit energy-envelope sign hash of a raw PCM16LE buffer. */
  def pcm16_energy_sign_hash(bin: Column): Column =
    GraftColumnBridge.column(
      Pcm16EnergySignHash(GraftColumnBridge.expression(bin)))
}
