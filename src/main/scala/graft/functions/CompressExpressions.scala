package graft.functions

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Real gzip member codec (RFC 1952) over opaque binary columns — the
  * TEXT-modality half of the compressed-payload ingest story (the PNG
  * codec in [[PngExpressions]] is the image half): web-crawl corpora
  * arrive as gzip members (WARC/WET records are per-record gzip), so a
  * pipeline that claims to ingest crawl data must inflate REAL gzip,
  * not pre-extracted text. The encoder emits a spec-valid member —
  * 10-byte header (deterministic MTIME=0, XFL=0, OS=255/unknown), raw
  * DEFLATE body (java.util.zip.Deflater nowrap), CRC-32 + ISIZE little
  * endian trailer — and the decoder performs the full inverse: header
  * parse honoring the FLG bits (FEXTRA/FNAME/FCOMMENT/FHCRC skipping),
  * raw inflate, then VERIFIES both trailer fields against the
  * recovered bytes. Any malformation — bad magic, unknown CM, reserved
  * FLG bits, truncated stream, CRC or ISIZE mismatch, trailing bytes
  * after the trailer, or inflated output beyond the 2^26-byte guard —
  * yields NULL, never a throw or an unbounded allocation.
  *
  * Both directions are row-local byte loops behind single custom
  * expressions with `doGenCode` — they fuse into the scan like every
  * other payload expression; compressed bytes never cross a shuffle
  * unless the query ships them. Oracle note: DEFLATE bytes are
  * implementation-defined, so gates hash only what the decoder
  * RECOVERS (plus sizes/flags derivable spec-side), never encoder
  * output bytes.
  */
object CompressExpressions {

  private final val MaxBytes = 1L << 26

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def putLe32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = (v & 0xff).toByte
    b(i + 1) = ((v >>> 8) & 0xff).toByte
    b(i + 2) = ((v >>> 16) & 0xff).toByte
    b(i + 3) = ((v >>> 24) & 0xff).toByte
  }

  /** data → one spec-valid gzip member. NULL over the 2^26 guard. */
  def gzipEncode(data: Array[Byte]): Array[Byte] = {
    if (data.length.toLong > MaxBytes) return null
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true)
    val body = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    try {
      defl.setInput(data)
      defl.finish()
      val buf = new Array[Byte](4096)
      while (!defl.finished()) body.write(buf, 0, defl.deflate(buf))
    } finally defl.end()
    val z = body.toByteArray
    val out = new Array[Byte](10 + z.length + 8)
    out(0) = 0x1f; out(1) = 0x8b.toByte // magic
    out(2) = 8 // CM = deflate
    out(3) = 0 // FLG: no optional fields
    // MTIME = 0 (no timestamp: deterministic bytes), XFL = 0, OS = 255
    out(9) = 0xff.toByte
    System.arraycopy(z, 0, out, 10, z.length)
    val crc = new CRC32
    crc.update(data)
    putLe32(out, 10 + z.length, crc.getValue)
    putLe32(out, 14 + z.length, data.length.toLong & 0xffffffffL)
    out
  }

  /** One gzip member → original bytes; NULL on ANY malformation. */
  def gzipDecode(gz: Array[Byte]): Array[Byte] = {
    if (gz.length < 18) return null
    if (gz(0) != 0x1f || gz(1) != 0x8b.toByte || gz(2) != 8) return null
    val flg = gz(3) & 0xff
    if ((flg & 0xe0) != 0) return null // reserved FLG bits must be zero
    var p = 10
    if ((flg & 0x04) != 0) { // FEXTRA: 2-byte LE length + payload
      if (p + 2 > gz.length) return null
      val xlen = (gz(p) & 0xff) | ((gz(p + 1) & 0xff) << 8)
      p += 2 + xlen
    }
    if ((flg & 0x08) != 0) { // FNAME: zero-terminated
      while (p < gz.length && gz(p) != 0) p += 1
      p += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT: zero-terminated
      while (p < gz.length && gz(p) != 0) p += 1
      p += 1
    }
    if ((flg & 0x02) != 0) p += 2 // FHCRC
    if (p + 8 > gz.length) return null
    val inf = new Inflater(/*nowrap=*/ true)
    val out = new java.io.ByteArrayOutputStream(math.min(
      (gz.length - p).toLong * 4, MaxBytes).toInt)
    try {
      inf.setInput(gz, p, gz.length - p)
      val buf = new Array[Byte](8192)
      try {
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0) {
            if (inf.needsInput() || inf.needsDictionary()) return null
          } else {
            if (out.size().toLong + n > MaxBytes) return null
            out.write(buf, 0, n)
          }
        }
      } catch { case _: DataFormatException => return null }
      // the raw DEFLATE stream must leave EXACTLY the 8 trailer bytes
      val used = (gz.length - p) - inf.getRemaining
      if (p + used + 8 != gz.length) return null
      val data = out.toByteArray
      val crc = new CRC32
      crc.update(data)
      if (crc.getValue != le32(gz, p + used)) return null
      if ((data.length.toLong & 0xffffffffL) != le32(gz, p + used + 4))
        return null
      data
    } finally inf.end()
  }

  case class GzipEncode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      CompressExpressions.gzipEncode(input.asInstanceOf[Array[Byte]])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val v = ctx.freshName("gz")
        val cls =
          CompressExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |byte[] $v = $cls.gzipEncode($bin);
           |if ($v == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $v; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class GzipDecode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      CompressExpressions.gzipDecode(input.asInstanceOf[Array[Byte]])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val v = ctx.freshName("raw")
        val cls =
          CompressExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |byte[] $v = $cls.gzipDecode($bin);
           |if ($v == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $v; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** bytes → one gzip member (RFC 1952, deterministic header). */
  def gzip_encode(bin: Column): Column =
    GraftColumnBridge.column(GzipEncode(GraftColumnBridge.expression(bin)))

  /** gzip member → bytes, CRC-32 + ISIZE verified; NULL on malformation. */
  def gzip_decode(bin: Column): Column =
    GraftColumnBridge.column(GzipDecode(GraftColumnBridge.expression(bin)))
}
