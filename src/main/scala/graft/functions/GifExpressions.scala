package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** GIF/LZW codec over opaque `binary` media columns — the third REAL
  * image codec next to [[PngExpressions]] (DEFLATE family) and
  * [[JpegExpressions]] (DCT family): GIF's variable-width LZW (the
  * CompuServe GIF87a/89a spec, 1987/1989) is a third, distinct
  * compression family, and unlike JPEG it is LOSSLESS — so the decode
  * is oracle-checkable on ARBITRARY planted content, not only on
  * constructed fixtures.
  *
  * Encoder (`gif_encode_gray`): GIF87a, one image, 256-entry grayscale
  * global color table (entry i = (i,i,i) so index == gray value),
  * non-interlaced, LZW min code size 8, codes packed LSB-first into
  * ≤255-byte sub-blocks, CLEAR emitted up-front and again before the
  * dictionary would overflow, EOI terminated, 0x3B trailer.
  *
  * Decoder (`gif_decode_gray`): accepts GIF87a AND GIF89a, skips
  * extension blocks (0x21 label + sub-blocks — the Graphic Control
  * Extension the JDK writer emits), honors a local color table when
  * present, full variable-width LZW with the KwKwK case, CLEAR/EOI
  * handling and deferred-clear full-table behavior. VALIDATES: exact
  * pixel count w·h, EOI before data exhaustion, trailer present, every
  * REFERENCED palette entry achromatic (r==g==b — it is a gray decoder;
  * the returned bytes are the palette-mapped gray values, so a
  * foreign stream with a permuted gray palette still decodes to
  * VALUES, not indices), and INTERLACED images are de-interlaced (the
  * spec's four-pass row order — the JDK writer emits interlaced
  * streams by default, so a crawl decoder without this path rejects
  * half its input). Any structural violation (truncation, bad code,
  * missing table) → NULL, never a throw. Decoder-side bit-width
  * schedule: the width bumps when the
  * table reaches 2^width entries; the encoder mirrors it one add ahead
  * (it inserts an entry per emitted code, the decoder one per consumed
  * code starting from the second) — `GifSpec` pins both directions
  * against the JDK's own GIF reader/writer across the 9→10→11→12-bit
  * boundaries and a forced mid-stream CLEAR.
  */
object GifExpressions {

  private final val MinCodeSize = 8
  private final val ClearCode = 1 << MinCodeSize // 256
  private final val EoiCode = ClearCode + 1 // 257
  private final val MaxTable = 4096
  // decode allocation cap (64 Mpx), mirroring PngExpressions.MaxPixels
  private final val MaxPixels = 1L << 26

  private def writeLe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  // ------------------------------------------------------------ encode

  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0
    var nbits = 0
    var bits = MinCodeSize + 1
    def put(code: Int): Unit = {
      acc |= (code & ((1 << bits) - 1)) << nbits
      nbits += bits
      while (nbits >= 8) {
        out.write(acc & 0xff); acc >>>= 8; nbits -= 8
      }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = EoiCode + 1
    def reset(): Unit = { dict.clear(); nextCode = EoiCode + 1 }
    put(ClearCode)
    var prefix = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val b = data(i) & 0xff
      val key = (prefix << 8) | b
      val hit = dict.get(key)
      if (hit != null) prefix = hit
      else {
        put(prefix)
        // stay clear of the 4096 edge: re-CLEAR before the table could
        // overflow (deferred-clear reads back fine either way; GifSpec
        // crosses this boundary)
        if (nextCode >= MaxTable - 1) {
          put(ClearCode); reset(); bits = MinCodeSize + 1
        } else {
          dict.put(key, nextCode); nextCode += 1
          // the decoder adds its twin entry one code LATER, so its
          // width bump lands one add later too: bump at 2^bits + 1
          if (nextCode == (1 << bits) + 1 && bits < 12) bits += 1
        }
        prefix = b
      }
      i += 1
    }
    put(prefix)
    put(EoiCode)
    if (nbits > 0) out.write(acc & 0xff)
    out.toByteArray
  }

  /** Grayscale pixels (row-major, one byte per px) → GIF87a; null when
    * the buffer does not match w·h or dims exceed the u16 container
    * fields.
    */
  def gifEncodeGray(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (px == null || w <= 0 || h <= 0 || w > 0xffff || h > 0xffff ||
        px.length != w * h) return null
    val out = new java.io.ByteArrayOutputStream()
    out.write('G'); out.write('I'); out.write('F')
    out.write('8'); out.write('7'); out.write('a')
    writeLe16(out, w); writeLe16(out, h)
    out.write(0xf7) // GCT present | color-res 8 | 256 entries
    out.write(0) // background index
    out.write(0) // no aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    writeLe16(out, 0); writeLe16(out, 0)
    writeLe16(out, w); writeLe16(out, h)
    out.write(0) // no local table, not interlaced
    out.write(MinCodeSize)
    val lzw = lzwEncode(px)
    var p = 0
    while (p < lzw.length) {
      val n = math.min(255, lzw.length - p)
      out.write(n); out.write(lzw, p, n); p += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ------------------------------------------------------------ decode

  /** GIF87a/89a → palette-mapped gray bytes of the FIRST image; null on
    * any structural violation (see object scaladoc).
    */
  def gifDecodeGray(gif: Array[Byte]): Array[Byte] = {
    val b = gif
    if (b == null || b.length < 14) return null
    if (b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
        (b(4) != '7' && b(4) != '9') || b(5) != 'a') return null
    var i = 6
    if (i + 7 > b.length) return null
    val packed = b(i + 4) & 0xff
    i += 7
    var palette: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (i + 3 * n > b.length) return null
      palette = java.util.Arrays.copyOfRange(b, i, i + 3 * n)
      i += 3 * n
    }
    while (i < b.length) {
      (b(i) & 0xff) match {
        case 0x3b => return null // trailer before any image
        case 0x21 => // extension: label + sub-blocks
          i += 2
          var done = false
          while (!done) {
            if (i >= b.length) return null
            val n = b(i) & 0xff; i += 1
            if (n == 0) done = true else i += n
          }
        case 0x2c =>
          if (i + 10 > b.length) return null
          val w = le16(b, i + 5)
          val h = le16(b, i + 7)
          val ipacked = b(i + 9) & 0xff
          i += 10
          val interlaced = (ipacked & 0x40) != 0
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            if (i + 3 * n > b.length) return null
            palette = java.util.Arrays.copyOfRange(b, i, i + 3 * n)
            i += 3 * n
          }
          // dims are attacker-controlled header bytes: w*h up to
          // 65535*65535 overflows Int (negative allocation) and even
          // non-overflowing products force multi-GB buffers from a
          // ~30-byte crafted header — cap pixel count like the PNG
          // path before any allocation (NULL, never a throw)
          if (palette == null || w <= 0 || h <= 0 ||
              w.toLong * h > MaxPixels) return null
          if (i >= b.length) return null
          val minCode = b(i) & 0xff; i += 1
          if (minCode < 2 || minCode > 8) return null
          // concatenate sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            if (i >= b.length) return null
            val n = b(i) & 0xff; i += 1
            if (n == 0) done = true
            else {
              if (i + n > b.length) return null
              data.write(b, i, n); i += n
            }
          }
          // remaining stream must still reach a trailer (truncation check)
          var j = i
          var sawTrailer = false
          while (!sawTrailer && j < b.length) {
            (b(j) & 0xff) match {
              case 0x3b => sawTrailer = true
              case 0x21 =>
                j += 2
                var d2 = false
                while (!d2 && j < b.length) {
                  val n = b(j) & 0xff; j += 1
                  if (n == 0) d2 = true else j += n
                }
                if (!d2) return null
              case _ => return null // a second image is out of scope
            }
          }
          if (!sawTrailer) return null
          val lin = lzwDecode(data.toByteArray, minCode, w * h)
          if (lin == null) return null
          // interlace (GIF87a spec appendix E): decoded rows arrive in
          // four passes — every 8th from 0, every 8th from 4, every 4th
          // from 2, every 2nd from 1
          val idx = if (!interlaced) lin else {
            val re = new Array[Byte](w * h)
            var src = 0
            val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))
            passes.foreach { case (start, step) =>
              var r = start
              while (r < h) {
                System.arraycopy(lin, src * w, re, r * w, w)
                src += 1; r += step
              }
            }
            re
          }
          // gray-map through the palette; referenced entries must be gray
          val out = new Array[Byte](w * h)
          val np = palette.length / 3
          var k = 0
          while (k < idx.length) {
            val e = idx(k) & 0xff
            if (e >= np) return null
            val r = palette(3 * e); val g = palette(3 * e + 1)
            val bl = palette(3 * e + 2)
            if (r != g || g != bl) return null
            out(k) = r
            k += 1
          }
          return out
        case _ => return null
      }
    }
    null
  }

  /** Variable-width GIF-LZW; null unless exactly `expect` indices are
    * produced and an EOI terminates the stream.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        expect: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](MaxTable)
    val suffix = new Array[Byte](MaxTable)
    val stack = new Array[Byte](MaxTable + 1)
    val out = new Array[Byte](expect)
    var outN = 0
    var bits = minCode + 1
    var nextCode = eoi + 1
    var prev = -1
    var acc = 0
    var nbits = 0
    var i = 0
    def emit(code: Int): Boolean = {
      // walk the chain onto a stack, then pop
      var sp = 0
      var c = code
      while (c >= clear) { // composite entry
        if (sp > MaxTable) return false
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
      }
      if (outN + sp + 1 > expect) return false
      out(outN) = c.toByte; outN += 1
      while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
      true
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    while (true) {
      while (nbits < bits) {
        if (i >= data.length) return null // ran out before EOI
        acc |= (data(i) & 0xff) << nbits; nbits += 8; i += 1
      }
      val code = acc & ((1 << bits) - 1)
      acc >>>= bits; nbits -= bits
      if (code == clear) {
        nextCode = eoi + 1; bits = minCode + 1; prev = -1
      } else if (code == eoi) {
        return if (outN == expect) out else null
      } else if (prev == -1) {
        if (code >= clear) return null
        if (!emit(code)) return null
        prev = code
      } else {
        if (code > nextCode) return null
        if (code == nextCode && nextCode >= MaxTable) return null
        if (nextCode < MaxTable) {
          prefix(nextCode) = prev
          // KwKwK (code == nextCode): the entry being added is the one
          // about to be emitted — its first byte is prev's first byte
          suffix(nextCode) = firstByte(if (code == nextCode) prev else code)
          nextCode += 1
        }
        if (!emit(code)) return null
        if (nextCode == (1 << bits) && bits < 12) bits += 1
        prev = code
      }
    }
    null
  }

  private def cls: String =
    GifExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"

  case class GifEncodeGray(child: Expression, w: Int, h: Int)
      extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      GifExpressions.gifEncodeGray(input.asInstanceOf[Array[Byte]], w, h)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val r = ctx.freshName("gif")
        s"""
           |byte[] $r = $cls.gifEncodeGray($bin, $w, $h);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class GifDecodeGray(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      GifExpressions.gifDecodeGray(input.asInstanceOf[Array[Byte]])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val r = ctx.freshName("px")
        s"""
           |byte[] $r = $cls.gifDecodeGray($bin);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def gif_encode_gray(px: Column, w: Int, h: Int): Column =
    GraftColumnBridge.column(
      GifEncodeGray(GraftColumnBridge.expression(px), w, h))

  def gif_decode_gray(gif: Column): Column =
    GraftColumnBridge.column(GifDecodeGray(GraftColumnBridge.expression(gif)))
}
