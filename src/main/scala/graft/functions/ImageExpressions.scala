package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Image-header decoding over opaque `binary` media columns — the real
  * (non-stub) slice of the multimodal surface: container formats are public
  * byte layouts, so width/height extraction needs no codec library.
  *
  *  - PNG: 8-byte signature then the IHDR chunk — width/height are the two
  *    big-endian 32-bit words at offsets 16/20 (ISO/IEC 15948 §5.2, §11.2.2).
  *  - JPEG: SOI marker then a segment walk to the first SOFn frame header
  *    (C0–CF minus DHT C4 / JPG C8 / DAC CC), whose payload carries
  *    precision(1) height(2) width(2) big-endian (ITU-T T.81 §B.2.2).
  *    APP0/JFIF and any other leading segments are skipped via their
  *    declared lengths; CRC/entropy data is never touched.
  *
  * The parse runs once per row in generated code and packs
  * (format, width, height) into one long — `fmt(2 bits) | w(31) | h(31)` —
  * decoded back into typed columns with plain bit-op expressions, so the
  * whole decode stays inside whole-stage codegen with a single custom
  * expression. Unrecognized/truncated payloads → NULL.
  */
object ImageExpressions {

  /** 1 = PNG, 2 = JPEG, 3 = GIF (bits 63–62 of the packed long). */
  private final val FmtPng = 1L
  private final val FmtJpeg = 2L
  private final val FmtGif = 3L

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def pack(fmt: Long, w: Long, h: Long): Long =
    (fmt << 62) | (w << 31) | h

  /** Parse PNG/JPEG header dims; 0 when unrecognized (maps to NULL). */
  def dimsPacked(b: Array[Byte]): Long = {
    if (b.length >= 24 &&
        b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16)
      val h = be32(b, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) 0L
      else pack(FmtPng, w, h)
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
               b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      // logical-screen dims, u16 LITTLE-endian (GIF87a spec §17)
      val w = (b(6) & 0xffL) | ((b(7) & 0xffL) << 8)
      val h = (b(8) & 0xffL) | ((b(9) & 0xffL) << 8)
      if (w <= 0 || h <= 0) 0L else pack(FmtGif, w, h)
    } else if (b.length >= 4 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte) {
      var i = 2
      while (i + 1 < b.length) {
        if (b(i) != 0xff.toByte) return 0L
        val marker = b(i + 1) & 0xff
        if (marker == 0xff) { i += 1 } // fill byte
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
        else if (marker == 0xd9 || marker == 0xda) return 0L // EOI/SOS: no SOF seen
        else if (marker >= 0xc0 && marker <= 0xcf &&
                 marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (i + 8 >= b.length) return 0L
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          return if (w <= 0 || h <= 0) 0L else pack(FmtJpeg, w, h)
        } else {
          if (i + 3 >= b.length) return 0L
          val segLen = be16(b, i + 2)
          if (segLen < 2) return 0L
          i += 2 + segLen
        }
      }
      0L
    } else 0L
  }

  /** binary → packed (fmt|w|h) long; NULL when not a parseable PNG/JPEG. */
  case class ImageDimsPacked(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val packed = ImageExpressions.dimsPacked(input.asInstanceOf[Array[Byte]])
      if (packed == 0L) null else java.lang.Long.valueOf(packed)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val packed = ctx.freshName("packed")
        val cls = ImageExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |long $packed = $cls.dimsPacked($bin);
           |if ($packed == 0L) { ${ev.isNull} = true; } else { ${ev.value} = $packed; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  private def packedCol(bin: Column): Column =
    GraftColumnBridge.column(ImageDimsPacked(GraftColumnBridge.expression(bin)))

  /** "png" / "jpeg" / "gif" / NULL. */
  def image_format(bin: Column): Column = {
    val fmt = shiftrightunsigned(packedCol(bin), 62)
    when(fmt === FmtPng, "png").when(fmt === FmtJpeg, "jpeg")
      .when(fmt === FmtGif, "gif")
  }

  def image_width(bin: Column): Column =
    shiftrightunsigned(packedCol(bin), 31).bitwiseAND(0x7fffffffL).cast("int")

  def image_height(bin: Column): Column =
    packedCol(bin).bitwiseAND(0x7fffffffL).cast("int")

  // ------------------------------------------------------ perceptual hash

  /** dHash (Krawetz's difference hash — the standard public perceptual
    * hash) over a RAW 8-bit grayscale pixel buffer, row-major, `w`×`h`:
    *
    *   1. integer box-pool to the canonical 9×8 grid — cell (r, c) is
    *      the INTEGER-DIV mean of the `(h div 8)`×`(w div 9)` block at
    *      rows [r·ch, (r+1)·ch), cols [c·cw, (c+1)·cw) (trailing
    *      remainder rows/cols are ignored, as in a floor resize);
    *   2. bit r·8+c is set iff cell(r, c+1) > cell(r, c) — 8 horizontal
    *      gradient signs per grid row × 8 rows = 64 bits.
    *
    * Every step is exact integer arithmetic on the bytes, so a SQL
    * oracle can recompute the hash bit-for-bit from the same pixel
    * stream — which is what turns the image near-dup gate (Hamming
    * bucketing over these hashes, the q22 pigeonhole machinery) into an
    * exactly-checkable query. NULL when the buffer is shorter than
    * `w`·`h` or the grid does not fit (w < 9 or h < 8). The CODEC step
    * (PNG/JPEG entropy decode to this raw buffer) is REAL as of r11/r12
    * — [[PngExpressions]] (gray + RGB) and [[JpegExpressions]] (gray +
    * YCbCr 4:2:0 color) feed it, q309/q316/q326/q327/q331-gated; the
    * hash over a decoded buffer runs in generated code per row.
    */
  def grayDhash64(b: Array[Byte], w: Int, h: Int): java.lang.Long = {
    // Long-widened guard and cell sums: w.toLong * h cannot wrap (an
    // Int w*h overflows for large declared dims, silently passing the
    // guard), and a Long accumulator keeps cells with area > ~8.4M
    // pixels exact — the documented exact-integer contract.
    if (w < 9 || h < 8 || b.length.toLong < w.toLong * h) return null
    val cw = w / 9
    val ch = h / 8
    val area = cw.toLong * ch
    val cells = new Array[Int](72)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        var sum = 0L
        var y = r * ch
        val yEnd = y + ch
        while (y < yEnd) {
          var x = c * cw
          val xEnd = x + cw
          val rowOff = y * w
          while (x < xEnd) {
            sum += b(rowOff + x) & 0xff
            x += 1
          }
          y += 1
        }
        cells(r * 9 + c) = (sum / area).toInt
        c += 1
      }
      r += 1
    }
    var hash = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r * 9 + c + 1) > cells(r * 9 + c))
          hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** aHash (average hash — the mean-threshold sibling of dHash): box-pool
    * to the canonical 8×8 grid (cw = w div 8, ch = h div 8, integer-div
    * means, remainder ignored), global mean m = (Σ cells) div 64, bit i
    * (i = r·8+c) set iff cell(r, c) > m. Same exact-integer contract as
    * [[grayDhash64]] — SQL-recomputable bit-for-bit. NULL when the
    * buffer is short or w < 8 / h < 8.
    */
  def grayAhash64(b: Array[Byte], w: Int, h: Int): java.lang.Long = {
    // Same Long-widened guard + sums as grayDhash64 (Int w*h / cell
    // sums wrap for large dims, breaking the exact-integer contract).
    if (w < 8 || h < 8 || b.length.toLong < w.toLong * h) return null
    val cw = w / 8
    val ch = h / 8
    val area = cw.toLong * ch
    val cells = new Array[Int](64)
    var total = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        var sum = 0L
        var y = r * ch
        val yEnd = y + ch
        while (y < yEnd) {
          var x = c * cw
          val xEnd = x + cw
          val rowOff = y * w
          while (x < xEnd) {
            sum += b(rowOff + x) & 0xff
            x += 1
          }
          y += 1
        }
        val v = (sum / area).toInt
        cells(r * 8 + c) = v
        total += v
        c += 1
      }
      r += 1
    }
    val mean = (total / 64L).toInt
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (cells(i) > mean) hash |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(hash)
  }

  case class GrayAhash64(child: Expression, w: Int, h: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      ImageExpressions.grayAhash64(input.asInstanceOf[Array[Byte]], w, h)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val v = ctx.freshName("ah")
        val cls = ImageExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |java.lang.Long $v = $cls.grayAhash64($bin, $w, $h);
           |if ($v == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $v.longValue(); }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** 64-bit grayscale average hash of a raw w×h 8-bit buffer. */
  def gray_ahash64(bin: Column, w: Int, h: Int): Column =
    GraftColumnBridge.column(
      GrayAhash64(GraftColumnBridge.expression(bin), w, h))

  case class GrayDhash64(child: Expression, w: Int, h: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      ImageExpressions.grayDhash64(input.asInstanceOf[Array[Byte]], w, h)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val v = ctx.freshName("dh")
        val cls = ImageExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |java.lang.Long $v = $cls.grayDhash64($bin, $w, $h);
           |if ($v == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $v.longValue(); }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** 64-bit grayscale difference hash of a raw w×h 8-bit buffer. */
  def gray_dhash64(bin: Column, w: Int, h: Int): Column =
    GraftColumnBridge.column(
      GrayDhash64(GraftColumnBridge.expression(bin), w, h))

  /** Nearest-neighbor grayscale RESIZE of a raw w×h 8-bit buffer to
    * ow×oh: out(y, x) = in((y·h) div oh, (x·w) div ow) — the standard
    * floor source-index map, exact integer arithmetic end to end, so a
    * SQL oracle can recompute every output byte. NULL on short buffers,
    * non-positive dims, or an output larger than 2^26 pixels (the same
    * guard class as the Long-widened w·h check — a hostile header
    * cannot make the expression allocate unboundedly). This is the
    * thumbnail step of the multimodal surface; the CODEC step (PNG/JPEG
    * entropy decode to the raw buffer) is real as of r11/r12 —
    * [[PngExpressions]]/[[JpegExpressions]].
    */
  def grayResize(b: Array[Byte], w: Int, h: Int,
                 ow: Int, oh: Int): Array[Byte] = {
    if (w <= 0 || h <= 0 || ow <= 0 || oh <= 0
        || b.length.toLong < w.toLong * h
        || ow.toLong * oh > (1L << 26)) return null
    val out = new Array[Byte](ow * oh)
    var y = 0
    while (y < oh) {
      val rowOff = ((y.toLong * h) / oh).toInt * w
      var x = 0
      while (x < ow) {
        out(y * ow + x) = b(rowOff + ((x.toLong * w) / ow).toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  case class GrayResize(child: Expression, w: Int, h: Int, ow: Int, oh: Int)
      extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      ImageExpressions.grayResize(input.asInstanceOf[Array[Byte]], w, h,
        ow, oh)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val v = ctx.freshName("rz")
        val cls = ImageExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |byte[] $v = $cls.grayResize($bin, $w, $h, $ow, $oh);
           |if ($v == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $v; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Nearest-neighbor resize of a raw w×h gray buffer to ow×oh. */
  def gray_resize(bin: Column, w: Int, h: Int, ow: Int, oh: Int): Column =
    GraftColumnBridge.column(
      GrayResize(GraftColumnBridge.expression(bin), w, h, ow, oh))

  /** Sum of the unsigned bytes at positions offset, offset+stride, … —
    * the per-CHANNEL reduction over an interleaved multi-channel buffer
    * (stride = channel count, offset = channel index). Three of these
    * over a decoded RGB buffer are the channel-aware fingerprint the
    * q327 gate hashes: unlike a grayscale mean, they distinguish
    * channel-swapped images. NULL only via null input; an
    * out-of-range offset just sums zero terms. Exact integer
    * arithmetic — a SQL oracle recomputes it from the pixel formula.
    */
  def channelSum(b: Array[Byte], stride: Int, offset: Int): java.lang.Long = {
    if (stride <= 0 || offset < 0) return null
    var i = offset; var s = 0L
    while (i < b.length) { s += b(i) & 0xff; i += stride }
    java.lang.Long.valueOf(s)
  }

  case class ChannelSum(child: Expression, stride: Int, offset: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      ImageExpressions.channelSum(input.asInstanceOf[Array[Byte]], stride,
        offset)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bin => {
        val v = ctx.freshName("cs")
        val cls = ImageExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
        s"""
           |java.lang.Long $v = $cls.channelSum($bin, $stride, $offset);
           |if ($v == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $v.longValue(); }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Per-channel byte sum of an interleaved buffer (see [[channelSum]]). */
  def channel_sum(bin: Column, stride: Int, offset: Int): Column =
    GraftColumnBridge.column(
      ChannelSum(GraftColumnBridge.expression(bin), stride, offset))
}
