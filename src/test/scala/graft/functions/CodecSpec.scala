package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the REAL compressed-payload codecs ([[PngExpressions]],
  * [[CompressExpressions]]) beyond what the q309/q310 oracles exercise:
  * malformation classes one at a time (the oracles only plant truncation),
  * interop with the JDK's own reference streams, and the allocation guards.
  */
class CodecSpec extends SparkSpec {
  import spark.implicits._

  private def pixels(n: Int, seed: Int): Array[Byte] = {
    // deterministic noise without java.util.Random (stable across JVMs)
    val b = new Array[Byte](n)
    var x = seed.toLong
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      b(i) = (x >>> 33).toByte
      i += 1
    }
    b
  }

  // ------------------------------------------------------------- PNG

  test("png: decode(encode(px)) is byte-exact across shapes incl. all filters") {
    for ((w, h) <- Seq((18, 16), (9, 8), (64, 64), (9, 5000), (257, 3))) {
      val px = pixels(w * h, w * 1000 + h)
      val png = PngExpressions.pngEncodeGray(px, w, h)
      assert(png != null, s"encode failed for ${w}x$h")
      val dec = PngExpressions.pngDecodeGray(png)
      assert(dec != null, s"decode failed for ${w}x$h")
      assert(java.util.Arrays.equals(dec, px), s"round-trip mismatch ${w}x$h")
    }
  }

  test("png: javax.imageio agrees with our decoder on our encoder's output") {
    val (w, h) = (18, 16)
    val px = pixels(w * h, 7)
    val png = PngExpressions.pngEncodeGray(px, w, h)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "JDK ImageIO rejected our PNG — not spec-valid")
    assert(img.getWidth == w && img.getHeight == h)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      assert(raster.getSample(x, y, 0) == (px(y * w + x) & 0xff),
        s"pixel ($x,$y) disagrees with ImageIO")
  }

  test("png: every malformation class yields NULL, never a throw") {
    val px = pixels(288, 11)
    val png = PngExpressions.pngEncodeGray(px, 18, 16)
    def dec(b: Array[Byte]) = PngExpressions.pngDecodeGray(b)
    assert(dec(java.util.Arrays.copyOf(png, png.length - 24)) == null,
      "truncated IDAT+IEND")
    assert(dec(java.util.Arrays.copyOf(png, 20)) == null, "header only")
    val badSig = png.clone(); badSig(0) = 0x88.toByte
    assert(dec(badSig) == null, "bad signature")
    val badCrc = png.clone(); badCrc(29) = (badCrc(29) ^ 0x01).toByte
    assert(dec(badCrc) == null, "IHDR CRC flip")
    // corrupt one DEFLATE byte mid-IDAT AND fix that chunk's CRC so only
    // the zlib layer (Adler-32 / Huffman) can catch it
    val mid = png.clone()
    val idatData = 8 + 25 + 8 // sig + IHDR chunk + IDAT len/type
    mid(idatData + 40) = (mid(idatData + 40) ^ 0x10).toByte
    val lenHi = ((mid(8 + 25) & 0xff) << 24) | ((mid(8 + 25 + 1) & 0xff) << 16) |
      ((mid(8 + 25 + 2) & 0xff) << 8) | (mid(8 + 25 + 3) & 0xff)
    val crc = new java.util.zip.CRC32
    crc.update(mid, 8 + 25 + 4, 4 + lenHi)
    val cv = crc.getValue
    mid(idatData + lenHi) = ((cv >>> 24) & 0xff).toByte
    mid(idatData + lenHi + 1) = ((cv >>> 16) & 0xff).toByte
    mid(idatData + lenHi + 2) = ((cv >>> 8) & 0xff).toByte
    mid(idatData + lenHi + 3) = (cv & 0xff).toByte
    assert(dec(mid) == null, "zlib-layer corruption (chunk CRC fixed)")
    // non-grayscale color type
    val rgb = png.clone(); rgb(8 + 8 + 9) = 2
    assert(dec(rgb) == null, "color type (CRC now wrong anyway)")
    // hostile dims: w*h over the 2^26 guard on encode and decode
    assert(PngExpressions.pngEncodeGray(px, 1 << 14, 1 << 13) == null)
  }

  test("png: hostile-input hardening — FDICT, trailing bytes, dim overflow") {
    val px = pixels(288, 11)
    val png = PngExpressions.pngEncodeGray(px, 18, 16)
    def dec(b: Array[Byte]) = PngExpressions.pngDecodeGray(b)
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def be(v: Long): Unit = {
        out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
        out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      be(payload.length.toLong)
      out.write(typ.getBytes("US-ASCII")); out.write(payload)
      val crc = new java.util.zip.CRC32
      crc.update(typ.getBytes("US-ASCII")); crc.update(payload)
      be(crc.getValue)
      out.toByteArray
    }
    // zlib header demanding a preset dictionary (FDICT bit): CMF=0x78
    // FLG=0x20 (bit 5 set, 0x7820 % 31 == 0) + 4-byte DICTID. Before
    // the needsDictionary() guard this HUNG the decode loop (inflate
    // returns 0 forever with needsInput() false).
    val head = java.util.Arrays.copyOf(png, 8 + 25) // sig + IHDR chunk
    val fdict = head ++
      chunk("IDAT", Array(0x78, 0x20, 1, 2, 3, 4).map(_.toByte)) ++
      chunk("IEND", Array.empty[Byte])
    assert(dec(fdict) == null, "FDICT zlib header")
    // trailing bytes after IEND: two different binaries must not decode
    // to identical pixels (the gzip decoder rejects the same class)
    assert(dec(png :+ 0x00.toByte) == null, "trailing byte after IEND")
    // 0xC0000000 × 0xC0000000 wraps the signed-64 product negative —
    // must hit the per-dim cap, not NegativeArraySizeException
    val ihdr = new Array[Byte](13)
    ihdr(0) = 0xC0.toByte; ihdr(4) = 0xC0.toByte // w = h = 0xC0000000
    ihdr(8) = 8 // bit depth; color/compression/filter/interlace all 0
    val evil = png.take(8) ++ chunk("IHDR", ihdr) ++
      chunk("IEND", Array.empty[Byte])
    assert(dec(evil) == null, "dim product overflows signed 64")
  }

  test("png: multi-IDAT split is actually exercised (payload > 1024)") {
    val (w, h) = (64, 64) // 64*65 = 4160 filtered bytes of noise ≈ incompressible
    val px = pixels(w * h, 3)
    val png = PngExpressions.pngEncodeGray(px, w, h)
    val s = new String(png.map(b => (b & 0xff).toChar))
    assert(s.sliding(4).count(_ == "IDAT") >= 2, "expected multiple IDATs")
    assert(java.util.Arrays.equals(PngExpressions.pngDecodeGray(png), px))
  }

  test("png: expressions fuse per-row in a query and null out corrupt rows") {
    val df = (0L until 40L).toDF("id")
      .withColumn("px", expr("concat(" + (0 until 18).map(i =>
        s"unhex(md5(cast(concat(cast(id as string), '|$i') as binary)))")
        .mkString(",") + ")"))
      .withColumn("png", PngExpressions.png_encode_gray(col("px"), 18, 16))
      .withColumn("blob", when(col("id") % 5 === 0,
        expr("substring(png, 1, octet_length(png) - 24)")).otherwise(col("png")))
      .withColumn("dec", PngExpressions.png_decode_gray(col("blob")))
    val rows = df.select(col("id"), (col("dec") <=> col("px")).as("ok"),
      col("dec").isNull.as("dead")).collect()
    assert(rows.forall(r => if (r.getLong(0) % 5 == 0) r.getBoolean(2)
      else r.getBoolean(1)))
  }

  // ------------------------------------------------------------ gzip

  test("gzip: decode(encode(b)) byte-exact; JDK GZIPInputStream interop") {
    for (n <- Seq(0, 1, 13, 4096, 100000)) {
      val data = pixels(n, n + 1)
      val gz = CompressExpressions.gzipEncode(data)
      assert(gz != null)
      assert(java.util.Arrays.equals(CompressExpressions.gzipDecode(gz), data),
        s"round-trip mismatch n=$n")
      val jdk = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gz))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var r = jdk.read(buf)
      while (r > 0) { out.write(buf, 0, r); r = jdk.read(buf) }
      assert(java.util.Arrays.equals(out.toByteArray, data),
        s"JDK GZIPInputStream disagrees n=$n")
    }
  }

  test("gzip: decodes JDK GZIPOutputStream members (incl. no-OS header)") {
    val data = pixels(5000, 42)
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(data); g.close()
    assert(java.util.Arrays.equals(
      CompressExpressions.gzipDecode(bos.toByteArray), data))
  }

  test("gzip: optional header fields (FNAME/FEXTRA/FCOMMENT) are skipped") {
    val data = pixels(300, 9)
    val gz = CompressExpressions.gzipEncode(data)
    // splice FNAME 'x.txt\0' + FEXTRA (len 4) into the header, set FLG bits
    val name = "x.txt".getBytes("US-ASCII") :+ 0.toByte
    val extra = Array[Byte](4, 0, 1, 2, 3, 4) // XLEN=4 LE + 4 payload bytes
    val out = new Array[Byte](gz.length + name.length + extra.length)
    System.arraycopy(gz, 0, out, 0, 10)
    out(3) = (out(3) | 0x04 | 0x08).toByte
    System.arraycopy(extra, 0, out, 10, extra.length)
    System.arraycopy(name, 0, out, 10 + extra.length, name.length)
    System.arraycopy(gz, 10, out, 10 + extra.length + name.length,
      gz.length - 10)
    assert(java.util.Arrays.equals(CompressExpressions.gzipDecode(out), data))
  }

  test("gzip: malformations yield NULL — trailer is actually verified") {
    val data = pixels(1000, 5)
    val gz = CompressExpressions.gzipEncode(data)
    def dec(b: Array[Byte]) = CompressExpressions.gzipDecode(b)
    assert(dec(java.util.Arrays.copyOf(gz, gz.length - 1)) == null,
      "1-byte trailer truncation")
    val crc = gz.clone(); crc(gz.length - 8) = (crc(gz.length - 8) ^ 0x01).toByte
    assert(dec(crc) == null, "CRC flip")
    val isz = gz.clone(); isz(gz.length - 1) = (isz(gz.length - 1) ^ 0x5a).toByte
    assert(dec(isz) == null, "ISIZE flip")
    val res = gz.clone(); res(3) = (res(3) | 0x20).toByte
    assert(dec(res) == null, "reserved FLG bit")
    val cm = gz.clone(); cm(2) = 7
    assert(dec(cm) == null, "unknown CM")
    val trail = java.util.Arrays.copyOf(gz, gz.length + 3)
    assert(dec(trail) == null, "trailing bytes after member")
  }

  // --------------------------------------------------- RGB PNG (q327)

  test("png rgb: decode(encode(px)) byte-exact; bpp=3 filtering actually matters") {
    for ((w, h) <- Seq((8, 12), (5, 7), (64, 48), (1, 300))) {
      val px = pixels(w * h * 3, w * 77 + h)
      val png = PngExpressions.pngEncodeRgb(px, w, h)
      assert(png != null, s"rgb encode failed ${w}x$h")
      val dec = PngExpressions.pngDecodeRgb(png)
      assert(dec != null, s"rgb decode failed ${w}x$h")
      assert(java.util.Arrays.equals(dec, px), s"rgb round-trip ${w}x$h")
    }
  }

  test("png rgb: javax.imageio reads our truecolor PNG with identical samples") {
    val w = 8; val h = 12
    val px = pixels(w * h * 3, 99)
    val png = PngExpressions.pngEncodeRgb(px, w, h)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO rejected our truecolor PNG")
    assert(img.getWidth == w && img.getHeight == h)
    val rgb = new Array[Int](3)
    for (y <- 0 until h; x <- 0 until w) {
      img.getRaster.getPixel(x, y, rgb)
      for (c <- 0 until 3)
        assert(rgb(c) == (px((y * w + x) * 3 + c) & 0xff),
          s"channel $c at ($x,$y)")
    }
  }

  test("png rgb: color-type cross-validation — gray decoder rejects RGB and vice versa") {
    val gpx = pixels(8 * 12, 1)
    val cpx = pixels(8 * 12 * 3, 2)
    val gray = PngExpressions.pngEncodeGray(gpx, 8, 12)
    val rgb = PngExpressions.pngEncodeRgb(cpx, 8, 12)
    assert(PngExpressions.pngDecodeGray(rgb) == null,
      "gray decoder must reject color type 2")
    assert(PngExpressions.pngDecodeRgb(gray) == null,
      "rgb decoder must reject color type 0")
    // and each accepts its own
    assert(java.util.Arrays.equals(PngExpressions.pngDecodeGray(gray), gpx))
    assert(java.util.Arrays.equals(PngExpressions.pngDecodeRgb(rgb), cpx))
  }

  test("png rgb: truncation and bit-depth hostiles yield NULL") {
    val px = pixels(8 * 12 * 3, 4)
    val png = PngExpressions.pngEncodeRgb(px, 8, 12)
    assert(PngExpressions.pngDecodeRgb(
      java.util.Arrays.copyOf(png, png.length - 24)) == null, "truncated")
    // 16-bit depth with a RECOMPUTED chunk CRC: the depth check itself
    // must fire, not just the CRC walk
    val deep = png.clone()
    deep(24) = 16 // IHDR bit-depth byte (8 sig + 8 len/type + 8 w/h)
    val crc = new java.util.zip.CRC32
    crc.update(deep, 12, 4 + 13)
    val cv = crc.getValue
    deep(29) = ((cv >>> 24) & 0xff).toByte
    deep(30) = ((cv >>> 16) & 0xff).toByte
    deep(31) = ((cv >>> 8) & 0xff).toByte
    deep(32) = (cv & 0xff).toByte
    assert(PngExpressions.pngDecodeRgb(deep) == null,
      "16-bit depth with valid CRC must be rejected by validation")
  }

  test("png rgb / channel_sum: stride slices recover per-channel sums") {
    val px = pixels(8 * 12 * 3, 6)
    var r = 0L; var g = 0L; var b = 0L
    for (i <- 0 until px.length / 3) {
      r += px(3 * i) & 0xff
      g += px(3 * i + 1) & 0xff
      b += px(3 * i + 2) & 0xff
    }
    assert(ImageExpressions.channelSum(px, 3, 0) == r)
    assert(ImageExpressions.channelSum(px, 3, 1) == g)
    assert(ImageExpressions.channelSum(px, 3, 2) == b)
    assert(ImageExpressions.channelSum(px, 0, 0) == null)
    assert(ImageExpressions.channelSum(px, 3, -1) == null)
  }
}
