package graft.functions

import graft.SparkSpec

/** Unit coverage for the baseline JPEG codec ([[JpegExpressions]]) —
  * in particular the AC path the q326 oracle deliberately leaves out
  * (its fixtures are constant blocks; see the codec's object doc):
  *
  *  - constant-block LOSSLESSNESS (the property the oracle hashes):
  *    with DC quant step 8, decode(encode(px)) == px bit-for-bit;
  *  - general-image round-trip against an INDEPENDENT reference
  *    reimplementation of the transform chain (spec-side FDCT →
  *    quantize → dequantize → naive IDCT with the production rounding
  *    formula): any entropy-layer corruption (Huffman tables, DPCM,
  *    run-lengths, ZRL, extend, byte stuffing) or transform drift
  *    shows as a byte mismatch;
  *  - interop: the JDK's own ImageIO JPEG reader must accept our
  *    encoder's output — the proof the stream is a REAL baseline JFIF,
  *    not a private format — and reproduce constant blocks exactly;
  *  - the hostile-input matrix (truncations at every structural layer,
  *    progressive frames, trailing bytes, garbage) → NULL, no throws.
  */
class JpegSpec extends SparkSpec {

  private def pixels(n: Int, seed: Int): Array[Byte] = {
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

  // ---- independent reference transform chain (NOT the production code:
  // straight from the T.81 equations, kept deliberately naive)

  private val zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
  private def qstep(i: Int) = if (i == 0) 8 else 16

  private def refBlockRoundtrip(s: Array[Double]): Array[Int] = {
    def c(k: Int) = if (k == 0) 1.0 / math.sqrt(2.0) else 1.0
    val q = new Array[Int](64)
    for (v <- 0 until 8; u <- 0 until 8) {
      var acc = 0.0
      for (y <- 0 until 8; x <- 0 until 8)
        acc += s(y * 8 + x) * math.cos((2 * x + 1) * u * math.Pi / 16) *
          math.cos((2 * y + 1) * v * math.Pi / 16)
      q(v * 8 + u) =
        math.round(0.25 * c(u) * c(v) * acc / qstep(v * 8 + u)).toInt
    }
    val out = new Array[Int](64)
    val allZero = (1 until 64).forall(i => q(i) == 0)
    if (allZero) {
      val px = math.max(0, math.min(255,
        (((q(0).toLong * qstep(0) + 4) >> 3) + 128).toInt))
      java.util.Arrays.fill(out, px)
    } else {
      for (y <- 0 until 8; x <- 0 until 8) {
        var acc = 0.0
        for (v <- 0 until 8; u <- 0 until 8)
          acc += c(u) * c(v) * (q(v * 8 + u) * qstep(v * 8 + u)).toDouble *
            math.cos((2 * x + 1) * u * math.Pi / 16) *
            math.cos((2 * y + 1) * v * math.Pi / 16)
        val px = math.round(0.25 * acc) + 128
        out(y * 8 + x) = math.max(0L, math.min(255L, px)).toInt
      }
    }
    out
  }

  private def refDecode(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val out = new Array[Byte](w * h)
    for (by <- 0 until bh; bx <- 0 until bw) {
      val s = new Array[Double](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        val sy = math.min(by * 8 + y, h - 1)
        val sx = math.min(bx * 8 + x, w - 1)
        s(y * 8 + x) = (px(sy * w + sx) & 0xff) - 128.0
      }
      val blk = refBlockRoundtrip(s)
      for (y <- 0 until 8; x <- 0 until 8) {
        val oy = by * 8 + y; val ox = bx * 8 + x
        if (oy < h && ox < w) out(oy * w + ox) = blk(y * 8 + x).toByte
      }
    }
    out
  }

  private def constantImage(w: Int, h: Int, blockVals: Array[Int])
      : Array[Byte] = {
    val bw = (w + 7) / 8
    Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      blockVals(((y / 8) * bw + (x / 8)) % blockVals.length).toByte
    }
  }

  test("jpeg: constant-block images are exactly lossless (the q326 contract)") {
    for ((w, h, vals) <- Seq(
      (16, 16, Array(0, 255, 127, 128)),
      (8, 8, Array(1)),
      (24, 16, Array(17, 201, 33, 250, 64, 99)),
      (20, 12, Array(200)))) { // non-8-aligned: replicate-pad still constant
      val px = constantImage(w, h, vals)
      val jpg = JpegExpressions.jpegEncodeGray(px, w, h)
      assert(jpg != null, s"encode failed ${w}x$h")
      val dec = JpegExpressions.jpegDecodeGray(jpg)
      assert(dec != null, s"decode failed ${w}x$h")
      assert(java.util.Arrays.equals(dec, px), s"not lossless ${w}x$h")
    }
  }

  test("jpeg: general images round-trip to the independent reference chain") {
    // the production IDCT is the integer islow transform (r13 — what
    // makes the q350 SQL oracle possible); the deliberately-naive
    // double reference chain is the IDEAL transform, so agreement is
    // within the islow fixed-point rounding bound (±1), not bit-exact
    for ((w, h) <- Seq((16, 16), (8, 8), (32, 24), (17, 9), (40, 40))) {
      val px = pixels(w * h, w * 31 + h)
      val jpg = JpegExpressions.jpegEncodeGray(px, w, h)
      assert(jpg != null)
      val dec = JpegExpressions.jpegDecodeGray(jpg)
      assert(dec != null, s"decode failed ${w}x$h")
      val ref = refDecode(px, w, h)
      var i = 0
      while (i < w * h) {
        val d = math.abs((dec(i) & 0xff) - (ref(i) & 0xff))
        assert(d <= 1, s"islow vs ideal IDCT off by $d at $i (${w}x$h)")
        i += 1
      }
    }
  }

  test("jpeg: ImageIO (the JDK's own libjpeg) accepts our stream; constant blocks exact") {
    val px = constantImage(16, 16, Array(12, 240, 77, 180))
    val jpg = JpegExpressions.jpegEncodeGray(px, 16, 16)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    assert(img != null, "ImageIO rejected our JFIF stream")
    assert(img.getWidth == 16 && img.getHeight == 16)
    val got = new Array[Int](1)
    for (y <- 0 until 16; x <- 0 until 16) {
      img.getRaster.getPixel(x, y, got)
      assert(got(0) == (px(y * 16 + x) & 0xff),
        s"ImageIO pixel ($x,$y) = ${got(0)} != ${px(y * 16 + x) & 0xff}")
    }
  }

  test("jpeg: ImageIO agrees within ±1 on general images (IDCT rounding)") {
    val w = 24; val h = 16
    val px = pixels(w * h, 7)
    val jpg = JpegExpressions.jpegEncodeGray(px, w, h)
    val ours = JpegExpressions.jpegDecodeGray(jpg)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    val got = new Array[Int](1)
    for (y <- 0 until h; x <- 0 until w) {
      img.getRaster.getPixel(x, y, got)
      val d = math.abs(got(0) - (ours(y * w + x) & 0xff))
      assert(d <= 1, s"ImageIO vs ours at ($x,$y): ${got(0)} vs " +
        s"${ours(y * w + x) & 0xff}")
    }
  }

  test("jpeg: hostile inputs decode NULL, never throw") {
    val px = pixels(256, 3)
    val jpg = JpegExpressions.jpegEncodeGray(px, 16, 16)
    // truncation sweep: cut through EOI, entropy data, SOS, DHT, SOF, DQT
    for (cut <- Seq(1, 2, 5, 10, 20, 50, 100, 200, jpg.length - 4)) {
      if (cut < jpg.length) {
        val t = java.util.Arrays.copyOf(jpg, jpg.length - cut)
        assert(JpegExpressions.jpegDecodeGray(t) == null,
          s"truncated by $cut must be NULL")
      }
    }
    // trailing garbage after EOI
    assert(JpegExpressions.jpegDecodeGray(jpg :+ 0x00.toByte) == null)
    // progressive frame: patch SOF0 (FFC0) to SOF2 (FFC2)
    val prog = jpg.clone()
    var i = 2
    var patched = false
    while (i + 1 < prog.length && !patched) {
      if (prog(i) == 0xff.toByte && prog(i + 1) == 0xc0.toByte) {
        prog(i + 1) = 0xc2.toByte; patched = true
      }
      i += 1
    }
    assert(patched)
    assert(JpegExpressions.jpegDecodeGray(prog) == null,
      "progressive SOF must be rejected")
    // not a JPEG at all / empty / tiny
    assert(JpegExpressions.jpegDecodeGray(Array[Byte]()) == null)
    assert(JpegExpressions.jpegDecodeGray(Array[Byte](1, 2, 3)) == null)
    assert(JpegExpressions.jpegDecodeGray(pixels(500, 9)) == null)
    // encoder guards
    assert(JpegExpressions.jpegEncodeGray(px, 0, 16) == null)
    assert(JpegExpressions.jpegEncodeGray(px, 16, -1) == null)
    assert(JpegExpressions.jpegEncodeGray(pixels(10, 1), 16, 16) == null)
    assert(JpegExpressions.jpegEncodeGray(px, 1 << 14, 1 << 14) == null)
  }

  // ------------------------------------------------- color (4:2:0, q331)

  private def grayAsRgb(px: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](px.length * 3)
    for (i <- px.indices) {
      out(3 * i) = px(i); out(3 * i + 1) = px(i); out(3 * i + 2) = px(i)
    }
    out
  }

  test("jpeg color: gray-valued RGB is exactly lossless through 4:2:0 (q331)") {
    for ((w, h, vals) <- Seq(
      (16, 16, Array(0, 255, 127, 128)),
      (32, 16, Array(9, 244, 61, 180, 33, 201, 5, 99)),
      (20, 12, Array(77)))) { // non-16-aligned: MCU replicate pad
      val rgb = grayAsRgb(constantImage(w, h, vals))
      val jpg = JpegExpressions.jpegEncodeColor(rgb, w, h)
      assert(jpg != null, s"color encode failed ${w}x$h")
      val dec = JpegExpressions.jpegDecodeRgb(jpg)
      assert(dec != null, s"color decode failed ${w}x$h")
      assert(java.util.Arrays.equals(dec, rgb), s"color not lossless ${w}x$h")
    }
  }

  test("jpeg color: per-pixel-random GRAY-valued images are lossy only through the Y transform") {
    // chroma stays exactly 128 (the JFIF rows sum to 0), so the color
    // pipeline must agree byte-for-byte with the GRAYSCALE pipeline on
    // the same Y plane — the structural proof that chroma adds nothing
    // on gray content
    val w = 24; val h = 16
    val g = pixels(w * h, 21)
    val viaGray = JpegExpressions.jpegDecodeGray(
      JpegExpressions.jpegEncodeGray(g, w, h))
    val viaColor = JpegExpressions.jpegDecodeRgb(
      JpegExpressions.jpegEncodeColor(grayAsRgb(g), w, h))
    assert(viaGray != null && viaColor != null)
    for (i <- 0 until w * h; c <- 0 until 3)
      assert((viaColor(3 * i + c) & 0xff) == (viaGray(i) & 0xff),
        s"color pipeline diverged from gray at px $i ch $c")
  }

  test("jpeg color: real color content round-trips within quantization error") {
    def mad(rgb: Array[Byte], w: Int, h: Int): Double = {
      val jpg = JpegExpressions.jpegEncodeColor(rgb, w, h)
      val dec = JpegExpressions.jpegDecodeRgb(jpg)
      assert(dec != null)
      (0 until w * h * 3)
        .map(i => math.abs((dec(i) & 0xff) - (rgb(i) & 0xff))).sum.toDouble /
        (w * h * 3)
    }
    // smooth gradient — the content 4:2:0 is designed for: chroma varies
    // slowly, so subsample+upsample error is a couple of counts and the
    // quant error is bounded by half a step
    val w = 32; val h = 32
    val grad = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      grad((y * w + x) * 3) = (x * 8).toByte
      grad((y * w + x) * 3 + 1) = (y * 8).toByte
      grad((y * w + x) * 3 + 2) = ((x + y) * 4).toByte
    }
    val gm = mad(grad, w, h)
    assert(gm < 12.0, s"gradient mean abs error $gm")
    // white-noise chroma is 4:2:0's designed-in worst case (the 2x2
    // average destroys per-pixel chroma): the error is LARGE and that
    // is correct behavior — pin only a sanity ceiling
    val nm = mad(pixels(16 * 16 * 3, 33), 16, 16)
    assert(nm < 64.0, s"noise mean abs error $nm implausibly high")
  }

  test("jpeg color: ImageIO reads our 4:2:0 stream; exact on gray-valued content") {
    val rgb = grayAsRgb(constantImage(16, 16, Array(12, 240, 77, 180)))
    val jpg = JpegExpressions.jpegEncodeColor(rgb, 16, 16)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img != null, "ImageIO rejected our color JFIF")
    assert(img.getWidth == 16 && img.getHeight == 16)
    val got = new Array[Int](3)
    for (y <- 0 until 16; x <- 0 until 16) {
      img.getRaster.getPixel(x, y, got)
      for (c <- 0 until 3)
        assert(got(c) == (rgb((y * 16 + x) * 3 + c) & 0xff),
          s"ImageIO channel $c at ($x,$y)")
    }
  }

  test("jpeg: our decoder reads ImageIO's ENCODER output (foreign Huffman tables)") {
    // the reverse interop: a stream we did not produce — JDK-libjpeg
    // Annex-K tables, its own quantization — must decode, and agree
    // with ImageIO's own read-back of the same bytes within IDCT
    // rounding (same coefficients on both sides)
    val w = 24; val h = 16
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val px = pixels(w * h, 44)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setPixel(x, y, Array(px(y * w + x) & 0xff))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val foreign = bos.toByteArray
    val ours = JpegExpressions.jpegDecodeGray(foreign)
    assert(ours != null, "failed to decode a JDK-encoded baseline JPEG")
    val theirs = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(foreign))
    val got = new Array[Int](1)
    for (y <- 0 until h; x <- 0 until w) {
      theirs.getRaster.getPixel(x, y, got)
      val d = math.abs(got(0) - (ours(y * w + x) & 0xff))
      assert(d <= 1, s"foreign-stream decode disagrees at ($x,$y): " +
        s"${got(0)} vs ${ours(y * w + x) & 0xff}")
    }
  }

  test("jpeg color: hostile matrix — truncation, cross-decoder rejection") {
    val rgb = grayAsRgb(pixels(256, 55))
    val jpg = JpegExpressions.jpegEncodeColor(rgb, 16, 16)
    for (cut <- Seq(1, 5, 20, 60, 150, jpg.length - 4)) {
      if (cut < jpg.length)
        assert(JpegExpressions.jpegDecodeRgb(
          java.util.Arrays.copyOf(jpg, jpg.length - cut)) == null,
          s"color truncated by $cut must be NULL")
    }
    assert(JpegExpressions.jpegDecodeGray(jpg) == null,
      "gray decoder must reject a 3-component frame")
    val gray = JpegExpressions.jpegEncodeGray(pixels(256, 56), 16, 16)
    assert(JpegExpressions.jpegDecodeRgb(gray) == null,
      "rgb decoder must reject a 1-component frame")
    assert(JpegExpressions.jpegEncodeColor(pixels(10, 1), 16, 16) == null)
  }

  test("jpeg: DC shortcut equals the full islow path on DC-only blocks") {
    // the decoder takes the exact-integer dcval shortcut when every AC
    // coefficient is zero; the q350 SQL oracle always runs the full
    // butterfly — they must agree on every DC value or a DC-only block
    // would hash-mismatch. Force the full path by planting one AC
    // coefficient at zero... which the shortcut test also covers: a
    // fixture whose 63 AC driving bytes map to 0 (byte 4 → 4%9-4=0)
    // decodes via the shortcut; the same DC with AC=+1 then -1 at one
    // position brackets it within the islow rounding bound.
    def fixture(dcByte: Int, acByte: Int): Array[Byte] = {
      val b = Array.fill[Byte](64)(4.toByte) // AC driving byte 4 → 0
      b(0) = dcByte.toByte
      b(1) = acByte.toByte
      JpegExpressions.jpegBlockFixture(b)
    }
    for (dcByte <- Seq(0, 17, 59, 60, 61, 119, 200, 255)) {
      val shortcut = JpegExpressions.jpegDecodeGray(fixture(dcByte, 4))
      assert(shortcut != null && shortcut.distinct.length == 1,
        s"DC-only block must decode constant (dcByte=$dcByte)")
      val dc = (dcByte % 120 - 60) * 8 // dequantized DC
      val expect = math.max(0, math.min(255, ((dc + 4) >> 3) + 128))
      assert((shortcut(0) & 0xff) == expect, s"dcByte=$dcByte")
      // ±1 AC at position 1 perturbs the block smoothly around the
      // shortcut value (full islow path, same DC term)
      for (acByte <- Seq(5, 3)) { // → qcoef +1 / −1
        val full = JpegExpressions.jpegDecodeGray(fixture(dcByte, acByte))
        assert(full != null && full.distinct.length > 1)
        val mean = full.map(_ & 0xff).sum / 64.0
        assert(math.abs(mean - expect) <= 2.0,
          s"AC-perturbed mean drifted: dcByte=$dcByte acByte=$acByte")
      }
    }
  }

  test("jpeg: block fixture is a real wire — ImageIO decodes it within ±1") {
    // AC-bearing single-block fixture (the q350 construction): the JDK's
    // own decoder must accept the wire and agree with our islow decode
    // to within the IDCT-implementation bound
    val bytes = Array.tabulate(64)(i => ((i * 37 + 11) % 256).toByte)
    val jpg = JpegExpressions.jpegBlockFixture(bytes)
    assert(jpg != null)
    val dec = JpegExpressions.jpegDecodeGray(jpg)
    assert(dec != null && dec.length == 64)
    // the fixture must actually exercise the AC path (not constant)
    assert(dec.distinct.length > 1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img != null && img.getWidth == 8 && img.getHeight == 8)
    val got = new Array[Int](1)
    for (y <- 0 until 8; x <- 0 until 8) {
      img.getRaster.getPixel(x, y, got)
      val d = math.abs(got(0) - (dec(y * 8 + x) & 0xff))
      assert(d <= 1, s"ImageIO vs islow at ($x,$y): ${got(0)} vs " +
        s"${dec(y * 8 + x) & 0xff}")
    }
    assert(JpegExpressions.jpegBlockFixture(bytes.take(63)) == null)
    assert(JpegExpressions.jpegBlockFixture(null) == null)
  }

  test("jpeg: expression round-trip inside a Spark plan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, pixels(256, 11)), (2L, pixels(256, 12)))
      .toDF("id", "px")
      .withColumn("jpg", JpegExpressions.jpeg_encode_gray(col("px"), 16, 16))
      .withColumn("dec", JpegExpressions.jpeg_decode_gray(col("jpg")))
      .withColumn("fmt", ImageExpressions.image_format(col("jpg")))
      .withColumn("w", ImageExpressions.image_width(col("jpg")))
    val rows = df.select("id", "px", "dec", "fmt", "w")
      .orderBy(col("id")).collect()
    rows.foreach { r =>
      val px = r.getAs[Array[Byte]]("px")
      val dec = r.getAs[Array[Byte]]("dec")
      assert(dec != null)
      val ref = refDecode(px, 16, 16)
      (0 until 256).foreach { i => // islow vs ideal: ±1 (see above)
        assert(math.abs((dec(i) & 0xff) - (ref(i) & 0xff)) <= 1)
      }
      assert(r.getAs[String]("fmt") == "jpeg")
      assert(r.getAs[Int]("w") == 16)
    }
  }
}
