package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Pins the GIF/LZW codec beyond what q338's oracle sees: interop with
  * the JDK's own GIF reader/writer in BOTH directions, the LZW
  * bit-width boundaries (9→10→11→12 bits) and the forced mid-stream
  * CLEAR, and the hostile-input matrix.
  */
class GifSpec extends SparkSpec {
  import GifExpressions.{gifDecodeGray, gifEncodeGray}

  private def deterministicBytes(n: Int, seed: Int): Array[Byte] = {
    var x = seed.toLong
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >> 33) & 0xff).toByte
    }
  }

  test("lossless round-trip on arbitrary content") {
    val px = deterministicBytes(18 * 16, 1)
    val gif = gifEncodeGray(px, 18, 16)
    assert(gif != null)
    assert(gifDecodeGray(gif).toSeq == px.toSeq)
  }

  test("LZW width boundaries and table overflow round-trip") {
    // a large noisy buffer walks the code width 9→10→11→12 and forces
    // the pre-overflow CLEAR; losslessness across all of it pins the
    // encoder/decoder width schedules to each other
    val px = deterministicBytes(256 * 256, 2)
    val gif = gifEncodeGray(px, 256, 256)
    assert(gifDecodeGray(gif).toSeq == px.toSeq)
    // low-entropy content reaches long chains (KwKwK paths) fast
    val runs = Array.tabulate(128 * 64)(i => (i / 97 % 7).toByte)
    assert(gifDecodeGray(gifEncodeGray(runs, 128, 64)).toSeq == runs.toSeq)
  }

  test("the JDK's own reader decodes our stream exactly") {
    val px = deterministicBytes(33 * 21, 3)
    val img = ImageIO.read(new ByteArrayInputStream(gifEncodeGray(px, 33, 21)))
    assert(img != null && img.getWidth == 33 && img.getHeight == 21)
    val got = for (y <- 0 until 21; x <- 0 until 33)
      yield (img.getRGB(x, y) & 0xff).toByte
    assert(got == px.toSeq)
  }

  test("a foreign JDK-written stream decodes exactly") {
    val px = deterministicBytes(40 * 25, 4)
    val img = new BufferedImage(40, 25, BufferedImage.TYPE_BYTE_GRAY)
    // raster writes, not setRGB — setRGB routes through sRGB conversion
    for (y <- 0 until 25; x <- 0 until 40)
      img.getRaster.setPixel(x, y, Array(px(y * 40 + x) & 0xff))
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "gif", bos))
    val dec = gifDecodeGray(bos.toByteArray)
    assert(dec != null, "JDK stream rejected")
    assert(dec.toSeq == px.toSeq)
  }

  test("hostile inputs decode to NULL, never throw") {
    val px = deterministicBytes(18 * 16, 5)
    val gif = gifEncodeGray(px, 18, 16)
    assert(gifDecodeGray(gif.dropRight(20)) == null) // truncated
    assert(gifDecodeGray(gif.dropRight(1)) == null) // missing trailer
    assert(gifDecodeGray(Array.emptyByteArray) == null)
    assert(gifDecodeGray("GIF87a".getBytes) == null)
    val badSig = gif.clone(); badSig(4) = '6'
    assert(gifDecodeGray(badSig) == null)
    // flipping the interlace flag on a sequential stream must change
    // the row order (the de-interlace path is live), not throw
    val interlaced = gif.clone()
    // image descriptor starts right after header+LSD+GCT(768)
    val idOff = 6 + 7 + 768
    assert(interlaced(idOff) == 0x2c)
    interlaced(idOff + 9) = 0x40.toByte
    val reordered = gifDecodeGray(interlaced)
    assert(reordered != null && reordered.toSeq != px.toSeq)
    // row 0 of a 16-row interlaced image is pass-1 row 0 — unchanged
    assert(reordered.take(18).toSeq == px.take(18).toSeq)
    // a COLOR gif must be rejected by the gray decoder: palette entry
    // used by pixel 0 made chromatic
    val color = gif.clone()
    val e = px(0) & 0xff
    color(6 + 7 + 3 * e + 1) = ((color(6 + 7 + 3 * e + 1) ^ 0x55) & 0xff).toByte
    assert(gifDecodeGray(color) == null)
    // encoder-side validation
    assert(gifEncodeGray(px, 17, 16) == null) // dims mismatch
    assert(gifEncodeGray(null, 18, 16) == null)
    // crafted 65535x65535 descriptor: w*h overflows Int — must be NULL,
    // not a NegativeArraySizeException / multi-GB allocation (ADVICE r12)
    val huge = gif.clone()
    huge(idOff + 5) = 0xff.toByte; huge(idOff + 6) = 0xff.toByte
    huge(idOff + 7) = 0xff.toByte; huge(idOff + 8) = 0xff.toByte
    assert(gifDecodeGray(huge) == null)
    // non-overflowing but over the 64 Mpx cap (16384 x 16384)
    val big = gif.clone()
    big(idOff + 5) = 0x00.toByte; big(idOff + 6) = 0x40.toByte
    big(idOff + 7) = 0x00.toByte; big(idOff + 8) = 0x40.toByte
    assert(gifDecodeGray(big) == null)
  }

  test("header sniffing: image_format/width/height see the gif container") {
    import spark.implicits._
    val px = deterministicBytes(18 * 16, 6)
    val df = Seq((1L, gifEncodeGray(px, 18, 16))).toDF("id", "blob")
      .select(ImageExpressions.image_format(col("blob")).as("fmt"),
        ImageExpressions.image_width(col("blob")).as("w"),
        ImageExpressions.image_height(col("blob")).as("h"))
    val r = df.head()
    assert(r.getString(0) == "gif" && r.getInt(1) == 18 && r.getInt(2) == 16)
  }
}
