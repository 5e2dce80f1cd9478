package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the G.711 µ-law codec beyond q345's formula oracle: the
  * all-256-codes requantization involution, the quantization error
  * bound of the encoder, interop with the JDK's own µ-law converter,
  * and the hostile matrix.
  */
class MulawSpec extends SparkSpec {
  import MulawExpressions._

  test("decode∘encode∘decode ≡ decode over all 256 codes") {
    (0 until 256).foreach { c =>
      val v = ulawToLinear(c)
      assert(ulawToLinear(linearToUlaw(v)) == v, s"code $c decode $v")
    }
  }

  test("encoder quantization error bounded by the top-segment step") {
    var s = -32768
    while (s <= 32767) {
      val err = math.abs(ulawToLinear(linearToUlaw(s)) - s)
      assert(err <= 1024, s"sample $s err $err")
      s += 7 // dense-enough sweep, hits both signs and all segments
    }
    // exact at the table points and at zero
    assert(ulawToLinear(linearToUlaw(0)) == 0)
  }

  test("matches the JDK's own µ-law expansion") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    val codes = Array.tabulate[Byte](256)(_.toByte)
    val src = new AudioInputStream(
      new java.io.ByteArrayInputStream(codes),
      new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f,
        false),
      codes.length.toLong)
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f,
      16, 1, 2, 8000f, false)
    val conv = AudioSystem.getAudioInputStream(pcmFmt, src)
    val buf = conv.readAllBytes()
    assert(buf.length == 512)
    (0 until 256).foreach { c =>
      val jdk = ((buf(2 * c) & 0xff) | (buf(2 * c + 1) << 8)).toShort.toInt
      assert(jdk == ulawToLinear(c), s"code $c jdk $jdk ours ${ulawToLinear(c)}")
    }
  }

  test("hostile inputs and column-level codegen") {
    assert(mulawDecode(Array.emptyByteArray) == null)
    assert(mulawEncode(Array[Byte](1)) == null) // odd PCM length
    import spark.implicits._
    val codes = Array.tabulate[Byte](64)(i => (i * 5 + 3).toByte)
    val r = Seq((1L, codes)).toDF("id", "c")
      .select(MulawExpressions.mulaw_decode(col("c")).as("pcm")).head()
    val pcm = r.getAs[Array[Byte]]("pcm")
    assert(pcm.length == 128)
    (0 until 64).foreach { i =>
      val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      assert(v == ulawToLinear(codes(i) & 0xff))
    }
  }
}
