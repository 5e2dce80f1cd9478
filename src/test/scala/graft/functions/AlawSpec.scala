package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the G.711 A-law codec beyond q371's formula oracle: the
  * all-256-codes requantization involution (A-law has no double-zero,
  * so EVERY code is a fixed point — stronger than µ-law's 254), the
  * encoder quantization error bound, interop with the JDK's own A-law
  * converter, and the hostile matrix.
  */
class AlawSpec extends SparkSpec {
  import AlawExpressions._

  test("every one of the 256 codes is a fixed point of encode∘decode") {
    (0 until 256).foreach { c =>
      assert(linearToAlaw(alawToLinear(c)) == c,
        s"code $c decode ${alawToLinear(c)}")
    }
  }

  test("encoder quantization error bounded by the top-segment step") {
    var s = -32768
    while (s <= 32767) {
      val err = math.abs(alawToLinear(linearToAlaw(s)) - s)
      assert(err <= 1024, s"sample $s err $err")
      s += 7
    }
    // zero lands in the smallest positive cell (A-law has no zero code)
    assert(math.abs(alawToLinear(linearToAlaw(0))) <= 8)
  }

  test("matches the JDK's own A-law expansion") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    val codes = Array.tabulate[Byte](256)(_.toByte)
    val src = new AudioInputStream(
      new java.io.ByteArrayInputStream(codes),
      new AudioFormat(AudioFormat.Encoding.ALAW, 8000f, 8, 1, 1, 8000f,
        false),
      codes.length.toLong)
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f,
      16, 1, 2, 8000f, false)
    val conv = AudioSystem.getAudioInputStream(pcmFmt, src)
    val buf = conv.readAllBytes()
    assert(buf.length == 512)
    (0 until 256).foreach { c =>
      val jdk = ((buf(2 * c) & 0xff) | (buf(2 * c + 1) << 8)).toShort.toInt
      assert(jdk == alawToLinear(c),
        s"code $c jdk $jdk ours ${alawToLinear(c)}")
    }
  }

  test("hostile inputs and column-level codegen") {
    assert(alawDecode(Array.emptyByteArray) == null)
    assert(alawEncode(Array[Byte](1)) == null) // odd PCM length
    import spark.implicits._
    val codes = Array.tabulate[Byte](64)(i => (i * 5 + 3).toByte)
    val r = Seq((1L, codes)).toDF("id", "c")
      .select(AlawExpressions.alaw_decode(col("c")).as("pcm")).head()
    val pcm = r.getAs[Array[Byte]]("pcm")
    assert(pcm.length == 128)
    (0 until 64).foreach { i =>
      val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      assert(v == alawToLinear(codes(i) & 0xff))
    }
  }
}
