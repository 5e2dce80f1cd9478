package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the r9 content fingerprints (gray_ahash64,
  * pcm16_energy_sign_hash) — hand-computed hashes, NULL contracts,
  * interpreted-vs-codegen agreement. E2e gates: q279 / q280.
  */
class ContentFingerprintSpec extends SparkSpec {

  import spark.implicits._

  private def ahash(b: Array[Byte], w: Int, h: Int): Option[Long] = {
    val r = Seq(Tuple1(b)).toDF("px")
      .select(ImageExpressions.gray_ahash64(col("px"), w, h)).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  private def ehash(b: Array[Byte]): Option[Long] = {
    val r = Seq(Tuple1(b)).toDF("px")
      .select(AudioExpressions.pcm16_energy_sign_hash(col("px"))).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  test("ahash: uniform image has no cell above the mean → 0") {
    assert(ahash(Array.fill(64)(100.toByte), 8, 8) === Some(0L))
  }

  test("ahash: one bright cell sets exactly its own bit") {
    // 8×8, cw=ch=1: cell 10 = 255, rest 0; mean = 255/64 = 3 → only
    // cell 10 exceeds it
    val b = Array.fill(64)(0.toByte)
    b(10) = 255.toByte
    assert(ahash(b, 8, 8) === Some(1L << 10))
  }

  test("ahash: NULL on short buffer / w<8 / h<8") {
    assert(ahash(Array.fill(10)(1.toByte), 8, 8) === None)
    assert(ahash(Array.fill(56)(1.toByte), 7, 8) === None)
  }

  test("ahash interpreted equals codegen on a pseudo-random 18x16") {
    val b = Array.tabulate(18 * 16)(i => (i * 131 % 256).toByte)
    assert(ahash(b, 18, 16) === Some(ImageExpressions
      .grayAhash64(b, 18, 16).longValue()))
  }

  test("energy hash: constant amplitude → flat envelope → 0") {
    // 65 frames of 2 samples each, all +1000 (LE: 0xE8 0x03)
    val b = new Array[Byte](65 * 2 * 2)
    var i = 0
    while (i < b.length) { b(i) = 0xe8.toByte; b(i + 1) = 0x03; i += 2 }
    assert(ehash(b) === Some(0L))
  }

  test("energy hash: single loud frame flips only its rise bit") {
    // frame 5 loud: rise into 5 sets bit 4; fall off 5 (frame 6 quieter)
    // clears bit 5 (strict >) — all else flat
    val b = new Array[Byte](65 * 2 * 2) // silence (all zero)
    // frame 5 = samples 10,11 → bytes 20..23: amplitude 512 (0x00 0x02)
    b(21) = 0x02; b(23) = 0x02
    assert(ehash(b) === Some(1L << 4))
  }

  test("energy hash: |-32768| stays exact (no abs overflow)") {
    // all samples -32768 (LE: 0x00 0x80): flat envelope of 32768 → 0
    val b = new Array[Byte](65 * 2 * 2)
    var i = 0
    while (i < b.length) { b(i) = 0x00; b(i + 1) = 0x80.toByte; i += 2 }
    assert(ehash(b) === Some(0L))
  }

  test("energy hash: NULL under 65 samples") {
    assert(ehash(new Array[Byte](64 * 2)) === None)
  }

  test("energy hash interpreted equals codegen on pseudo-random PCM") {
    val b = Array.tabulate(528)(i => (i * 197 % 256).toByte)
    assert(ehash(b) === Some(AudioExpressions
      .pcm16EnergySignHash(b).longValue()))
  }
}
