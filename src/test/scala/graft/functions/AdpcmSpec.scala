package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the IMA ADPCM codec beyond what q337's constant-block oracle can
  * see: the ADAPTIVE path (step/index walking) against an independent
  * straight-line reference decoder, reconstruction quality on a smooth
  * signal, and the hostile-input matrix.
  */
class AdpcmSpec extends SparkSpec {
  import AdpcmExpressions.{adpcmDecode, adpcmEncode, BlockBytes, SamplesPerBlock}

  // ---- independent reference decoder (re-derived from the published
  // IMA tables; deliberately structured differently from the engine's:
  // per-sample function over explicit state, no shared helpers)
  private val steps = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val idxAdj = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def referenceDecode(bin: Array[Byte]): Array[Short] = {
    val out = Array.newBuilder[Short]
    for (base <- 0 until bin.length by BlockBytes) {
      var pred = ((bin(base) & 0xff) | (bin(base + 1) << 8)).toShort.toInt
      var idx = bin(base + 2) & 0xff
      out += pred.toShort
      for (k <- 0 until SamplesPerBlock - 1) {
        val nib = if (k % 2 == 0) bin(base + 4 + k / 2) & 0xf
          else (bin(base + 4 + k / 2) >> 4) & 0xf
        val st = steps(idx)
        val mag = (st >> 3) + (if ((nib & 4) != 0) st else 0) +
          (if ((nib & 2) != 0) st >> 1 else 0) +
          (if ((nib & 1) != 0) st >> 2 else 0)
        pred = math.max(-32768,
          math.min(32767, if ((nib & 8) != 0) pred - mag else pred + mag))
        idx = math.max(0, math.min(88, idx + idxAdj(nib & 7)))
        out += pred.toShort
      }
    }
    out.result()
  }

  private def pcmBytes(samples: Array[Short]): Array[Byte] = {
    val b = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      b(2 * i) = (samples(i) & 0xff).toByte
      b(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    b
  }

  private def toSamples(pcm: Array[Byte]): Array[Short] =
    pcm.grouped(2).map(p => ((p(0) & 0xff) | (p(1) << 8)).toShort).toArray

  private def deterministicSignal(n: Int, seed: Int): Array[Short] = {
    // reproducible pseudo-noise without java Random: an LCG walk
    var x = seed.toLong
    Array.fill(n) {
      x = (x * 6364136223846793005L + 1442695040888963407L)
      ((x >> 33) & 0xffff).toShort
    }
  }

  test("decode matches the independent reference on adaptive content") {
    val sig = deterministicSignal(SamplesPerBlock * 6, seed = 42)
    val enc = adpcmEncode(pcmBytes(sig))
    assert(enc != null && enc.length == 6 * BlockBytes)
    assert(toSamples(adpcmDecode(enc)).toSeq ==
      referenceDecode(enc).toSeq)
  }

  test("constant blocks round-trip losslessly (the q337 construction)") {
    val levels = Array[Short](1234, -32768, 32767, 0)
    val sig = Array.tabulate[Short](SamplesPerBlock * 4)(i =>
      levels(i / SamplesPerBlock))
    val enc = adpcmEncode(pcmBytes(sig))
    assert(toSamples(adpcmDecode(enc)).toSeq == sig.toSeq)
  }

  test("smooth-signal reconstruction error stays small after warm-up") {
    val sig = Array.tabulate[Short](SamplesPerBlock * 4)(i =>
      (8000 + 3 * i).toShort) // slope 3/sample — well inside step range
    val dec = toSamples(adpcmDecode(adpcmEncode(pcmBytes(sig))))
    val err = sig.zip(dec).drop(8).map { case (a, b) => math.abs(a - b) }.max
    assert(err <= 16, s"max error $err")
  }

  test("hostile inputs decode to NULL, never throw") {
    val ok = adpcmEncode(pcmBytes(deterministicSignal(SamplesPerBlock, 7)))
    assert(adpcmDecode(ok.dropRight(3)) == null) // partial block
    assert(adpcmDecode(Array.emptyByteArray) == null)
    val badIdx = ok.clone(); badIdx(2) = 89.toByte
    assert(adpcmDecode(badIdx) == null) // step index out of range
    val badRes = ok.clone(); badRes(3) = 1.toByte
    assert(adpcmDecode(badRes) == null) // reserved byte set
    assert(adpcmEncode(Array[Byte](1)) == null) // odd byte count
    assert(adpcmEncode(pcmBytes(new Array[Short](5))) == null) // not a block
  }

  test("column expressions round-trip under codegen") {
    import spark.implicits._
    val sig = deterministicSignal(SamplesPerBlock * 2, seed = 9)
    val df = Seq((1L, pcmBytes(sig))).toDF("id", "pcm")
      .withColumn("enc", AdpcmExpressions.adpcm_encode(col("pcm")))
      .withColumn("dec",
        AdpcmExpressions.adpcm_decode(col("enc")))
    val row = df.select(col("enc"), col("dec")).head()
    assert(toSamples(row.getAs[Array[Byte]]("dec")).toSeq ==
      referenceDecode(row.getAs[Array[Byte]]("enc")).toSeq)
  }
}
