package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5: bloom-pruned joins and WAV header decoding (q124/q125). */
class BloomAudioSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")

  // ------------------------------------------------- bloom join

  test("bloom semiJoin is row-identical to the plain left_semi join") {
    val dim = orders.filter($"o_orderstatus" === "F")
    val got = BloomJoin.semiJoin(li, dim, "l_orderkey", "o_orderkey")
      .select($"l_orderkey", $"l_linenumber").as[(Long, Int)].collect().sorted
    val want = li.join(dim.select($"o_orderkey".as("l_orderkey")),
        Seq("l_orderkey"), "left_semi")
      .select($"l_orderkey", $"l_linenumber").as[(Long, Int)].collect().sorted
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }

  test("bloom prefilter is a superset of the exact match set, subset of fact") {
    val dim = orders.filter($"o_orderpriority" === "1-URGENT")
    val pre = BloomJoin.prefilter(li, dim, "l_orderkey", "o_orderkey").count()
    val exact = BloomJoin.semiJoin(li, dim, "l_orderkey", "o_orderkey").count()
    assert(exact <= pre, "bloom must never drop a true match")
    assert(pre <= li.count())
    // with a correctly-sized filter the FP rate should be far from 100%:
    // the prefilter must actually prune on this selective dim
    assert(pre < li.count(), "prefilter pruned nothing")
  }

  test("bloom functions reachable from SQL after install") {
    graft.GraftExtensions.install(spark)
    orders.createOrReplaceTempView("bs_orders")
    li.createOrReplaceTempView("bs_li")
    val n = spark.sql(
      """SELECT count(*) FROM bs_li
        |WHERE bloom_might_contain(
        |  (SELECT bloom_agg(o_orderkey, 100000) FROM bs_orders
        |   WHERE o_orderstatus = 'F'),
        |  l_orderkey)""".stripMargin).as[Long].head()
    assert(n > 0)
  }

  // ------------------------------------------------- audio meta

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def wav(rate: Int, ch: Int, bits: Int, dataBytes: Long,
                  leadingJunkChunk: Boolean = false): Array[Byte] = {
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++
      le32(rate) ++ le32(rate.toLong * ch * bits / 8) ++
      le16(ch * bits / 8) ++ le16(bits)
    val junk = if (leadingJunkChunk)
      "LIST".getBytes ++ le32(5) ++ "INFOx".getBytes ++ Array(0.toByte) // odd size → padded
    else Array.emptyByteArray
    "RIFF".getBytes ++ le32(36 + dataBytes) ++ "WAVE".getBytes ++
      junk ++ fmt ++ ("data".getBytes ++ le32(dataBytes))
  }

  test("WAV decode: planted fields round-trip, odd-sized chunk padding walked") {
    import graft.functions.AudioExpressions._
    val rows = Seq(
      (1L, wav(44100, 2, 16, 88200L)),               // 500 ms stereo CD
      (2L, wav(8000, 1, 8, 8000L, leadingJunkChunk = true)), // 1 s, walks LIST
      (3L, "not audio at all".getBytes))
    val df = rows.toDF("id", "payload")
    val got = df.select($"id", audio_format($"payload").as("f"),
        audio_sample_rate($"payload").as("r"), audio_channels($"payload").as("c"),
        audio_bits($"payload").as("b"), audio_duration_ms($"payload").as("ms"))
      .orderBy($"id")
      .as[(Long, Option[String], Option[Int], Option[Int], Option[Int], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      (1L, Some("wav"), Some(44100), Some(2), Some(16), Some(500L)),
      (2L, Some("wav"), Some(8000), Some(1), Some(8), Some(1000L)),
      (3L, None, None, None, None, None)))
  }

  test("WAV payload extraction: format code + data bytes; truncation NULL") {
    import graft.functions.AudioExpressions
    val payload = Array.tabulate(16)(i => (i * 17 + 3).toByte)
    // format-7 (µ-law) wire with the payload attached
    val fmt7 = "RIFF".getBytes ++ le32(52) ++ "WAVE".getBytes ++
      ("fmt ".getBytes ++ le32(16) ++ le16(7) ++ le16(1) ++ le32(8000) ++
        le32(8000) ++ le16(1) ++ le16(8)) ++
      "data".getBytes ++ le32(16) ++ payload
    assert(AudioExpressions.formatCode(fmt7) == 7)
    assert(AudioExpressions.dataPayload(fmt7).toSeq == payload.toSeq)
    // declared 16 bytes but only 12 present: NULL, never a short read
    assert(AudioExpressions.dataPayload(fmt7.dropRight(4)) == null)
    assert(AudioExpressions.formatCode("junk".getBytes) == -1)
    assert(AudioExpressions.dataPayload("junk".getBytes) == null)
    // PCM wire (format 1) still reports its code
    val pcm = wav(8000, 1, 8, 0L)
    assert(AudioExpressions.formatCode(pcm) == 1)
  }

  test("WAV decode rejects data-before-fmt and truncated headers") {
    import graft.functions.AudioExpressions._
    val noFmt = "RIFF".getBytes ++ le32(10) ++ "WAVE".getBytes ++
      "data".getBytes ++ le32(4)
    val truncated = wav(44100, 2, 16, 1000L).take(20)
    val df = Seq((1L, noFmt), (2L, truncated)).toDF("id", "payload")
    val got = df.select(audio_format($"payload")).as[Option[String]].collect()
    assert(got.forall(_.isEmpty))
  }

  test("WAV decode survives malformed u32 chunk sizes (no loop, no throw)") {
    import graft.functions.AudioExpressions._
    // a junk chunk declaring size 0xFFFFFFF8: truncated-to-Int advance
    // would be 8 + (-8) + 0 = stuck (infinite loop); other >2^31 sizes
    // would step i negative and throw in tag(). Both must return NULL.
    def junkWav(junkSize: Long): Array[Byte] =
      "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
        "JUNK".getBytes ++ le32(junkSize) ++ Array.fill(16)(0x20.toByte)
    val rows = Seq(
      (1L, junkWav(0xFFFFFFF8L)),   // advance would be 0 in Int arithmetic
      (2L, junkWav(0x80000000L)),   // advance negative in Int arithmetic
      (3L, junkWav(0xFFFFFFFFL)))   // max u32, odd → padded
    val got = rows.toDF("id", "payload")
      .select(audio_format($"payload")).as[Option[String]].collect()
    assert(got.forall(_.isEmpty))
  }
}
