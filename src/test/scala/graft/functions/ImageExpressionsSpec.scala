package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImageExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def png(w: Int, h: Int): Array[Byte] =
    hexBytes("89504E470D0A1A0A" + "0000000D49484452" +
      f"$w%08X$h%08X" + "0802000000" + "DEADBEEF")

  private def jpegSof(marker: String, w: Int, h: Int): Array[Byte] =
    hexBytes("FFD8" + "FFE000104A46494600010100000100010000" +
      marker + "001108" + f"$h%04X$w%04X" + "03012200021101031101")

  test("dimsPacked parses PNG and JPEG, walks segments, rejects garbage") {
    def dims(b: Array[Byte]): Option[(String, Int, Int)] = {
      val p = ImageExpressions.dimsPacked(b)
      if (p == 0L) None
      else Some((if ((p >>> 62) == 1L) "png" else "jpeg",
        ((p >>> 31) & 0x7fffffffL).toInt, (p & 0x7fffffffL).toInt))
    }
    assert(dims(png(640, 480)).contains(("png", 640, 480)))
    assert(dims(jpegSof("FFC0", 33, 7)).contains(("jpeg", 33, 7)))
    // progressive (SOF2) parses too
    assert(dims(jpegSof("FFC2", 5, 9)).contains(("jpeg", 5, 9)))
    // DHT (C4) is NOT a frame header: a stream with only DHT then EOI fails
    assert(dims(hexBytes("FFD8" + "FFC400050000000000" + "FFD9")).isEmpty)
    assert(dims("plain text".getBytes("UTF-8")).isEmpty)
    assert(dims(Array.emptyByteArray).isEmpty)
    // truncated PNG (signature only)
    assert(dims(hexBytes("89504E470D0A1A0A")).isEmpty)
    // truncated JPEG (APP0 length points past the end)
    assert(dims(hexBytes("FFD8FFE00010")).isEmpty)
  }

  test("column API decodes via codegen over a parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("imgexpr").toString
    val rows = Seq(
      (1L, png(12, 34)),
      (2L, jpegSof("FFC0", 56, 78)),
      (3L, "not an image".getBytes("UTF-8")))
    rows.toDF("id", "payload").write.mode("overwrite").parquet(dir)
    val got = spark.read.parquet(dir)
      .select($"id",
        ImageExpressions.image_format($"payload").as("fmt"),
        ImageExpressions.image_width($"payload").as("w"),
        ImageExpressions.image_height($"payload").as("h"))
      .orderBy($"id")
      .as[(Long, Option[String], Option[Int], Option[Int])].collect().toSeq
    assert(got == Seq(
      (1L, Some("png"), Some(12), Some(34)),
      (2L, Some("jpeg"), Some(56), Some(78)),
      (3L, None, None, None)))
  }
}
