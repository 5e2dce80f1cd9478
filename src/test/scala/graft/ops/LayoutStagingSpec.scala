package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorExpressions
import graft.functions.VectorExpressions.{MortonInterleave, MortonInterleave3}
import graft.streaming.Staging

/** Unit pins for the r10 layout + staging primitives: the Morton-curve
  * properties q302's pruning claim rests on, and the one-pass slice
  * stager's exact equivalence to the N-filter loop it replaced
  * (including the empty-slice template path and in-file sort order —
  * the properties the streaming gates assume but only exercise
  * end-to-end).
  */
class LayoutStagingSpec extends SparkSpec {
  import spark.implicits._

  test("morton zkey is componentwise monotone on the 16x16 grid") {
    for (a <- 0L until 16L; b <- 0L until 16L) {
      if (a > 0)
        assert(MortonInterleave.interleave(a, b) >
          MortonInterleave.interleave(a - 1, b))
      if (b > 0)
        assert(MortonInterleave.interleave(a, b) >
          MortonInterleave.interleave(a, b - 1))
    }
  }

  test("zWindow brackets every point of its box (superset property)") {
    val (zlo, zhi) = Layout.zWindow(3, 5, 9, 12)
    for (a <- 3L to 9L; b <- 5L to 12L) {
      val z = MortonInterleave.interleave(a, b)
      assert(z >= zlo && z <= zhi, s"($a,$b)")
    }
  }

  test("morton3 interleave matches the per-bit reference formula") {
    def ref(a: Long, b: Long, c: Long): Long =
      (0 until 21).map { i =>
        (((a >> i) & 1L) << (3 * i)) | (((b >> i) & 1L) << (3 * i + 1)) |
          (((c >> i) & 1L) << (3 * i + 2))
      }.reduce(_ | _)
    val probes = Seq[(Long, Long, Long)](
      (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1), (255, 0, 0),
      (0, 255, 0), (0, 0, 255), (255, 255, 255), (0x1fffffL, 0x1fffffL,
        0x1fffffL), (123456, 654321, 777777), (1, 2, 4))
    probes.foreach { case (a, b, c) =>
      assert(MortonInterleave3.interleave3(a, b, c) === ref(a, b, c),
        s"($a,$b,$c)")
    }
    // bits above 21 per dim are masked off, key stays non-negative
    assert(MortonInterleave3.interleave3(0x200000L, 0, 0) === 0L)
    assert(MortonInterleave3.interleave3(0x1fffffL, 0x1fffffL,
      0x1fffffL) === 0x7fffffffffffffffL)
  }

  test("morton3 zkey is componentwise monotone on the 8x8x8 grid") {
    for (a <- 0L until 8L; b <- 0L until 8L; c <- 0L until 8L) {
      if (a > 0)
        assert(MortonInterleave3.interleave3(a, b, c) >
          MortonInterleave3.interleave3(a - 1, b, c))
      if (b > 0)
        assert(MortonInterleave3.interleave3(a, b, c) >
          MortonInterleave3.interleave3(a, b - 1, c))
      if (c > 0)
        assert(MortonInterleave3.interleave3(a, b, c) >
          MortonInterleave3.interleave3(a, b, c - 1))
    }
  }

  test("zWindow3 brackets every point of its box (superset property)") {
    val (zlo, zhi) = Layout.zWindow3(3, 5, 2, 9, 12, 7)
    for (a <- 3L to 9L; b <- 5L to 12L; c <- 2L to 7L) {
      val z = MortonInterleave3.interleave3(a, b, c)
      assert(z >= zlo && z <= zhi, s"($a,$b,$c)")
    }
  }

  test("morton3 column expression agrees with the driver-side object") {
    val df = spark.range(0, 64)
      .selectExpr("id % 4 AS a", "(id div 4) % 4 AS b", "(id div 16) % 4 AS c")
      .select(col("a"), col("b"), col("c"),
        VectorExpressions.morton_interleave3(col("a"), col("b"), col("c"))
          .as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(3) === MortonInterleave3.interleave3(
        r.getLong(0), r.getLong(1), r.getLong(2)))
    }
  }

  test("bucket is a clamped power-of-two-width shift") {
    spark.range(0, 5000, 37)
      .select(col("id"), Layout.bucket(col("id"), 4).as("bk"))
      .collect().foreach { r =>
        assert(r.getLong(1) === math.min(r.getLong(0) >> 4, 255L))
      }
  }

  test("stageSlices == the N-filter loop, incl. an empty slice file") {
    // span 0..400 over n=4; slice 2 ([200,300)) deliberately empty
    val ords = Seq(5L, 10L, 99L, 100L, 150L, 199L, 350L, 399L, 320L)
    val df = ords.zipWithIndex.map { case (o, i) => (i.toLong, o) }
      .toDF("event_id", "ord")
    val srcDir = Files.createTempDirectory("staging_spec_src")
    val tmp = Files.createTempDirectory("staging_spec_tmp")
    val (lo, span, n) = (0L, 400L, 4)
    Staging.stageSlices(df, col("ord"), n, lo, span, srcDir, tmp,
      Seq(col("event_id")))
    val files = (0 until n).map(i => srcDir.resolve(f"part-$i%02d.parquet"))
    files.foreach(p => assert(Files.exists(p), p.toString))
    for (i <- 0 until n) {
      val a = lo + i * span / n
      val b = if (i == n - 1) span + 1 else lo + (i + 1) * span / n
      val expect = ords.filter(o => o >= a && o < b).sorted
      val got = spark.read.parquet(files(i).toString)
        .select("ord").as[Long].collect().toSeq
      // equality of SEQUENCES also pins the deterministic in-file order
      assert(got === expect, s"slice $i")
    }
  }

  test("stageSlices output is identical across invocations") {
    val df = spark.range(0, 500)
      .select(col("id").as("event_id"), (col("id") * 7919 % 997).as("ord"))
    def stageOnce(): Seq[Seq[(Long, Long)]] = {
      val srcDir = Files.createTempDirectory("staging_det_src")
      val tmp = Files.createTempDirectory("staging_det_tmp")
      Staging.stageSlices(df, col("ord"), 4, 0L, 997L, srcDir, tmp,
        Seq(col("event_id")))
      (0 until 4).map { i =>
        spark.read
          .parquet(srcDir.resolve(f"part-$i%02d.parquet").toString)
          .as[(Long, Long)].collect().toSeq
      }
    }
    assert(stageOnce() === stageOnce())
  }
}
