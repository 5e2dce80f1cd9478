package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** gray_dhash64 unit pins: hand-computed hashes on constructed buffers,
  * pooling arithmetic, and NULL contract. The e2e gate is q277 (oracle
  * recomputes every bit in SQL).
  */
class ImageDhashSpec extends SparkSpec {

  import spark.implicits._

  private def hashOf(bytes: Array[Byte], w: Int, h: Int): Option[Long] = {
    val df = Seq(Tuple1(bytes)).toDF("px")
    val r = df.select(
      ImageExpressions.gray_dhash64(col("px"), w, h).as("fp")).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  test("uniform image hashes to 0 (no gradient sign ever positive)") {
    assert(hashOf(Array.fill(9 * 8)(42.toByte), 9, 8) === Some(0L))
  }

  test("gray_resize: floor index map, identity, guards, codegen parity") {
    // 4×4 ramp down to 2×2: out(y,x) = in(2y, 2x) = (2y)*4 + 2x
    val in = Array.tabulate(16)(_.toByte)
    val got = Seq(Tuple1(in)).toDF("px")
      .select(ImageExpressions.gray_resize(col("px"), 4, 4, 2, 2).as("t"))
      .head().getAs[Array[Byte]](0)
    assert(got.toSeq === Seq[Byte](0, 2, 8, 10))
    // identity resize returns the same bytes
    assert(ImageExpressions.grayResize(in, 4, 4, 4, 4).toSeq === in.toSeq)
    // guards: short buffer, bad dims, oversized output
    assert(ImageExpressions.grayResize(in, 5, 4, 2, 2) === null)
    assert(ImageExpressions.grayResize(in, 0, 4, 2, 2) === null)
    assert(ImageExpressions.grayResize(in, 4, 4, 1 << 14, 1 << 14) === null)
    // interpreted eval agrees with the driver-side method (codegen path
    // is exercised by the q308 gate end-to-end)
    val df = Seq(Tuple1(in)).toDF("px")
    val viaExpr = df.select(
      ImageExpressions.gray_resize(col("px"), 4, 4, 3, 2)).head()
      .getAs[Array[Byte]](0).toSeq
    assert(viaExpr === ImageExpressions.grayResize(in, 4, 4, 3, 2).toSeq)
  }

  test("strictly increasing row gradient sets all 64 bits") {
    // 9×8 buffer where each column is brighter than the last
    val b = Array.tabulate(9 * 8)(i => ((i % 9) * 20).toByte)
    assert(hashOf(b, 9, 8) === Some(-1L)) // all 64 bits set
  }

  test("single bright cell flips exactly the two adjacent gradients") {
    // flat image except grid cell (0, 3) is brighter: bit r0c2 (left
    // neighbor rises into it) set; bit r0c3 (falls off it) clear; all
    // other comparisons equal → clear (strict >)
    val b = Array.fill(9 * 8)(10.toByte)
    b(3) = 200.toByte // row 0, col 3 (cw=ch=1 at 9×8)
    assert(hashOf(b, 9, 8) === Some(1L << 2))
  }

  test("2x2 box pooling is the integer mean") {
    // 18×16: cell (0,0) block = {0,1,2,3} → mean 6/4 = 1 (integer div);
    // cell (0,1) block all 0 → 0; so bit r0c0 (cell1 > cell0 = 0 > 1)
    // clear, and bit for (0,0)->(0,1) comparison… construct instead a
    // clear rise: block (0,1) = all 9 → cell 9 > cell 1 → bit 0 set
    val b = Array.fill(18 * 16)(0.toByte)
    b(0) = 0; b(1) = 1; b(18) = 2; b(19) = 3 // cell (0,0) = 1
    b(2) = 9; b(3) = 9; b(20) = 9; b(21) = 9 // cell (0,1) = 9
    val got = hashOf(b, 18, 16).get
    assert((got & 1L) === 1L, "bit 0: cell(0,1)=9 > cell(0,0)=1")
    assert((got & 2L) === 0L, "bit 1 clear: cell(0,2)=0 < cell(0,1)=9")
    assert((got >>> 2) === 0L, "all remaining comparisons are flat")
  }

  test("NULL on short buffer or unpoolable dims") {
    assert(hashOf(Array.fill(10)(1.toByte), 18, 16) === None)
    assert(hashOf(Array.fill(64)(1.toByte), 8, 8) === None) // w < 9
    assert(hashOf(Array.fill(63)(1.toByte), 9, 7) === None) // h < 8
  }

  test("declared dims whose product overflows Int still hit the guard") {
    // 1_000_000 x 9_000: w*h = 9e9 wraps to 410_065_408 as Int — an
    // Int-arithmetic guard would pass and then AIOOBE inside the cell
    // loop (r9 ADVICE). The Long-widened guard must return NULL for
    // both hashes against any short buffer.
    val b = Array.fill(1024)(1.toByte)
    assert(ImageExpressions.grayDhash64(b, 1000000, 9000) === null)
    assert(ImageExpressions.grayAhash64(b, 1000000, 9000) === null)
    // and the extreme corner: dims at Int.MaxValue each
    assert(ImageExpressions.grayDhash64(b, Int.MaxValue, Int.MaxValue)
      === null)
    assert(ImageExpressions.grayAhash64(b, Int.MaxValue, Int.MaxValue)
      === null)
  }

  test("interpreted eval agrees with codegen") {
    val b = Array.tabulate(18 * 16)(i => (i * 37 % 256).toByte)
    val expected = ImageExpressions.grayDhash64(b, 18, 16)
    assert(hashOf(b, 18, 16) === Some(expected.longValue()))
  }
}
