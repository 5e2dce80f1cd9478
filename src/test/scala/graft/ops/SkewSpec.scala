package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of rows) + a tail
  private lazy val big = (1 to 1000).map(i =>
    (if (i <= 900) "hot" else s"k${i % 17}", i.toLong)).toDF("k", "v")
  private lazy val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"))
    .toDF("k", "label")

  test("saltedJoin returns exactly the plain-join result (inner and left)") {
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(dim, Seq("k"), jt)
        .select("k", "v", "label").collect().map(_.toSeq).toSet
      val salted = Skew.saltedJoin(big, dim, Seq("k"), "v", factor = 8, jt)
        .select("k", "v", "label").collect().map(_.toSeq).toSet
      assert(salted == plain, s"joinType=$jt")
    }
  }

  test("saltedSumCount matches a direct aggregation") {
    val direct = big.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(big, Seq("k"), "v", factor = 8, saltFrom = "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("saltedSumCount spreads a constant-valued hot key across salts") {
    // all rows share one value — salting on a row identity still spreads
    val const = (1 to 100).map(i => ("hot", 1L, i.toLong)).toDF("k", "v", "id")
    val out = Skew.saltedSumCount(const, Seq("k"), "v", factor = 8, saltFrom = "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("hot", 100L, 100L)))
  }

  test("saltedJoin rejects join types it cannot preserve") {
    intercept[IllegalArgumentException](
      Skew.saltedJoin(big, dim, Seq("k"), "v", 4, "full"))
  }
}
