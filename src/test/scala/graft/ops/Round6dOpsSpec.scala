package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property specs for the round-6d audit family (q181–q183), pinning the
  * mathematical invariants the oracle gate cannot express directly:
  *  - KS is a metric on CDFs: every statistic sits in [0, 1];
  *  - the decile table is a partition of the corpus (counts sum back to
  *    the recrawled total) and the planted duplicates are all accounted;
  *  - G² is non-negative (a log-likelihood RATIO against the independence
  *    expectation) and the min-count prune held.
  */
class Round6dOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q181: KS statistic is a [0,1] distance, one row per source") {
    val rows = graft.Queries.all("q181_ks_drift")(spark, sfDir).collect()
    val nSources = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source")).distinct().count()
    assert(rows.length == nSources)
    rows.foreach { r =>
      val ks = r.getAs[Double]("ks")
      assert(ks >= 0.0 && ks <= 1.0, s"${r.getAs[String]("source")}: $ks")
    }
    // sf0.001 sources draw lengths from one generator — drift exists but
    // must be far from the degenerate extremes on 25-doc samples
    assert(rows.map(_.getAs[Double]("ks")).max > 0.0)
  }

  test("q182: deciles partition the recrawled corpus; planted dups all land") {
    val rows = graft.Queries.all("q182_quality_lift")(spark, sfDir).collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val planted = docs.filter(col("doc_id") % 50 === 0).count()
    assert(rows.map(_.getAs[Int]("decile")).toSet.subsetOf((1 to 10).toSet))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n + planted)
    // no natural duplicates at small SF: dup mass == both copies of every
    // planted pair, spread over whichever deciles their lengths fall in
    assert(rows.map(_.getAs[Long]("n_dup")).sum == 2 * planted)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_chars") <= r.getAs[Long]("max_chars"))
      assert(r.getAs[Double]("dup_rate") >= 0.0
        && r.getAs[Double]("dup_rate") <= 1.0)
    }
  }

  test("q184: streak accounting is internally consistent per user") {
    val rows = graft.Queries.all("q184_activity_streaks")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val days = r.getAs[Long]("n_active_days")
      val streaks = r.getAs[Long]("n_streaks")
      val longest = r.getAs[Long]("max_streak")
      // islands partition the user's distinct active days
      assert(streaks >= 1 && streaks <= days)
      assert(longest >= 1 && longest <= days)
      // n_streaks islands of length <= max_streak must cover all days
      assert(streaks * longest >= days)
    }
  }

  test("q185: weighted median is an actual data value at >= half the mass") {
    val rows = graft.Queries.all("q185_weighted_median")(spark, sfDir).collect()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    rows.foreach { r =>
      val flag = r.getAs[String]("flag")
      val m = r.getAs[Double]("wmedian")
      val grp = li.filter(col("l_returnflag") === flag)
      // the median is a real price from the group
      assert(grp.filter(col("l_extendedprice") === m).count() > 0)
      // Scala-side reference: smallest price with cum weight >= half total
      val cells = grp.groupBy(col("l_extendedprice"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("w"))
        .collect()
        .map(x => (x.getDouble(0), x.getDecimal(1)))
        .sortBy(_._1)
      val total = cells.map(_._2.doubleValue).sum
      var cum = 0.0
      val ref = cells.find { case (_, w) =>
        cum += w.doubleValue; cum * 2 >= total }.get._1
      assert(m == ref, s"$flag: got $m want $ref")
    }
  }

  test("q183: G2 keyness is non-negative and the min-count prune held") {
    val rows = graft.Queries.all("q183_token_keyness")(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      // rounded to 4 decimals — tolerate the half-ulp of the rounding
      assert(r.getAs[Double]("g2") >= -0.0001,
        s"${r.getAs[String]("token")}: ${r.getAs[Double]("g2")}")
      assert(r.getAs[Long]("n_focus") + r.getAs[Long]("n_rest") >= 5)
    }
  }
}
