package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase rank primitives: value-equality vs the single-partition
  * window reference at test scale, invariance across range widths (the
  * r8 advice hazard was partition-placement-dependent answers), and the
  * absence of driver-side collects / partition-less windows in the plan.
  */
class RanksSpec extends SparkSpec {

  import spark.implicits._

  private def sampleDf = {
    // deterministic pseudo-random longs with duplicates in the value col
    val rows = (1 to 5000).map(i => (i.toLong, (i * 2654435761L) % 997,
      s"u${i % 613}"))
    rows.toDF("id", "v", "name")
  }

  test("globalRowNumber matches single-partition row_number, any width") {
    val df = sampleDf
    val ref = df.withColumn("rn_ref",
      row_number().over(Window.orderBy(col("v").desc, col("id"))))
    for (p <- Seq(1, 3, 7, 32)) {
      val got = Ranks.globalRowNumber(df, Seq(col("v").desc, col("id")),
        "rn", numPartitions = p)
      val diff = got.join(ref, Seq("id"))
        .filter(col("rn") =!= col("rn_ref").cast("long")).count()
      assert(diff === 0L, s"numPartitions=$p")
      Dedup.releaseCaches()
    }
  }

  test("globalRunningMax matches single-partition running max (longs)") {
    val df = sampleDf
    val ref = df.withColumn("rm_ref",
      max(col("v")).over(Window.orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    for (p <- Seq(1, 5, 32)) {
      val got = Ranks.globalRunningMax(df, Seq(col("id")), col("v"),
        "rm", numPartitions = p)
      val diff = got.join(ref, Seq("id"))
        .filter(col("rm") =!= col("rm_ref")).count()
      assert(diff === 0L, s"numPartitions=$p")
      Dedup.releaseCaches()
    }
  }

  test("globalRunningMax orders strings like Spark max (UTF8 bytes)") {
    // includes a supplementary-plane char: "😀" (U+1F600) must
    // order ABOVE "￿"-free ASCII but as UTF-8 bytes vs other BMP
    // chars — exactly whatever Spark's own max says, since the prefix
    // max now IS Spark's max.
    val df = Seq((1L, "apple"), (2L, "😀grin"), (3L, "zebra"),
      (4L, "priv"), (5L, "banana")).toDF("id", "s")
    val ref = df.withColumn("rm_ref",
      max(col("s")).over(Window.orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = Ranks.globalRunningMax(df, Seq(col("id")), col("s"),
      "rm", numPartitions = 3)
    val diff = got.join(ref, Seq("id"))
      .filter(col("rm") =!= col("rm_ref")).count()
    assert(diff === 0L)
    Dedup.releaseCaches()
  }

  test("globalRunningMax doubles: NaN-greatest and NULL-skipping like " +
      "Spark max") {
    // Spark's max ordering puts NaN ABOVE every double and skips NULLs;
    // the executor-side fold must agree (JVM `>=` is false for any NaN
    // operand, so a naive compare would silently drop NaN prefixes —
    // the r9 ADVICE hazard).
    val df = Seq[(Long, java.lang.Double)](
      (1L, 1.5), (2L, null), (3L, Double.NaN), (4L, 7.0), (5L, null),
      (6L, Double.PositiveInfinity), (7L, 2.0), (8L, Double.NaN))
      .toDF("id", "v")
    val ref = df.withColumn("rm_ref",
      max(col("v")).over(Window.orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    for (p <- Seq(1, 3, 8)) {
      val got = Ranks.globalRunningMax(df, Seq(col("id")), col("v"),
        "rm", numPartitions = p)
      // NaN != NaN under `=!=`, so compare via NaN-aware equality
      val diff = got.join(ref, Seq("id"))
        .filter(!(col("rm") <=> col("rm_ref")
          || (isnan(col("rm")) && isnan(col("rm_ref"))))).count()
      assert(diff === 0L, s"numPartitions=$p")
      Dedup.releaseCaches()
    }
  }

  test("ntileFromRank reproduces SQL ntile semantics incl. remainder") {
    val df = (1 to 103).map(_.toLong).toDF("id")
    val ref = df.withColumn("nt_ref",
      ntile(5).over(Window.orderBy(col("id"))))
    val got = Ranks.globalRowNumber(df, Seq(col("id")), "rn",
        numPartitions = 4)
      .withColumn("nt", Ranks.ntileFromRank(col("rn"), lit(103L), 5))
    val diff = got.join(ref, Seq("id"))
      .filter(col("nt") =!= col("nt_ref")).count()
    assert(diff === 0L)
    Dedup.releaseCaches()
  }

  test("rank plan has no partition-less Window and no when-chain offsets") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def partitionless(p: SparkPlan): Seq[WindowExec] = p match {
      case a: AdaptiveSparkPlanExec => partitionless(a.inputPlan)
      case _ =>
        (p match {
          case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
          case _ => Nil
        }) ++ p.children.flatMap(partitionless)
    }
    val got = Ranks.globalRowNumber(sampleDf, Seq(col("v"), col("id")),
      "rn", numPartitions = 8)
    val plan = got.queryExecution.executedPlan
    assert(partitionless(plan).isEmpty)
    // offsets arrive via broadcast join, not an O(P) literal chain
    assert(plan.toString.contains("BroadcastHashJoin"))
    Dedup.releaseCaches()
  }

  test("empty input yields empty output with the rank column present") {
    val df = sampleDf.filter(col("id") < 0)
    val got = Ranks.globalRowNumber(df, Seq(col("id")), "rn")
    assert(got.columns.contains("rn") && got.count() === 0L)
    Dedup.releaseCaches()
  }
}
