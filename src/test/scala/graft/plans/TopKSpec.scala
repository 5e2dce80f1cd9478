package graft.plans

import graft.SparkSpec
import graft.ops.TopK
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    graft.GraftExtensions.install(spark)
    (1 to 500).map(i => (i % 13L, i.toDouble % 97, i.toLong))
      .toDF("k", "score", "id")
      .repartition(7) // several input partitions so the partial stage matters
  }

  test("TopKPerKey matches the window row_number formulation exactly") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"score".desc, $"id")
    val expected = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    val got = TopK.perKey(df, Seq("k"), "score", "id", k = 3)
      .collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("planned as partial -> exchange -> final (aggregation-style)") {
    val plan = TopK.perKey(df, Seq("k"), "score", "id", k = 3)
      .queryExecution.executedPlan.toString
    // physical nodes print without the Exec suffix
    assert("TopKPerKey \\[".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("ties on score resolved by ascending tiebreak") {
    val tied = Seq((1L, 5.0, 10L), (1L, 5.0, 3L), (1L, 5.0, 7L), (1L, 1.0, 1L))
      .toDF("k", "score", "id")
    val got = TopK.perKey(tied, Seq("k"), "score", "id", k = 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L, 7L))
  }

  test("k larger than group size returns whole groups") {
    val small = Seq((1L, 2.0, 1L), (1L, 3.0, 2L)).toDF("k", "score", "id")
    assert(TopK.perKey(small, Seq("k"), "score", "id", k = 10).count() == 2)
  }

  test("string order column over a columnar parquet scan (buffer reuse)") {
    // eval results over columnar rows can be views into reused buffers —
    // regression for the copyValue fix; parquet forces the columnar path
    val dir = java.nio.file.Files.createTempDirectory("topk_str").toString
    (1 to 2000).map(i => (i % 7L, f"s${i % 37}%03d", i.toLong))
      .toDF("k", "sval", "id")
      .write.mode("overwrite").parquet(dir)
    val pq = spark.read.parquet(dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"sval".desc, $"id")
    val expected = pq.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 4).drop("rn").collect().map(_.toSeq).toSet
    val got = TopK.perKey(pq, Seq("k"), "sval", "id", k = 4)
      .collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("bounded partial map: overflow keys pass through, result stays exact") {
    // force the partial stage to hold at most 4 key heaps per partition —
    // most of the 200 keys overflow and stream through to the final stage
    spark.conf.set("graft.topk.maxPartialKeys", "4")
    try {
      val wide = (1 to 4000).map(i => (i % 200L, (i * 31 % 199).toDouble, i.toLong))
        .toDF("k", "score", "id").repartition(5)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"score".desc, $"id")
      val expected = wide.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3).drop("rn").collect().map(_.toSeq).toSet
      val got = TopK.perKey(wide, Seq("k"), "score", "id", k = 3)
        .collect().map(_.toSeq).toSet
      assert(got == expected)
    } finally spark.conf.unset("graft.topk.maxPartialKeys")
  }

  test("final stage emits groups in sorted order (streaming scan, no heaps)") {
    val got = TopK.perKey(df, Seq("k"), "score", "id", k = 3).collect()
    // within each key, rows must arrive score-desc then id-asc — the
    // contract that lets the final stage run with O(1) state
    got.groupBy(_.getLong(0)).values.foreach { rows =>
      val scores = rows.map(r => (-r.getDouble(1), r.getLong(2))).toSeq
      assert(scores == scores.sorted)
    }
  }

  test("asc mode matches the ascending window formulation exactly") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"score".asc, $"id")
    val expected = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    val got = TopK.perKey(df, Seq("k"), "score", "id", k = 3, asc = true)
      .collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("asc mode: null scores still lose to everything") {
    val withNulls = Seq(
      (1L, Some(2.0), 1L), (1L, None, 2L), (1L, Some(1.0), 3L))
      .toDF("k", "score", "id")
    val got = TopK.perKey(withNulls, Seq("k"), "score", "id", k = 2, asc = true)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("asc mode over a string order column (q92 shape: min-k by md5)") {
    val dir = java.nio.file.Files.createTempDirectory("topk_asc_str").toString
    (1 to 2000).map(i => (i % 5L, i.toLong)).toDF("k", "id")
      .withColumn("hk", md5($"id".cast("string")))
      .write.mode("overwrite").parquet(dir)
    val pq = spark.read.parquet(dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"hk", $"id")
    val expected = pq.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 4).drop("rn").collect().map(_.toSeq).toSet
    val got = TopK.perKey(pq, Seq("k"), "hk", "id", k = 4, asc = true)
      .collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("null scores lose to everything") {
    val withNulls = Seq(
      (1L, Some(2.0), 1L), (1L, None, 2L), (1L, Some(1.0), 3L))
      .toDF("k", "score", "id")
    val got = TopK.perKey(withNulls, Seq("k"), "score", "id", k = 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }
}
