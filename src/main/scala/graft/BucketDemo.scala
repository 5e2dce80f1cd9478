package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketed-layout demo: write orders + lineitem bucketed on the join key,
  * then show the bucket-aware join plan has NO shuffle Exchange — the
  * co-located-join layout SCALE.md prescribes for repeated 100 TB joins.
  * (`sbt "runMain graft.BucketDemo [sfDir]"`)
  */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("qty"))

    val plan = joined.queryExecution.executedPlan.toString
    println(s"BUCKETED_JOIN_SHUFFLES=${if (plan.contains("SortMergeJoin")) countJoinExchanges(plan) else -1}")
    println(s"HAS_SMJ=${plan.contains("SortMergeJoin")}")
    joined.orderBy("o_orderstatus").show()
    spark.stop()
  }

  /** Count Exchange nodes feeding the join (below the first aggregate). */
  private def countJoinExchanges(plan: String): Int = {
    val lines = plan.linesIterator.toVector
    val joinIdx = lines.indexWhere(_.contains("SortMergeJoin"))
    lines.drop(joinIdx).count(_.contains("Exchange hashpartitioning"))
  }
}
