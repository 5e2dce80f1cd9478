package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Partitioned-layout demo: write documents partitioned by `lang` (the
  * silver-layer layout SCALE.md prescribes), then show a lang filter is
  * answered by PARTITION PRUNING — the scan touches one directory, not
  * the corpus. (`sbt "runMain graft.PartitionDemo [sfDir]"`)
  */
object PartitionDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.io.Writers.parquet(
      spark.read.parquet(s"$sfDir/documents.parquet"),
      s"$out/documents", partitionBy = Seq("lang"))

    val q = spark.read.parquet(s"$out/documents")
      .filter(col("lang") === "en")
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("<none>")
    println(s"PARTITION_FILTERS=$pf")
    println(s"EN_DOCS=${q.head().getLong(0)}")
    val dirs = new java.io.File(s"$out/documents").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    println(s"LAYOUT=${dirs.mkString(",")}")
    spark.stop()
  }
}
