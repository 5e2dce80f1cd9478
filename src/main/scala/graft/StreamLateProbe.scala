package graft

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic for the q300 gate: prints per-micro-batch
  * progress (rows, watermark, dropped counts) so the oracle's watermark
  * replay can be reconciled against the engine's actual protocol.
  */
object StreamLateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-stream-late-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val srcDir = java.nio.file.Files.createTempDirectory("probe_late_src")
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("arr", unix_micros(col("ts"))
        + conv(substring(md5(col("event_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 216000000000L)
    val b = ev.agg(min(col("arr")), max(col("arr"))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val span = math.max(hi - lo, 16L)
    def stageFile(df: org.apache.spark.sql.DataFrame, i: Int): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"probe_late_tmp$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = srcDir.resolve(f"part-$i%02d.parquet")
      java.nio.file.Files.move(part, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 10000L))
    }
    (0 until 16).foreach { i =>
      val a = lo + i * span / 16
      val bb = if (i == 15) hi + 1 else lo + (i + 1) * span / 16
      stageFile(ev.filter(col("arr") >= a && col("arr") < bb)
        .select(col("event_id"), col("ts"), col("event_type"), col("cents")), i)
    }
    stageFile(spark.range(1).select(lit(-1L).as("event_id"),
      timestamp_micros(lit(hi + 30L * 86400L * 1000000L)).as("ts"),
      lit("sentinel").as("event_type"), lit(0L).as("cents")), 16)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType), StructField("cents", LongType)))
    val sq = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir.toString)
      .withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      .writeStream.outputMode("append").format("memory")
      .queryName("probe_late_sink").trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    sq.recentProgress.foreach { p =>
      val so = p.stateOperators.map(o =>
        s"dropped=${o.numRowsDroppedByWatermark} updated=${o.numRowsUpdated}")
        .mkString(";")
      println(s"PROBE batch=${p.batchId} rows=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")} $so")
    }
    println(s"PROBE total_sink=${spark.table("probe_late_sink").count()}")
    spark.stop()
  }
}
