package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Structured-Streaming demo over the real events table: stages the
  * parquet file into a stream-source directory, runs the watermarked
  * windowed aggregation from [[graft.streaming.EventStreams]] as a file
  * stream, and prints the resulting per-hour counts.
  * (`sbt "runMain graft.StreamDemo [sfDir]"`)
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val srcDir = Files.createTempDirectory("events_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)

    // Mirror Tables.events' layout tolerance: probe the batch reader's
    // decoded ts type once, declare the matching stream schema, then
    // normalize to TimestampType. Long (legacy nanos) converts with
    // integer div; NTZ casts (instant-preserving under the UTC session).
    val tsRawType = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsRawType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream0 = spark.readStream.schema(schema).parquet(srcDir.toString)
    val stream = tsRawType match {
      case LongType =>
        stream0.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => stream0
      case _ =>
        stream0.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
    }

    val agg = graft.streaming.EventStreams.windowedCounts(stream, "1 hour", "2 hours")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_out").start()
    q.processAllAvailable()
    val out = spark.table("stream_out")
    println(s"STREAM_WINDOWS=${out.count()}")
    out.orderBy("window_start", "event_type").show(8)
    q.stop()
    spark.stop()
  }
}
