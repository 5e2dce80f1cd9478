package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Pins the offline state-data-source contract q336 rides on: a
  * transformWithState checkpoint exposes its state variables by NAME
  * (and rejects an unnamed read), and the state-metadata source
  * describes the owning operator.
  */
class StateReadSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ckpt: String = {
    val src = Files.createTempDirectory("graft_stateread_src")
    val ck = Files.createTempDirectory("graft_stateread_ckpt").toString
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("double").as("value"))
    ev.coalesce(1).write.mode("overwrite").parquet(src.toString)
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(ev.schema).parquet(src.toString)
        .as[EventStreams.Event]
      val sq = EventStreams.runningTotals(stream)(spark).toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName("graft_stateread_spec_sink")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      sq.awaitTermination()
    } finally prev match {
      case Some(p) => spark.conf
        .set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf
        .unset("spark.sql.streaming.stateStore.providerClass")
    }
    ck
  }

  test("state-metadata names the operator and its state variables") {
    val md = spark.read.format("state-metadata").load(ckpt).collect()
    assert(md.length == 1)
    val r = md.head
    assert(r.getAs[String]("operatorName") == "transformWithStateExec")
    assert(r.getAs[String]("operatorProperties").contains("\"cum\""))
  }

  test("statestore read needs the state variable name on a TWS checkpoint") {
    intercept[Exception] {
      spark.read.format("statestore").load(ckpt).collect()
    }
    // named read resolves and equals the batch aggregate
    val st = spark.read.format("statestore")
      .option("stateVarName", "cum").load(ckpt)
      .select(col("key.value").as("user_id"), col("value.n").as("n"),
        col("value.cents").as("cents"))
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("bigint"))
          .as("cents"))
    assert(st.orderBy("user_id").collect().toSeq ==
      batch.orderBy("user_id").collect().toSeq)
  }
}
