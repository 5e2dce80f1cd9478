package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Ranks}

/** Reduce-width sweep for the two-phase rank primitive (r8 verdict #2
  * follow-through): the old O(P) `when`-chain offsets were a janino
  * codegen-depth hazard at cluster widths; the r9 broadcast
  * LocalRelation join must hold flat from P=32 to P=1024+. Runs
  * `globalRowNumber` over the sf0.1 events table at several widths,
  * checks the results are IDENTICAL across widths (the determinism
  * property the r8 advice flagged), and prints wall seconds per width.
  *
  * Usage: runMain graft.tools.RankWidth [sfDir]
  */
object RankWidth {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().appName("graft-rank-width")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    events.cache().count()
    var ref: Array[(Long, Long)] = null
    for (p <- Seq(32, 256, 1024); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val out = Ranks.globalRowNumber(events,
          Seq(col("value").desc, col("event_id")), "rn", numPartitions = p)
        .select(col("event_id"), col("rn"))
      val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
      Dedup.releaseCaches()
      val sec = (System.nanoTime() - t0) / 1e9
      val sorted = rows.sortBy(_._1)
      if (ref == null) ref = sorted
      val same = java.util.Arrays.equals(
        sorted.map(x => x._1 * 1000003L + x._2),
        ref.map(x => x._1 * 1000003L + x._2))
      println(f"RW P=$p%-5d rep$rep rows=${rows.length}%-7d " +
        f"identical=$same $sec%.3f s")
      require(same, s"rank output diverged at P=$p")
    }
    spark.stop()
  }
}
