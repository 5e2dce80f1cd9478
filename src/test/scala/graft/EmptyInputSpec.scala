package graft

import org.apache.spark.sql.functions._

/** Degenerate-input sweep: every declared query must RUN (not necessarily
  * return rows) against a corpus of schema-identical EMPTY tables — the
  * guard against division-by-zero, empty-aggregate, and null-propagation
  * crashes that the value-comparing driver gate can never see (it always
  * runs on populated tables). A new partition of a 100 TB lake being
  * empty is routine, not exceptional.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      df.limit(0).write.parquet(s"$dir/$t.parquet")
    }
    // events carries TIMESTAMP(NANOS); read it the way Tables.events does
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$src/events.parquet").limit(0)
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("every query executes on empty tables without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, emptyDir).collect()
          graft.ops.Dedup.releaseCaches()
          None
        } catch {
          case e: Throwable =>
            graft.ops.Dedup.releaseCaches()
            Some(s"$name: ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
        }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
