package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IoSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft_io").toString
  private lazy val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")

  test("parquet/orc/jsonl/csv sinks round-trip through their readers") {
    Writers.parquet(df, s"$root/p")
    Writers.orc(df, s"$root/o")
    Writers.jsonl(df, s"$root/j")
    Writers.csv(df, s"$root/c", delimiter = "|")

    assert(Readers.parquet(spark, s"$root/p").orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    assert(spark.read.orc(s"$root/o").orderBy("id").count() == 2)
    assert(Readers.jsonl(spark, s"$root/j").orderBy("id").count() == 2)
    // csv comes back all-string (by design — no inference, SURVEY §1.2)
    val csv = Readers.csv(spark, s"$root/c", delimiter = "|")
    assert(csv.schema.fields.forall(_.dataType.typeName == "string"))
    assert(csv.orderBy("id").select("s").as[String].collect().toSeq == Seq("a", "b"))
  }

  test("FS helpers: listParquetFiles + copyRecursive") {
    Writers.parquet(df, s"$root/src")
    val parts = Writers.listParquetFiles(s"$root/src")
    assert(parts.nonEmpty && parts.forall(_.endsWith(".parquet")))
    assert(Writers.copyRecursive(s"$root/src", s"$root/dst"))
    assert(Readers.parquet(spark, s"$root/dst").count() == 2)
    assert(Writers.listParquetFiles(s"$root/nope").isEmpty)
  }
}
