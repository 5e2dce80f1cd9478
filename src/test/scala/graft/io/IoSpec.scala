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

  test("parquet compression codec matrix round-trips losslessly") {
    // codec choice is a storage-management knob at 100 TB (zstd for cold
    // layers, snappy for hot); values must be codec-invariant and the
    // part files must carry the codec marker in their names
    val want = df.orderBy("id").collect().toSeq
    Seq("snappy", "gzip", "zstd").foreach { codec =>
      val dir = s"$root/codec_$codec"
      df.write.option("compression", codec).parquet(dir)
      assert(Readers.parquet(spark, dir).orderBy("id").collect().toSeq == want,
        s"$codec round-trip lost data")
      val parts = Writers.listParquetFiles(dir)
      assert(parts.nonEmpty && parts.forall(_.contains(codec)),
        s"$codec marker missing from part names: $parts")
    }
  }

  test("FS helpers: listParquetFiles + copyRecursive") {
    Writers.parquet(df, s"$root/src")
    val parts = Writers.listParquetFiles(s"$root/src")
    assert(parts.nonEmpty && parts.forall(_.endsWith(".parquet")))
    assert(Writers.copyRecursive(s"$root/src", s"$root/dst"))
    assert(Readers.parquet(spark, s"$root/dst").count() == 2)
    assert(Writers.listParquetFiles(s"$root/nope").isEmpty)
  }

  test("dynamic partition overwrite touches only rewritten partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dyn").toString + "/t"
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq(("a", 1), ("b", 2)).toDF("p", "v")
        .write.partitionBy("p").parquet(dir)
      // incremental rewrite of partition b only — a must survive
      Seq(("b", 99)).toDF("p", "v")
        .write.mode("overwrite").partitionBy("p").parquet(dir)
      val got = spark.read.parquet(dir).orderBy("p")
        .as[(Int, String)].collect().toSeq
      assert(got == Seq((1, "a"), (99, "b")))
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("compact: many small files -> few clustered files, data intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    (1 to 5000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(20).write.parquet(dir)
    def parts = Writers.listParquetFiles(dir)
    assert(parts.size == 20)
    val n = Writers.compact(spark, dir, targetBytesPerFile = 1L << 30,
      sortCols = Seq("id"))
    assert(n == 1 && parts.size == 1)
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    // clustering sort applied: rows inside the single file are id-ordered
    val ids = back.select("id").as[Long].collect().toSeq
    assert(ids == ids.sorted)
  }

  test("corrupt-record capture: bad rows quarantined, good rows intact") {
    import org.apache.spark.sql.types._
    val path = s"$root/landing/mixed.csv"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/landing"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      "id,score\n1,2.5\n2,notanumber\n3,4.0\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType)))
    // Spark disallows querying only the corrupt column straight off the
    // raw file — materialize first (the documented usage)
    val out = Readers.csvWithCorruptCapture(spark, path, schema).cache()
    val good = out.filter(col("_corrupt_record").isNull)
    val bad = out.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 2)
    assert(bad.count() == 1)
    assert(bad.select("_corrupt_record").as[String].head().contains("notanumber"))
  }

  test("parquet mergeSchema: evolved columns appear as nulls on old files") {
    val dir = s"$root/evolving"
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "s", "extra").write.mode("append").parquet(dir)
    val merged = Readers.parquetMergeSchema(spark, dir).orderBy("id")
    assert(merged.columns.toSet == Set("id", "s", "extra"))
    val rows = merged.collect()
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) == 9.5)
  }
}
