package graft

import org.apache.spark.sql.functions._

/** Adversarial-text sweep: every declared query must run against a
  * documents table of exotic-but-legal content — emoji (astral-plane
  * codepoints), CJK, RTL scripts, combining marks, zero-width joiners,
  * newlines-in-text — and produce the same values when re-run (the
  * byte-vs-character and normalization bug class). Non-document tables
  * come from sf0.001 unchanged.
  */
class ExoticTextSpec extends SparkSpec {
  import spark.implicits._

  private lazy val exoticDir: String = {
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_exotic").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "embeddings").foreach { t =>
      graft.io.Writers.copyRecursive(s"$src/$t.parquet", s"$dir/$t.parquet")
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$src/events.parquet")
      .write.parquet(s"$dir/events.parquet")
    val texts = Seq(
      "naïve café résumé — déjà vu über allés çedilla àccents " * 3,
      "日本語のテキスト 中文文本 한국어 텍스트 " * 5,
      "مرحبا بالعالم هذا نص عربي طويل بعض الشيء " * 4,
      "עברית טקסט מימין לשמאל עם מילים רבות " * 4,
      "emoji soup 🎉🚀🌍 family 👨‍👩‍👧‍👦 flags 🇧🇷🇯🇵 skin 👍🏽 " * 4,
      "zero​width‌join‍er and nbsp and\ttabs\nand newlines " * 3,
      "comb́ining marks àéîõü everywhere " * 4,
      "ＦＵＬＬＷＩＤＴＨ ｌａｔｉｎ ﬁligature ﬂuent œuvre æther " * 4,
      "mixed العربية and English and 中文 in one line with 🎯 targets " * 4,
      "𝔪𝔞𝔱𝔥𝔢𝔪𝔞𝔱𝔦𝔠𝔞𝔩 𝖇𝖔𝖑𝖉 𝕕𝕠𝕦𝕓𝕝𝕖 𝗌𝖺𝗇𝗌 scripts " * 4)
    val rows = (0 until 40).map { i =>
      (i.toLong, texts(i % texts.length) + s" doc $i",
        Seq("en", "zh", "ar", "he", "de")(i % 5), s"src${i % 3}")
    }
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("every query runs on exotic text and is value-stable across runs") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val a = fn(spark, exoticDir).collect().map(_.toString).toSeq
          graft.ops.Dedup.releaseCaches()
          val b = fn(spark, exoticDir).collect().map(_.toString).toSeq
          graft.ops.Dedup.releaseCaches()
          // skip instability check for queries whose fixtures embed temp
          // dirs (round-trips recreate files; values still compared above
          // within each run by the driver gate)
          if (a != b) Some(s"$name: unstable across runs") else None
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
