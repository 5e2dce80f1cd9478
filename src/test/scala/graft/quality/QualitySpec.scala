package graft.quality

import graft.SparkSpec
import Expectations._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some("a"), Some(5.0), Some("HOT")),
    (None, Some(25.0), Some("COLD")),
    (Some("c"), None, Some("WARM")),
    (Some("d"), Some(-1.0), None)
  ).toDF("name", "score", "grade")

  test("not-null / between / in-set violation counts in one pass (Q1/Q3)") {
    val suite = Suite("s", Seq(
      NotNull("name"),
      Between("score", 0, 10),
      InSet("grade", Seq("HOT", "COLD"))))
    val r = Checkpoint.run(df, suite)
    assert(r.rows == 4)
    val byKind = r.results.map(x => (x.kind, x.column) -> x.violations).toMap
    assert(byKind(("not_null", "name")) == 1)
    assert(byKind(("between", "score")) == 2) // 25.0 and -1.0; NULL passes
    assert(byKind(("in_set", "grade")) == 1) // WARM; NULL passes
    assert(!r.passed)
  }

  test("column_exists is schema-level, missing row-level column reports all rows (Q2)") {
    val suite = Suite("s", Seq(
      ColumnExists("name"), ColumnExists("ghost"), NotNull("ghost")))
    val r = Checkpoint.run(df, suite)
    val byDesc = r.results.map(x => (x.kind, x.column) -> x).toMap
    assert(byDesc(("column_exists", "name")).passed)
    assert(!byDesc(("column_exists", "ghost")).passed)
    assert(byDesc(("not_null", "ghost")).violations == 4)
  }

  test("matches_regex (engine extension)") {
    val r = Checkpoint.run(df, Suite("s", Seq(MatchesRegex("grade", "^[A-Z]+$"))))
    assert(r.passed) // WARM matches; NULL passes
    val r2 = Checkpoint.run(df, Suite("s", Seq(MatchesRegex("grade", "^H"))))
    assert(r2.results.head.violations == 2) // COLD, WARM
  }

  test("suite result serializes to a JSON report and stores it (Q4/Q5)") {
    val dir = java.nio.file.Files.createTempDirectory("dq").toString
    val r = Checkpoint.run(df, Suite("banks_silver", Seq(NotNull("name"))))
    val path = Checkpoint.store(r, dir)
    val json = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    assert(json.contains("\"suite\":\"banks_silver\""))
    assert(json.contains("\"violations\":1"))
    // report is diagnosable but never fatal (SURVEY §4.4-e)
    assert(!r.passed)
  }

  test("store renders an HTML data-docs page naming every verdict (E1:196)") {
    val dir = java.nio.file.Files.createTempDirectory("dq_html").toString
    val r = Checkpoint.run(df, Suite("banks_silver", Seq(
      NotNull("name"),                      // 1 violation → FAILED
      Between("score", -10.0, 100.0),       // passes
      ColumnExists("not_a_<column>"))))     // fails; name needs escaping
    Checkpoint.store(r, dir)
    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "banks_silver.html"))
    assert(html.contains("<title>Data quality: banks_silver</title>"))
    // one row per expectation, each naming its verdict
    assert(html.contains("not_null") && html.contains("between") &&
      html.contains("column_exists"))
    assert(html.contains("""<span class="fail">FAILED</span>"""))
    assert(html.contains("""<span class="pass">PASSED</span>"""))
    assert(html.contains(s"Rows validated: ${r.rows}"))
    // HTML-escaped column name, no raw angle brackets from data
    assert(html.contains("not_a_&lt;column&gt;"))
  }

  test("suite DEFINITION round-trips through JSON (save_expectation_suite analog)") {
    val suite = Suite("claims_silver", Seq(
      NotNull("cnpj"),
      Between("índice", 0.0, 10.0),
      MatchesRegex("cnpj", "^[0-9]+$"),
      InSet("segmento", Seq("S1", "S2", "s\"3")),
      ColumnExists("quantidade_de_clientes_–_scr")))
    val dir = java.nio.file.Files.createTempDirectory("dq_suite").toString
    val path = Checkpoint.saveSuite(suite, dir)
    assert(path.endsWith("claims_silver.suite.json"))
    val loaded = Checkpoint.loadSuite(path)
    assert(loaded == suite) // full structural equality incl. quotes/unicode
    // a reloaded suite must be runnable
    val r = Checkpoint.run(df, Suite("reloaded", loaded.expectations.take(1)))
    assert(r.results.head.kind == "not_null")
  }

  test("Profiler: nulls, distincts, canonicalized min/max in one pass") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Some(1L), Some("b"), Some(2.5)),
      (Some(2L), None, Some(1.25)),
      (Some(2L), Some("a"), None))
      .toDF("id", "s", "x")
    val out = graft.quality.Profiler.profile(df, Seq("id", "s", "x"),
        canon = Map("x" -> ((c: org.apache.spark.sql.Column) => c.cast("decimal(10,2)"))))
      .orderBy("col_name")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    assert(out.toSeq == Seq(
      ("id", 0L, 2L, "1", "2"),
      ("s", 1L, 2L, "a", "b"),
      ("x", 1L, 2L, "1.25", "2.50")))
  }

  test("observe-based DQ: counters collected during the write, no extra scan") {
    val suite = Suite("obs", Seq(
      NotNull("name"), Between("score", 0, 10), ColumnExists("grade")))
    val (observed, obs) = Checkpoint.observed(df, suite)
    val out = java.nio.file.Files.createTempDirectory("obs").toString
    observed.write.mode("overwrite").parquet(out) // the ONLY scan
    val r = Checkpoint.observedResult(observed, obs, suite)
    assert(r.rows == 4)
    val byKind = r.results.map(x => (x.kind, x.column) -> x.violations).toMap
    assert(byKind(("not_null", "name")) == 1)
    assert(byKind(("between", "score")) == 2)
    assert(byKind(("column_exists", "grade")) == 0)
    // reading back proves the write itself succeeded alongside collection
    assert(spark.read.parquet(out).count() == 4)
  }
}
