package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import Expectations._

/** Q4/Q5 (SURVEY.md §2.9): run a suite against a batch, produce a stored
  * validation result. Mirrors the reference's checkpoint
  * (`etl/1-processing-banks.py:161-196`): results are REPORTED, never fatal
  * (SURVEY §4.4-e — a failing expectation does not stop the pipeline).
  */
object Checkpoint {

  /** Evaluate every row-level expectation in one aggregate job; schema-level
    * expectations are checked against `df.schema` with no extra scan.
    */
  def run(df: DataFrame, suite: Suite): SuiteResult = {
    val (schemaLevel, rowLevel) = suite.expectations.partition {
      case _: ColumnExists => true
      case _               => false
    }
    val fields = df.schema.fieldNames.toSet
    // Guard row-level expectations against absent columns: they report as
    // failed (rows = all) rather than throwing at analysis time.
    val (resolvable, unresolvable) = rowLevel.partition(e => fields(e.column))

    val aggCols = count(lit(1)).cast("long").as("__rows") +:
      resolvable.zipWithIndex.map { case (e, i) =>
        sum(e.violationIndicator).cast("long").as(s"__v$i")
      }
    val row = df.agg(aggCols.head, aggCols.tail: _*).head()
    val rows = row.getLong(0)

    val rowResults = resolvable.zipWithIndex.map { case (e, i) =>
      val v = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
      ExpectationResult(e.kind, e.column, v, v == 0L)
    }
    val missingResults = unresolvable.map { e =>
      ExpectationResult(e.kind, e.column, rows, passed = false)
    }
    val schemaResults = schemaLevel.map { e =>
      val ok = fields(e.column)
      ExpectationResult(e.kind, e.column, if (ok) 0L else 1L, ok)
    }
    SuiteResult(suite.name, rows, schemaResults ++ rowResults ++ missingResults)
  }

  /** Q5: persist the validation result as a JSON document plus a small
    * HTML data-docs page (the engine's analog of GE's result store + the
    * rendered data docs the reference publishes to its `data_quality/`
    * bucket, E1:163-196). Returns the JSON path; the HTML sits next to it
    * as `<suite>.html`.
    */
  def store(result: SuiteResult, outDir: String): String = {
    Files.createDirectories(Paths.get(outDir))
    val p = Paths.get(outDir, s"${result.suite}.json")
    Files.writeString(p, result.toJson)
    Files.writeString(Paths.get(outDir, s"${result.suite}.html"),
      renderHtml(result))
    p.toString
  }

  /** Minimal single-file data-docs page: suite verdict banner + one table
    * row per expectation with its column, violation count, and verdict.
    */
  def renderHtml(result: SuiteResult): String = {
    def esc(s: String) = s.flatMap {
      case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
      case '"' => "&quot;"; case c => c.toString
    }
    def verdict(ok: Boolean) =
      if (ok) """<span class="pass">PASSED</span>"""
      else """<span class="fail">FAILED</span>"""
    val rows = result.results.map { r =>
      s"""<tr><td>${esc(r.kind)}</td><td>${esc(r.column)}</td>""" +
        s"""<td>${r.violations}</td><td>${verdict(r.passed)}</td></tr>"""
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8">
       |<title>Data quality: ${esc(result.suite)}</title>
       |<style>
       |body{font-family:sans-serif;margin:2em}
       |table{border-collapse:collapse}
       |td,th{border:1px solid #999;padding:4px 10px;text-align:left}
       |.pass{color:#176b30;font-weight:bold}
       |.fail{color:#a11020;font-weight:bold}
       |</style></head><body>
       |<h1>Validation result: ${esc(result.suite)}</h1>
       |<p>Rows validated: ${result.rows} — suite ${verdict(result.passed)}</p>
       |<table>
       |<tr><th>expectation</th><th>column</th><th>violations</th><th>verdict</th></tr>
       |$rows
       |</table>
       |</body></html>
       |""".stripMargin
  }

  /** Q4: persist a suite DEFINITION (not its result) as JSON — the
    * engine's `save_expectation_suite` (E1:156). Returns the file path.
    */
  def saveSuite(suite: Suite, outDir: String): String = {
    Files.createDirectories(Paths.get(outDir))
    val p = Paths.get(outDir, s"${suite.name}.suite.json")
    Files.writeString(p, Expectations.suiteToJson(suite))
    p.toString
  }

  /** Load a suite definition persisted by [[saveSuite]]. */
  def loadSuite(path: String): Suite =
    Expectations.suiteFromJson(Files.readString(Paths.get(path)))

  /** Zero-extra-scan validation: attach the suite's violation counters to
    * the frame with `observe()`, so they are collected DURING whatever
    * action the caller runs next (typically the layer write) — even the
    * one-pass checkpoint costs one dedicated scan; this costs none.
    * Returns the instrumented frame plus the `Observation` handle; call
    * [[observedResult]] with the handle after the action.
    */
  def observed(df: DataFrame, suite: Suite)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val (_, rowLevel) = partitionSuite(df, suite)
    val aggs = count(lit(1)).cast("long").as("__rows") +:
      rowLevel.zipWithIndex.map { case (e, i) =>
        sum(e.violationIndicator).cast("long").as(s"__v$i")
      }
    val obs = org.apache.spark.sql.Observation(s"graft_dq_${suite.name}")
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Read the counters after an action ran on the instrumented frame
    * (blocks until the observation completes).
    */
  def observedResult(df: DataFrame, obs: org.apache.spark.sql.Observation,
                     suite: Suite): SuiteResult = {
    val metrics = obs.get
    val (schemaLevel, rowLevel) = partitionSuite(df, suite)
    val rows = metrics("__rows").asInstanceOf[Long]
    val rowResults = rowLevel.zipWithIndex.map { case (e, i) =>
      val v = metrics.get(s"__v$i") match {
        case Some(x: Long) => x
        case _             => 0L
      }
      ExpectationResult(e.kind, e.column, v, v == 0L)
    }
    val fields = df.schema.fieldNames.toSet
    val schemaResults = schemaLevel.map { e =>
      val ok = fields(e.column)
      ExpectationResult(e.kind, e.column, if (ok) 0L else 1L, ok)
    }
    SuiteResult(suite.name, rows, schemaResults ++ rowResults)
  }

  private def partitionSuite(df: DataFrame, suite: Suite) = {
    val (schemaLevel, rowLevel) = suite.expectations.partition {
      case _: ColumnExists => true
      case _               => false
    }
    val fields = df.schema.fieldNames.toSet
    (schemaLevel, rowLevel.filter(e => fields(e.column)))
  }
}
