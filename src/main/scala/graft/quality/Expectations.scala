package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Q1–Q6 (SURVEY.md §2.9): the reference's second "query language" — Great
  * Expectations suites evaluated per silver batch
  * (`etl/1-processing-banks.py:130-196`, `etl/2-processing-claims.py:139-205`,
  * `etl/3-processing-employees.py:140-203`).
  *
  * Design: every row-level expectation compiles to a 0/1 violation-indicator
  * `Column`, and a whole suite runs as ONE aggregate pass
  * (`sum(indicator)` per expectation) — versus the reference's one Spark job
  * per expectation over a re-read parquet file (E1:105-114, SURVEY §4.2).
  * At 100 TB that's the difference between 1 scan and #expectations scans.
  */
object Expectations {

  sealed trait Expectation {
    def column: String
    def kind: String
    def description: String = s"$kind($column)"
    /** 1 when the row violates the expectation, else 0. Row-level only. */
    def violationIndicator: Column
  }

  /** Q1: expect_column_values_to_not_be_null (E1:139-142). */
  final case class NotNull(column: String) extends Expectation {
    val kind = "not_null"
    def violationIndicator: Column =
      when(col(column).isNull, 1L).otherwise(0L)
  }

  /** Q3: expect_column_values_to_be_between (E1:144-146, commented in the
    * reference but part of the intended surface). NULL passes (GE default:
    * nulls are handled by not_null, not range checks).
    */
  final case class Between(column: String, lo: Double, hi: Double) extends Expectation {
    val kind = "between"
    def violationIndicator: Column = {
      val v = col(column).try_cast("double")
      when(v.isNotNull && (v < lo || v > hi), 1L).otherwise(0L)
    }
  }

  /** Engine extension: value must match a Java regex (NULL passes). */
  final case class MatchesRegex(column: String, pattern: String) extends Expectation {
    val kind = "matches_regex"
    def violationIndicator: Column =
      when(col(column).isNotNull && !col(column).rlike(pattern), 1L).otherwise(0L)
  }

  /** Engine extension: value must be in a fixed set (NULL passes). */
  final case class InSet(column: String, values: Seq[String]) extends Expectation {
    val kind = "in_set"
    def violationIndicator: Column =
      when(col(column).isNotNull && !col(column).isin(values: _*), 1L).otherwise(0L)
  }

  /** Q2: expect_column_to_exist (E1:151) — schema-level, no scan. */
  final case class ColumnExists(column: String) extends Expectation {
    val kind = "column_exists"
    def violationIndicator: Column = lit(0L) // evaluated against schema instead
  }

  final case class Suite(name: String, expectations: Seq[Expectation])

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Q4: the suite DEFINITION as JSON — the reference round-trips suites
    * through `save_expectation_suite` (E1:156); results alone are not the
    * whole DQ surface. Inverse of [[suiteFromJson]].
    */
  def suiteToJson(s: Suite): String = {
    val es = s.expectations.map {
      case NotNull(c) =>
        s"""{"kind":"not_null","column":"${esc(c)}"}"""
      case Between(c, lo, hi) =>
        s"""{"kind":"between","column":"${esc(c)}","lo":$lo,"hi":$hi}"""
      case MatchesRegex(c, p) =>
        s"""{"kind":"matches_regex","column":"${esc(c)}","pattern":"${esc(p)}"}"""
      case InSet(c, vs) =>
        s"""{"kind":"in_set","column":"${esc(c)}",""" +
          s""""values":${vs.map(v => s""""${esc(v)}"""").mkString("[", ",", "]")}}"""
      case ColumnExists(c) =>
        s"""{"kind":"column_exists","column":"${esc(c)}"}"""
    }.mkString("[", ",", "]")
    s"""{"name":"${esc(s.name)}","expectations":$es}"""
  }

  /** Rebuild a [[Suite]] from [[suiteToJson]] output (json4s ships with
    * Spark). Unknown kinds fail loudly — silent drops would weaken a gate.
    */
  def suiteFromJson(json: String): Suite = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    val name = (j \ "name").extract[String]
    val es = (j \ "expectations").extract[List[JValue]].map { o =>
      def s(field: String) = (o \ field).extract[String]
      (o \ "kind").extract[String] match {
        case "not_null"      => NotNull(s("column"))
        case "between"       => Between(s("column"),
          (o \ "lo").extract[Double], (o \ "hi").extract[Double])
        case "matches_regex" => MatchesRegex(s("column"), s("pattern"))
        case "in_set"        => InSet(s("column"),
          (o \ "values").extract[List[String]])
        case "column_exists" => ColumnExists(s("column"))
        case k => throw new IllegalArgumentException(s"unknown expectation kind: $k")
      }
    }
    Suite(name, es)
  }

  final case class ExpectationResult(kind: String, column: String,
                                     violations: Long, passed: Boolean)

  final case class SuiteResult(suite: String, rows: Long,
                               results: Seq[ExpectationResult]) {
    def passed: Boolean = results.forall(_.passed)

    /** Q5 shape: a JSON validation-result document (E1:163-196). */
    def toJson: String = {
      def esc(s: String) = s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val rs = results.map { r =>
        s"""{"expectation":"${esc(r.kind)}","column":"${esc(r.column)}",""" +
          s""""violations":${r.violations},"passed":${r.passed}}"""
      }.mkString("[", ",", "]")
      s"""{"suite":"${esc(suite)}","rows":$rows,"passed":$passed,"results":$rs}"""
    }
  }
}
