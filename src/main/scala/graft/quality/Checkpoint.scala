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

  /** Q5: persist the validation result as a JSON document (the engine's
    * analog of GE's result store + data docs, E1:163-196).
    */
  def store(result: SuiteResult, outDir: String): String = {
    Files.createDirectories(Paths.get(outDir))
    val p = Paths.get(outDir, s"${result.suite}.json")
    Files.writeString(p, result.toJson)
    p.toString
  }
}
