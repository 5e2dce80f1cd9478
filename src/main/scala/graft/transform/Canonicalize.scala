package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X1/P7 (SURVEY.md §2.2, §2.7): rule-table text canonicalization.
  *
  * The reference cleans bank names with a sequence of `withColumn(c,
  * regexp_replace(col(c), pat, rep))` steps (`etl/1-processing-banks.py:60-73`,
  * `etl/2-processing-claims.py:63-77`, `etl/3-processing-employees.py:62-77`)
  * — one Project node per rule. Here the whole rule table is folded into a
  * single `select` with nested `regexp_replace` expressions per column: one
  * Project, fully inside whole-stage codegen, no plan tower for the
  * optimizer to collapse.
  */
object Canonicalize {

  /** One replacement rule: Java-regex `pattern` → `replacement` on `column`. */
  final case class Rule(column: String, pattern: String, replacement: String)

  /** The nested-replace expression for one column under an ordered rule list. */
  def expression(base: Column, rules: Seq[Rule]): Column =
    rules.foldLeft(base)((acc, r) => regexp_replace(acc, r.pattern, r.replacement))

  /** Apply every rule, preserving rule order per column, in one Project. */
  def apply(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val byCol: Map[String, Seq[Rule]] = rules.groupBy(_.column)
    val cols = df.columns.map { c =>
      byCol.get(c) match {
        case Some(rs) => expression(col(c), rs).as(c)
        case None     => col(c)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** The banks-name rule table re-expressed generically (E1:60-73 shape):
    * strip a suffix marker, squash punctuation runs to spaces, collapse
    * whitespace, trim. Kept as a reusable default for name-like columns.
    */
  def nameRules(column: String): Seq[Rule] = Seq(
    Rule(column, "(\\.+|/+|\\-+)", " "),
    Rule(column, "\\s{2,}", " "),
    Rule(column, "^\\s+|\\s+$", "")
  )
}
