package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived-column operators P8–P10, P13, X2–X5, X7 (SURVEY.md §2.2, §2.7).
  *
  * ANSI note (SURVEY §4.4-c): Spark 4 defaults `spark.sql.ansi.enabled=true`,
  * so the reference's bare `cast('integer')` on decimal strings
  * (`etl/4-generate-final-table-gold.py:79`) would throw on malformed input.
  * The engine expresses the reference's EFFECTIVE legacy semantics
  * explicitly: `try_cast` (NULL on malformed) + explicit `floor` where the
  * legacy truncating string→int cast is wanted.
  */
object Enrich {

  /** X2/P8: `split(col, sep)[i]` with NULL (not error) when out of range
    * (E1:74 `split(nome,'  ')[1]`; under ANSI `getItem` would throw).
    * `i` is 0-based like the reference; `try_element_at` is 1-based.
    */
  def splitItem(c: Column, separator: String, i: Int): Column =
    try_element_at(split(c, separator), lit(i + 1))

  /** P9/X4/X5: `when(col.isin(values), to).otherwise(col)` (E4:37-38). */
  def remap(c: Column, values: Seq[String], to: String): Column =
    when(c.isin(values: _*), lit(to)).otherwise(c)

  /** Chained remaps applied in one expression. */
  def remapAll(c: Column, remaps: Seq[(Seq[String], String)]): Column =
    remaps.foldLeft(c) { case (acc, (vs, to)) => remap(acc, vs, to) }

  /** E4:47,54: decimal-comma string → dot. */
  def commaToDot(c: Column): Column = regexp_replace(c, ",", ".")

  /** Legacy-safe string→double: NULL on malformed (never throws in ANSI). */
  def toDoubleOrNull(c: Column): Column = try_cast(c, "double")

  /** The reference's effective `cast('integer')` on a decimal string
    * (E4:79 under legacy mode): parse as double, truncate toward zero.
    */
  def legacyStringToInt(c: Column): Column = {
    val d = try_cast(c, "double")
    when(d >= 0, floor(d)).otherwise(-floor(-d)).cast("int")
  }

  /** P10/X3. */
  def upperCol(c: Column): Column = upper(c)

  private def try_cast(c: Column, to: String): Column = c.try_cast(to)
}
