package graft.transform

import org.apache.spark.sql.DataFrame

/** P11 (SURVEY.md §2.2): column-name normalization.
  *
  * The reference loops `withColumnRenamed` over `df.columns`, lowercasing
  * (banks, `etl/1-processing-banks.py:54-58`) and additionally mapping
  * `-`/` ` → `_` (claims/employees, `etl/2-processing-claims.py:54-58`,
  * `etl/3-processing-employees.py:54-58`). That builds O(#cols) nested
  * Project nodes that Catalyst then has to collapse; here the rename is a
  * pure `String => String` applied in ONE `toDF` (a single Project).
  */
object Normalize {

  /** The reference's exact rename: lowercase, `-`→`_`, ` `→`_`. */
  def name(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT).replace('-', '_').replace(' ', '_')

  /** Extended variant: also trims and collapses runs of `_`. Idempotent. */
  def nameStrict(s: String): String =
    name(s.trim).replaceAll("_+", "_").stripPrefix("_").stripSuffix("_")

  def columns(df: DataFrame, f: String => String = name): DataFrame = {
    val renamed = df.columns.map(f)
    require(renamed.distinct.length == renamed.length,
      s"column-name normalization would collide: ${renamed.mkString(",")}")
    df.toDF(renamed.toIndexedSeq: _*)
  }

  /** P12: targeted renames applied in bulk (E2:60-61, E4:28). */
  def rename(df: DataFrame, renames: (String, String)*): DataFrame = {
    val m = renames.toMap
    df.toDF(df.columns.map(c => m.getOrElse(c, c)).toIndexedSeq: _*)
  }
}
