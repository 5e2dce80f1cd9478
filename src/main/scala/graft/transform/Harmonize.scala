package graft.transform

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField}

/** U1 + P1 + P6 (SURVEY.md §2.2, §2.6): schema harmonization + union.
  *
  * The reference pads missing columns with `lit('')`
  * (`gerenciando-dados-externos/0a-...py:56-57`), forces one canonical
  * column order via `select` (G0a:60-63), then does a POSITIONAL `union`
  * (G0a:66) — correct only because of the forced ordering (SURVEY §4.4-d).
  * Here the same semantics (missing string columns become empty string, not
  * null) run through `unionByName`, which is order-safe by construction.
  */
object Harmonize {

  /** Pad `df` so it has every column in `target` (missing → typed default). */
  def pad(df: DataFrame, target: Seq[StructField]): DataFrame = {
    val present = df.columns.toSet
    val cols: Seq[Column] = target.map { f =>
      if (present(f.name)) col(f.name)
      else f.dataType match {
        case StringType => lit("").as(f.name) // reference semantics (G0a:56-57)
        case dt         => lit(null).cast(dt).as(f.name)
      }
    }
    df.select(cols: _*)
  }

  /** Union N frames by name after padding to the merged schema. First-seen
    * column order wins (mirrors the reference's canonical list, G0a:60-63).
    */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionAll of zero frames")
    val merged: Seq[StructField] =
      dfs.flatMap(_.schema.fields).foldLeft(Vector.empty[StructField]) {
        (acc, f) => if (acc.exists(_.name == f.name)) acc else acc :+ f
      }
    dfs.map(pad(_, merged)).reduce(_.unionByName(_))
  }
}
