package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join, composed from built-ins (preference order (a) of
  * the build rules — no custom strategy needed): for every left row, the
  * right row with the greatest `rightTime` ≤ `leftTime` within the same
  * key group.
  *
  * Implementation: tag + union both sides, one shuffle on the key, sort by
  * (time, side, tiebreak) within partitions, and carry the latest right
  * value forward with `last(ignoreNulls = true)` over an unbounded-
  * preceding window. Right rows at exactly `leftTime` sort before left
  * rows, giving inclusive (≥) semantics.
  *
  * Scale: exactly one shuffle (hash on keys) + one sort — the same cost
  * profile as a sort-merge join, with no range-explosion. This is the
  * standard Spark formulation of the time-series as-of operator.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry (output as `asof_<c>`)
    * @param tiebreak  right-side column ordering ties on equal timestamps
    *                  (latest wins) — keeps the match deterministic.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               valueCols: Seq[String], tiebreak: Option[String] = None)
      : DataFrame = {
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val rTagged = right.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side") :+
        // natural-type ordering: casting to long would silently null out
        // non-numeric tiebreaks and lose determinism
        tiebreak.map(col).getOrElse(lit(0L)).as("__tb")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    // Left rows lack __tb/__v_*; right rows lack the left payload — the
    // by-name union null-fills both directions and we keep only left rows.
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .drop((Seq("__t", "__side", "__tb") ++ valueCols.map(c => s"__v_$c")): _*)
  }
}
