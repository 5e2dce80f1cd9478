package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join for BIG-BIG inputs (engine extension; the broadcast
  * shape in q58 covers small-side cases).
  *
  * Problem: `l JOIN r ON r.ts ∈ (l.ts, l.ts + w]` with no (or a low-
  * cardinality) equality key degenerates to a cross product in a hash
  * join. Binning restores an equi-key: bucket both sides by
  * `floor(ts / w)`; a right row in `(l.ts, l.ts + w]` can only live in
  * the left row's bin or the next one, so the LEFT side is exploded into
  * those two bins (2× smaller side, not the corpus) and the join runs as
  * a plain shuffle hash join on (key, bin) with the exact range predicate
  * evaluated in the probe. Shuffle volume: 2|L| + |R|; candidate pairs
  * per bucket are bounded by the bin's time width, never |L|×|R|.
  */
object RangeJoin {

  /** Pairs (l, r) with `r.tsCol` in `(l.tsCol, l.tsCol + windowMs]` and
    * equal `keyCol` (pass a constant column as `key` for a pure range
    * join). Output: left columns prefixed `l_`, right prefixed `r_`.
    */
  def binned(left: DataFrame, right: DataFrame, keyCol: String,
             tsCol: String, windowMs: Long,
             leftCols: Seq[String], rightCols: Seq[String]): DataFrame = {
    require(windowMs > 0, "windowMs must be positive")
    val binOf: Column => Column =
      ts => floor(unix_millis(ts) / lit(windowMs)).cast("long")

    val l = left.select(
      (col(keyCol).as("__k") +: col(tsCol).as("__lts") +:
        leftCols.map(c => col(c).as(s"l_$c"))): _*)
      .withColumn("__bin", explode(array(binOf(col("__lts")), binOf(col("__lts")) + 1)))
    val r = right.select(
      (col(keyCol).as("__rk") +: col(tsCol).as("__rts") +:
        rightCols.map(c => col(c).as(s"r_$c"))): _*)
      .withColumn("__bin", binOf(col("__rts")))

    l.join(r, col("__k") === col("__rk") && l("__bin") === r("__bin") &&
        // strict lower bound at FULL timestamp precision (a millisecond-
        // truncated compare silently includes/excludes same-ms pairs);
        // the upper bound works on truncated millis, matching the bin key
        col("__rts") > col("__lts") &&
        unix_millis(col("__rts")) <= unix_millis(col("__lts")) + windowMs)
      .select((leftCols.map(c => col(s"l_$c")) ++ rightCols.map(c => col(s"r_$c")) :+
        col("__lts").as("l_ts") :+ col("__rts").as("r_ts")): _*)
  }
}
