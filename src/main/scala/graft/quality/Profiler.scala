package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling: per-column null count, distinct count, min/max — the
  * "describe the batch" primitive behind DQ rule suggestion and drift
  * detection (complements the expectation suites in [[Expectations]]).
  *
  * One aggregate pass over the frame computes every metric for every
  * column (single scan — the reference's GE validator re-scans per
  * expectation, SURVEY §4.2); the single wide row is then exploded into a
  * long-form (col_name, metrics...) table driver-free.
  *
  * min/max are canonicalized to strings so heterogeneous columns share one
  * schema; callers pass a canonicalizer per column where raw casts are not
  * portable (e.g. doubles → fixed-scale decimal first, because
  * double→string formatting is engine-specific).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String],
              canon: Map[String, Column => Column] = Map.empty): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def canonical(c: String): Column =
      canon.getOrElse(c, identity[Column] _)(col(c))

    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"), // non-null count
        countDistinct(col(c)).as(s"__nd_$c"),
        min(canonical(c)).cast("string").as(s"__mn_$c"),
        max(canonical(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        (col("__rows") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"))
    }
    one.select(explode(array(entries: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_value"), col("p.max_value"))
  }
}
