package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ranking primitives.
  *
  * A bare `row_number().over(Window.orderBy(...))` funnels the entire
  * frame through ONE partition — fine for k-bounded frames (top-50
  * lists, fold grids), fatal for corpus-sized ones: at 100 TB the
  * single-partition sort is THE bottleneck and the first OOM. The
  * classic fix (re-expressed from the public `zipWithIndex` pattern —
  * Spark's own RDD.zipWithIndex does exactly this two-phase count) is:
  *
  *   1. range-partition by the sort key — RangePartitioner guarantees
  *      every row in partition i orders before every row in i+1;
  *   2. per-partition local `row_number` (each partition sorts only its
  *      own slice — P-way parallel, spill-safe);
  *   3. add the broadcast prefix-sum of partition counts.
  *
  * The collect in step 3 is bounded by the partition COUNT (hundreds),
  * never the row count — driver-safe at any corpus size.
  */
object Ranks {

  /** Exact global `row_number() OVER (ORDER BY sortCols*)` without a
    * single-partition window. `sortCols` must be a total order (add a
    * unique id as the last key) or ranks of ties are partition-placement
    * dependent, exactly as they are for the single-partition window.
    *
    * @param numPartitions width of the range shuffle; at gate SF a
    *        handful, at 100 TB set to the cluster's reduce width.
    */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      out: String, numPartitions: Int = 32): DataFrame = {
    val ranged = df.repartitionByRange(numPartitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val local = ranged.withColumn("__rn",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(sortCols: _*)))
    // partition counts -> prefix offsets; bounded by numPartitions rows.
    val counts = local.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (pid, cnt)) => (pid, acc + cnt)
    }.sliding(2).collect { case Array((_, off), (pid, _)) => (pid, off) }.toMap
    val offCol = offsets.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(acc)
    }
    local.withColumn(out, col("__rn").cast("long") + offCol)
      .drop("__pid", "__rn")
  }

  /** Exact global running max `max(value) OVER (ORDER BY sortCols*
    * ROWS UNBOUNDED PRECEDING)` without a single-partition window —
    * the same two-phase shape as [[globalRowNumber]]: per-range-
    * partition running max, then each partition folds in the broadcast
    * max of every EARLIER partition. The prefix array is bounded by
    * the partition count, never the row count.
    */
  def globalRunningMax(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
                       out: String, numPartitions: Int = 32): DataFrame = {
    val ranged = df.repartitionByRange(numPartitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", valueCol)
    val local = ranged.withColumn("__run",
      max(col("__v")).over(Window.partitionBy(col("__pid"))
        .orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val maxes = local.groupBy(col("__pid")).agg(max(col("__v")).as("__m"))
      .collect().map(r => (r.getInt(0), r.get(1))).sortBy(_._1)
    // exclusive prefix max per pid (null when no earlier partition)
    val prefixes = maxes.scanLeft((Int.MinValue, Option.empty[Any])) {
      case ((_, acc), (pid, m)) =>
        (pid, Seq(acc, Option(m)).flatten
          .reduceOption((a, b) => if (ordGe(a, b)) a else b))
    }.sliding(2).collect {
      case Array((_, pre), (pid, _)) => (pid, pre)
    }.toMap
    val preCol = prefixes.foldLeft(lit(null).cast(schemaOf(ranged, "__v"))) {
      case (acc, (pid, pre)) =>
        when(col("__pid") === pid,
          pre.map(v => lit(v)).getOrElse(lit(null))).otherwise(acc)
    }
    local.withColumn(out, greatest(col("__run"), preCol))
      .drop("__pid", "__v", "__run")
  }

  private def ordGe(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long)     => x >= y
    case (x: Int, y: Int)       => x >= y
    case (x: Double, y: Double) => x >= y
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) =>
      x.compareTo(y) >= 0
    case (x: String, y: String) => x >= y
    case _ => throw new IllegalArgumentException(
      s"unsupported running-max type: ${a.getClass}")
  }

  private def schemaOf(df: DataFrame, name: String) =
    df.schema(name).dataType.sql

  /** SQL `ntile(k)` reconstructed arithmetically from a global
    * row_number `rn` and total count `n` — the exact standard
    * semantics (first `n mod k` buckets get the extra row), so it is
    * hash-identical to a window ntile while letting the rank come from
    * [[globalRowNumber]] instead of a single-partition sort. All
    * arithmetic is on longs < 2^52 so the double-floor is exact.
    */
  def ntileFromRank(rn: Column, n: Column, k: Int): Column = {
    val q = floor(n.cast("long") / lit(k.toLong)).cast("long")
    val r = n.cast("long") - q * k
    val big = q + lit(1L)
    when(rn <= r * big, floor((rn - 1) / big) + 1)
      .otherwise(r + floor((rn - r * big - 1) / q) + 1)
      .cast("int")
  }
}
