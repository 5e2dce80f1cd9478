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
  *   3. fold in the exclusive prefix (sum of counts / max of values) of
  *      all EARLIER partitions.
  *
  * Two hazards of the naive version (r8 advice), both closed here:
  *
  *  - `repartitionByRange` samples its range bounds per execution with
  *    an RDD-id-derived seed, so running the prefix aggregation and the
  *    final action as SEPARATE jobs over an uncached exchange can place
  *    rows in DIFFERENT partitions between the two jobs once upstream
  *    partitions exceed the reservoir sample — silently wrong ranks.
  *    Fix: the ranged+locally-ranked frame is pinned (cached) and BOTH
  *    the prefix aggregation and the result read that one materialized
  *    partitioning. Callers release via [[Dedup.releaseCaches]] (the
  *    Bench/Verify harnesses already sweep after every query).
  *  - the prefix used to be folded into an O(P)-deep `when` chain of
  *    literals — a janino codegen-depth hazard at cluster widths
  *    (P in the thousands). Fix: the collected per-partition aggregate
  *    (bounded by the partition COUNT, never rows) is prefix-scanned on
  *    the driver and joined back as a broadcast LocalRelation — a
  *    broadcast hash join probe of a P-row table, constant codegen
  *    depth at any P, and the local-relation broadcast launches no
  *    extra Spark job (its collect is driver-local).
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
    // ONE range shuffle + an in-partition sort. The local rank comes
    // from `monotonically_increasing_id()` AFTER the sort (the id is
    // pid<<33 | physical-row-offset, so within a sorted partition it
    // ascends in sort order; Catalyst never reorders it across the sort
    // because it is non-deterministic) — NOT from a
    // Window.partitionBy(__pid), which would demand hashpartitioning
    // by __pid and insert a SECOND corpus-sized shuffle after the
    // range exchange. Pinned: the stats branch and the result branch
    // MUST read one materialized partitioning (scaladoc hazard #1).
    val local = Dedup.pin(
      df.repartitionByRange(numPartitions, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .withColumn("__pid", spark_partition_id())
        .withColumn("__mid", monotonically_increasing_id()))
    // Per-partition (count, first id) — ≤ numPartitions rows, ONE
    // bounded collect over the pinned frame → exclusive prefix sum on
    // the driver → joined back as a broadcast LocalRelation. The
    // local-relation broadcast needs no extra Spark job, and a join
    // (vs the old O(P) `when` literal chain) keeps codegen depth
    // constant at any P.
    val spark = df.sparkSession
    val stats = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"), min(col("__mid")).as("__min"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val offsets = stats.scanLeft(0L) { case (acc, (_, cnt, _)) => acc + cnt }
      .init.zip(stats).map { case (off, (pid, _, mn)) => (pid, mn, off) }
    import spark.implicits._
    val offsetsDf = spark.createDataset(offsets.toSeq)
      .toDF("__pid", "__min", "__off")
    local.join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn(out, col("__mid") - col("__min") + lit(1L) + col("__off"))
      .drop("__pid", "__mid", "__min", "__off")
  }

  /** Exact global running max `max(value) OVER (ORDER BY sortCols*
    * ROWS UNBOUNDED PRECEDING)` without a single-partition window —
    * the same two-phase shape as [[globalRowNumber]]: per-range-
    * partition running max, then each partition folds in the exclusive
    * prefix max of every EARLIER partition, computed in-plan from the
    * per-partition max aggregate (≤ numPartitions rows) and broadcast
    * back. Value ordering is Spark's own `max` comparator throughout.
    *
    * The local running max is a sequential `mapPartitions` scan over
    * the range-sorted partitions — NOT `Window.partitionBy(__pid)`,
    * which demands hashpartitioning by `__pid` and inserts a SECOND
    * corpus-sized Exchange directly above the range exchange (the
    * exact hazard [[globalRowNumber]]'s scaladoc documents; confirmed
    * in q237's physical plan in r9). A per-partition left-to-right
    * fold has no Catalyst expression, so `mapPartitions` is the
    * legitimate tool here: one pass, zero extra shuffles, and the
    * accumulator comparison reuses [[ordGe]] (Spark's own max
    * comparators, NaN-greatest for doubles).
    */
  def globalRunningMax(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
                       out: String, numPartitions: Int = 32): DataFrame = {
    val ranged = df.repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", valueCol)
    val vType = ranged.schema("__v").dataType
    // Fail fast on the DRIVER for value types [[ordGe]] cannot order —
    // otherwise the mismatch only surfaces as an executor-side
    // IllegalArgumentException mid-job. Keep in sync with ordGe.
    vType match {
      case _: org.apache.spark.sql.types.LongType | _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.ShortType | _: org.apache.spark.sql.types.ByteType |
           _: org.apache.spark.sql.types.DoubleType | _: org.apache.spark.sql.types.FloatType |
           _: org.apache.spark.sql.types.DecimalType | _: org.apache.spark.sql.types.StringType |
           _: org.apache.spark.sql.types.DateType | _: org.apache.spark.sql.types.TimestampType => ()
      case other => throw new IllegalArgumentException(
        s"globalRunningMax: unsupported value type $other (supported: " +
          "long/int/short/byte/double/float/decimal/string/date/timestamp)")
    }
    val runSchema = ranged.schema
      .add(org.apache.spark.sql.types.StructField("__run", vType, nullable = true))
    val local = Dedup.pin(
      ranged.mapPartitions { it =>
        val vIdx = runSchema.fieldIndex("__v")
        var acc: Any = null // running max so far; max() skips NULL inputs
        it.map { r =>
          val v = r.get(vIdx)
          if (v != null && (acc == null || ordGe(v, acc))) acc = v
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
        }
      }(org.apache.spark.sql.Encoders.row(runSchema)))
    val spark = df.sparkSession
    val maxes = local.groupBy(col("__pid")).agg(max(col("__v")).as("__m"))
      .collect().map(r => (r.getInt(0), r.get(1))).sortBy(_._1)
    // Exclusive prefix max per pid (None for the first partition —
    // `greatest` ignores NULLs, so its rows keep __run). Ordering
    // matches Spark's own max comparators: UTF8String bytes for
    // strings (NOT JVM UTF-16 order), compareTo for decimals.
    val prefixes = maxes.scanLeft((0, Option.empty[Any])) {
      case ((_, acc), (pid, m)) =>
        (pid, Seq(acc, Option(m)).flatten
          .reduceOption((a, b) => if (ordGe(a, b)) a else b))
    }.init.zip(maxes).map { case ((_, pre), (pid, _)) => (pid, pre) }
    val preSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__pre", vType,
        nullable = true)))
    val preDf = spark.createDataFrame(
      java.util.Arrays.asList(prefixes.map { case (pid, pre) =>
        org.apache.spark.sql.Row(pid, pre.orNull)
      }: _*), preSchema)
    local.join(broadcast(preDf), Seq("__pid"))
      .withColumn(out, greatest(col("__run"), col("__pre")))
      .drop("__pid", "__v", "__run", "__pre")
  }

  /** Value ordering for the running-max fold (executor-side per-row
    * scan AND driver-side prefix over ≤ numPartitions values) — MUST
    * agree with Spark's own `max` comparators or cross-partition
    * prefixes diverge from a single-partition window: strings compare
    * as UTF8String (UTF-8 BYTE order — JVM String `>=` is UTF-16
    * code-unit order and differs for supplementary-plane characters),
    * doubles/floats NaN-greatest via `compare` (JVM `>=` is false for
    * any NaN operand), decimals by compareTo.
    */
  private def ordGe(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long)     => x >= y
    case (x: Int, y: Int)       => x >= y
    case (x: Short, y: Short)   => x >= y
    case (x: Byte, y: Byte)     => x >= y
    // Row API surfaces dates/timestamps as java.sql types (or java.time
    // when spark.sql.datetime.java8API.enabled) — both are Comparable
    // with orderings that agree with Spark's max (days / micros since
    // epoch), so compareTo is exact here.
    case (x: java.sql.Date, y: java.sql.Date)           => x.compareTo(y) >= 0
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y) >= 0
    case (x: java.time.LocalDate, y: java.time.LocalDate) => x.compareTo(y) >= 0
    case (x: java.time.Instant, y: java.time.Instant)     => x.compareTo(y) >= 0
    // java.lang.Double.compare, NOT `x >= y`: JVM `>=` is false for any
    // NaN operand, while Spark's max/greatest ordering (TypeUtils) puts
    // NaN above every double — the two must agree or the cross-partition
    // prefix diverges from a single-partition window on NaN inputs.
    case (x: Double, y: Double) =>
      java.lang.Double.compare(x, y) >= 0
    case (x: Float, y: Float) =>
      java.lang.Float.compare(x, y) >= 0
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) =>
      x.compareTo(y) >= 0
    case (x: String, y: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) >= 0
    case _ => throw new IllegalArgumentException(
      s"unsupported running-max type: ${a.getClass}")
  }

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
