package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Z-order (Morton) data layout for multi-dimensional scan pruning.
  *
  * Why it matters at 100 TB: hive partitioning (q107) prunes on ONE
  * column; a lexicographic sort serves only its leading column. A
  * corpus queried by several selective dimensions at once (length ×
  * token count, date × source, …) wants a single cluster key whose
  * ranges are small RECTANGLES in the multi-dimensional space — the
  * Morton curve: bucketize each dimension, interleave the bits
  * ([[VectorExpressions.MortonInterleave]], a native codegen
  * expression gated bit-for-bit by q111), range-partition + sort by
  * the z-value, and every parquet file / row group owns a bounded box.
  * Delta/Iceberg `OPTIMIZE ZORDER BY` is this same idea; here the key
  * is a plain stored column any engine can recompute, which is what
  * makes the layout ORACLE-CHECKABLE end to end (q302).
  *
  * Everything is integer-exact bit arithmetic — no UDFs, no floating
  * point, whole-stage codegen throughout.
  */
object Layout {

  /** Clamp a non-negative metric into [0, 2^bits) buckets of width
    * 2^widthBits: least(x >> widthBits, 2^bits - 1). A bit shift, not
    * a division — Spark's `/` on Columns is TRUE (double) division and
    * a double quotient can land ±1 ulp around an exact integer
    * (SCALE.md r6); power-of-two widths keep the whole layout in exact
    * integer arithmetic end to end.
    */
  def bucket(x: Column, widthBits: Int, bits: Int = 8): Column =
    least(shiftright(x.cast("long"), widthBits), lit((1L << bits) - 1))

  /** The cluster key: Morton interleave of two bucketized dimensions
    * (`a` at even bit positions, `b` at odd — q111's gated convention).
    */
  def zkey(a: Column, b: Column): Column =
    VectorExpressions.morton_interleave(a.cast("int"), b.cast("int"))

  /** Inclusive z-window [z(aLo,bLo), z(aHi,bHi)] for a box query — a
    * SUPERSET of the box, because the Morton code is componentwise
    * monotone (increasing either coordinate with the other fixed moves
    * every one of its bits to equal-or-higher values at fixed
    * positions). Scan the window, then re-apply the exact box
    * predicate: the standard two-phase z-order read. The window is
    * what parquet footer min/max stats prune against.
    */
  def zWindow(aLo: Long, bLo: Long, aHi: Long, bHi: Long): (Long, Long) =
    (VectorExpressions.MortonInterleave.interleave(aLo, bLo),
      VectorExpressions.MortonInterleave.interleave(aHi, bHi))

  /** Write `df` z-clustered: compute the stored cluster key `z`, range-
    * partition by it (each output file owns a contiguous z-interval →
    * a bounded box), sort within partitions (each ROW GROUP's interval
    * is tighter still), write parquet. `z` is KEPT as a real column —
    * 8 bytes/row buys a filter (`z BETWEEN zlo AND zhi`) that pushes
    * to the scan as an ordinary column predicate, so footer stats skip
    * non-overlapping row groups with no engine extension at read time
    * (dropping the key, as Delta does, would make pruning depend on
    * per-base-column stats instead — pushable here too, but the stored
    * key is what an external oracle can recompute and audit). No
    * directory explosion: hive-partitioning by z would mint one dir
    * per distinct value.
    */
  def zorderWrite(df: DataFrame, a: Column, b: Column, path: String,
                  numPartitions: Int = 8): Unit =
    df.withColumn("z", zkey(a, b))
      .repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(path)

  /** 3-D cluster key: Morton interleave of three bucketized dimensions
    * (`a` at positions 3i, `b` at 3i+1, `c` at 3i+2 —
    * [[VectorExpressions.MortonInterleave3]]). Real corpus layouts
    * cluster three dimensions at once (date × source × length); a 2-D
    * key leaves the third unserved the way a lexicographic sort leaves
    * the second unserved — q314 measures both degenerations.
    *
    * DOMAIN: each dimension must already be a bucket in [0, 2^21)
    * (ADVICE r11 #1 — [[bucket]] produces one). The interleave keeps
    * only the low 21 bits per dim, so an out-of-range value would
    * ALIAS onto another cell and silently void [[zWindow3]]'s superset
    * guarantee; the guard below raises on the first out-of-range value
    * instead.
    */
  def zkey3(a: Column, b: Column, c: Column): Column = {
    def dom(x: Column): Column = {
      val v = x.cast("long")
      when(v >= 0 && v < (1L << 21), v.cast("int"))
        .otherwise(raise_error(concat(
          lit("zkey3 input outside [0, 2^21): "), v.cast("string")))
          .cast("int"))
    }
    VectorExpressions.morton_interleave3(dom(a), dom(b), dom(c))
  }

  /** Inclusive 3-D z-window — a superset interval of the query box, by
    * the same componentwise monotonicity as [[zWindow]]; scan the
    * window, then re-apply the exact box predicate. Bounds share
    * [[zkey3]]'s [0, 2^21) domain; out-of-range bounds would alias and
    * void the superset guarantee, so they fail loudly here.
    */
  def zWindow3(aLo: Long, bLo: Long, cLo: Long,
               aHi: Long, bHi: Long, cHi: Long): (Long, Long) = {
    val lim = 1L << 21
    Seq(aLo, bLo, cLo, aHi, bHi, cHi).foreach(v =>
      require(v >= 0 && v < lim, s"zWindow3 bound $v outside [0, 2^21)"))
    (VectorExpressions.MortonInterleave3.interleave3(aLo, bLo, cLo),
      VectorExpressions.MortonInterleave3.interleave3(aHi, bHi, cHi))
  }

  /** Write `df` clustered by the 3-D Morton key (the [[zorderWrite]]
    * layout with [[zkey3]]); the stored `z` column serves pushdown-able
    * window filters identically to the 2-D case.
    */
  def zorderWrite3(df: DataFrame, a: Column, b: Column, c: Column,
                   path: String, numPartitions: Int = 8): Unit =
    df.withColumn("z", zkey3(a, b, c))
      .repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(path)
}
