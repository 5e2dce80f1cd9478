package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass micro-batch staging for the file-source streaming gates.
  *
  * The gates replay arrival order by laying N single-file "micro
  * batches" into a source directory (ascending mtimes +
  * `maxFilesPerTrigger=1` make the file source consume them as N
  * batches). The original idiom ran N separate filter + `coalesce(1)`
  * write jobs — N full scans of the (jitter-decorated) input frame.
  * This helper stages ALL N slices in ONE job: bucketize each row by
  * its span-slice, shuffle once on the bucket, and let a single
  * `partitionBy` write emit one file per non-empty bucket. Buckets the
  * data skipped get a copy of a once-written empty-template file, so
  * the BATCH COUNT — which the lagged-watermark oracles replay as a
  * fixed protocol — stays data-independent, exactly as the N-filter
  * loop guaranteed.
  *
  * Slice boundaries reproduce the loop's integer arithmetic verbatim:
  * row → slice i iff `ord ∈ [lo + i*span/n, lo + (i+1)*span/n)` (last
  * slice open-ended), computed as a sum of boundary indicators — no
  * float division anywhere. Rows inside each staged file are sorted by
  * `(ord, tieKeys…)` so file bytes are deterministic across runs
  * despite the shuffle's nondeterministic reduce-side fetch order (the
  * stateful processors sort per key anyway; this pins the iterator
  * order they'd see for equal timestamps too).
  */
object Staging {

  private def firstParquet(dir: Path): Option[Path] = {
    val s = Files.list(dir)
    try {
      val o = s.filter(_.toString.endsWith(".parquet")).findFirst()
      if (o.isPresent) Some(o.get) else None
    } finally s.close()
  }

  private def place(src: Path, i: Int, srcDir: Path, move: Boolean): Unit = {
    val dst = srcDir.resolve(f"part-$i%02d.parquet")
    if (move) Files.move(src, dst, StandardCopyOption.REPLACE_EXISTING)
    else Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dst,
      FileTime.fromMillis(1000000000000L + i * 10000L))
  }

  /** Stage `df` into `n` slice files under `srcDir` (parts 0..n-1) by
    * the span-slice of `ord`, using `tmp` as scratch. `ord` must be
    * computable from `df`'s own columns; the staged files carry exactly
    * `df`'s schema.
    *
    * Contract (matches the N-filter loop this replaced): rows with a
    * NULL `ord` or with `ord < lo` are DROPPED, explicitly. The loop's
    * `ord >= b && ord < e` was never true for NULL and its first slice
    * started at `lo`; without the filter, NULL-ord rows would vanish
    * into an unread `__HIVE_DEFAULT_PARTITION__` directory and
    * below-lo rows would land in bucket 0 (the indicator sum is 0 for
    * them), silently reshaping slice membership for a caller that
    * passes a clamped `lo`. Every current caller passes lo = min(ord),
    * so the lower-bound filter is a no-op for them.
    */
  def stageSlices(df: DataFrame, ord: Column, n: Int, lo: Long, span: Long,
                  srcDir: Path, tmp: Path,
                  tieKeys: Seq[Column] = Nil): Unit = {
    require(n >= 1, s"n=$n")
    val bucket = (1 until n)
      .map(j => (ord >= lit(lo + j.toLong * span / n)).cast("int"))
      .reduceOption[Column](_ + _).getOrElse(lit(0))
    val bucketed = tmp.resolve("buckets")
    df.filter(ord.isNotNull && ord >= lit(lo))
      .withColumn("__b", bucket)
      .repartition(n, col("__b"))
      .sortWithinPartitions(col("__b") +: ord +: tieKeys: _*)
      .write.mode("overwrite").partitionBy("__b").parquet(bucketed.toString)
    val emptyDir = tmp.resolve("empty")
    df.limit(0).coalesce(1).write.mode("overwrite")
      .parquet(emptyDir.toString)
    val template = firstParquet(emptyDir).get
    (0 until n).foreach { i =>
      val bdir = bucketed.resolve(s"__b=$i")
      val part =
        if (Files.isDirectory(bdir)) firstParquet(bdir) else None
      part match {
        case Some(p) => place(p, i, srcDir, move = true)
        case None => place(template, i, srcDir, move = false)
      }
    }
  }

  /** Stage one single-file batch (the sentinel idiom) as part `i`. */
  def stageOne(df: DataFrame, i: Int, srcDir: Path, tmp: Path): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    place(firstParquet(tmp).get, i, srcDir, move = true)
  }
}
