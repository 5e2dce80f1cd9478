package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink + filesystem operators S6–S8 (SURVEY.md §2.1).
  *
  * S6: `df.write.mode('overwrite').parquet(path)` (G0a:28,40,69; E1:79;
  * E4:96). S7: list a layer dir and pick `*.parquet` part-files
  * (E1:91-97). S8: recursive copy between storage roots (G0b:8, E1:196,
  * E4:101) — the reference uses `dbutils.fs.cp`; the portable equivalent is
  * the Hadoop FileSystem API, which also covers cloud object stores when the
  * right FS implementation is on the classpath.
  *
  * Scale note: writers take an optional partition-by column list — at 100 TB
  * the layer layout (e.g. partition silver by ingest date / segment) is what
  * makes downstream partition pruning possible (SURVEY §4.1).
  */
object Writers {

  /** S6: parquet sink. `partitionBy` enables partition pruning downstream. */
  def parquet(df: DataFrame, path: String,
              mode: SaveMode = SaveMode.Overwrite,
              partitionBy: Seq[String] = Nil): DataFrame = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
    df
  }

  /** Engine extensions beyond the reference's parquet-only sink: the same
    * layer contract over ORC / JSON-lines / delimited text.
    */
  def orc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
          partitionBy: Seq[String] = Nil): DataFrame = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
    df
  }

  def jsonl(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): DataFrame = {
    df.write.mode(mode).json(path)
    df
  }

  def csv(df: DataFrame, path: String, delimiter: String = ",",
          header: Boolean = true, mode: SaveMode = SaveMode.Overwrite): DataFrame = {
    df.write.mode(mode)
      .option("header", header.toString).option("sep", delimiter).csv(path)
    df
  }

  /** Small-file compaction with optional clustering: re-lay a parquet
    * directory into ~`targetBytesPerFile` files; with `sortCols`, rows are
    * range-partitioned + sorted within files so parquet row-group min/max
    * stats prune reads on those columns (poor-man's Z-order for one sort
    * family). Writes to a temp sibling then swaps, so a failed compaction
    * never destroys the input. Returns the new file count.
    *
    * The 100 TB story: streaming/micro-batch sinks accrete thousands of
    * small files per partition; compaction is the maintenance op that
    * keeps scan task counts and footer overhead sane.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetBytesPerFile: Long = 128L << 20,
              sortCols: Seq[String] = Nil): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(dir)
    val fileSys = fs(src, conf)
    val totalBytes = fileSys.listStatus(src)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetBytesPerFile - 1) / targetBytesPerFile).toInt
    val df = spark.read.parquet(dir)
    val arranged =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(nFiles)
    val tmp = new Path(src.getParent, src.getName + "._compact_tmp")
    arranged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fileSys.delete(src, true)
    fileSys.rename(tmp, src)
    nFiles
  }

  private def fs(path: Path, conf: Configuration): FileSystem = path.getFileSystem(conf)

  /** S7: list `*.parquet` part-files under a directory (E1:91-97). */
  def listParquetFiles(dir: String, conf: Configuration = new Configuration()): Seq[String] = {
    val p = new Path(dir)
    val f = fs(p, conf)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toIndexedSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
      .sorted
  }

  /** S8: recursive copy (G0b:8 `dbutils.fs.cp(src, dst, True)`). */
  def copyRecursive(src: String, dst: String,
                    conf: Configuration = new Configuration()): Boolean = {
    val s = new Path(src)
    val d = new Path(dst)
    FileUtil.copy(fs(s, conf), s, fs(d, conf), d, /*deleteSource=*/ false,
      /*overwrite=*/ true, conf)
  }
}
