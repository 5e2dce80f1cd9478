package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source operators S1–S5 (SURVEY.md §2.1).
  *
  * The reference ingests header-ful CSVs with per-dataset delimiters and no
  * explicit schema — every column lands as string
  * (`gerenciando-dados-externos/0a-moving-from-land-to-bucket-to-parquet.py:26,38,52-53`)
  * — and re-reads parquet layer directories
  * (`etl/1-processing-banks.py:44`, `etl/4-generate-final-table-gold.py:7-9`).
  *
  * Scale note: CSV scans are file-parallel narrow reads; schema inference is
  * deliberately NOT enabled (it would add a full extra pass over 100 TB of
  * input). String-typed ingest + explicit downstream casts is both the
  * reference's semantics and the cheaper plan.
  */
object Readers {

  /** S1–S3: delimited text with header, all-string schema (no inference). */
  def csv(spark: SparkSession, path: String, delimiter: String = ",",
          header: Boolean = true, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("header", header.toString)
      .option("sep", delimiter)
    schema.fold(r)(s => r.schema(s)).csv(path)
  }

  /** S1: tab-separated (banks, G0a:26). */
  def tsv(spark: SparkSession, path: String): DataFrame = csv(spark, path, "\t")

  /** S3: pipe-separated (employees, G0a:52-53). */
  def psv(spark: SparkSession, path: String): DataFrame = csv(spark, path, "|")

  /** S4/S5: parquet directory or single file. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-lines source (engine extension; not in the reference surface). */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** JSONL read with inference, falling back to `schemaIfEmpty` when the
    * directory holds no data files (inference on an empty dir yields a
    * zero-column frame; a partition of a lake being empty is routine).
    */
  def jsonlOrEmpty(spark: SparkSession, path: String,
                   schemaIfEmpty: StructType): DataFrame = {
    val df = spark.read.json(path)
    if (df.columns.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemaIfEmpty)
    else df
  }

  /** Parquet read with an explicit schema — required to read BACK a layer
    * that may have been written from an empty frame (no part files ⇒
    * nothing to infer from; partitioned writes of empty frames emit only
    * _SUCCESS). On populated dirs behaves like [[parquet]], including
    * partition discovery.
    */
  def parquetWithSchema(spark: SparkSession, path: String,
                        schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)

  /** CSV ingest that CAPTURES malformed rows instead of dropping or dying:
    * PERMISSIVE mode with a corrupt-record column, so a quarantine branch
    * can write bad rows aside while good rows continue — at 100 TB some
    * malformed input is a certainty, and silent drops are unacceptable
    * for training-data lineage. Requires an explicit schema (the corrupt
    * column must be declared in it). NOTE: Spark refuses queries that
    * reference ONLY the corrupt column on the raw scan — cache() or write
    * the frame before splitting good/bad.
    */
  def csvWithCorruptCapture(spark: SparkSession, path: String,
                            schema: StructType, delimiter: String = ",",
                            corruptCol: String = "_corrupt_record"): DataFrame = {
    val full = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    spark.read
      .option("header", "true")
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(full)
      .csv(path)
  }

  /** JSONL ingest with malformed-line quarantine — the JSON sibling of
    * [[csvWithCorruptCapture]]: PERMISSIVE mode keeps every parseable
    * line, captures broken ones verbatim in the corrupt-record column.
    * Same explicit-schema and cache-before-splitting caveats apply.
    */
  def jsonlWithCorruptCapture(spark: SparkSession, path: String,
                              schema: StructType,
                              corruptCol: String = "_corrupt_record"): DataFrame = {
    val full = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(full)
      .json(path)
  }

  /** Parquet directory scan with schema merging across part files —
    * the read-side half of schema evolution (new columns appear as nulls
    * on old files). Costs a footer pass per file; use only on layers
    * where schemas actually drift.
    */
  def parquetMergeSchema(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
