package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** North-star multimodal-column plumbing (BASELINE.json "north_star").
  *
  * Media payloads are opaque `binary` columns + a typed metadata struct;
  * decode / feature-extraction runs per-partition over the typed Dataset so
  * a real codec drops in without touching the plan shape. The actual codec
  * is STUBBED (no image/audio libraries in this container): `decodeStub`
  * derives deterministic fake dimensions/features from the bytes, clearly
  * marked below. Everything else — schema, partitioning, batch iteration,
  * output contract — is the real Spark-side design.
  *
  * Scale notes: payload bytes never enter a shuffle (feature extraction is
  * a narrow mapPartitions before any wide op); only the small feature/
  * metadata columns flow downstream. Partition sizing is byte-based
  * (`spark.sql.files.maxPartitionBytes`) so huge binary rows don't skew
  * task sizes.
  */
object Multimodal {

  /** One media row: payload + self-describing metadata. */
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Int,
                                 width: Int, height: Int, feature: Array[Float])

  /** Build a media table from any table with an id and a binary-able
    * column (test harness uses `documents.text` bytes as the payload).
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   kind: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("payload"))

  // ======================================================================
  // STUB: deterministic fake decode. A real deployment replaces ONLY this
  // function with a codec call (e.g. image decode → (w, h, pixels)).
  // ======================================================================
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val len = payload.length
    val w = 1 + (math.abs(fold(payload, 17)) % 64).toInt
    val h = 1 + (math.abs(fold(payload, 31)) % 64).toInt
    val feat = Array.tabulate(8)(i => (fold(payload, 101 + i) % 1000) / 1000.0f)
    (w, h, feat)
  }

  private def fold(bytes: Array[Byte], seed: Int): Long = {
    var h = seed.toLong
    var i = 0
    while (i < bytes.length) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
    h
  }

  /** Feature extraction: typed mapPartitions — batch-shaped like a real
    * decode loop (iterator in, iterator out; one codec init per partition).
    */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      // (real impl: initialize the codec once per partition here)
      rows.map { r =>
        val (w, h, feat) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length, w, h, feat)
      }
    }
  }

  /** Pure-expression metadata pass (no decode): byte length + content hash.
    * This is the cheap first stage a 100 TB pipeline runs before deciding
    * what to decode.
    */
  def payloadMetadata(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      octet_length(col("payload")).as("byte_len"),
      xxhash64(col("payload")).as("content_hash"))

  /** REAL container decode (not the stub): PNG IHDR / JPEG SOF width and
    * height parsed from the binary payload in generated code
    * ([[graft.functions.ImageExpressions]]) — one narrow codegen'd pass,
    * payload bytes never shuffled; unrecognized payloads yield NULLs.
    */
  def imageMeta(media: DataFrame): DataFrame = {
    import graft.functions.ImageExpressions._
    media.select(col("media_id"), col("kind"),
      octet_length(col("payload")).as("byte_len"),
      image_format(col("payload")).as("fmt"),
      image_width(col("payload")).as("width"),
      image_height(col("payload")).as("height"))
  }
}
