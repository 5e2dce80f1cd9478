package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class DeleteVectorsSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): String =
    Files.createTempDirectory("graft_dvdist").toString + "/t"

  private def plain(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  test("executor-side sidecars: per-file grouping, merge, retry-idempotent") {
    val store = freshStore()
    (0L until 40L).map(i => (i, i % 4)).toDF("id", "b")
      .repartition(col("b")).write.partitionBy("b").parquet(store)
    val files = new java.io.File(store).listFiles().toIndexedSeq
      .filter(f => f.isDirectory && f.getName.startsWith("b="))
      .flatMap(d => Writers.listParquetFiles(d.toString)).sorted
    assert(files.size >= 2)
    def victims(pred: org.apache.spark.sql.Column) =
      spark.read.option("basePath", store).parquet(files: _*)
        .filter(pred)
        .select(col("_metadata.file_path").as("file"),
          col("_metadata.row_index").as("pos"))
    // first delete: id % 10 == 3 → one victim per b-bucket file it lands in
    val sc1 = DeleteVectors.writeSidecars(victims(col("id") % 10 === 3), store)
    // driver state is |touched files|, keys are plain paths
    assert(sc1.nonEmpty && sc1.keySet.subsetOf(files.map(plain).toSet))
    val total1 = sc1.values.map(SnapshotLog.readDeleteVector(_).size).sum
    assert(total1 == 4) // ids 3,13,23,33
    // task-retry idempotence (content addressing): identical victims →
    // identical sidecar paths, nothing torn or duplicated
    assert(DeleteVectors.writeSidecars(
      victims(col("id") % 10 === 3), store) == sc1)
    // second delete on the same files MERGES the existing positions
    val sc2 = DeleteVectors.writeSidecars(
      victims(col("id") % 10 === 7), store, existing = sc1)
    val total2 = sc2.values.map(SnapshotLog.readDeleteVector(_).size).sum +
      sc1.filterNot { case (k, _) => sc2.contains(k) }
        .values.map(SnapshotLog.readDeleteVector(_).size).sum
    assert(total2 == 8) // 3,13,23,33 ∪ 7,17,27,37
    // positions are per-file correct: the ids whose (file,pos) the
    // sidecars mark are EXACTLY the union of both delete predicates
    val deletedIds = spark.read.option("basePath", store)
      .parquet(files: _*)
      .select(col("id"), col("_metadata.file_path").as("f"),
        col("_metadata.row_index").as("pos"))
      .as[(Long, String, Long)].collect()
      .filter { case (_, f, p) =>
        val dv = sc2.get(plain(f)).orElse(sc1.get(plain(f)))
        dv.exists(d => SnapshotLog.readDeleteVector(d).contains(p))
      }.map(_._1).toSet
    assert(deletedIds == Set(3L, 13L, 23L, 33L, 7L, 17L, 27L, 37L))
  }

  test("empty victims frame writes nothing") {
    val store = freshStore()
    Seq((1L, 0L)).toDF("id", "b").write.parquet(store)
    val files = Writers.listParquetFiles(store)
    val victims = spark.read.parquet(files: _*)
      .filter(lit(false))
      .select(col("_metadata.file_path").as("file"),
        col("_metadata.row_index").as("pos"))
    assert(DeleteVectors.writeSidecars(victims, store).isEmpty)
  }
}
