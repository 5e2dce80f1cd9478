package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SnapshotLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): String =
    Files.createTempDirectory("graft_snaplog").toString + "/t"

  // listParquetFiles returns scheme'd Hadoop URIs; the log stores plain
  // absolute paths — compare in plain form
  private def plain(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  test("commit/files/latest: versions accumulate, paths relativize") {
    val store = freshStore()
    Seq((1L, 10L)).toDF("id", "v").write.parquet(store)
    val f1 = Writers.listParquetFiles(store)
    assert(f1.nonEmpty)
    assert(SnapshotLog.latest(store) == 0)
    assert(SnapshotLog.commit(store, f1) == 1)
    Seq((2L, 20L)).toDF("id", "v").write.mode("append").parquet(store)
    val f2 = Writers.listParquetFiles(store)
    assert(SnapshotLog.commit(store, f2) == 2)
    assert(SnapshotLog.versions(store) == Seq(1, 2))
    // manifests resolve back to absolute paths under the store
    assert(SnapshotLog.files(store, 1).toSet == f1.map(plain).toSet)
    assert(SnapshotLog.files(store, 2).toSet == f2.map(plain).toSet)
    // time travel: v1 read sees only the first commit's rows
    val v1 = spark.read.parquet(SnapshotLog.files(store, 1): _*)
    assert(v1.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("unknown version fails loudly") {
    val store = freshStore()
    Seq((1L, 10L)).toDF("id", "v").write.parquet(store)
    SnapshotLog.commit(store, Writers.listParquetFiles(store))
    intercept[IllegalArgumentException](SnapshotLog.files(store, 7))
  }

  test("commitIfBase: stale base conflicts, current base lands") {
    val store = freshStore()
    Seq((1L, 10L)).toDF("id", "v").write.parquet(store)
    val f1 = Writers.listParquetFiles(store)
    val base = SnapshotLog.commit(store, f1)
    assert(base == 1)
    // writer A wins v2
    assert(SnapshotLog.commitIfBase(store, f1, base).contains(2))
    // writer B against the stale base must conflict (CREATE_NEW of the
    // v2 manifest is the lock)
    assert(SnapshotLog.commitIfBase(store, f1, base).isEmpty)
    // rebase onto the current version lands v3
    assert(SnapshotLog.commitIfBase(store, f1, 2).contains(3))
    assert(SnapshotLog.versions(store) == Seq(1, 2, 3))
  }

  test("vacuum removes only unreferenced files and expired manifests") {
    val store = freshStore()
    Seq((1L, 10L)).toDF("id", "v").write.parquet(store)
    val f1 = Writers.listParquetFiles(store)
    SnapshotLog.commit(store, f1)
    Seq((2L, 20L)).toDF("id", "v").write.mode("append").parquet(store)
    val f2 = Writers.listParquetFiles(store)
    // v2 drops the v1 file (a copy-on-write rewrite): v1's file becomes
    // an orphan once v1 expires
    val v2files = f2.filterNot(f1.contains)
    SnapshotLog.commit(store, v2files)
    val removed = SnapshotLog.vacuum(store, retainLast = 1)
    assert(removed.toSet == f1.map(plain).toSet)
    assert(f1.forall(p => !new java.io.File(plain(p)).exists()))
    assert(v2files.forall(p => new java.io.File(plain(p)).exists()))
    // expired manifest is gone; retained one still resolves
    intercept[IllegalArgumentException](SnapshotLog.files(store, 1))
    assert(SnapshotLog.files(store, 2).toSet == v2files.map(plain).toSet)
    val v2 = spark.read.parquet(SnapshotLog.files(store, 2): _*)
    assert(v2.select("id").as[Long].collect().toSeq == Seq(2L))
  }
}
