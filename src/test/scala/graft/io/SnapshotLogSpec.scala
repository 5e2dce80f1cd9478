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

  test("versions ignores non-conforming names in _log (ADVICE r12)") {
    val store = freshStore()
    Seq((1L, 10L)).toDF("id", "v").write.parquet(store)
    SnapshotLog.commit(store, Writers.listParquetFiles(store))
    val log = new java.io.File(store, "_log")
    // stray files that used to throw NumberFormatException
    Files.write(new java.io.File(log, "v1.manifest~").toPath, Array[Byte]())
    Files.write(new java.io.File(log, "v.manifest").toPath, Array[Byte]())
    Files.write(new java.io.File(log, "v99999999999.manifest").toPath,
      Array[Byte]())
    assert(SnapshotLog.versions(store) == Seq(1))
    assert(SnapshotLog.latest(store) == 1)
  }

  test("entries round-trip dv + stats annotations; files() ignores them") {
    val store = freshStore()
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
      .coalesce(1).write.parquet(store)
    val f1 = Writers.listParquetFiles(store)
    val dv = SnapshotLog.writeDeleteVector(store, f1.head, Seq(2L, 0L, 2L))
    // positions are deduped + sorted
    assert(SnapshotLog.readDeleteVector(dv) == Seq(0L, 2L))
    val e = SnapshotLog.FileEntry(f1.head, dv = Some(dv),
      stats = Some(SnapshotLog.FileStats(1L, 3L, 3L)))
    val v = SnapshotLog.commitEntries(store, Seq(e), ts = Some(5000L))
    val back = SnapshotLog.entries(store, v)
    assert(back.size == 1)
    assert(back.head.path == plain(f1.head))
    assert(back.head.dv.map(plain) == Some(plain(dv)))
    assert(back.head.stats.contains(SnapshotLog.FileStats(1L, 3L, 3L)))
    // plain readers see just the data file, no annotation leakage
    assert(SnapshotLog.files(store, v) == Seq(plain(f1.head)))
    assert(SnapshotLog.commitTs(store, v).contains(5000L))
  }

  test("versionAsOf resolves by commit time and fails loudly before t0") {
    val store = freshStore()
    Seq((1L, 10L)).toDF("id", "v").write.parquet(store)
    val f1 = Writers.listParquetFiles(store)
    SnapshotLog.commit(store, f1, ts = Some(1000L))
    SnapshotLog.commit(store, f1, ts = Some(2000L))
    SnapshotLog.commit(store, f1, ts = Some(3000L))
    assert(SnapshotLog.versionAsOf(store, 1000L) == 1)
    assert(SnapshotLog.versionAsOf(store, 2500L) == 2)
    assert(SnapshotLog.versionAsOf(store, 9999L) == 3)
    intercept[IllegalArgumentException](SnapshotLog.versionAsOf(store, 999L))
  }

  test("vacuumOlderThan expires by time but always keeps the latest") {
    val store = freshStore()
    Seq((1L, 10L)).toDF("id", "v").write.parquet(store)
    val f1 = Writers.listParquetFiles(store)
    SnapshotLog.commit(store, f1, ts = Some(1000L))
    Seq((2L, 20L)).toDF("id", "v").write.mode("append").parquet(store)
    val f2 = Writers.listParquetFiles(store).filterNot(f1.contains)
    SnapshotLog.commit(store, f2, ts = Some(2000L))
    // cutoff beyond every commit: latest must survive regardless of age
    val removed = SnapshotLog.vacuumOlderThan(store, 99999L)
    assert(removed.toSet == f1.map(plain).toSet)
    assert(SnapshotLog.versions(store) == Seq(2))
    assert(SnapshotLog.files(store, 2).toSet == f2.map(plain).toSet)
  }

  test("vacuum drops expired manifests before data files (crash order)") {
    // can't crash mid-vacuum in a unit test, but the observable contract
    // holds: after vacuum no resolvable manifest references a deleted
    // file, and dv sidecars orphan together with their version
    val store = freshStore()
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v").coalesce(1).write.parquet(store)
    val f1 = Writers.listParquetFiles(store)
    val dv = SnapshotLog.writeDeleteVector(store, f1.head, Seq(0L))
    SnapshotLog.commitEntries(store,
      Seq(SnapshotLog.FileEntry(f1.head, dv = Some(dv))))
    Seq((3L, 30L)).toDF("id", "v").write.mode("append").parquet(store)
    val f2 = Writers.listParquetFiles(store).filterNot(f1.contains)
    SnapshotLog.commit(store, f2)
    val removed = SnapshotLog.vacuum(store, retainLast = 1)
    assert(removed.toSet == (f1.map(plain) :+ dv).toSet)
    assert(!new java.io.File(dv).exists())
    SnapshotLog.versions(store).foreach { v =>
      SnapshotLog.entries(store, v).foreach { e =>
        assert(new java.io.File(e.path).exists())
        e.dv.foreach(d => assert(new java.io.File(d).exists()))
      }
    }
  }

  test("refs: set/get/repoint; nonexistent version refused") {
    val store = freshStore()
    Seq((1L, 10L)).toDF("id", "v").write.parquet(store)
    val f1 = Writers.listParquetFiles(store)
    SnapshotLog.commit(store, f1)
    assert(SnapshotLog.getRef(store, "main").isEmpty)
    SnapshotLog.setRef(store, "main", 1)
    assert(SnapshotLog.getRef(store, "main").contains(1))
    SnapshotLog.commit(store, f1)
    SnapshotLog.setRef(store, "main", 2) // repoint = publish
    assert(SnapshotLog.getRef(store, "main").contains(2))
    intercept[IllegalArgumentException](SnapshotLog.setRef(store, "main", 9))
    intercept[IllegalArgumentException](
      SnapshotLog.setRef(store, "../evil", 1))
  }

  test("removeOrphans deletes only never-committed debris") {
    val store = freshStore()
    Seq((1L, 10L)).toDF("id", "v").coalesce(1).write.parquet(store)
    val f1 = Writers.listParquetFiles(store)
    val dv = SnapshotLog.writeDeleteVector(store, f1.head, Seq(0L))
    SnapshotLog.commitEntries(store,
      Seq(SnapshotLog.FileEntry(f1.head, dv = Some(dv))))
    // crashed writer: staged data + a dv sidecar, commit never happened
    Seq((9L, 90L)).toDF("id", "v").write.mode("append").parquet(store)
    val staged = Writers.listParquetFiles(store).filterNot(f1.contains)
    val orphanDv = SnapshotLog.writeDeleteVector(store, staged.head, Seq(1L))
    val removed = SnapshotLog.removeOrphans(store)
    assert(removed.toSet == (staged.map(plain) :+ orphanDv).toSet)
    // the committed generation is untouched and still resolves
    assert(new java.io.File(plain(f1.head)).exists())
    assert(new java.io.File(dv).exists())
    assert(SnapshotLog.files(store, 1) == Seq(plain(f1.head)))
    assert(SnapshotLog.removeOrphans(store).isEmpty) // idempotent
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
