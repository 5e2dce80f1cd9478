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
    // grace window (ADVICE r13): at the 3-day default the just-staged
    // files look like a LIVE writer's in-flight data and must survive
    assert(SnapshotLog.removeOrphans(store).isEmpty)
    // explicit future cutoff = "no concurrent writers" assertion
    val removed = SnapshotLog.removeOrphans(store,
      olderThanMs = System.currentTimeMillis() + 60000L)
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

  test("vacuum retains ref-targeted versions (ADVICE r13)") {
    val store = freshStore()
    Seq((1L, 10L)).toDF("id", "v").write.parquet(store)
    val f1 = Writers.listParquetFiles(store)
    SnapshotLog.commit(store, f1)
    Seq((2L, 20L)).toDF("id", "v").write.mode("append").parquet(store)
    val v2files = Writers.listParquetFiles(store).filterNot(f1.contains)
    SnapshotLog.commit(store, v2files)
    SnapshotLog.setRef(store, "main", 1) // published pointer at v1
    // retainLast=1 alone would expire v1 — the ref must pin it
    assert(SnapshotLog.vacuum(store, retainLast = 1).isEmpty)
    assert(SnapshotLog.versions(store) == Seq(1, 2))
    assert(SnapshotLog.files(store, 1).toSet == f1.map(plain).toSet)
    // dropping the ref releases the pin
    assert(new java.io.File(store + "/_log/refs/main").delete())
    val removed = SnapshotLog.vacuum(store, retainLast = 1)
    assert(removed.toSet == f1.map(plain).toSet)
    assert(SnapshotLog.versions(store) == Seq(2))
  }

  test("vacuumOlderThan retains untimestamped versions (ADVICE r13)") {
    val store = freshStore()
    Seq((1L, 10L)).toDF("id", "v").write.parquet(store)
    val f1 = Writers.listParquetFiles(store)
    SnapshotLog.commit(store, f1) // no ts: pre-retention history
    Seq((2L, 20L)).toDF("id", "v").write.mode("append").parquet(store)
    val f2 = Writers.listParquetFiles(store).filterNot(f1.contains)
    SnapshotLog.commit(store, f2, ts = Some(1000L))
    Seq((3L, 30L)).toDF("id", "v").write.mode("append").parquet(store)
    val f3 = Writers.listParquetFiles(store).filterNot((f1 ++ f2).contains)
    SnapshotLog.commit(store, f3, ts = Some(9000L))
    // cutoff expires v2 (ts=1000) but NOT v1: missing timestamp means
    // "age unknown", never "infinitely old"
    val removed = SnapshotLog.vacuumOlderThan(store, 5000L)
    assert(removed.toSet == f2.map(plain).toSet)
    assert(SnapshotLog.versions(store) == Seq(1, 3))
  }

  test("delete-vector sidecars are content-addressed and immutable") {
    val store = freshStore()
    Seq((1L, 10L)).toDF("id", "v").write.parquet(store)
    val f1 = Writers.listParquetFiles(store)
    // same file, same cardinality, DIFFERENT positions → distinct
    // sidecars (the r13 count-keyed name aliased these)
    val a = SnapshotLog.writeDeleteVector(store, f1.head, Seq(0L, 2L))
    val b = SnapshotLog.writeDeleteVector(store, f1.head, Seq(1L, 3L))
    assert(a != b)
    assert(SnapshotLog.readDeleteVector(a) == Seq(0L, 2L))
    assert(SnapshotLog.readDeleteVector(b) == Seq(1L, 3L))
    // identical positions are idempotent: same path, contents verified
    assert(SnapshotLog.writeDeleteVector(store, f1.head, Seq(2L, 0L)) == a)
    // a corrupted sidecar at the content-addressed name fails loudly
    // instead of being overwritten
    Files.write(java.nio.file.Paths.get(a), "999".getBytes)
    intercept[IllegalArgumentException](
      SnapshotLog.writeDeleteVector(store, f1.head, Seq(0L, 2L)))
  }

  test("commitStrict fails loudly on a racing commit (VERDICT r13 #6)") {
    val store = freshStore()
    Seq((1L, 10L)).toDF("id", "v").write.parquet(store)
    val f1 = Writers.listParquetFiles(store)
    val base = SnapshotLog.commit(store, f1)
    // a racing writer lands v2 first
    assert(SnapshotLog.commitIfBase(store, f1, base).contains(2))
    // the strict single-writer path must THROW, never silently advance —
    // the pattern the streaming sinks (q344/q348/q356/q358) now run
    val e = intercept[IllegalStateException](
      SnapshotLog.commitStrict(store, f1, base))
    assert(e.getMessage.contains("lost the race"))
    assert(SnapshotLog.latest(store) == 2) // nothing committed past it
    // no conflict → commits and returns the version
    assert(SnapshotLog.commitStrict(store, f1, 2) == 3)
  }
}
