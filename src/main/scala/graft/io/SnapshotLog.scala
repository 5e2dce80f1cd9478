package graft.io

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Manifest-committed snapshot log over a parquet directory — the
  * storage-format half of snapshot isolation (the Iceberg/Delta commit
  * model, re-expressed minimally): a table version is an immutable LIST
  * OF FILES, not a directory listing. Writers add data files with
  * whatever physical layout they like, then `commit` the complete file
  * set of the new version; readers resolve a version's manifest and
  * read exactly those files. Because old manifests keep referencing old
  * files, any historical version stays readable ("time travel") until
  * `vacuum` reclaims files no longer referenced by the retained
  * versions.
  *
  * The 100 TB story: directory listings are both slow (object-store
  * LIST at millions of files) and WRONG under concurrent maintenance —
  * a compaction that rewrites files would corrupt in-flight readers
  * that discovered files by listing. Manifest resolution makes reads
  * O(|manifest|) and gives copy-on-write maintenance (delete, compact,
  * re-cluster) atomic swap semantics: readers of version v never see
  * version v+1's rewrites. Reference scope note: the reference reads
  * and rewrites bare directories (e.g. its silver/gold relayering,
  * E1:79-97); this component is the extension that makes those
  * relayerings safe to run WHILE the table is being read.
  *
  * Layout: `<store>/_log/v<N>.manifest` — one RELATIVE data-file path
  * per line, N monotonically increasing from 1. The log dir lives
  * inside the store so a store is self-contained (copy/move-able with
  * `Writers.copyRecursive`).
  */
object SnapshotLog {

  private val LogDir = "_log"
  private val Suffix = ".manifest"

  private def logDir(store: String): File = new File(store, LogDir)

  private def manifestFile(store: String, version: Int): File =
    new File(logDir(store), s"v$version$Suffix")

  /** Versions present in the log, ascending. */
  def versions(store: String): Seq[Int] = {
    val d = logDir(store)
    val kids = d.listFiles()
    (if (kids == null) Array.empty[File] else kids).toIndexedSeq
      .map(_.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(Suffix) =>
        n.stripPrefix("v").stripSuffix(Suffix).toInt
      }
      .sorted
  }

  def latest(store: String): Int = versions(store).lastOption.getOrElse(0)

  /** Commit `files` (absolute or store-relative paths of the version's
    * COMPLETE data-file set) as the next version; returns its number.
    * Paths are stored relative to the store root, sorted, so manifests
    * are deterministic and survive a store move. The manifest is
    * written CREATE_NEW — manifest creation is the commit's atomic
    * primitive, so two writers racing for the same version number
    * cannot both succeed (the loser retries against the next number).
    */
  def commit(store: String, files: Seq[String]): Int = {
    var v = latest(store) + 1
    while (!tryWrite(store, v, files)) v += 1
    v
  }

  /** Optimistic-concurrency commit: succeed ONLY if the log is still at
    * `expectedBase` (the version this writer read and built its file
    * set against). Returns the new version, or None on conflict — the
    * caller must re-read the current version, REBASE its change (its
    * file set referenced base-version files that may no longer be
    * current), and try again. This is the Iceberg/Delta commit
    * protocol: the atomic CREATE_NEW of `v(expectedBase+1)` is the
    * whole lock.
    */
  def commitIfBase(store: String, files: Seq[String],
                   expectedBase: Int): Option[Int] = {
    val v = expectedBase + 1
    if (tryWrite(store, v, files)) Some(v) else None
  }

  private def tryWrite(store: String, version: Int,
                       files: Seq[String]): Boolean = {
    val root = Paths.get(store).toAbsolutePath.normalize()
    val rel = files.map { f =>
      // accept scheme'd Hadoop URIs (file:/...) as well as plain paths
      val plain = new org.apache.hadoop.fs.Path(f).toUri.getPath
      val p = Paths.get(plain).toAbsolutePath.normalize()
      if (p.startsWith(root)) root.relativize(p).toString else plain
    }.sorted
    val dir = logDir(store)
    if (!dir.isDirectory) { dir.mkdirs(); () }
    try {
      Files.write(manifestFile(store, version).toPath,
        rel.mkString("\n").getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }
  }

  /** Absolute data-file paths of `version`. Fails loudly on an unknown
    * (never committed, or log-truncated) version.
    */
  def files(store: String, version: Int): Seq[String] = {
    val f = manifestFile(store, version)
    require(f.isFile, s"snapshot v$version does not exist under $store/_log")
    val root = Paths.get(store).toAbsolutePath.normalize()
    Files.readAllLines(f.toPath, StandardCharsets.UTF_8).asScala.toIndexedSeq
      .filter(_.nonEmpty)
      .map(l => root.resolve(l).toString)
  }

  /** Delete data files referenced by NO retained version (the newest
    * `retainLast` manifests; older manifests are dropped from the log so
    * a later time-travel read fails loudly instead of reading holes).
    * Returns the deleted data-file paths. Driver-side cost is
    * O(total files in the log), never a data read.
    */
  def vacuum(store: String, retainLast: Int = 1): Seq[String] = {
    val vs = versions(store)
    val retained = vs.takeRight(math.max(1, retainLast))
    val keep = retained.flatMap(files(store, _)).toSet
    val all = vs.flatMap(files(store, _)).distinct
    val orphans = all.filterNot(keep.contains)
    orphans.foreach(p => Files.deleteIfExists(Paths.get(p)))
    vs.filterNot(retained.contains)
      .foreach(v => Files.deleteIfExists(manifestFile(store, v).toPath))
    orphans
  }
}
