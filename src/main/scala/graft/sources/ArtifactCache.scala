package graft.sources

import java.io.File

/** Content-stamp-keyed derived-artifact cache — the shared machinery
  * behind every "build once per distinct source fixture, serve many"
  * layout (q140's hive-partitioned documents layout, q174's persisted
  * ANN index). The cache key folds the source parquet's
  * (size, mtime, footer-hash) stamp with a caller version key, so a
  * driver-regenerated fixture — or a format-version bump — gets a
  * fresh artifact instead of a stale one ([[graft.Tables.fileStamp]]'s
  * contract).
  *
  * Concurrency contract (inherited verbatim from the r12 layout-cache
  * hardening): concurrent builders are safe both in-process (JVM lock)
  * and cross-process (build into a private temp dir, publish by ONE
  * atomic directory rename; rename-race losers discard their copy and
  * adopt the winner's). The root is per-user under java.io.tmpdir — a
  * world-shared predictable path invites permission/symlink collisions
  * on multi-user boxes. Superseded stamps of the same (versioned)
  * source and crashed builders' `.tmp.<uuid>` debris sweep out behind
  * a one-hour grace window: an already-planned reader may still be
  * mid-scan of a superseded artifact, and deleting it immediately
  * fails those tasks with FileNotFound.
  */
object ArtifactCache {

  private val lock = new Object

  /** Path of the published artifact for `srcKey` (a caller-versioned
    * identity of the source, e.g. `"v2_<dirhash>"`) at content stamp
    * `(sz, mt, h)`, building it via `build(tmpDir)` on first use.
    */
  def artifact(srcKey: String, stamp: (Long, Long, Int),
      build: String => Unit): String = {
    val (sz, mt, h) = stamp
    val key = s"${srcKey}_${sz}_${mt}_$h"
    val root = new File(
      System.getProperty("java.io.tmpdir"),
      s"graft_layout_${System.getProperty("user.name", "anon")}")
    val out = new File(root, key)
    lock.synchronized {
      if (!out.exists()) {
        val tmp = new File(
          s"${out.getPath}.tmp.${java.util.UUID.randomUUID()}")
        build(tmp.getPath)
        try
          java.nio.file.Files.move(tmp.toPath, out.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case e @ (_: java.nio.file.FileAlreadyExistsException |
              _: java.nio.file.DirectoryNotEmptyException |
              _: java.nio.file.AccessDeniedException) =>
            // benign only when another process really published first;
            // a genuine permission/quota failure must surface HERE with
            // its cause, not as an opaque downstream read of a missing
            // path
            rmTree(tmp)
            if (!out.exists()) throw e
        }
        val graceMs = 60L * 60 * 1000
        Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
          val n = f.getName
          val aged =
            System.currentTimeMillis() - f.lastModified() > graceMs
          val stale = aged &&
            (n.contains(".tmp.") ||
              (n.startsWith(s"${srcKey}_") && n != key))
          if (stale) rmTree(f)
        }
      }
    }
    out.getPath
  }

  private def rmTree(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    java.nio.file.Files.deleteIfExists(f.toPath); ()
  }
}
