package graft.checkpoint

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Resume checkpointing for chunked loads (reference `checkpoint.go`).
  *
  * Same design as the reference: per-table completed-chunk sets persisted
  * as JSON; batched flush every `flushEvery` completions or `flushMillis`
  * ms (reference `checkpoint.go:214-219` — 10 completions / 5 s); atomic
  * temp-file + rename writes (`checkpoint.go:96-118`); a compatibility
  * fingerprint of config+schema rejects resume against a changed job
  * (`checkpoint_compat.go:48-87`). Thread-safe: Spark task-completion
  * callbacks land from multiple listener threads.
  */
final class CheckpointManager(
    path: Path,
    fingerprint: String,
    flushEvery: Int = 10,
    flushMillis: Long = 5000L) {

  private val done = mutable.Map[String, mutable.SortedSet[Long]]()
  private var pendingSinceFlush = 0
  private var lastFlush = System.currentTimeMillis()
  private val lock = new Object

  def markDone(table: String, chunkId: Long): Unit = lock.synchronized {
    done.getOrElseUpdate(table, mutable.SortedSet.empty[Long]) += chunkId
    pendingSinceFlush += 1
    val now = System.currentTimeMillis()
    if (pendingSinceFlush >= flushEvery || now - lastFlush >= flushMillis)
      flushLocked()
  }

  def isDone(table: String, chunkId: Long): Boolean = lock.synchronized {
    done.get(table).exists(_.contains(chunkId))
  }

  def completed(table: String): Set[Long] = lock.synchronized {
    done.get(table).map(_.toSet).getOrElse(Set.empty)
  }

  def flush(): Unit = lock.synchronized { flushLocked() }

  private def flushLocked(): Unit = {
    val json = CheckpointManager.toJson(fingerprint, done)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.createDirectories(path.toAbsolutePath.getParent)
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    pendingSinceFlush = 0
    lastFlush = System.currentTimeMillis()
  }
}

object CheckpointManager {

  /** Load an existing checkpoint; rejects a fingerprint mismatch
    * (reference `checkpoint_compat.go:410-472` compat diff → abort).
    */
  def load(pathStr: String, expectedFingerprint: String): CheckpointManager = {
    val path = Paths.get(pathStr)
    val mgr = new CheckpointManager(path, expectedFingerprint)
    if (Files.exists(path)) {
      val (fp, tables) = fromJson(
        new String(Files.readAllBytes(path), StandardCharsets.UTF_8))
      require(fp == expectedFingerprint,
        s"checkpoint fingerprint mismatch: saved=$fp " +
          s"current=$expectedFingerprint — config/schema changed since " +
          "the checkpoint was written; refusing to resume")
      tables.foreach { case (t, chunks) =>
        chunks.foreach(mgr.markDone(t, _))
      }
    }
    mgr
  }

  /** SHA-256 compatibility fingerprint over the canonicalized job spec
    * (reference `checkpoint_compat.go:48-87,160-226`).
    */
  def fingerprint(parts: Seq[(String, String)]): String = {
    val canonical = parts.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("\n")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(canonical.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  private[checkpoint] def toJson(fp: String,
      done: mutable.Map[String, mutable.SortedSet[Long]]): String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val tables = done.toSeq.sortBy(_._1).map { case (t, chunks) =>
      s"${q(t)}: [${chunks.mkString(",")}]"
    }.mkString(", ")
    s"""{"fingerprint": ${q(fp)}, "tables": {$tables}}"""
  }

  /** Minimal parser for the exact JSON this object writes. */
  private[checkpoint] def fromJson(
      s: String): (String, Map[String, Seq[Long]]) = {
    val fpRe = "\"fingerprint\"\\s*:\\s*\"([^\"]*)\"".r
    val fp = fpRe.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(
        "corrupt checkpoint: no fingerprint")).group(1)
    val tblRe = "\"([^\"]+)\"\\s*:\\s*\\[([0-9,\\s]*)\\]".r
    val tables = tblRe.findAllMatchIn(s).map { m =>
      val chunks = m.group(2).split(",").toSeq
        .map(_.trim).filter(_.nonEmpty).map(_.toLong)
      m.group(1) -> chunks
    }.toMap - "fingerprint"
    (fp, tables)
  }
}
