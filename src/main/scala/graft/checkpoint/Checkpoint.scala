package graft.checkpoint

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Resume checkpointing for chunked loads (reference `checkpoint.go`).
  *
  * The on-disk format follows the reference's versioned schema
  * (`checkpoint.go:14-35`): top-level `version` / `started_at` /
  * `compatibility` / `tables`, with per-table `chunk_count`,
  * `completed_chunks` (chunk id → {completed_at, rows_copied}),
  * `full_table_done`, and `total_rows_copied` — so checkpoints are
  * structurally interoperable. Batched flush every `flushEvery`
  * completions or `flushMillis` ms (reference `checkpoint.go:214-219` —
  * 10 completions / 5 s); atomic temp-file + rename writes
  * (`checkpoint.go:96-118`); a compatibility fingerprint of
  * config+schema rejects resume against a changed job
  * (`checkpoint_compat.go:48-87`). Thread-safe: Spark task-completion
  * callbacks land from multiple listener threads.
  */
final class CheckpointManager(
    path: Path,
    fingerprint: String,
    flushEvery: Int = 10,
    flushMillis: Long = 5000L,
    compatParts: Seq[(String, String)] = Nil) {

  import CheckpointManager.{ChunkResult, TableState}

  private val tables = mutable.Map[String, TableState]()
  // original start time survives resume (restored by load)
  private[checkpoint] var startedAt = java.time.Instant.now().toString
  private var pendingSinceFlush = 0
  private var lastFlush = System.currentTimeMillis()
  private val lock = new Object

  def markDone(table: String, chunkId: Long, rowsCopied: Long = 0L): Unit =
    lock.synchronized {
      record(table, chunkId, rowsCopied,
        java.time.Instant.now().toString)
      pendingSinceFlush += 1
      val now = System.currentTimeMillis()
      if (pendingSinceFlush >= flushEvery || now - lastFlush >= flushMillis)
        flushLocked()
    }

  /** Replay a chunk from a loaded checkpoint: keeps the ORIGINAL
    * completion timestamp and — critically — never triggers a batched
    * flush, so a partially-replayed state can't overwrite the file
    * (a crash mid-load would otherwise forget completed chunks).
    */
  private[checkpoint] def restore(table: String, chunkId: Long,
      rowsCopied: Long, completedAt: String): Unit = lock.synchronized {
    record(table, chunkId, rowsCopied, completedAt)
  }

  private def record(table: String, chunkId: Long, rowsCopied: Long,
      completedAt: String): Unit = {
    val ts = tables.getOrElseUpdate(table, TableState())
    if (!ts.chunks.contains(chunkId)) {
      ts.chunks(chunkId) = ChunkResult(completedAt, rowsCopied)
      ts.totalRowsCopied += rowsCopied
    }
  }

  def markTableDone(table: String): Unit = lock.synchronized {
    tables.getOrElseUpdate(table, TableState()).fullTableDone = true
    flushLocked()
  }

  private[checkpoint] def restoreTableDone(table: String): Unit =
    lock.synchronized {
      tables.getOrElseUpdate(table, TableState()).fullTableDone = true
    }

  def setChunkCount(table: String, n: Int): Unit = lock.synchronized {
    tables.getOrElseUpdate(table, TableState()).chunkCount = n
  }

  /** Chunk count recorded by a prior run (0/absent = never planned). */
  def chunkCount(table: String): Option[Int] = lock.synchronized {
    tables.get(table).map(_.chunkCount)
  }

  /** Record that a table exists in the target (its CREATE ran) without
    * marking any data progress — resume uses this to make the schema
    * phase idempotent (skip CREATE for tables the prior run created).
    */
  def ensureTable(table: String): Unit = lock.synchronized {
    tables.getOrElseUpdate(table, TableState()); ()
  }

  /** True if this table has any checkpoint state (created / chunks /
    * done) from a prior run.
    */
  def hasTable(table: String): Boolean = lock.synchronized {
    tables.contains(table)
  }

  /** Delete the checkpoint file after a fully-successful migration
    * (reference `checkpoint.go:367-373` Cleanup) — there is nothing left
    * to resume.
    */
  def cleanup(): Unit = lock.synchronized {
    Files.deleteIfExists(path); ()
  }

  def isDone(table: String, chunkId: Long): Boolean = lock.synchronized {
    tables.get(table).exists(_.chunks.contains(chunkId))
  }

  def isTableDone(table: String): Boolean = lock.synchronized {
    tables.get(table).exists(_.fullTableDone)
  }

  def completed(table: String): Set[Long] = lock.synchronized {
    tables.get(table).map(_.chunks.keySet.toSet).getOrElse(Set.empty)
  }

  def rowsCopied(table: String): Long = lock.synchronized {
    tables.get(table).map(_.totalRowsCopied).getOrElse(0L)
  }

  def flush(): Unit = lock.synchronized { flushLocked() }

  private def flushLocked(): Unit = {
    val json =
      CheckpointManager.toJson(fingerprint, compatParts, startedAt, tables)
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

  /** Matches `checkpointVersion` in the reference (`checkpoint.go:13`). */
  val Version = 2

  final case class ChunkResult(completedAt: String, rowsCopied: Long)
  final case class TableState(
      chunks: mutable.Map[Long, ChunkResult] = mutable.Map.empty,
      var chunkCount: Int = 0,
      var fullTableDone: Boolean = false,
      var totalRowsCopied: Long = 0L)

  /** Load an existing checkpoint; rejects a fingerprint mismatch
    * (reference `checkpoint_compat.go:410-472` compat diff → abort) and
    * an unsupported version (`checkpoint.go:68-72`).
    */
  def load(pathStr: String, expectedFingerprint: String,
      parts: Seq[(String, String)] = Nil): CheckpointManager = {
    val path = Paths.get(pathStr)
    val mgr = new CheckpointManager(path, expectedFingerprint,
      compatParts = parts)
    if (Files.exists(path)) {
      val doc = Json.parse(
        new String(Files.readAllBytes(path), StandardCharsets.UTF_8))
      val obj = doc.asInstanceOf[Map[String, Any]]
      // Pre-versioning checkpoints ({fingerprint, tables:[names]}, written
      // before the v2 schema landed) are accepted: the table-name list
      // marks fully-completed tables. Anything else unversioned is
      // rejected.
      obj.get("version").map(_.asInstanceOf[Number].intValue()) match {
        case Some(Version) => ()
        case None if obj.get("tables").exists(_.isInstanceOf[Seq[_]]) =>
          val fp = obj.getOrElse("fingerprint", "").toString
          if (fp != expectedFingerprint)
            throw new IllegalArgumentException(
              "legacy checkpoint incompatible with current job " +
                s"(saved=$fp current=$expectedFingerprint) — refusing " +
                "to resume")
          obj("tables").asInstanceOf[Seq[Any]]
            .foreach(t => mgr.restoreTableDone(t.toString))
          return mgr
        case v => throw new IllegalArgumentException(
          s"unsupported checkpoint version ${v.getOrElse("<none>")} " +
            s"(expected $Version, or the legacy unversioned table-list " +
            "format) — delete the checkpoint file to restart from scratch")
      }
      val compat = obj.get("compatibility") match {
        case Some(c: Map[String @unchecked, Any @unchecked]) => c
        case _ => Map.empty[String, Any]
      }
      val fp = compat.getOrElse("fingerprint", "").toString
      if (fp != expectedFingerprint) {
        // structured diff of the saved vs current compatibility parts
        // (reference checkpoint_compat.go:240-332 reason list)
        val saved = compat.get("parts") match {
          case Some(p: Map[String @unchecked, Any @unchecked]) =>
            p.view.mapValues(_.toString).toMap
          case _ => Map.empty[String, String]
        }
        val reasons = compatDiff(saved, parts.toMap)
        val detail =
          if (reasons.nonEmpty) reasons.mkString("; ")
          else s"saved=$fp current=$expectedFingerprint"
        throw new IllegalArgumentException(
          s"checkpoint incompatible with current job ($detail) — " +
            "refusing to resume")
      }
      obj.get("started_at").foreach(v => mgr.startedAt = v.toString)
      obj.get("tables") match {
        case Some(ts: Map[String @unchecked, Any @unchecked]) =>
          ts.foreach { case (name, v) =>
            val t = v.asInstanceOf[Map[String, Any]]
            t.get("chunk_count").foreach(n =>
              mgr.setChunkCount(name, n.asInstanceOf[Number].intValue()))
            t.get("completed_chunks").foreach {
              case cc: Map[String @unchecked, Any @unchecked] =>
                cc.foreach { case (id, r) =>
                  val res = r.asInstanceOf[Map[String, Any]]
                  mgr.restore(name, id.toLong,
                    res.get("rows_copied")
                      .map(_.asInstanceOf[Number].longValue()).getOrElse(0L),
                    res.get("completed_at").map(_.toString)
                      .getOrElse(java.time.Instant.now().toString))
                }
              case _ => ()
            }
            if (t.get("full_table_done").contains(true))
              mgr.restoreTableDone(name)
          }
        case _ => ()
      }
    }
    mgr
  }

  /** SHA-256 compatibility fingerprint over the canonicalized job spec
    * (reference `checkpoint_compat.go:48-87,160-226`).
    */
  def fingerprint(parts: Seq[(String, String)]): String =
    sha256(parts.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("\n"))

  /** Hex SHA-256 — also used to digest hook-file contents into the
    * compat parts (reference `checkpoint_compat.go:160-226`).
    */
  def sha256(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  private def q(s: String) = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Sorted human-readable reasons why two compat part maps differ
    * (reference `checkpoint_compat.go:240-332`).
    */
  private[checkpoint] def compatDiff(saved: Map[String, String],
      current: Map[String, String]): Seq[String] = {
    if (saved.isEmpty || current.isEmpty) return Nil
    val changed = for {
      (k, v) <- saved.toSeq; cv <- current.get(k) if cv != v
    } yield s"$k changed: was '$v', now '$cv'"
    val removed = saved.keySet.diff(current.keySet).toSeq
      .map(k => s"$k removed")
    val added = current.keySet.diff(saved.keySet).toSeq
      .map(k => s"$k added")
    (changed ++ removed ++ added).sorted
  }

  private[checkpoint] def toJson(fp: String, parts: Seq[(String, String)],
      startedAt: String,
      tables: mutable.Map[String, TableState]): String = {
    val tbl = tables.toSeq.sortBy(_._1).map { case (name, ts) =>
      val chunks = ts.chunks.toSeq.sortBy(_._1).map { case (id, r) =>
        s""""$id": {"completed_at": ${q(r.completedAt)}, """ +
          s""""rows_copied": ${r.rowsCopied}}"""
      }.mkString("{", ", ", "}")
      s"${q(name)}: {" +
        s""""chunk_count": ${ts.chunkCount}, """ +
        s""""completed_chunks": $chunks, """ +
        s""""full_table_done": ${ts.fullTableDone}, """ +
        s""""total_rows_copied": ${ts.totalRowsCopied}}"""
    }.mkString("{", ", ", "}")
    val partsJson = parts.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")
    s"""{"version": $Version, "started_at": ${q(startedAt)}, """ +
      s""""compatibility": {"fingerprint": ${q(fp)}, """ +
      s""""parts": $partsJson}, "tables": $tbl}"""
  }

  /** Minimal recursive-descent JSON reader (objects → `Map[String, Any]`,
    * arrays → `Seq[Any]`, numbers → `Double`). Structural, so a table
    * named `fingerprint` (or anything else) round-trips safely.
    */
  private[checkpoint] object Json {
    def parse(s: String): Any = {
      val p = new P(s); val v = p.value(); p.ws()
      require(p.eof, s"trailing JSON at ${p.i}"); v
    }
    private final class P(s: String) {
      var i = 0
      def eof: Boolean = i >= s.length
      def ws(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
      private def expect(c: Char): Unit = {
        require(!eof && s.charAt(i) == c, s"expected '$c' at $i"); i += 1
      }
      def value(): Any = { ws(); s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }}
      private def lit(word: String, v: Any): Any = {
        require(s.startsWith(word, i), s"bad literal at $i")
        i += word.length; v
      }
      private def obj(): Map[String, Any] = {
        expect('{'); ws()
        val b = Map.newBuilder[String, Any]
        if (s.charAt(i) == '}') { i += 1; return b.result() }
        var go = true
        while (go) {
          ws(); val k = str(); ws(); expect(':'); val v = value(); ws()
          b += k -> v
          if (s.charAt(i) == ',') i += 1 else { expect('}'); go = false }
        }
        b.result()
      }
      private def arr(): Seq[Any] = {
        expect('['); ws()
        val b = Seq.newBuilder[Any]
        if (s.charAt(i) == ']') { i += 1; return b.result() }
        var go = true
        while (go) {
          b += value(); ws()
          if (s.charAt(i) == ',') i += 1 else { expect(']'); go = false }
        }
        b.result()
      }
      private def str(): String = {
        expect('"')
        val sb = new StringBuilder
        while (s.charAt(i) != '"') {
          val c = s.charAt(i)
          if (c == '\\') {
            i += 1
            s.charAt(i) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'
              case 'r' => sb += '\r'; case 'b' => sb += '\b'
              case 'f' => sb += '\f'; case '/' => sb += '/'
              case '"' => sb += '"'; case '\\' => sb += '\\'
              case 'u' =>
                sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
                i += 4
              case other => throw new IllegalArgumentException(
                s"bad escape \\$other at $i")
            }
          } else sb += c
          i += 1
        }
        i += 1
        sb.toString
      }
      /** Integral tokens (no '.', 'e', 'E') lex as Long — a Double would
        * silently lose precision above 2^53, corrupting resumed
        * rows_copied totals for very large tables.
        */
      private def num(): Any = {
        val start = i
        while (!eof && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
        val tok = s.substring(start, i)
        if (tok.exists(c => c == '.' || c == 'e' || c == 'E')) tok.toDouble
        else tok.toLong
      }
    }
  }
}
