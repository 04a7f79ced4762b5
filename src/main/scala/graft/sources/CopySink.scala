package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import java.sql.{Connection, PreparedStatement}

/** Partition-parallel JDBC sink — the Spark analog of the reference's
  * per-chunk pgx CopyFrom writers (`migrate.go:319-349`): one connection
  * per partition task (matching the reference's
  * connection-per-worker-with-SetMaxOpenConns(1), `migrate.go:262-269`),
  * batched inserts, deferred constraints handled by [[DdlGenerator]]
  * around the write.
  *
  * The connection comes from a serializable factory so tests (and
  * alternative drivers) can inject; production wires a
  * `DriverManager.getConnection` closure. On PostgreSQL the fastest path
  * is the COPY protocol via pgjdbc's CopyManager — structurally identical
  * (swap `writePartition` for a CopyManager call); the generic batched
  * INSERT below is driver-agnostic.
  */
object CopySink {

  /** Parameterized INSERT for a target table. `schema` null/empty →
    * unqualified table name (embedded targets like Derby).
    */
  def insertSql(schema: String, table: String, cols: Seq[String]): String = {
    import SchemaMapping.pgIdent
    val target =
      if (schema == null || schema.isEmpty) pgIdent(table)
      else s"${pgIdent(schema)}.${pgIdent(table)}"
    s"INSERT INTO $target " +
      s"(${cols.map(pgIdent).mkString(", ")}) VALUES " +
      s"(${cols.map(_ => "?").mkString(", ")})"
  }

  /** Bind one row; shared by the writer and unit tests. */
  def bindRow(ps: PreparedStatement, row: Row): Unit = {
    var i = 0
    while (i < row.length) {
      val v = row.get(i)
      v match {
        case null => ps.setObject(i + 1, null)
        case ts: java.sql.Timestamp => ps.setTimestamp(i + 1, ts)
        case d: java.sql.Date => ps.setDate(i + 1, d)
        case b: Array[Byte] => ps.setBytes(i + 1, b)
        case bd: java.math.BigDecimal => ps.setBigDecimal(i + 1, bd)
        case s: scala.collection.Seq[_] =>
          // array columns → SQL array of strings (SET → text[] mapping)
          ps.setObject(i + 1, s.map(String.valueOf).toArray)
        case other => ps.setObject(i + 1, other)
      }
      i += 1
    }
  }

  /** Write one partition through one connection with batching. Returns
    * rows written (progress accounting, reference `migrate.go:448-473`).
    */
  def writePartition(
      rows: Iterator[Row],
      connect: () => Connection,
      sql: String,
      batchSize: Int): Long = {
    val conn = connect()
    var written = 0L
    try {
      conn.setAutoCommit(false)
      // ONE batching loop in this file: the seam arm is the core, this
      // wrapper only owns connection + transaction lifecycle
      written = InsertDataWriter(sql, batchSize).write(conn, rows)
      conn.commit()
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: Throwable => () }
        throw e
    } finally conn.close()
    written
  }

  /** Per-partition write dispatch: a PostgreSQL target streams the COPY
    * protocol ([[PgCopy]] — the reference's write path,
    * `migrate.go:319-349`); any other JDBC target takes the batched
    * INSERT. Both are one connection per partition task.
    */
  def writePartitionAuto(
      targetUrl: String,
      rows: Iterator[Row],
      connect: () => Connection,
      insertSql: String,
      copySql: String,
      batchSize: Int): Long =
    if (PgCopy.isPostgres(targetUrl))
      PgCopy.copyPartition(rows, connect, copySql)
    else writePartition(rows, connect, insertSql, batchSize)

  /** Ledger DDL for [[writeExactlyOnce]]: one row per committed
    * (sink, batch, partition). The PRIMARY KEY is load-bearing — a
    * racing duplicate attempt (speculative task, zombie executor)
    * fails its ledger INSERT and rolls back its data rows in the same
    * transaction. `n_parts` records the batch's partition count and
    * `n_rows` the partition's row count, so a replay can verify the
    * row-to-partition assignment per partition (not just the count of
    * partitions) before trusting the skip.
    */
  def ledgerDdl(ledgerTable: String): String = {
    import SchemaMapping.pgIdent
    s"CREATE TABLE ${pgIdent(ledgerTable)} (" +
      s"${pgIdent("sink_id")} VARCHAR(128) NOT NULL, " +
      s"${pgIdent("batch_id")} BIGINT NOT NULL, " +
      s"${pgIdent("part_id")} INTEGER NOT NULL, " +
      s"${pgIdent("n_parts")} INTEGER NOT NULL, " +
      s"${pgIdent("n_rows")} BIGINT NOT NULL, " +
      s"${pgIdent("content_ck")} BIGINT, " +
      s"PRIMARY KEY (${pgIdent("sink_id")}, ${pgIdent("batch_id")}, " +
      s"${pgIdent("part_id")}))"
  }

  /** Upgrade DDL for a ledger created by a pre-`n_rows` build —
    * referenced by the schema-outdated error message so operators have
    * a one-statement migration path. Backfilled rows get n_rows = -1
    * (sentinel: "count unknown, skip row-count verification"), which
    * [[writeExactlyOnce]] honors on the skip path.
    */
  def ledgerMigrationDdl(ledgerTable: String): String = {
    import SchemaMapping.pgIdent
    s"ALTER TABLE ${pgIdent(ledgerTable)} ADD COLUMN " +
      s"${pgIdent("n_rows")} BIGINT DEFAULT -1 NOT NULL"
  }

  /** Upgrade DDL for a ledger created by a pre-`content_ck` build
    * (r12). The column is NULLABLE on purpose: NULL is the "checksum
    * unknown, skip content verification" sentinel pre-upgrade rows
    * get for free from the ALTER's backfill — unlike n_rows, no long
    * value can serve as a sentinel (every 64-bit value is a valid
    * checksum).
    */
  def ledgerChecksumMigrationDdl(ledgerTable: String): String = {
    import SchemaMapping.pgIdent
    s"ALTER TABLE ${pgIdent(ledgerTable)} ADD COLUMN " +
      s"${pgIdent("content_ck")} BIGINT"
  }

  /** Canonical per-row content hash for the ledger checksum: FNV-1a 64
    * over a field-delimited rendering (NUL for SQL NULL — distinct
    * from the string "null"; binary columns as hex — Array.toString
    * would be an identity hash, different every JVM). A partition's
    * checksum is the WRAPPING SUM of its row hashes: order-insensitive
    * (commutative — a benign intra-partition reorder of the same
    * multiset is not a content change) yet multiplicity-sensitive
    * (a row swapped for a duplicate of another shifts the sum).
    */
  def rowCk(row: Row): Long = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < row.length) {
      row.get(i) match {
        case null => sb.append(0.toChar)
        case b: Array[Byte] =>
          var j = 0
          while (j < b.length) { sb.append(f"${b(j)}%02x"); j += 1 }
        case v => sb.append(String.valueOf(v))
      }
      sb.append(1.toChar)
      i += 1
    }
    SchemaMapping.fnv1a64(sb.toString)
  }

  /** How a partition's data rows reach the target INSIDE the ledger
    * transaction of [[writeExactlyOnce]]. Implementations write on the
    * caller's open connection and return the row count; they must not
    * commit, roll back, or close — atomicity with the ledger INSERT is
    * the caller's commit. Serializable: instances ship to tasks.
    */
  trait PartitionDataWriter extends Serializable {
    def write(conn: Connection, rows: Iterator[Row]): Long
  }

  /** Driver-agnostic batched-INSERT arm (Derby, MySQL, anything). */
  final case class InsertDataWriter(sql: String, batchSize: Int)
      extends PartitionDataWriter {
    override def write(conn: Connection, rows: Iterator[Row]): Long = {
      var written = 0L
      val ps = conn.prepareStatement(sql)
      try {
        var inBatch = 0
        while (rows.hasNext) {
          bindRow(ps, rows.next())
          ps.addBatch()
          inBatch += 1
          written += 1
          if (inBatch >= batchSize) { ps.executeBatch(); inBatch = 0 }
        }
        if (inBatch > 0) ps.executeBatch()
      } finally ps.close()
      written
    }
  }

  /** PostgreSQL COPY-protocol arm ([[PgCopy]] — the reference's fast
    * path, `migrate.go:319-349`) on the ledger's open transaction:
    * COPY inside an explicit transaction is ordinary PostgreSQL — the
    * streamed rows become visible atomically with the ledger row at
    * the caller's commit, so the fast path carries the identical
    * exactly-once semantics as the INSERT arm.
    */
  final case class CopyDataWriter(copySql: String)
      extends PartitionDataWriter {
    override def write(conn: Connection, rows: Iterator[Row]): Long =
      PgCopy.copyOnConnection(conn, rows, copySql)
  }

  /** [[writeExactlyOnce]]'s default data-arm dispatch: the COPY
    * protocol for a PostgreSQL target URL, the batched INSERT for
    * everything else — [[writePartitionAuto]]'s rule, relocated inside
    * the ledger transaction.
    */
  def chooseWriter(targetUrl: String, schema: String, table: String,
      cols: Seq[String], batchSize: Int): PartitionDataWriter =
    if (PgCopy.isPostgres(targetUrl))
      CopyDataWriter(PgCopy.copySql(schema, table, cols))
    else InsertDataWriter(insertSql(schema, table, cols), batchSize)

  /** Idempotent exactly-once `foreachBatch` body: each partition
    * commits its rows AND its (sink_id, batch_id, part_id) ledger row
    * in ONE local transaction, and skips itself when the ledger row
    * already exists — so a redelivered micro-batch (sink committed,
    * checkpoint not yet advanced when the stream died: Structured
    * Streaming's documented at-least-once `foreachBatch` contract) or
    * a retried task re-writes NOTHING. The same shape as the
    * reference's chunk-completion skip on resume (checkpoint.go:16-35:
    * chunks recorded done are not re-copied) and Delta's (appId,
    * version) txn ledger, at partition granularity so the write stays
    * fully distributed — no driver-side funnel, no staging table.
    *
    * Correctness rests on replayed batches being DETERMINISTIC
    * (same rows in the same partitions), which Structured Streaming
    * guarantees for checkpointed replayable sources (file, Kafka) —
    * PROVIDED the partitioning config did not change across the
    * restart. That proviso is enforced in two layers, neither of them
    * complete on its own:
    *
    *  - a driver-side pre-check compares the replay's partition count
    *    against the `n_parts` every ledger row recorded, failing
    *    loudly BEFORE writing when the layout changed (changed
    *    maxPartitionBytes / shuffle.partitions mid-checkpoint). This
    *    check is advisory — it is TOCTOU-racy between two concurrent
    *    drivers and blind to an equal-count layout whose
    *    row-to-partition ASSIGNMENT shifted;
    *  - the authoritative guard is per-partition, inside the skip
    *    path: a skipping task re-counts its replayed rows and
    *    verifies them against the `n_rows` its ledger row committed,
    *    so an equal-n_parts reassignment (reordered input listing,
    *    different split boundaries, nondeterministic upstream
    *    shuffle) is detected at the exact partition where it would
    *    have lost or duplicated rows. Concurrent-driver races on
    *    fresh partitions are settled by the ledger PRIMARY KEY: the
    *    loser's INSERT fails and its data rows roll back in the same
    *    transaction.
    *
    * The third layer closes the residual the first two cannot see — a
    * same-count same-rows-per-partition PERMUTATION of row contents
    * across equal-sized partitions: every committing partition records
    * a content checksum ([[rowCk]] — order-insensitive commutative sum
    * of per-row hashes) in its ledger row, and a skipping partition
    * re-hashes its replayed rows and verifies. The cost is hashing
    * each row once per write/replay (cheap next to the JDBC round
    * trip); pre-upgrade ledger rows carry NULL (checksum unknown) and
    * skip content verification, the n_rows = -1 discipline.
    * StreamingSinkSpec proves the redelivery path row-for-row, the
    * layout-change rejection, the row-count mismatch rejection, and
    * the equal-count content-permutation rejection.
    *
    * The data arm is pluggable ([[PartitionDataWriter]]): a PostgreSQL
    * `targetUrl` streams the COPY protocol inside the SAME transaction
    * (ledger INSERT + COPY commit together — the fast path is as
    * idempotent as the INSERT arm), anything else takes the batched
    * INSERT; tests inject instrumented writers through `dataWriter`.
    */
  def writeExactlyOnce(
      batch: DataFrame,
      batchId: Long,
      sinkId: String,
      schema: String,
      table: String,
      ledgerTable: String,
      connect: () => Connection,
      batchSize: Int = 1000,
      targetUrl: String = "",
      dataWriter: Option[PartitionDataWriter] = None): Unit = {
    import SchemaMapping.pgIdent
    val cols = batch.columns.toSeq
    // data arm: explicit override > COPY for a PostgreSQL target URL >
    // driver-agnostic batched INSERT — same dispatch as
    // writePartitionAuto, but inside the ledger transaction
    val writer =
      dataWriter.getOrElse(chooseWriter(targetUrl, schema, table, cols,
        batchSize))
    val lt =
      if (schema == null || schema.isEmpty) pgIdent(ledgerTable)
      else s"${pgIdent(schema)}.${pgIdent(ledgerTable)}"
    val checkSql = s"SELECT ${pgIdent("n_rows")}, " +
      s"${pgIdent("content_ck")} FROM $lt " +
      s"WHERE ${pgIdent("sink_id")} = ? " +
      s"AND ${pgIdent("batch_id")} = ? AND ${pgIdent("part_id")} = ?"
    val markSql = s"INSERT INTO $lt (${pgIdent("sink_id")}, " +
      s"${pgIdent("batch_id")}, ${pgIdent("part_id")}, " +
      s"${pgIdent("n_parts")}, ${pgIdent("n_rows")}, " +
      s"${pgIdent("content_ck")}) " +
      s"VALUES (?, ?, ?, ?, ?, ?)"
    val nParts = batch.rdd.getNumPartitions
    // advisory layout guard (driver-side, once per batch): if ANY
    // ledger row exists for this batch, its recorded partition count
    // must match the replay's — a differing layout breaks the
    // per-partition skip semantics (silent loss + duplication), so
    // refuse loudly before launching any write task. Also the schema
    // gate: a ledger created by a pre-n_rows build fails every
    // markSql INSERT with an opaque driver error, so detect the
    // outdated shape here and fail with the migration statement.
    locally {
      val pc = connect()
      try {
        val probe = pc.prepareStatement(s"SELECT * FROM $lt WHERE 1=0")
        try {
          val md = probe.executeQuery().getMetaData
          val names = (1 to md.getColumnCount)
            .map(md.getColumnName(_).toLowerCase)
          if (!names.contains("n_rows"))
            throw new IllegalStateException(
              "writeExactlyOnce: ledger table is missing the n_rows " +
                "column (created by an older build). Migrate it with: " +
                ledgerMigrationDdl(ledgerTable) +
                " — backfilled rows get the -1 sentinel, which skips " +
                "row-count verification for pre-upgrade batches")
          if (!names.contains("content_ck"))
            throw new IllegalStateException(
              "writeExactlyOnce: ledger table is missing the " +
                "content_ck column (created by a pre-checksum build). " +
                "Migrate it with: " +
                ledgerChecksumMigrationDdl(ledgerTable) +
                " — backfilled rows get NULL, which skips content " +
                "verification for pre-upgrade batches")
        } finally probe.close()
        val st = pc.prepareStatement(
          s"SELECT MAX(${pgIdent("n_parts")}) FROM $lt " +
            s"WHERE ${pgIdent("sink_id")} = ? AND " +
            s"${pgIdent("batch_id")} = ?")
        try {
          st.setString(1, sinkId); st.setLong(2, batchId)
          val rs = st.executeQuery()
          try {
            if (rs.next()) {
              val stored = rs.getInt(1)
              if (!rs.wasNull() && stored != nParts)
                throw new IllegalStateException(
                  s"writeExactlyOnce: batch $batchId was partially " +
                    s"committed with $stored partitions but replays " +
                    s"with $nParts — the partitioning config changed " +
                    "across the restart; restore it (or drain the " +
                    "ledger) before resuming")
            }
          } finally rs.close()
        } finally st.close()
      } finally pc.close()
    }
    batch.foreachPartition { (rows: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val conn = connect()
      try {
        conn.setAutoCommit(false)
        val cps = conn.prepareStatement(checkSql)
        // committed: None → first attempt; Some((n, ck)) → this
        // partition already committed n rows (n = -1: pre-migration
        // ledger row, count unknown) with content checksum ck
        // (None: pre-checksum ledger row, content unknown)
        val committed =
          try {
            cps.setString(1, sinkId); cps.setLong(2, batchId)
            cps.setInt(3, pid)
            val rs = cps.executeQuery()
            try {
              if (rs.next()) {
                val n = rs.getLong(1)
                val ckv = rs.getLong(2)
                Some((n, if (rs.wasNull()) None else Some(ckv)))
              } else None
            } finally rs.close()
          } finally cps.close()
        committed match {
          case None =>
            // hash while streaming: the checksum folds over the same
            // single pass the data arm consumes
            var ck = 0L
            val hashed = rows.map { r => ck += rowCk(r); r }
            val written = writer.write(conn, hashed)
            val mp = conn.prepareStatement(markSql)
            try {
              mp.setString(1, sinkId); mp.setLong(2, batchId)
              mp.setInt(3, pid); mp.setInt(4, nParts)
              mp.setLong(5, written); mp.setLong(6, ck)
              mp.executeUpdate()
            } finally mp.close()
          case Some((expected, expectedCk)) =>
            // skip path: the per-partition half of the determinism
            // guard — count AND re-hash the replayed rows, verifying
            // both against the ledger row: the count catches an
            // equal-n_parts layout whose row-to-partition assignment
            // shifted sizes, the checksum the equal-count content
            // PERMUTATION neither count can see
            var replayed = 0L
            var rck = 0L
            while (rows.hasNext) {
              rck += rowCk(rows.next()); replayed += 1
            }
            if (expected >= 0L && replayed != expected)
              throw new IllegalStateException(
                s"writeExactlyOnce: partition $pid of batch $batchId " +
                  s"committed $expected rows but replays with " +
                  s"$replayed — the row-to-partition assignment " +
                  "changed across the restart (reordered input " +
                  "listing or nondeterministic upstream shuffle); " +
                  "the partition-granular skip would lose/duplicate " +
                  "rows, so refusing. Restore the original layout " +
                  "(or drain the ledger and deduplicate downstream) " +
                  "before resuming")
            if (expectedCk.exists(_ != rck))
              throw new IllegalStateException(
                s"writeExactlyOnce: partition $pid of batch $batchId " +
                  s"replays with ${replayed} rows matching the " +
                  "committed count, but the content checksum differs " +
                  "— the replay permuted row contents across " +
                  "equal-sized partitions (nondeterministic upstream " +
                  "shuffle or changed input order); the " +
                  "partition-granular skip would lose/duplicate rows, " +
                  "so refusing. Restore the original layout (or drain " +
                  "the ledger and deduplicate downstream) before " +
                  "resuming")
        }
        // data + ledger row atomically; on the skip path this just
        // ends the read-only ledger-check transaction (Derby refuses
        // to close a connection with ANY open transaction)
        conn.commit()
      } catch {
        case e: Throwable =>
          try conn.rollback() catch { case _: Throwable => () }
          throw e
      } finally conn.close()
    }
  }

  /** Distributed write: every partition opens its own connection and
    * streams its rows. `connect` must be serializable (capture DSN
    * strings, not Connection objects).
    */
  def write(
      df: DataFrame,
      schema: String,
      table: String,
      connect: () => Connection,
      batchSize: Int = 1000): Unit = {
    val cols = df.columns.toSeq
    val sql = insertSql(schema, table, cols)
    df.foreachPartition { (it: Iterator[Row]) =>
      writePartition(it, connect, sql, batchSize)
      ()
    }
  }
}
