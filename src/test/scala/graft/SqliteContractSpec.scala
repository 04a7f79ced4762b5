package graft

import graft.config.JobConfig
import graft.sources._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** SQLite introspection + migration CONTRACT test — the no-driver
  * stand-in for a live `.db` end-to-end run: sqlite-jdbc is not
  * resolvable in this sandbox (offline coursier cache carries no SQLite
  * driver; `/opt/spark/jars` ships Derby only), so the contract is
  * pinned in the same two halves as `MySqlContractSpec`:
  *
  *  1. the five pragma/catalog surfaces' SQL text carries every field,
  *     filter, and ORDER BY the reference's round trips scan
  *     (`source_sqlite.go:364-721`), with the ≤400-term compound-SELECT
  *     batching and literal escaping the reference applies
  *     (`source_sqlite.go:15-16,296-312`);
  *  2. a recorded Chinook-shaped pragma result set replays through the
  *     REAL migration chain — assembly → type mapping → TableMeta →
  *     MigrationPipeline (DDL, load, constraint re-attachment, count +
  *     checksum validation) — asserting the IR and the emitted DDL at
  *     each step, which is everything a socket would exercise except
  *     the wire itself.
  */
class SqliteContractSpec extends AnyFunSuite {

  // ---- contract 1/2: catalog SQL parity -----------------------------

  test("contract 1/2: pragma batch SQL carries every field the " +
      "reference scans, with its ordering, batching, and escaping") {
    import Introspection.Sqlite

    // tables (source_sqlite.go: sqlite_master scan)
    assert(Sqlite.tablesSql.contains("type = 'table'"))
    assert(Sqlite.tablesSql.contains("NOT LIKE 'sqlite_%'"))
    assert(Sqlite.tablesSql.contains("ORDER BY name"))

    // create-SQL scan for AUTOINCREMENT detection (:437-456)
    assert(Sqlite.createSqlSql.contains("COALESCE(sql, '')"))
    assert(Sqlite.createSqlSql.contains("type = 'table'"))

    // columns (:372-384): table_name, cid, name, type, notnull,
    // dflt_value, pk, hidden from pragma_table_xinfo, ordered by
    // (table_name, cid)
    val cols = Sqlite.columnsSqlBatches(Seq("album", "artist")).head
    Seq("table_name", "cid", "name", "type", "notnull", "dflt_value",
      "pk", "hidden").foreach(f => assert(cols.contains(f), f))
    assert(cols.contains("pragma_table_xinfo('album')"))
    assert(cols.contains(" UNION ALL "))
    assert(cols.endsWith("ORDER BY table_name, cid"))

    // index list (:509-523): seq, name, unique, origin, partial
    val ixl = Sqlite.indexListSqlBatches(Seq("album")).head
    Seq("table_name", "seq", "name", "unique", "origin", "partial")
      .foreach(f => assert(ixl.contains(f), f))
    assert(ixl.contains("pragma_index_list('album')"))
    assert(ixl.endsWith("ORDER BY table_name, seq"))

    // index info (:570-585): seqno, cid, name keyed by (table, index)
    val ixi = Sqlite.indexInfoSqlBatches(Seq(("album", "ix_a"))).head
    Seq("table_name", "index_name", "seqno", "cid", "name")
      .foreach(f => assert(ixi.contains(f), f))
    assert(ixi.contains("pragma_index_info('ix_a')"))
    assert(ixi.endsWith("ORDER BY table_name, index_name, seqno"))

    // foreign keys (:642-655): id, seq, table, from, to, on_update,
    // on_delete. (The reference also selects `match` and immediately
    // discards it, `_ = match` at :674 — omitted here deliberately.)
    val fks = Sqlite.foreignKeysSqlBatches(Seq("album")).head
    Seq("table_name", "id", "seq", "ref_table", "from", "to",
      "on_update", "on_delete").foreach(f => assert(fks.contains(f), f))
    assert(fks.contains("pragma_foreign_key_list('album')"))
    assert(fks.endsWith("ORDER BY table_name, id, seq"))

    // batching: 401 tables split into 400 + 1 compound SELECTs, each
    // self-contained with its own ORDER BY (sqliteMaxCompoundSelectTerms)
    val batches = Sqlite.columnsSqlBatches((1 to 401).map(i => s"t$i"))
    assert(batches.size == 2)
    assert(batches(0).split("UNION ALL").length == 400)
    assert(batches(1).split("UNION ALL").length == 1)
    assert(batches.forall(_.endsWith("ORDER BY table_name, cid")))

    // literal escaping: a quoted table name never breaks the statement
    val hostile = Sqlite.columnsSqlBatches(Seq("we'ird")).head
    assert(hostile.contains("'we''ird'"))
  }

  // ---- contract 2/2: Chinook-shaped replay through the real chain ---

  // pragma_table_xinfo rows: (table, cid, name, type, notnull,
  // dflt_value, pk, hidden)
  private val colRows = Seq(
    // artist: rowid-alias INTEGER pk → auto_increment
    Row("artist", 0, "ArtistId", "INTEGER", 1, null, 1, 0),
    Row("artist", 1, "Name", "NVARCHAR(120)", 0, null, 0, 0),
    // album: AUTOINCREMENT via CREATE SQL; FK to artist
    Row("album", 0, "AlbumId", "INTEGER", 1, null, 1, 0),
    Row("album", 1, "Title", "NVARCHAR(160)", 1, null, 0, 0),
    Row("album", 2, "ArtistId", "INTEGER", 1, null, 0, 0),
    // track: decimal price, generated column, default
    Row("track", 0, "TrackId", "INTEGER", 1, null, 1, 0),
    Row("track", 1, "Name", "NVARCHAR(200)", 1, null, 0, 0),
    Row("track", 2, "AlbumId", "INTEGER", 0, null, 0, 0),
    Row("track", 3, "UnitPrice", "NUMERIC(10,2)", 1, "0.99", 0, 0),
    Row("track", 4, "Ms", "INTEGER", 1, "0", 0, 0),
    Row("track", 5, "Sec", "REAL", 0, null, 0, 2), // STORED GENERATED
    Row("track", 6, "Disp", "TEXT", 0, null, 0, 3), // VIRTUAL GENERATED
    // playlist_track: composite PK (declared out of cid order),
    // composite-free two FKs
    Row("playlist_track", 0, "PlaylistId", "INTEGER", 1, null, 1, 0),
    Row("playlist_track", 1, "TrackId", "INTEGER", 1, null, 2, 0))

  // pragma_index_list rows: (table, seq, name, unique, origin, partial)
  private val listRows = Seq(
    Row("album", 0, "ix_album_artist", 0, "c", 0),
    Row("album", 1, "sqlite_autoindex_album_1", 1, "pk", 0),
    Row("track", 0, "ix_track_name_u", 1, "c", 0),
    Row("track", 1, "ix_track_cheap", 0, "c", 1), // partial → skipped
    Row("track", 2, "ix_track_expr", 0, "c", 0)) // expression → skipped

  // pragma_index_info rows: (table, index, seqno, cid, name)
  private val infoRows = Seq(
    Row("album", "ix_album_artist", 0, 2, "ArtistId"),
    Row("track", "ix_track_name_u", 0, 1, "Name"),
    Row("track", "ix_track_cheap", 0, 3, "UnitPrice"),
    Row("track", "ix_track_expr", 0, -2, null)) // NULL col = expression

  // pragma_foreign_key_list rows: (table, id, seq, ref_table, from, to,
  // on_update, on_delete)
  private val fkRows = Seq(
    Row("album", 0, 0, "artist", "ArtistId", "ArtistId",
      "no action", "cascade"),
    Row("track", 0, 0, "album", "AlbumId", "AlbumId",
      "no action", "set null"),
    Row("playlist_track", 0, 0, "track", "TrackId", "TrackId",
      "no action", "no action"),
    Row("playlist_track", 1, 0, "playlist", "PlaylistId", "PlaylistId",
      "no action", "no action"))

  private val createSql = Map(
    "album" -> ("CREATE TABLE album (AlbumId INTEGER PRIMARY KEY " +
      "AUTOINCREMENT, Title NVARCHAR(160) NOT NULL, ArtistId INTEGER)"))

  private class Recorder extends SqlExecutor {
    val stmts = mutable.Buffer[String]()
    def execute(sql: String): Unit = stmts += sql
  }

  /** Replay loader: per-table row counts as a live source would report
    * them, with a deliberate checksum mismatch on one table to prove
    * validation flows end to end.
    */
  private object ReplayLoader extends TableLoader {
    val rows = Map("artist" -> 275L, "album" -> 347L, "track" -> 3503L,
      "playlist_track" -> 8715L)
    def load(t: TableMeta): Long = rows(t.name)
    def sourceCount(t: TableMeta): Long = rows(t.name)
    def targetCount(t: TableMeta): Long = rows(t.name)
    override def sourceDigest(t: TableMeta): Option[String] =
      Some(if (t.name == "track") "3503:deadbeef" else s"${rows(t.name)}:ok")
    override def targetDigest(t: TableMeta): Option[String] =
      Some(if (t.name == "track") "3503:cafebabe" else s"${rows(t.name)}:ok")
  }

  test("contract 2/2: recorded Chinook-shaped pragma rows replay " +
      "through assembly, type mapping, DDL, and the full pipeline") {
    val (sts, fks) = Introspection.assembleSqlite(
      colRows, listRows, infoRows, fkRows, createSql)

    // --- assembly IR ---
    assert(sts.map(_.name) ==
      Seq("album", "artist", "playlist_track", "track"))
    val artist = sts.find(_.name == "artist").get
    assert(artist.columns.head.extra == "auto_increment") // rowid alias
    val album = sts.find(_.name == "album").get
    assert(album.columns.head.extra == "auto_increment") // AUTOINCREMENT
    val track = sts.find(_.name == "track").get
    assert(track.columns(3).precision.contains(10) &&
      track.columns(3).scale.contains(2))
    assert(track.columns(5).extra == "STORED GENERATED")
    assert(track.columns(6).extra == "VIRTUAL GENERATED")
    // composite PK in pk-position order
    val pt = sts.find(_.name == "playlist_track").get
    assert(pt.indexes.find(_.isPrimary).get.columns ==
      Seq("PlaylistId", "TrackId"))
    // pk-origin autoindex excluded; partial/expression indexes flagged
    assert(!album.indexes.exists(_.name.startsWith("sqlite_autoindex")))
    assert(track.indexes.find(_.name == "ix_track_cheap")
      .get.hasExpression)
    assert(track.indexes.find(_.name == "ix_track_expr")
      .get.hasExpression)
    // FK naming + rules parity (fk_<table>_<id>, uppercased rules)
    assert(fks("album").head.name == "fk_album_0" &&
      fks("album").head.onDelete == "CASCADE")
    assert(fks("track").head.onDelete == "SET NULL")
    assert(fks("playlist_track").map(_.name) ==
      Seq("fk_playlist_track_0", "fk_playlist_track_1"))

    // --- type mapping + TableMeta via the real Main path ---
    val metas = sts.map(st => SchemaMapping.toTableMeta(SqliteDialect, st,
      fks.getOrElse(st.name, Nil), TypeOptions(),
      snake = true, preserveDefaults = true))
    val trackMeta = metas.find(_.name == "track").get
    val cols = trackMeta.columns.map(c => c._1 -> c._2).toMap
    assert(cols("track_id") == "bigint")
    assert(cols("name") == "text")
    assert(cols("unit_price") == "numeric(10,2)")
    assert(cols("sec") == "double precision")
    val defaults = trackMeta.columns.collect {
      case (n, _, _, Some(d)) => n -> d
    }.toMap
    assert(defaults.get("unit_price").contains("0.99"))
    assert(defaults.get("ms").contains("0"))

    // --- the full pipeline over the replayed catalog ---
    val rec = new Recorder
    val cfg = JobConfig(validation = "checksum")
    val report = new MigrationPipeline(cfg, rec, ReplayLoader)
      .migrate(metas)
    val s = rec.stmts

    assert(report.tablesCreated.toSet ==
      Set("album", "artist", "playlist_track", "track"))
    assert(report.rowsLoaded == ReplayLoader.rows)
    assert(report.validationMismatches.isEmpty)
    // the planted digest mismatch on track surfaces in the report
    assert(report.checksumMismatches.keySet == Set("track"))

    // DDL parity spot checks on the emitted statements
    assert(s.exists(_.startsWith(
      """CREATE UNLOGGED TABLE "public"."track"""")))
    assert(s.exists(st => st.contains(""""unit_price" numeric(10,2)""") &&
      st.contains("DEFAULT 0.99")))
    // composite PK attaches post-load in order
    assert(s.exists(_.contains(
      """"playlist_track" ADD PRIMARY KEY ("playlist_id", "track_id")""")))
    // plain index created; partial/expression indexes skipped
    assert(s.exists(_.contains(""""ix_album_artist"""")))
    assert(!s.exists(_.contains("ix_track_cheap")))
    assert(!s.exists(_.contains("ix_track_expr")))
    // FKs re-attach with the source rules
    assert(s.exists(st => st.contains(""""fk_album_0"""") &&
      st.contains("ON DELETE CASCADE")))
    assert(s.exists(st => st.contains(""""fk_track_0"""") &&
      st.contains("ON DELETE SET NULL")))
    // sequence reset for the auto_increment rowid aliases
    assert(s.exists(st => st.contains("pg_get_serial_sequence") &&
      st.contains("artist")))
  }
}
