package graft.sources

import graft.SourceTable
import org.apache.spark.sql.{DataFrame, Row}

/** Schema introspection (reference S6: `source_mysql.go:142-413`,
  * `source_sqlite.go:364-721`, `source_mssql.go:141-508`).
  *
  * Each dialect exposes the catalog SQL (run as ordinary JDBC reads —
  * four round trips, like the reference) and an assembly step that folds
  * the catalog rows into the `SourceTable`/`IndexMeta`/`ForeignKeyMeta`
  * IR. Catalog results are small; assembly is driver-side, exactly as in
  * the reference (`source_mysql.go:277-334` group-by-key assembly).
  * Deterministic ordering comes from the catalog ORDER BY clauses
  * (reference O2).
  */
object Introspection {

  /** Views/routines/triggers discovered but NOT migrated — reported for
    * manual follow-up, exactly the reference's posture
    * (`source_objects.go:6-10`, `main.go:194-201`).
    */
  final case class SourceObjects(
      views: Seq[String] = Nil,
      routines: Seq[String] = Nil,   // "PROCEDURE name" / "FUNCTION name"
      triggers: Seq[String] = Nil) {
    def isEmpty: Boolean = views.isEmpty && routines.isEmpty &&
      triggers.isEmpty
  }

  /** MySQL catalog queries (reference `source_mysql.go:148-163`). */
  object MySql {
    def columnsSql(schema: String): String =
      s"""SELECT TABLE_NAME, COLUMN_NAME, DATA_TYPE, COLUMN_TYPE,
         |  CHARACTER_MAXIMUM_LENGTH, NUMERIC_PRECISION, NUMERIC_SCALE,
         |  IS_NULLABLE, COLUMN_DEFAULT, EXTRA, COLLATION_NAME,
         |  GENERATION_EXPRESSION, ORDINAL_POSITION, CHARACTER_SET_NAME
         |FROM INFORMATION_SCHEMA.COLUMNS
         |WHERE TABLE_SCHEMA = '$schema'
         |ORDER BY TABLE_NAME, ORDINAL_POSITION""".stripMargin

    def tablesSql(schema: String): String =
      s"""SELECT TABLE_NAME FROM INFORMATION_SCHEMA.TABLES
         |WHERE TABLE_SCHEMA = '$schema' AND TABLE_TYPE = 'BASE TABLE'
         |ORDER BY TABLE_NAME""".stripMargin

    def indexesSql(schema: String): String =
      s"""SELECT TABLE_NAME, INDEX_NAME, NON_UNIQUE, SEQ_IN_INDEX,
         |  COLUMN_NAME, SUB_PART, EXPRESSION, INDEX_TYPE, COLLATION
         |FROM INFORMATION_SCHEMA.STATISTICS
         |WHERE TABLE_SCHEMA = '$schema'
         |ORDER BY TABLE_NAME, INDEX_NAME, SEQ_IN_INDEX""".stripMargin

    /** Source-objects scan (S7, reference `source_mysql.go:417-460`). */
    def viewsSql(schema: String): String =
      s"SELECT TABLE_NAME FROM INFORMATION_SCHEMA.VIEWS " +
        s"WHERE TABLE_SCHEMA = '$schema' ORDER BY TABLE_NAME"

    def routinesSql(schema: String): String =
      s"SELECT ROUTINE_TYPE, ROUTINE_NAME FROM " +
        s"INFORMATION_SCHEMA.ROUTINES WHERE ROUTINE_SCHEMA = '$schema' " +
        "ORDER BY ROUTINE_TYPE, ROUTINE_NAME"

    def triggersSql(schema: String): String =
      s"SELECT TRIGGER_NAME FROM INFORMATION_SCHEMA.TRIGGERS " +
        s"WHERE TRIGGER_SCHEMA = '$schema' ORDER BY TRIGGER_NAME"

    /** Fold the three catalog results into the report IR. */
    def assembleSourceObjects(views: Seq[Row], routines: Seq[Row],
        triggers: Seq[Row]): SourceObjects =
      SourceObjects(
        views = views.map(_.getString(0)),
        routines = routines.map(r =>
          s"${r.getString(0).toUpperCase} ${r.getString(1)}"),
        triggers = triggers.map(_.getString(0)))

    def foreignKeysSql(schema: String): String =
      s"""SELECT kcu.TABLE_NAME, kcu.CONSTRAINT_NAME, kcu.COLUMN_NAME,
         |  kcu.REFERENCED_TABLE_NAME, kcu.REFERENCED_COLUMN_NAME,
         |  rc.UPDATE_RULE, rc.DELETE_RULE, kcu.ORDINAL_POSITION
         |FROM INFORMATION_SCHEMA.KEY_COLUMN_USAGE kcu
         |JOIN INFORMATION_SCHEMA.REFERENTIAL_CONSTRAINTS rc
         |  ON kcu.CONSTRAINT_NAME = rc.CONSTRAINT_NAME
         | AND kcu.TABLE_SCHEMA = rc.CONSTRAINT_SCHEMA
         |WHERE kcu.TABLE_SCHEMA = '$schema'
         |  AND kcu.REFERENCED_TABLE_NAME IS NOT NULL
         |ORDER BY kcu.TABLE_NAME, kcu.CONSTRAINT_NAME,
         |  kcu.ORDINAL_POSITION""".stripMargin
  }

  /** SQLite pragma batching (reference `source_sqlite.go:15-16,296-312`):
    * table-valued pragmas compound-selected via UNION ALL, capped per
    * statement.
    */
  object Sqlite {
    val MaxUnionTerms = 400 // reference source_sqlite.go:15-16

    private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

    def tablesSql: String =
      "SELECT name FROM sqlite_master WHERE type = 'table' " +
        "AND name NOT LIKE 'sqlite_%' ORDER BY name"

    /** name → CREATE SQL, for rowid-alias/AUTOINCREMENT detection
      * (reference `source_sqlite.go:437-456`).
      */
    def createSqlSql: String =
      "SELECT name, COALESCE(sql, '') FROM sqlite_master WHERE " +
        "type = 'table' AND name NOT LIKE 'sqlite_%' ORDER BY name"

    /** One compound SELECT per ≤400-table batch
      * (reference `source_sqlite.go:372-384`).
      */
    def columnsSqlBatches(tables: Seq[String]): Seq[String] =
      tables.grouped(MaxUnionTerms).map { batch =>
        batch.map { t =>
          s"SELECT ${lit(t)} AS table_name, cid, name, type, `notnull`, " +
            s"dflt_value, pk, hidden FROM pragma_table_xinfo(${lit(t)})"
        }.mkString("", " UNION ALL ", " ORDER BY table_name, cid")
      }.toSeq

    /** pragma_index_list batches (reference `source_sqlite.go:509-523`). */
    def indexListSqlBatches(tables: Seq[String]): Seq[String] =
      tables.grouped(MaxUnionTerms).map { batch =>
        batch.map { t =>
          s"SELECT ${lit(t)} AS table_name, seq, name, `unique`, " +
            s"origin, partial FROM pragma_index_list(${lit(t)})"
        }.mkString("", " UNION ALL ", " ORDER BY table_name, seq")
      }.toSeq

    /** pragma_index_info batches over (table, index) pairs
      * (reference `source_sqlite.go:570-585`).
      */
    def indexInfoSqlBatches(ixs: Seq[(String, String)]): Seq[String] =
      ixs.grouped(MaxUnionTerms).map { batch =>
        batch.map { case (t, ix) =>
          s"SELECT ${lit(t)} AS table_name, ${lit(ix)} AS index_name, " +
            s"seqno, cid, name FROM pragma_index_info(${lit(ix)})"
        }.mkString("", " UNION ALL ",
          " ORDER BY table_name, index_name, seqno")
      }.toSeq

    /** pragma_foreign_key_list batches
      * (reference `source_sqlite.go:642-655`).
      */
    def foreignKeysSqlBatches(tables: Seq[String]): Seq[String] =
      tables.grouped(MaxUnionTerms).map { batch =>
        batch.map { t =>
          s"SELECT ${lit(t)} AS table_name, id, seq, " +
            s"`table` AS ref_table, `from`, `to`, on_update, on_delete " +
            s"FROM pragma_foreign_key_list(${lit(t)})"
        }.mkString("", " UNION ALL ", " ORDER BY table_name, id, seq")
      }.toSeq

    /** S7 source-objects (reference `source_sqlite.go:115-151`). */
    def viewsSql: String =
      "SELECT name FROM sqlite_master WHERE type='view' ORDER BY name"
    def triggersSql: String =
      "SELECT name FROM sqlite_master WHERE type='trigger' ORDER BY name"
  }

  /** MSSQL sys.* joins (reference `source_mssql.go:179-508`). */
  object Mssql {
    def columnsSql(schema: String): String =
      s"""SELECT t.name AS table_name, c.name AS column_name,
         |  ty.name AS type_name, c.max_length, c.precision, c.scale,
         |  c.is_nullable, dc.definition AS default_definition,
         |  c.is_identity, cc.definition AS computed_definition,
         |  c.collation_name, c.column_id
         |FROM sys.columns c
         |JOIN sys.tables t ON c.object_id = t.object_id
         |JOIN sys.schemas s ON t.schema_id = s.schema_id
         |JOIN sys.types ty ON c.user_type_id = ty.user_type_id
         |LEFT JOIN sys.default_constraints dc
         |  ON c.default_object_id = dc.object_id
         |LEFT JOIN sys.computed_columns cc
         |  ON c.object_id = cc.object_id AND c.column_id = cc.column_id
         |WHERE s.name = '$schema' AND t.is_ms_shipped = 0
         |  AND c.is_hidden = 0
         |ORDER BY t.name, c.column_id""".stripMargin

    /** Key+included index columns (reference `source_mssql.go:319-340`;
      * `is_descending_key` drives per-column DESC on the recreated
      * index, like MySQL's STATISTICS.COLLATION = 'D').
      */
    def indexesSql(schema: String): String =
      s"""SELECT t.name AS table_name, i.name AS index_name, i.is_unique,
         |  i.is_primary_key, i.type_desc, i.has_filter, ic.key_ordinal,
         |  c.name AS column_name, ic.is_included_column,
         |  ic.is_descending_key
         |FROM sys.indexes i
         |JOIN sys.index_columns ic
         |  ON i.object_id = ic.object_id AND i.index_id = ic.index_id
         |JOIN sys.columns c
         |  ON ic.object_id = c.object_id AND ic.column_id = c.column_id
         |JOIN sys.tables t ON i.object_id = t.object_id
         |JOIN sys.schemas s ON t.schema_id = s.schema_id
         |WHERE s.name = '$schema' AND i.type > 0 AND i.name IS NOT NULL
         |ORDER BY t.name, i.index_id, ic.is_included_column,
         |  ic.key_ordinal""".stripMargin

    /** FK constraint columns (reference `source_mssql.go:432-453`).
      * `ref_schema` rides along for the cross-schema warning
      * (`source_mssql.go:477-481`): pgferry migrates one schema at a
      * time, so an FK referencing a table in another schema may fail
      * to re-attach and must be reported.
      */
    def foreignKeysSql(schema: String): String =
      s"""SELECT t.name AS table_name, fk.name AS fk_name,
         |  pc.name AS column_name, ref_t.name AS ref_table,
         |  rc.name AS ref_column,
         |  fk.update_referential_action_desc AS update_action,
         |  fk.delete_referential_action_desc AS delete_action,
         |  fkc.constraint_column_id,
         |  SCHEMA_NAME(ref_t.schema_id) AS ref_schema
         |FROM sys.foreign_keys fk
         |JOIN sys.foreign_key_columns fkc
         |  ON fk.object_id = fkc.constraint_object_id
         |JOIN sys.tables t ON fk.parent_object_id = t.object_id
         |JOIN sys.schemas s ON t.schema_id = s.schema_id
         |JOIN sys.tables ref_t ON fk.referenced_object_id = ref_t.object_id
         |JOIN sys.columns pc ON fkc.parent_object_id = pc.object_id
         |  AND fkc.parent_column_id = pc.column_id
         |JOIN sys.columns rc ON fkc.referenced_object_id = rc.object_id
         |  AND fkc.referenced_column_id = rc.column_id
         |WHERE s.name = '$schema'
         |ORDER BY t.name, fk.name, fkc.constraint_column_id""".stripMargin

    /** S7 source-objects (reference `source_mssql.go:512-590`). */
    def viewsSql(schema: String): String =
      s"""SELECT v.name FROM sys.views v
         |JOIN sys.schemas s ON v.schema_id = s.schema_id
         |WHERE s.name = '$schema' ORDER BY v.name""".stripMargin
    def routinesSql(schema: String): String =
      s"""SELECT o.type_desc, o.name FROM sys.objects o
         |JOIN sys.schemas s ON o.schema_id = s.schema_id
         |WHERE s.name = '$schema' AND o.type IN ('P','FN','IF','TF')
         |ORDER BY o.type, o.name""".stripMargin
    def triggersSql(schema: String): String =
      s"""SELECT tr.name FROM sys.triggers tr
         |JOIN sys.objects o ON tr.parent_id = o.object_id
         |JOIN sys.schemas s ON o.schema_id = s.schema_id
         |WHERE s.name = '$schema' ORDER BY tr.name""".stripMargin
  }

  /** Fold MySQL COLUMNS rows into per-table SourceColumn lists,
    * preserving first-seen (ordinal) order — the reference's
    * map+ordered-slice assembly (`source_mysql.go:277-334`).
    */
  def assembleMySqlColumns(rows: Seq[Row]): Map[String, Seq[SourceColumn]] = {
    val byTable = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[SourceColumn]]
    rows.foreach { r =>
      def strOpt(i: Int): Option[String] =
        if (r.isNullAt(i)) None else Some(r.get(i).toString)
      def intOpt(i: Int): Option[Int] =
        if (r.isNullAt(i)) None else Some(r.get(i).toString.toDouble.toInt)
      val c = SourceColumn(
        name = r.getString(1),
        dataType = r.getString(2),
        columnType = Option(r.getString(3)).getOrElse(""),
        charMaxLen = intOpt(4),
        precision = intOpt(5),
        scale = intOpt(6),
        nullable = r.getString(7).equalsIgnoreCase("YES"),
        default = strOpt(8),
        extra = Option(r.getString(9)).getOrElse(""),
        unsigned = Option(r.getString(3)).exists(
          _.toLowerCase.contains("unsigned")),
        collation = strOpt(10).getOrElse(""),
        // CHARACTER_SET_NAME rides at the tail so older recorded
        // catalogs (13-field rows) still replay
        charset = if (r.size > 13) strOpt(13).getOrElse("") else "",
        generationExpression = strOpt(11).getOrElse(""))
      val t = r.getString(0)
      byTable(t) = byTable.getOrElse(t, Vector.empty) :+ c
    }
    byTable.toMap
  }

  /** Fold MySQL STATISTICS rows into ordered IndexMeta per table. */
  def assembleMySqlIndexes(rows: Seq[Row]): Map[String, Seq[IndexMeta]] = {
    val grouped = rows.groupBy(r => (r.getString(0), r.getString(1)))
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[IndexMeta]]
    grouped.toSeq
      .sortBy { case ((t, ix), _) => (t, ix) }
      .foreach { case ((table, ixName), ixRows) =>
        val sorted = ixRows.sortBy(_.get(3).toString.toDouble.toInt)
        val ix = IndexMeta(
          name = ixName,
          columns = sorted.flatMap(r => Option(r.getString(4))),
          unique = sorted.head.get(2).toString.toDouble.toInt == 0,
          isPrimary = ixName == "PRIMARY",
          kind = sorted.head.getString(7),
          hasPrefix = sorted.exists(!_.isNullAt(5)),
          hasExpression = sorted.exists(!_.isNullAt(6)),
          // STATISTICS.COLLATION: 'A'/'D'/NULL per key part
          // (model.go:26); tail position keeps 8-field recordings valid
          directions = sorted.map(r =>
            if (r.size > 8 && !r.isNullAt(8) && r.getString(8) == "D")
              "DESC"
            else "ASC"))
        out(table) = out.getOrElse(table, Vector.empty) :+ ix
      }
    out.toMap
  }

  /** Fold KEY_COLUMN_USAGE ⋈ REFERENTIAL_CONSTRAINTS rows into FKs
    * (composite columns kept in ordinal order; reference
    * `source_mysql.go:351-412`).
    */
  def assembleMySqlForeignKeys(rows: Seq[Row])
      : Map[String, Seq[ForeignKeyMeta]] = {
    val grouped = rows.groupBy(r => (r.getString(0), r.getString(1)))
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[ForeignKeyMeta]]
    grouped.toSeq
      .sortBy { case ((t, fk), _) => (t, fk) }
      .foreach { case ((table, fkName), fkRows) =>
        val sorted = fkRows.sortBy(_.get(7).toString.toDouble.toInt)
        val fk = ForeignKeyMeta(
          name = fkName,
          columns = sorted.map(_.getString(2)),
          refTable = sorted.head.getString(3),
          refColumns = sorted.map(_.getString(4)),
          onUpdate = sorted.head.getString(5),
          onDelete = sorted.head.getString(6))
        out(table) = out.getOrElse(table, Vector.empty) :+ fk
      }
    out.toMap
  }

  /** Engine-agnostic introspection over `java.sql.DatabaseMetaData` —
    * works against ANY JDBC source (beyond the reference's three
    * engines): tables, ordered columns, primary keys, secondary
    * indexes, and imported foreign keys. Driver-side, a handful of
    * metadata round trips like the reference's catalog queries.
    */
  def fromJdbcMetadata(conn: java.sql.Connection,
      schemaPattern: String = null)
      : (Seq[SourceTable], Map[String, Seq[ForeignKeyMeta]]) = {
    val md = conn.getMetaData
    val tableNames = {
      val rs = md.getTables(null, schemaPattern, "%", Array("TABLE"))
      val b = Seq.newBuilder[String]
      while (rs.next()) b += rs.getString("TABLE_NAME")
      rs.close()
      b.result().sorted
    }
    def fkRule(code: Int): String = code match {
      case java.sql.DatabaseMetaData.importedKeyCascade => "CASCADE"
      case java.sql.DatabaseMetaData.importedKeySetNull => "SET NULL"
      case java.sql.DatabaseMetaData.importedKeySetDefault => "SET DEFAULT"
      case java.sql.DatabaseMetaData.importedKeyRestrict => "RESTRICT"
      case _ => "NO ACTION"
    }
    val tables = tableNames.map { t =>
      val cols = {
        val rs = md.getColumns(null, schemaPattern, t, "%")
        val b = Seq.newBuilder[(Int, SourceColumn)]
        while (rs.next()) {
          // wasNull() reports on the IMMEDIATELY preceding read — check
          // each nullable getInt before touching another column
          val size = rs.getInt("COLUMN_SIZE")
          val sizeNull = rs.wasNull()
          val scale = rs.getInt("DECIMAL_DIGITS")
          val scaleNull = rs.wasNull()
          b += rs.getInt("ORDINAL_POSITION") -> SourceColumn(
            name = rs.getString("COLUMN_NAME"),
            dataType = rs.getString("TYPE_NAME"),
            columnType = rs.getString("TYPE_NAME"),
            charMaxLen = if (sizeNull || size == 0) None else Some(size),
            precision = if (sizeNull) None else Some(size).filter(_ > 0),
            scale = if (scaleNull) None else Some(scale),
            nullable = rs.getInt("NULLABLE") !=
              java.sql.DatabaseMetaData.columnNoNulls,
            default = Option(rs.getString("COLUMN_DEF")))
        }
        rs.close()
        b.result().sortBy(_._1).map(_._2)
      }
      val pkCols = {
        val rs = md.getPrimaryKeys(null, schemaPattern, t)
        val b = Seq.newBuilder[(Short, String)]
        while (rs.next())
          b += rs.getShort("KEY_SEQ") -> rs.getString("COLUMN_NAME")
        rs.close()
        b.result().sortBy(_._1).map(_._2)
      }
      val pk =
        if (pkCols.isEmpty) None
        else Some(IndexMeta(s"pk_$t", pkCols, unique = true,
          isPrimary = true))
      val secondary = {
        val rs = md.getIndexInfo(null, schemaPattern, t, false, false)
        val b = Seq.newBuilder[(String, Boolean, Short, String)]
        while (rs.next()) {
          val name = rs.getString("INDEX_NAME")
          val col = rs.getString("COLUMN_NAME")
          if (name != null && col != null)
            b += ((name, !rs.getBoolean("NON_UNIQUE"),
              rs.getShort("ORDINAL_POSITION"), col))
        }
        rs.close()
        b.result().groupBy(_._1).toSeq.sortBy(_._1).map {
          case (name, rows) =>
            IndexMeta(name, rows.sortBy(_._3).map(_._4),
              unique = rows.head._2)
        }.filterNot(ix => pk.exists(_.columns == ix.columns))
      }
      SourceTable(t, cols, pk.toSeq ++ secondary)
    }
    val fks = tableNames.flatMap { t =>
      val rs = md.getImportedKeys(null, schemaPattern, t)
      val b = Seq.newBuilder[(String, Short, String, String, String,
        String, String)]
      while (rs.next())
        b += ((rs.getString("FK_NAME"), rs.getShort("KEY_SEQ"),
          rs.getString("FKCOLUMN_NAME"), rs.getString("PKTABLE_NAME"),
          rs.getString("PKCOLUMN_NAME"),
          fkRule(rs.getInt("UPDATE_RULE")),
          fkRule(rs.getInt("DELETE_RULE"))))
      rs.close()
      val grouped = b.result().groupBy(_._1).toSeq.sortBy(_._1).map {
        case (name, rows) =>
          val sorted = rows.sortBy(_._2)
          ForeignKeyMeta(name, sorted.map(_._3), sorted.head._4,
            sorted.map(_._5), onDelete = sorted.head._7,
            onUpdate = sorted.head._6)
      }
      if (grouped.isEmpty) None else Some(t -> grouped)
    }.toMap
    (tables, fks)
  }

  /** Full assembly: catalog DataFrames → SourceTable IR. */
  def assembleMySql(columns: DataFrame, indexes: DataFrame,
      foreignKeys: DataFrame)
      : (Seq[SourceTable], Map[String, Seq[ForeignKeyMeta]]) = {
    val cols = assembleMySqlColumns(columns.collect().toSeq)
    val ixs = assembleMySqlIndexes(indexes.collect().toSeq)
    val fks = assembleMySqlForeignKeys(foreignKeys.collect().toSeq)
    val tables = cols.toSeq.sortBy(_._1).map { case (t, cs) =>
      SourceTable(t, cs, ixs.getOrElse(t, Nil))
    }
    (tables, fks)
  }

  // ---- SQLite native assembly (reference source_sqlite.go:364-713) ----

  private def anyInt(v: Any): Int = v match {
    case b: Boolean => if (b) 1 else 0
    case n => n.toString.toDouble.toInt
  }

  private val TypeParams = """\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)""".r

  /** pragma_table_xinfo rows `(table_name, cid, name, type, notnull,
    * dflt_value, pk, hidden)` → per-table ordered columns and the PK
    * index. `createSql` (sqlite_master.sql) drives AUTOINCREMENT
    * detection; an INTEGER single-column PK is a rowid alias and maps to
    * auto_increment regardless (reference `source_sqlite.go:404-489`).
    */
  def assembleSqliteColumns(rows: Seq[Row],
      createSql: Map[String, String] = Map.empty)
      : (Map[String, Seq[SourceColumn]], Map[String, IndexMeta]) = {
    val byTable = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[(Int, SourceColumn)]]
    val pkCols = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[(Int, String)]]
    rows.foreach { r =>
      val t = r.getString(0)
      val declared = Option(r.getString(3)).getOrElse("")
      val params = TypeParams.findFirstMatchIn(declared)
      val p = params.map(_.group(1).toInt)
      val s = params.flatMap(m => Option(m.group(2)).map(_.toInt))
      val hidden = anyInt(r.get(7))
      val c = SourceColumn(
        name = r.getString(2),
        dataType = TypeParams.replaceAllIn(declared, "").trim.toLowerCase,
        columnType = declared.toLowerCase,
        charMaxLen =
          if (declared.toUpperCase.contains("CHAR")) p else None,
        precision = p,
        scale = s,
        nullable = anyInt(r.get(4)) == 0,
        default = if (r.isNullAt(5)) None else Some(r.get(5).toString),
        extra = hidden match {
          case 2 => "STORED GENERATED"
          case 3 => "VIRTUAL GENERATED"
          case _ => ""
        })
      byTable(t) = byTable.getOrElse(t, Vector.empty) :+
        (anyInt(r.get(1)) -> c)
      val pk = anyInt(r.get(6))
      if (pk > 0)
        pkCols(t) = pkCols.getOrElse(t, Vector.empty) :+ (pk -> c.name)
    }
    val pks = pkCols.map { case (t, cols) =>
      t -> IndexMeta(s"pk_$t", cols.sortBy(_._1).map(_._2),
        unique = true, isPrimary = true)
    }.toMap
    val tables = byTable.map { case (t, cs) =>
      val ordered = cs.sortBy(_._1).map(_._2)
      // rowid alias: single INTEGER pk column (covers AUTOINCREMENT too,
      // which sqlite only permits on INTEGER PRIMARY KEY); explicit
      // AUTOINCREMENT in the CREATE SQL also qualifies.
      val auto = pkCols.get(t).filter(_.size == 1).map(_.head._2)
        .filter { pkName =>
          ordered.exists(c => c.name == pkName &&
            c.columnType.equalsIgnoreCase("integer")) ||
            createSql.get(t).exists(
              _.toUpperCase.contains("AUTOINCREMENT"))
        }
      t -> ordered.map(c =>
        if (auto.contains(c.name)) c.copy(extra = "auto_increment") else c)
    }.toMap
    (tables, pks)
  }

  /** pragma_index_list `(table_name, seq, name, unique, origin,
    * partial)` + pragma_index_info `(table_name, index_name, seqno, cid,
    * name)` → secondary IndexMeta per table (PK-origin rows excluded;
    * partial and expression indexes flagged hasExpression so DDL skips
    * them — reference `source_sqlite.go:496-633`).
    */
  def assembleSqliteIndexes(listRows: Seq[Row], infoRows: Seq[Row])
      : Map[String, Seq[IndexMeta]] = {
    val colsByIx = infoRows.groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues { rs =>
        val sorted = rs.sortBy(r => anyInt(r.get(2)))
        (sorted.map(r => Option(r.getString(4))),
          sorted.exists(_.isNullAt(4))) // NULL column = expression index
      }.toMap
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[IndexMeta]]
    listRows.sortBy(r => (r.getString(0), anyInt(r.get(1)))).foreach { r =>
      val (t, name) = (r.getString(0), r.getString(2))
      if (r.getString(4) != "pk") {
        val (cols, hasExpr) =
          colsByIx.getOrElse((t, name), (Seq.empty, false))
        out(t) = out.getOrElse(t, Vector.empty) :+ IndexMeta(
          name = name,
          columns = cols.flatten,
          unique = anyInt(r.get(3)) == 1,
          isPrimary = false,
          hasExpression = hasExpr || anyInt(r.get(5)) == 1)
      }
    }
    out.toMap
  }

  /** pragma_foreign_key_list `(table_name, id, seq, ref_table, from, to,
    * on_update, on_delete)` → composite-ordered FKs, named
    * `fk_<table>_<id>` like the reference (`source_sqlite.go:686-699`).
    */
  def assembleSqliteForeignKeys(rows: Seq[Row])
      : Map[String, Seq[ForeignKeyMeta]] = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[ForeignKeyMeta]]
    rows.groupBy(r => (r.getString(0), anyInt(r.get(1)))).toSeq
      .sortBy(_._1).foreach { case ((t, id), fkRows) =>
        val sorted = fkRows.sortBy(r => anyInt(r.get(2)))
        out(t) = out.getOrElse(t, Vector.empty) :+ ForeignKeyMeta(
          name = s"fk_${t}_$id",
          columns = sorted.map(_.getString(4)),
          refTable = sorted.head.getString(3),
          refColumns = sorted.map(_.getString(5)),
          onUpdate = sorted.head.getString(6).toUpperCase,
          onDelete = sorted.head.getString(7).toUpperCase)
      }
    out.toMap
  }

  /** Full SQLite assembly from the batched pragma result sets. */
  def assembleSqlite(colRows: Seq[Row], listRows: Seq[Row],
      infoRows: Seq[Row], fkRows: Seq[Row],
      createSql: Map[String, String] = Map.empty)
      : (Seq[SourceTable], Map[String, Seq[ForeignKeyMeta]]) = {
    val (cols, pks) = assembleSqliteColumns(colRows, createSql)
    val ixs = assembleSqliteIndexes(listRows, infoRows)
    val tables = cols.toSeq.sortBy(_._1).map { case (t, cs) =>
      SourceTable(t, cs, pks.get(t).toSeq ++ ixs.getOrElse(t, Nil))
    }
    (tables, assembleSqliteForeignKeys(fkRows))
  }

  // ---- MSSQL native assembly (reference source_mssql.go:179-508) ----

  /** Strip the outer constraint parens MSSQL wraps defaults in:
    * `((0))` → `0`, `(getdate())` → `getdate()`
    * (reference `mssqlStripParens`).
    */
  def mssqlStripParens(s: String): String = {
    var cur = s.trim
    while (cur.length >= 2 && cur.head == '(' && cur.last == ')') {
      // only strip when the outer parens actually match each other
      var depth = 0
      var matched = true
      cur.zipWithIndex.foreach { case (c, i) =>
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1
          if (depth == 0 && i < cur.length - 1) matched = false }
      }
      if (!matched) return cur
      cur = cur.substring(1, cur.length - 1).trim
    }
    cur
  }

  /** sys.columns rows (see [[Mssql.columnsSql]]) → per-table columns.
    * nvarchar/nchar max_length is bytes (halved for chars); -1 = MAX
    * (→ no length, text mapping). IDENTITY → auto_increment; computed
    * columns carry their definition (reference
    * `source_mssql.go:208-311`).
    */
  def assembleMssqlColumns(rows: Seq[Row])
      : Map[String, Seq[SourceColumn]] = {
    val byTable = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[(Int, SourceColumn)]]
    rows.foreach { r =>
      val t = r.getString(0)
      val baseType = r.getString(2).toLowerCase
      val maxLen = anyInt(r.get(3))
      val chars = baseType match {
        case "nvarchar" | "nchar" | "ntext" =>
          if (maxLen <= 0) None else Some(maxLen / 2)
        case "varchar" | "char" | "binary" | "varbinary" =>
          if (maxLen <= 0) None else Some(maxLen)
        case _ => None
      }
      val computed = Option(r.getString(9)).filter(_.nonEmpty)
      val c = SourceColumn(
        name = r.getString(1),
        dataType = baseType,
        columnType = baseType,
        charMaxLen = chars,
        precision = Some(anyInt(r.get(4))).filter(_ > 0),
        scale = Some(anyInt(r.get(5))),
        nullable = anyInt(r.get(6)) != 0,
        default =
          if (r.isNullAt(7)) None
          else Some(mssqlStripParens(r.getString(7))),
        extra =
          if (anyInt(r.get(8)) != 0) "auto_increment"
          else if (computed.isDefined) "COMPUTED"
          else "",
        collation = Option(r.getString(10)).getOrElse(""),
        generationExpression = computed.getOrElse(""))
      byTable(t) = byTable.getOrElse(t, Vector.empty) :+
        (anyInt(r.get(11)) -> c)
    }
    byTable.map { case (t, cs) => t -> cs.sortBy(_._1).map(_._2) }.toMap
  }

  /** sys.indexes rows (see [[Mssql.indexesSql]]) → IndexMeta per table.
    * Included (non-key) columns are dropped; XML/SPATIAL and filtered
    * indexes are flagged hasExpression so DDL skips them (reference
    * `source_mssql.go:319-430`).
    */
  def assembleMssqlIndexes(rows: Seq[Row]): Map[String, Seq[IndexMeta]] = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[IndexMeta]]
    rows.groupBy(r => (r.getString(0), r.getString(1))).toSeq
      .sortBy(_._1).foreach { case ((t, name), ixRows) =>
        val keyCols = ixRows.filter(r => anyInt(r.get(8)) == 0)
          .sortBy(r => anyInt(r.get(6)))
        val head = ixRows.head
        val typeDesc = head.getString(4)
        // per-column DESC from is_descending_key (ninth column; older
        // recorded fixtures without it default to ASC)
        val dirs = keyCols.map(r =>
          if (r.length > 9 && anyInt(r.get(9)) == 1) "DESC" else "ASC")
        out(t) = out.getOrElse(t, Vector.empty) :+ IndexMeta(
          name = name,
          columns = keyCols.map(_.getString(7)),
          unique = anyInt(head.get(2)) == 1,
          isPrimary = anyInt(head.get(3)) == 1,
          kind = if (typeDesc == "XML" || typeDesc == "SPATIAL") typeDesc
            else "BTREE",
          hasExpression = typeDesc == "XML" || typeDesc == "SPATIAL" ||
            anyInt(head.get(5)) == 1,
          directions = dirs)
      }
    out.toMap
  }

  /** sys.foreign_keys rows (see [[Mssql.foreignKeysSql]]) → FKs;
    * MSSQL action spelling `NO_ACTION`/`SET_NULL` normalizes to the
    * SQL-standard space form (reference `source_mssql.go:455-508`).
    */
  def assembleMssqlForeignKeys(rows: Seq[Row],
      sourceSchema: String = "",
      onWarn: String => Unit = _ => ())
      : Map[String, Seq[ForeignKeyMeta]] = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[ForeignKeyMeta]]
    rows.groupBy(r => (r.getString(0), r.getString(1))).toSeq
      .sortBy(_._1).foreach { case ((t, name), fkRows) =>
        val sorted = fkRows.sortBy(r => anyInt(r.get(7)))
        // cross-schema referenced table: re-attachment may fail when
        // the referenced table isn't migrated into the target schema —
        // warn exactly like the reference (source_mssql.go:477-481).
        // (Older recorded fixtures without the ref_schema column skip
        // the check.)
        val head = sorted.head
        if (head.length > 8 && sourceSchema.nonEmpty) {
          val refSchema = Option(head.getString(8)).getOrElse("")
          if (refSchema.nonEmpty && refSchema != sourceSchema)
            onWarn(s"FK $name references table $refSchema." +
              s"${head.getString(3)} in a different schema; the FK may " +
              "fail if that table is not in the target PostgreSQL schema")
        }
        out(t) = out.getOrElse(t, Vector.empty) :+ ForeignKeyMeta(
          name = name,
          columns = sorted.map(_.getString(2)),
          refTable = sorted.head.getString(3),
          refColumns = sorted.map(_.getString(4)),
          onUpdate = sorted.head.getString(5).replace('_', ' '),
          onDelete = sorted.head.getString(6).replace('_', ' '))
      }
    out.toMap
  }

  /** Full MSSQL assembly from the sys.* result sets. */
  def assembleMssql(colRows: Seq[Row], ixRows: Seq[Row], fkRows: Seq[Row],
      sourceSchema: String = "",
      onWarn: String => Unit = _ => ())
      : (Seq[SourceTable], Map[String, Seq[ForeignKeyMeta]]) = {
    val cols = assembleMssqlColumns(colRows)
    val ixs = assembleMssqlIndexes(ixRows)
    val tables = cols.toSeq.sortBy(_._1).map { case (t, cs) =>
      SourceTable(t, cs, ixs.getOrElse(t, Nil))
    }
    (tables, assembleMssqlForeignKeys(fkRows, sourceSchema, onWarn))
  }
}
