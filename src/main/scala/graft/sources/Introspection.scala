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
         |  GENERATION_EXPRESSION, ORDINAL_POSITION
         |FROM INFORMATION_SCHEMA.COLUMNS
         |WHERE TABLE_SCHEMA = '$schema'
         |ORDER BY TABLE_NAME, ORDINAL_POSITION""".stripMargin

    def tablesSql(schema: String): String =
      s"""SELECT TABLE_NAME FROM INFORMATION_SCHEMA.TABLES
         |WHERE TABLE_SCHEMA = '$schema' AND TABLE_TYPE = 'BASE TABLE'
         |ORDER BY TABLE_NAME""".stripMargin

    def indexesSql(schema: String): String =
      s"""SELECT TABLE_NAME, INDEX_NAME, NON_UNIQUE, SEQ_IN_INDEX,
         |  COLUMN_NAME, SUB_PART, EXPRESSION, INDEX_TYPE
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

    def tablesSql: String =
      "SELECT name FROM sqlite_master WHERE type = 'table' " +
        "AND name NOT LIKE 'sqlite_%' ORDER BY name"

    /** One compound SELECT per ≤400-table batch. */
    def columnsSqlBatches(tables: Seq[String]): Seq[String] =
      tables.grouped(MaxUnionTerms).map { batch =>
        batch.map { t =>
          val lit = t.replace("'", "''")
          s"SELECT '$lit' AS table_name, name, type, `notnull`, " +
            s"dflt_value, pk, hidden FROM pragma_table_xinfo('$lit')"
        }.mkString(" UNION ALL ")
      }.toSeq
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
         |ORDER BY t.name, c.column_id""".stripMargin
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
          hasExpression = sorted.exists(!_.isNullAt(6)))
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
}
