package graft.sources

import SchemaMapping._

/** Table metadata the engine carries for the constraint-free sink DDL
  * (reference `model.go:22-53`): Spark has no PK/FK/index enforcement, so
  * these live as metadata and are re-emitted target-side after the load
  * (deferred-constraint posture, reference `ddl.go:14-16`,
  * `post.go:15-100`).
  */
final case class IndexMeta(name: String, columns: Seq[String],
    unique: Boolean = false, isPrimary: Boolean = false,
    kind: String = "BTREE",            // BTREE|FULLTEXT|SPATIAL|HASH
    hasPrefix: Boolean = false,        // prefix index, e.g. col(10)
    hasExpression: Boolean = false)    // functional index
final case class ForeignKeyMeta(name: String, columns: Seq[String],
    refTable: String, refColumns: Seq[String],
    onDelete: String = "NO ACTION", onUpdate: String = "NO ACTION")
final case class TableMeta(
    name: String,
    columns: Seq[(String, String, Boolean, Option[String])], // (name, pgType, nullable, default)
    primaryKey: Option[IndexMeta] = None,
    indexes: Seq[IndexMeta] = Nil,
    foreignKeys: Seq[ForeignKeyMeta] = Nil)

/** Target-side DDL generation (reference `ddl.go:16-98` createTables,
  * `ddl.go:132-175` enum types, `post.go` constraint re-attachment).
  * Constraints are intentionally absent from CREATE TABLE — they attach
  * post-load in the order PK → indexes → FKs → sequences
  * (reference `post.go:17-100`).
  */
object DdlGenerator {

  /** Bare CREATE TABLE, optionally UNLOGGED for bulk load
    * (reference `main.go:129-132`, `docs/conventions.md:284-295`).
    */
  def createTable(schema: String, t: TableMeta,
      unlogged: Boolean = true): String = {
    val cols = t.columns.map { case (name, pgType, nullable, default) =>
      val parts = Seq(pgIdent(name), pgType) ++
        (if (!nullable) Seq("NOT NULL") else Nil) ++
        default.map(d => s"DEFAULT $d").toSeq
      "  " + parts.mkString(" ")
    }
    val kind = if (unlogged) "UNLOGGED TABLE" else "TABLE"
    s"CREATE $kind ${pgIdent(schema)}.${pgIdent(t.name)} (\n" +
      cols.mkString(",\n") + "\n)"
  }

  /** Native PG enum type with value-set-hashed shared name
    * (reference `ddl.go:132-175`).
    */
  def createEnumType(values: Seq[String]): String = {
    val name = enumTypeName(values)
    s"CREATE TYPE ${pgIdent(name)} AS ENUM (" +
      values.map(pgLiteral).mkString(", ") + ")"
  }

  /** SET LOGGED after bulk load (reference `post.go:213-222`). */
  def setLogged(schema: String, table: String): String =
    s"ALTER TABLE ${pgIdent(schema)}.${pgIdent(table)} SET LOGGED"

  def addPrimaryKey(schema: String, t: TableMeta): Option[String] =
    t.primaryKey.map { pk =>
      s"ALTER TABLE ${pgIdent(schema)}.${pgIdent(t.name)} " +
        s"ADD PRIMARY KEY (${pk.columns.map(pgIdent).mkString(", ")})"
    }

  def createIndex(schema: String, table: String, ix: IndexMeta): String = {
    val unique = if (ix.unique) "UNIQUE " else ""
    val name = truncateIdentifier(ix.name)
    s"CREATE ${unique}INDEX ${pgIdent(name)} ON " +
      s"${pgIdent(schema)}.${pgIdent(table)} " +
      s"(${ix.columns.map(pgIdent).mkString(", ")})"
  }

  def addForeignKey(schema: String, table: String,
      fk: ForeignKeyMeta): String = {
    val name = truncateIdentifier(fk.name)
    s"ALTER TABLE ${pgIdent(schema)}.${pgIdent(table)} " +
      s"ADD CONSTRAINT ${pgIdent(name)} FOREIGN KEY " +
      s"(${fk.columns.map(pgIdent).mkString(", ")}) REFERENCES " +
      s"${pgIdent(schema)}.${pgIdent(fk.refTable)} " +
      s"(${fk.refColumns.map(pgIdent).mkString(", ")}) " +
      s"ON DELETE ${fk.onDelete} ON UPDATE ${fk.onUpdate}"
  }

  /** Sequence reset after load (reference `post.go:414-426`). */
  def resetSequence(schema: String, table: String, col: String): String = {
    val qt = s"${pgIdent(schema)}.${pgIdent(table)}"
    s"SELECT setval(pg_get_serial_sequence('$qt', '$col'), " +
      s"COALESCE((SELECT MAX(${pgIdent(col)}) FROM $qt), 0) + 1, false)"
  }

  /** F17 — per-dialect DEFAULT-expression rewrite (reference
    * `source_mysql.go:859-938`, `source_mssql.go:740-842`,
    * `source_sqlite.go:822-868`).
    */
  def mapDefault(dialect: String, raw: String): Option[String] = {
    var d = raw.trim
    if (d.isEmpty) return None
    // MSSQL wraps defaults in balanced parens: ((0)) → 0
    if (dialect == "mssql") {
      while (d.startsWith("(") && d.endsWith(")")) d = d.substring(1, d.length - 1).trim
      if (d.startsWith("N'")) d = d.substring(1)
    }
    val lower = d.toLowerCase
    lower match {
      case "current_timestamp" | "current_timestamp()" | "now()" |
           "getdate()" | "getutcdate()" | "sysdatetime()" =>
        Some("CURRENT_TIMESTAMP")
      case "newid()" | "newsequentialid()" | "uuid()" =>
        Some("gen_random_uuid()")
      case "suser_sname()" => Some("CURRENT_USER")
      case "null" => Some("NULL")
      case "true" | "false" => Some(lower.toUpperCase)
      case _ if d.startsWith("b'") && d.endsWith("'") =>
        Some("B" + d.substring(1)) // bit literal b'101' → B'101'
      case _ if d.matches("^-?\\d+(\\.\\d+)?$") => Some(d)
      case _ if d.startsWith("'") && d.endsWith("'") => Some(d)
      case _ => None // expression defaults are reported, not ported
    }
  }
}
