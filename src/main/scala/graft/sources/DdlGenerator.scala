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
    hasExpression: Boolean = false,    // functional index
    directions: Seq[String] = Nil)     // per-column ASC|DESC (model.go:26)
final case class ForeignKeyMeta(name: String, columns: Seq[String],
    refTable: String, refColumns: Seq[String],
    onDelete: String = "NO ACTION", onUpdate: String = "NO ACTION")
final case class TableMeta(
    name: String,
    columns: Seq[(String, String, Boolean, Option[String])], // (name, pgType, nullable, default)
    primaryKey: Option[IndexMeta] = None,
    indexes: Seq[IndexMeta] = Nil,
    foreignKeys: Seq[ForeignKeyMeta] = Nil,
    // (column, source base type) for columns whose source type was
    // UNSIGNED (excluding tinyint(1)→boolean) — drives the optional
    // post-load CHECK constraints (reference post.go:102-158)
    unsignedColumns: Seq[(String, String)] = Nil,
    // columns carrying MySQL `on update CURRENT_TIMESTAMP` — drives the
    // optional trigger replication (reference post.go:436-472)
    onUpdateColumns: Seq[String] = Nil,
    // per-table CHECK clauses from enum_mode=check (ddl.go:177-195)
    // and set_mode=text_array_check (ddl.go:197-214)
    checks: Seq[String] = Nil)

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
      // schema-qualify the shared FNV-named enum types created by
      // createEnumType (reference ddl.go:46-49)
      val qualified =
        if (pgType.startsWith("pgferry_enum_"))
          s"${pgIdent(schema)}.${pgIdent(pgType)}"
        else pgType
      val parts = Seq(pgIdent(name), qualified) ++
        (if (!nullable) Seq("NOT NULL") else Nil) ++
        default.map(d => s"DEFAULT $d").toSeq
      "  " + parts.mkString(" ")
    }
    val kind = if (unlogged) "UNLOGGED TABLE" else "TABLE"
    s"CREATE $kind ${pgIdent(schema)}.${pgIdent(t.name)} (\n" +
      (cols ++ t.checks.map("  " + _)).mkString(",\n") + "\n)"
  }

  /** DROP for `recreate` mode. The reference recreates at schema
    * granularity (`DROP SCHEMA … CASCADE`, `main.go:448-452`); this
    * engine drops per migrated table so unrelated objects in a shared
    * target schema survive. CASCADE detaches dependent FKs from earlier
    * runs.
    */
  def dropTable(schema: String, table: String): String =
    s"DROP TABLE IF EXISTS ${pgIdent(schema)}.${pgIdent(table)} CASCADE"

  /** DROP for `recreate` mode's enum types. Schema-qualified to match
    * createEnumType — with an unqualified name the DROP would resolve
    * via search_path and miss (or hit the wrong) type whenever the
    * target schema isn't the connection default.
    */
  def dropEnumType(schema: String, values: Seq[String]): String =
    s"DROP TYPE IF EXISTS ${pgIdent(schema)}.${pgIdent(enumTypeName(values))} CASCADE"

  /** Native PG enum type with value-set-hashed shared name
    * (reference `ddl.go:132-175`). Matches the reference on all three
    * contract points: the type is created IN the target schema (so the
    * schema-qualified reference in createTable resolves without any
    * search_path assumption), values are declared in the same sorted
    * order the name hash uses (deterministic comparison order regardless
    * of which column is encountered first), and creation is wrapped in a
    * duplicate_object-tolerant DO block so a resumed migration that
    * already created the type re-runs safely.
    */
  def createEnumType(schema: String, values: Seq[String]): String = {
    val name = enumTypeName(values)
    val lits = values.sorted.map(pgLiteral).mkString(", ")
    s"DO $$$$ BEGIN CREATE TYPE ${pgIdent(schema)}.${pgIdent(name)} " +
      s"AS ENUM ($lits); " +
      "EXCEPTION WHEN duplicate_object THEN NULL; END $$"
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
    val cols = ix.columns.zipWithIndex.map { case (c, i) =>
      // per-column DESC from the source index definition (model.go:26;
      // MySQL STATISTICS.COLLATION 'D')
      if (ix.directions.lift(i).contains("DESC")) s"${pgIdent(c)} DESC"
      else pgIdent(c)
    }
    s"CREATE ${unique}INDEX ${pgIdent(name)} ON " +
      s"${pgIdent(schema)}.${pgIdent(table)} " +
      s"(${cols.mkString(", ")})"
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

  /** Orphan-cleanup SQL per FK (reference `post.go:505-529`): DELETE
    * for any delete rule except SET NULL, which nullifies instead; the
    * all-NOT-NULL guard gives MATCH SIMPLE parity (`post.go:532-538`).
    */
  def cleanOrphansSql(schema: String, table: String,
      fk: ForeignKeyMeta): String = {
    val child = s"${pgIdent(schema)}.${pgIdent(table)}"
    val parent = s"${pgIdent(schema)}.${pgIdent(fk.refTable)}"
    val joinConds = fk.refColumns.zip(fk.columns)
      .map { case (r, c) => s"p.${pgIdent(r)} = c.${pgIdent(c)}" }
      .mkString(" AND ")
    val notExists = s"NOT EXISTS (SELECT 1 FROM $parent p WHERE $joinConds)"
    val allNotNull = fk.columns
      .map(c => s"c.${pgIdent(c)} IS NOT NULL").mkString(" AND ")
    if (fk.onDelete.equalsIgnoreCase("SET NULL")) {
      val sets = fk.columns.map(c => s"${pgIdent(c)} = NULL").mkString(", ")
      s"UPDATE $child c SET $sets WHERE ($allNotNull) AND $notExists"
    } else
      s"DELETE FROM $child c WHERE ($allNotNull) AND $notExists"
  }

  /** Range CHECK expression for an UNSIGNED source column
    * (reference `post.go:133-158`).
    */
  def unsignedCheckExpr(col: String, dataType: String): Option[String] = {
    val c = pgIdent(col)
    dataType match {
      case "tinyint"   => Some(s"$c >= 0 AND $c <= 255")
      case "smallint"  => Some(s"$c >= 0 AND $c <= 65535")
      case "mediumint" => Some(s"$c >= 0 AND $c <= 16777215")
      case "int"       => Some(s"$c >= 0 AND $c <= 4294967295")
      case "bigint"    => Some(s"$c >= 0 AND $c <= 18446744073709551615")
      case "decimal" | "float" | "double" => Some(s"$c >= 0")
      case _ => None
    }
  }

  /** ADD CONSTRAINT … NOT VALID then VALIDATE — two statements, so the
    * check never takes an exclusive lock over the full scan
    * (reference `post.go:102-131`).
    */
  def unsignedCheck(schema: String, table: String, col: String,
      dataType: String): Seq[String] =
    unsignedCheckExpr(col, dataType).toSeq.flatMap { expr =>
      val name = truncateIdentifier(s"ck_${table}_${col}_unsigned")
      val qt = s"${pgIdent(schema)}.${pgIdent(table)}"
      Seq(
        s"ALTER TABLE $qt ADD CONSTRAINT ${pgIdent(name)} " +
          s"CHECK ($expr) NOT VALID",
        s"ALTER TABLE $qt VALIDATE CONSTRAINT ${pgIdent(name)}")
    }

  /** Trigger function + BEFORE UPDATE trigger replicating MySQL
    * `on update CURRENT_TIMESTAMP` (reference `post.go:436-472`).
    */
  def onUpdateTrigger(schema: String, table: String,
      col: String): Seq[String] = {
    val fn = truncateIdentifier(s"set_$col")
    val trg = truncateIdentifier(s"trg_${table}_$col")
    val qs = pgIdent(schema)
    Seq(
      s"CREATE OR REPLACE FUNCTION $qs.${pgIdent(fn)}() RETURNS TRIGGER " +
        s"AS $$fn$$ BEGIN NEW.${pgIdent(col)} = CURRENT_TIMESTAMP; " +
        s"RETURN NEW; END; $$fn$$ LANGUAGE plpgsql",
      s"CREATE TRIGGER ${pgIdent(trg)} BEFORE UPDATE ON " +
        s"$qs.${pgIdent(table)} FOR EACH ROW EXECUTE FUNCTION " +
        s"$qs.${pgIdent(fn)}()")
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
