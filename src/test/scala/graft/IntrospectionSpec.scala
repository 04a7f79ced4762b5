package graft

import graft.sources._
import org.scalatest.funsuite.AnyFunSuite

/** Introspection assembly from fabricated catalog rows (the reference's
  * stub-driver introspection tests, `introspection_stub_test.go`):
  * catalog DataFrames → SourceTable IR with ordered columns, index
  * flags, composite FKs.
  */
class IntrospectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("mysql catalog assembly: columns, indexes, composite FKs") {
    import spark.implicits._
    val columns = Seq(
      ("users", "id", "bigint", "bigint unsigned", null: Integer,
        Integer.valueOf(20), Integer.valueOf(0), "NO", null: String,
        "auto_increment", null: String, null: String, 1),
      ("users", "email", "varchar", "varchar(200)", Integer.valueOf(200),
        null: Integer, null: Integer, "YES", null: String, "",
        "utf8mb4_general_ci", null: String, 2),
      ("posts", "id", "int", "int", null: Integer, Integer.valueOf(10),
        Integer.valueOf(0), "NO", null: String, "auto_increment",
        null: String, null: String, 1),
      ("posts", "tag", "varchar", "varchar(50)", Integer.valueOf(50),
        null: Integer, null: Integer, "YES", "'x'", "", null: String,
        "concat(a,b)", 2))
      .toDF("TABLE_NAME", "COLUMN_NAME", "DATA_TYPE", "COLUMN_TYPE",
        "CHARACTER_MAXIMUM_LENGTH", "NUMERIC_PRECISION", "NUMERIC_SCALE",
        "IS_NULLABLE", "COLUMN_DEFAULT", "EXTRA", "COLLATION_NAME",
        "GENERATION_EXPRESSION", "ORDINAL_POSITION")

    val indexes = Seq(
      ("users", "PRIMARY", 0, 1, "id", null: Integer, null: String, "BTREE"),
      ("users", "ux_email", 0, 1, "email", Integer.valueOf(10),
        null: String, "BTREE"),
      ("posts", "ix_multi", 1, 2, "tag", null: Integer, null: String,
        "BTREE"),
      ("posts", "ix_multi", 1, 1, "id", null: Integer, null: String,
        "BTREE"))
      .toDF("TABLE_NAME", "INDEX_NAME", "NON_UNIQUE", "SEQ_IN_INDEX",
        "COLUMN_NAME", "SUB_PART", "EXPRESSION", "INDEX_TYPE")

    val fks = Seq(
      ("posts", "fk_comp", "a1", "users", "r1", "CASCADE", "SET NULL", 1),
      ("posts", "fk_comp", "a2", "users", "r2", "CASCADE", "SET NULL", 2))
      .toDF("TABLE_NAME", "CONSTRAINT_NAME", "COLUMN_NAME",
        "REFERENCED_TABLE_NAME", "REFERENCED_COLUMN_NAME", "UPDATE_RULE",
        "DELETE_RULE", "ORDINAL_POSITION")

    val (tables, fkMap) = Introspection.assembleMySql(columns, indexes, fks)
    assert(tables.map(_.name) == Seq("posts", "users"))
    val users = tables.find(_.name == "users").get
    assert(users.columns.map(_.name) == Seq("id", "email"))
    assert(users.columns.head.unsigned &&
      users.columns.head.extra == "auto_increment")
    assert(users.columns(1).collation == "utf8mb4_general_ci")
    assert(users.indexes.find(_.name == "PRIMARY").exists(_.isPrimary))
    assert(users.indexes.find(_.name == "ux_email").exists(ix =>
      ix.unique && ix.hasPrefix))
    val posts = tables.find(_.name == "posts").get
    assert(posts.columns(1).generationExpression == "concat(a,b)")
    // composite index columns in SEQ_IN_INDEX order
    assert(posts.indexes.find(_.name == "ix_multi").get.columns ==
      Seq("id", "tag"))
    // composite FK in ordinal order with rules
    val fk = fkMap("posts").head
    assert(fk.columns == Seq("a1", "a2") &&
      fk.refColumns == Seq("r1", "r2") &&
      fk.refTable == "users" && fk.onDelete == "SET NULL")
    // chains into the dialect type mapping
    val mapped = MySqlDialect.resolve(users.columns.head, TypeOptions())
    assert(mapped.pg == "numeric(20)")
  }

  test("sqlite pragma batching caps at 400 union terms") {
    val many = (1 to 950).map(i => s"t$i")
    val batches = Introspection.Sqlite.columnsSqlBatches(many)
    assert(batches.size == 3)
    assert(batches(0).split("UNION ALL").length == 400)
    assert(batches(2).split("UNION ALL").length == 150)
    assert(batches(0).contains("pragma_table_xinfo('t1')"))
    // quote-escape table names in the pragma literal
    val odd = Introspection.Sqlite.columnsSqlBatches(Seq("we'ird"))
    assert(odd.head.contains("pragma_table_xinfo('we''ird')"))
  }

  test("catalog SQL shapes carry the reference's filters and ordering") {
    val c = Introspection.MySql.columnsSql("mydb")
    assert(c.contains("ORDER BY TABLE_NAME, ORDINAL_POSITION"))
    assert(Introspection.MySql.tablesSql("mydb")
      .contains("TABLE_TYPE = 'BASE TABLE'"))
    assert(Introspection.MySql.foreignKeysSql("mydb")
      .contains("REFERENCED_TABLE_NAME IS NOT NULL"))
    assert(Introspection.Sqlite.tablesSql
      .contains("NOT LIKE 'sqlite_%'"))
    assert(Introspection.Mssql.columnsSql("dbo")
      .contains("is_ms_shipped = 0"))
  }

  test("sqlite native assembly: generated/autoincrement columns, " +
      "composite PK, pk-origin index exclusion, partial flag, FKs") {
    import org.apache.spark.sql.Row
    // pragma_table_xinfo: (table, cid, name, type, notnull, dflt, pk, hidden)
    val colRows = Seq(
      Row("docs", 0, "id", "INTEGER", 1, null, 1, 0),
      Row("docs", 1, "body", "TEXT", 0, "'x'", 0, 0),
      Row("docs", 2, "fp", "TEXT", 0, null, 0, 2),
      Row("docs", 3, "price", "DECIMAL(10,2)", 0, null, 0, 0),
      Row("tags", 0, "a", "VARCHAR(40)", 1, null, 1, 0),
      Row("tags", 1, "b", "INTEGER", 1, null, 2, 0))
    // pragma_index_list: (table, seq, name, unique, origin, partial)
    val listRows = Seq(
      Row("docs", 0, "ix_body", 1, "c", 0),
      Row("docs", 1, "sqlite_autoindex_docs_1", 1, "pk", 0),
      Row("docs", 2, "ix_part", 0, "c", 1))
    // pragma_index_info: (table, index, seqno, cid, name)
    val infoRows = Seq(
      Row("docs", "ix_body", 0, 1, "body"),
      Row("docs", "ix_part", 0, 3, "price"))
    // pragma_foreign_key_list: (table, id, seq, ref_table, from, to,
    // on_update, on_delete)
    val fkRows = Seq(
      Row("tags", 0, 0, "docs", "a", "id", "no action", "cascade"),
      Row("tags", 0, 1, "docs", "b", "body", "no action", "cascade"))
    val (tables, fks) = Introspection.assembleSqlite(
      colRows, listRows, infoRows, fkRows,
      createSql = Map("docs" ->
        "CREATE TABLE docs (id INTEGER PRIMARY KEY AUTOINCREMENT)"))

    assert(tables.map(_.name) == Seq("docs", "tags"))
    val docs = tables.find(_.name == "docs").get
    assert(docs.columns.map(_.name) == Seq("id", "body", "fp", "price"))
    // rowid-alias INTEGER pk → auto_increment
    assert(docs.columns.head.extra == "auto_increment")
    assert(!docs.columns.head.nullable)
    assert(docs.columns(1).default.contains("'x'"))
    assert(docs.columns(2).extra == "STORED GENERATED")
    assert(docs.columns(3).precision.contains(10) &&
      docs.columns(3).scale.contains(2))
    val pk = docs.indexes.find(_.isPrimary).get
    assert(pk.columns == Seq("id"))
    // pk-origin autoindex is NOT duplicated as a secondary index
    assert(!docs.indexes.exists(_.name.startsWith("sqlite_autoindex")))
    assert(docs.indexes.find(_.name == "ix_body").exists(ix =>
      ix.unique && ix.columns == Seq("body") && !ix.hasExpression))
    assert(docs.indexes.find(_.name == "ix_part").exists(_.hasExpression))
    val tags = tables.find(_.name == "tags").get
    // composite pk in pk-position order; VARCHAR pk is NOT autoincrement
    assert(tags.indexes.find(_.isPrimary).get.columns == Seq("a", "b"))
    assert(!tags.columns.exists(_.extra == "auto_increment"))
    assert(tags.columns.head.charMaxLen.contains(40))
    val fk = fks("tags").head
    assert(fk.name == "fk_tags_0" && fk.columns == Seq("a", "b") &&
      fk.refTable == "docs" && fk.refColumns == Seq("id", "body") &&
      fk.onDelete == "CASCADE")
    // SQLite dialect chains: DECIMAL(10,2) → numeric(10,2)
    assert(SqliteDialect.resolve(docs.columns(3), TypeOptions()).pg ==
      "numeric(10,2)")
  }

  test("mssql native assembly: nvarchar byte-halving, MAX, identity, " +
      "computed, default paren-stripping, included-column skip, FKs") {
    import org.apache.spark.sql.Row
    // (table, column, type, max_length, precision, scale, nullable,
    //  default, identity, computed_def, collation, column_id)
    val colRows = Seq(
      Row("inv", "id", "int", 4, 10, 0, false, null, true, null,
        null, 1),
      Row("inv", "title", "nvarchar", 100, 0, 0, true, null, false, null,
        "SQL_Latin1_General_CP1_CI_AS", 2),
      Row("inv", "notes", "nvarchar", -1, 0, 0, true, null, false, null,
        null, 3),
      Row("inv", "qty", "int", 4, 10, 0, false, "((0))", false, null,
        null, 4),
      Row("inv", "total", "money", 8, 19, 4, false, null, false,
        "[qty]*[price]", null, 5))
    // (table, index, is_unique, is_primary, type_desc, has_filter,
    //  key_ordinal, column, is_included)
    val ixRows = Seq(
      Row("inv", "pk_inv", true, true, "CLUSTERED", false, 1, "id", false),
      Row("inv", "ix_title", false, false, "NONCLUSTERED", false, 1,
        "title", false),
      Row("inv", "ix_title", false, false, "NONCLUSTERED", false, 0,
        "notes", true),
      Row("inv", "ix_filtered", false, false, "NONCLUSTERED", true, 1,
        "qty", false))
    // (table, fk, column, ref_table, ref_column, upd, del, ordinal)
    val fkRows = Seq(
      Row("inv", "fk_inv_cat", "id", "cat", "cid", "NO_ACTION",
        "SET_NULL", 1))
    val (tables, fks) = Introspection.assembleMssql(colRows, ixRows, fkRows)
    val inv = tables.head
    assert(inv.columns.map(_.name) ==
      Seq("id", "title", "notes", "qty", "total"))
    assert(inv.columns.head.extra == "auto_increment")
    // nvarchar max_length is bytes → 50 chars; -1 (MAX) → no length
    assert(inv.columns(1).charMaxLen.contains(50))
    assert(inv.columns(1).collation == "SQL_Latin1_General_CP1_CI_AS")
    assert(inv.columns(2).charMaxLen.isEmpty)
    assert(inv.columns(3).default.contains("0"))
    assert(inv.columns(4).extra == "COMPUTED" &&
      inv.columns(4).generationExpression == "[qty]*[price]")
    assert(inv.indexes.find(_.isPrimary).get.columns == Seq("id"))
    // included column dropped from the key list
    assert(inv.indexes.find(_.name == "ix_title").get.columns ==
      Seq("title"))
    assert(inv.indexes.find(_.name == "ix_filtered").get.hasExpression)
    val fk = fks("inv").head
    assert(fk.onUpdate == "NO ACTION" && fk.onDelete == "SET NULL")
    // dialect chain: money → numeric(19,4)
    assert(MssqlDialect.resolve(inv.columns(4), TypeOptions()).pg ==
      "numeric(19,4)")
  }

  test("mssql default paren stripper only removes matching outers") {
    assert(Introspection.mssqlStripParens("((0))") == "0")
    assert(Introspection.mssqlStripParens("(getdate())") == "getdate()")
    assert(Introspection.mssqlStripParens("(a)+(b)") == "(a)+(b)")
    assert(Introspection.mssqlStripParens("plain") == "plain")
  }
}
