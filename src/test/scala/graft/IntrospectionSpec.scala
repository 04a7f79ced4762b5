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
}
