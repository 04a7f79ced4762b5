package graft

import graft.sources._
import org.scalatest.funsuite.AnyFunSuite

/** MySQL introspection CONTRACT test — the no-socket stand-in for the
  * reference's live-Sakila integration run (`integration_test.go:1316-1400`):
  * no MySQL server exists in this sandbox, so the contract is pinned in
  * two halves that together cover what a socket would:
  *
  *  1. the four batched catalog queries' SQL text carries every field,
  *     filter, and ORDER BY the reference's four round trips scan
  *     (`source_mysql.go:148-163` + the query bodies at 182-269,348-358) —
  *     if a column the assembly needs goes missing, this fails before
  *     any replay;
  *  2. a recorded Sakila-shaped INFORMATION_SCHEMA result set replays
  *     through the assembly into the exact IR the reference builds
  *     (composite PK, prefix + DESC index parts, FK rules, charset /
  *     collation capture), then on through type mapping and DDL.
  */
class MySqlContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fields(sql: String): Set[String] = {
    val sel = sql.substring(sql.indexOf("SELECT") + 6,
      sql.indexOf("FROM"))
    sel.split(",").map(_.trim.split("[ .]").last.toUpperCase).toSet
  }

  test("contract 1/2: the four catalog queries project every field " +
      "the reference scans, with its filters and ordering") {
    // tables (source_mysql.go:182-186)
    val t = Introspection.MySql.tablesSql("sakila")
    assert(fields(t) == Set("TABLE_NAME"))
    assert(t.contains("TABLE_TYPE = 'BASE TABLE'"))
    assert(t.contains("ORDER BY TABLE_NAME"))

    // columns (source_mysql.go:209-221): every scanned field present
    val c = Introspection.MySql.columnsSql("sakila")
    val refColumnFields = Set("TABLE_NAME", "COLUMN_NAME", "DATA_TYPE",
      "COLUMN_TYPE", "CHARACTER_MAXIMUM_LENGTH", "NUMERIC_PRECISION",
      "NUMERIC_SCALE", "IS_NULLABLE", "COLUMN_DEFAULT", "EXTRA",
      "ORDINAL_POSITION", "CHARACTER_SET_NAME", "COLLATION_NAME",
      "GENERATION_EXPRESSION")
    assert(refColumnFields.subsetOf(fields(c)),
      s"missing: ${refColumnFields.diff(fields(c))}")
    assert(c.contains("ORDER BY TABLE_NAME, ORDINAL_POSITION"))

    // indexes (source_mysql.go:264-269)
    val ix = Introspection.MySql.indexesSql("sakila")
    val refIndexFields = Set("TABLE_NAME", "INDEX_NAME", "COLUMN_NAME",
      "NON_UNIQUE", "SEQ_IN_INDEX", "INDEX_TYPE", "COLLATION",
      "SUB_PART")
    assert(refIndexFields.subsetOf(fields(ix)),
      s"missing: ${refIndexFields.diff(fields(ix))}")
    assert(ix.contains("ORDER BY TABLE_NAME, INDEX_NAME, SEQ_IN_INDEX"))

    // foreign keys (source_mysql.go:348-358): KCU ⋈ RC on constraint
    // name AND schema, referencing rows only, ordinal ordering
    val fk = Introspection.MySql.foreignKeysSql("sakila")
    val refFkFields = Set("TABLE_NAME", "CONSTRAINT_NAME", "COLUMN_NAME",
      "REFERENCED_TABLE_NAME", "REFERENCED_COLUMN_NAME", "UPDATE_RULE",
      "DELETE_RULE", "ORDINAL_POSITION")
    assert(refFkFields.subsetOf(fields(fk)),
      s"missing: ${refFkFields.diff(fields(fk))}")
    assert(fk.contains("REFERENCED_TABLE_NAME IS NOT NULL"))
    assert(fk.contains("KEY_COLUMN_USAGE") &&
      fk.contains("REFERENTIAL_CONSTRAINTS"))
    assert(fk.replaceAll("\\s+", " ")
      .contains("kcu.TABLE_SCHEMA = rc.CONSTRAINT_SCHEMA"))
    assert(fk.replaceAll("\\s+", " ").contains(
      "ORDER BY kcu.TABLE_NAME, kcu.CONSTRAINT_NAME, kcu.ORDINAL_POSITION"))

    // all four scope on the bound schema — the reference passes dbName
    // as the sole parameter to each round trip
    Seq(t, c, ix, fk).foreach(q =>
      assert(q.contains("TABLE_SCHEMA = 'sakila'")))
  }

  test("contract 2/2: recorded Sakila-shaped catalog rows replay into " +
      "the reference's IR (composite PK, DESC part, prefix index, FK " +
      "rules, charset) and on through types + DDL") {
    import spark.implicits._
    // film_actor: composite PK (actor_id, film_id); film: PK + a
    // last_update DESC index and a title(10) prefix index — the Sakila
    // shapes the reference's integration run exercises
    val columns = Seq(
      ("film", "film_id", "smallint", "smallint unsigned", null: Integer,
        Integer.valueOf(5), Integer.valueOf(0), "NO", null: String,
        "auto_increment", null: String, null: String, 1, null: String),
      ("film", "title", "varchar", "varchar(128)", Integer.valueOf(128),
        null: Integer, null: Integer, "NO", null: String, "",
        "utf8mb4_general_ci", null: String, 2, "utf8mb4"),
      ("film", "last_update", "timestamp", "timestamp", null: Integer,
        null: Integer, null: Integer, "NO", "CURRENT_TIMESTAMP",
        "on update CURRENT_TIMESTAMP", null: String, null: String, 3,
        null: String),
      ("film_actor", "actor_id", "smallint", "smallint unsigned",
        null: Integer, Integer.valueOf(5), Integer.valueOf(0), "NO",
        null: String, "", null: String, null: String, 1, null: String),
      ("film_actor", "film_id", "smallint", "smallint unsigned",
        null: Integer, Integer.valueOf(5), Integer.valueOf(0), "NO",
        null: String, "", null: String, null: String, 2, null: String))
      .toDF("TABLE_NAME", "COLUMN_NAME", "DATA_TYPE", "COLUMN_TYPE",
        "CHARACTER_MAXIMUM_LENGTH", "NUMERIC_PRECISION", "NUMERIC_SCALE",
        "IS_NULLABLE", "COLUMN_DEFAULT", "EXTRA", "COLLATION_NAME",
        "GENERATION_EXPRESSION", "ORDINAL_POSITION", "CHARACTER_SET_NAME")

    val indexes = Seq(
      ("film", "PRIMARY", 0, 1, "film_id", null: Integer, null: String,
        "BTREE", "A"),
      ("film", "ix_update_desc", 1, 1, "last_update", null: Integer,
        null: String, "BTREE", "D"),
      ("film", "ix_title_prefix", 1, 1, "title", Integer.valueOf(10),
        null: String, "BTREE", "A"),
      ("film_actor", "PRIMARY", 0, 1, "actor_id", null: Integer,
        null: String, "BTREE", "A"),
      ("film_actor", "PRIMARY", 0, 2, "film_id", null: Integer,
        null: String, "BTREE", "A"))
      .toDF("TABLE_NAME", "INDEX_NAME", "NON_UNIQUE", "SEQ_IN_INDEX",
        "COLUMN_NAME", "SUB_PART", "EXPRESSION", "INDEX_TYPE",
        "COLLATION")

    val fks = Seq(
      ("film_actor", "fk_film_actor_film", "film_id", "film", "film_id",
        "CASCADE", "RESTRICT", 1))
      .toDF("TABLE_NAME", "CONSTRAINT_NAME", "COLUMN_NAME",
        "REFERENCED_TABLE_NAME", "REFERENCED_COLUMN_NAME", "UPDATE_RULE",
        "DELETE_RULE", "ORDINAL_POSITION")

    val (tables, fkMap) = Introspection.assembleMySql(columns, indexes, fks)
    assert(tables.map(_.name) == Seq("film", "film_actor"))

    val film = tables.find(_.name == "film").get
    assert(film.columns.map(_.name) ==
      Seq("film_id", "title", "last_update"))
    assert(film.columns(1).charset == "utf8mb4" &&
      film.columns(1).collation == "utf8mb4_general_ci")
    assert(film.columns(2).extra.contains("on update CURRENT_TIMESTAMP"))
    val pk = film.indexes.find(_.isPrimary).get
    assert(pk.columns == Seq("film_id"))
    val desc = film.indexes.find(_.name == "ix_update_desc").get
    assert(desc.directions == Seq("DESC"))
    assert(film.indexes.find(_.name == "ix_title_prefix").get.hasPrefix)

    val fa = tables.find(_.name == "film_actor").get
    assert(fa.indexes.find(_.isPrimary).get.columns ==
      Seq("actor_id", "film_id"))
    val fk = fkMap("film_actor").head
    assert(fk.refTable == "film" && fk.onUpdate == "CASCADE" &&
      fk.onDelete == "RESTRICT")

    // chains through the type matrix and DDL exactly as a live run
    val meta = SchemaMapping.toTableMeta(MySqlDialect, film,
      Nil, TypeOptions())
    assert(meta.columns.head._2 == "integer") // smallint unsigned widened
    val ixSql = DdlGenerator.createIndex("s", meta.name,
      meta.indexes.find(_.name == "ix_update_desc").get)
    assert(ixSql.contains("\"last_update\" DESC"))
  }
}
