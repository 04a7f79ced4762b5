package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.{Connection, DriverManager}

/** Env-gated LIVE-dialect integration tier — the reference's CI proof
  * (`integration_test.go:20-26`: every suite begins with
  * `os.Getenv("MYSQL_DSN")`/`POSTGRES_DSN` and `t.Skip`s without
  * them). The sandbox has no database servers, so these suites CANCEL
  * cleanly (ScalaTest `assume`) unless the operator provides:
  *
  *   - `MYSQL_DSN`    — a JDBC URL, e.g.
  *     `jdbc:mysql://host:3306/db?user=u&password=p`
  *   - `MSSQL_DSN`    — e.g. `jdbc:sqlserver://host;databaseName=db;
  *     user=u;password=p;encrypt=false`
  *   - `POSTGRES_DSN` — the live PostgreSQL TARGET, e.g.
  *     `jdbc:postgresql://host:5432/db?user=u&password=p`
  *
  * plus the vendor JDBC driver jar on the test classpath (drop it in
  * `lib/` — sbt's unmanaged classpath; the SQLite suite needs only
  * `POSTGRES_DSN` + the xerial sqlite-jdbc jar, creating its own temp
  * database file like the reference's `TestIntegration_SQLite`).
  * README §"Live-dialect integration" has the container recipe.
  *
  * Fixtures mirror `integration_test.go seedMySQL` (:814-881): the
  * users/posts/comments graph with 2 deliberately-orphaned comments,
  * so the built-in orphan cleanup (J3; the reference does it via a
  * before_fk hook) is exercised against a REAL engine, and the
  * sequence-reset / PK / FK assertions run against live PostgreSQL
  * catalogs instead of Derby stand-ins.
  */
class LiveDialectIntegrationSpec extends AnyFunSuite {

  private def env(name: String): Option[String] =
    sys.env.get(name).map(_.trim).filter(_.nonEmpty)

  private def haveDriver(cls: String): Boolean =
    try { Class.forName(cls); true }
    catch { case _: Throwable => false }

  private def withConn[A](url: String)(f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def exec(c: Connection, sqls: String*): Unit = {
    val st = c.createStatement()
    try sqls.foreach(st.execute) finally st.close()
  }

  private def queryLong(c: Connection, sql: String): Long = {
    val st = c.createStatement()
    try {
      val rs = st.executeQuery(sql)
      rs.next(); rs.getLong(1)
    } finally st.close()
  }

  private def queryString(c: Connection, sql: String): String = {
    val st = c.createStatement()
    try {
      val rs = st.executeQuery(sql)
      rs.next(); rs.getString(1)
    } finally st.close()
  }

  /** The reference's target-side assertions (`integration_test.go`
    * assertRowCount/assertPKExists/assertFKExists) against live PG
    * catalogs, plus the sequence-reset liveness probe
    * (`TestIntegration_MySQL_SequenceReset_AllowsNextInsert`).
    */
  private def assertTarget(pg: Connection, schema: String): Unit = {
    assert(queryLong(pg,
      s"SELECT count(*) FROM $schema.users") == 5L)
    assert(queryLong(pg,
      s"SELECT count(*) FROM $schema.posts") == 5L)
    // 2 orphans removed by the built-in cleanup before FK creation
    assert(queryLong(pg,
      s"SELECT count(*) FROM $schema.comments") == 10L)
    for (t <- Seq("users", "posts", "comments"))
      assert(queryLong(pg,
        "SELECT count(*) FROM information_schema.table_constraints " +
          s"WHERE table_schema = '$schema' AND table_name = '$t' " +
          "AND constraint_type = 'PRIMARY KEY'") == 1L, s"PK on $t")
    assert(queryLong(pg,
      "SELECT count(*) FROM information_schema.table_constraints " +
        s"WHERE table_schema = '$schema' AND table_name = 'comments' " +
        "AND constraint_type = 'FOREIGN KEY'") == 2L, "FKs on comments")
    assert(queryString(pg,
      s"SELECT name FROM $schema.users WHERE id = 1") == "Alice")
    // sequence reset: the next identity insert must not collide
    assert(queryLong(pg,
      s"INSERT INTO $schema.users (name, email) " +
        "VALUES ('Frank', NULL) RETURNING id") == 6L)
    exec(pg, s"DELETE FROM $schema.users WHERE id = 6")
  }

  private def writeCfg(dialect: String, srcUrl: String, tgtUrl: String,
      schema: String, extra: String = ""): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft-live")
    val p = dir.resolve("migration.toml")
    java.nio.file.Files.writeString(p,
      s"""mode = "parallel"
         |workers = 2
         |chunk_size = 1000
         |recreate = true
         |validation = "row_count"
         |[source]
         |dialect = "$dialect"
         |url = "$srcUrl"
         |[target]
         |url = "$tgtUrl"
         |schema = "$schema"
         |$extra""".stripMargin)
    p
  }

  // ---- MySQL ---------------------------------------------------------

  private def seedMySql(c: Connection): Unit = exec(c,
    "DROP TABLE IF EXISTS places_optional",
    "DROP TABLE IF EXISTS places",
    "DROP TABLE IF EXISTS comments",
    "DROP TABLE IF EXISTS posts",
    "DROP TABLE IF EXISTS users",
    """CREATE TABLE users (
      |  id INT AUTO_INCREMENT PRIMARY KEY,
      |  name VARCHAR(100) NOT NULL,
      |  email VARCHAR(200) NULL)""".stripMargin,
    """CREATE TABLE posts (
      |  id INT AUTO_INCREMENT PRIMARY KEY,
      |  user_id INT NOT NULL,
      |  title VARCHAR(200) NOT NULL,
      |  body TEXT,
      |  FOREIGN KEY (user_id) REFERENCES users(id))""".stripMargin,
    """CREATE TABLE comments (
      |  id INT AUTO_INCREMENT PRIMARY KEY,
      |  post_id INT NOT NULL,
      |  user_id INT NOT NULL,
      |  content TEXT,
      |  FOREIGN KEY (post_id) REFERENCES posts(id),
      |  FOREIGN KEY (user_id) REFERENCES users(id))""".stripMargin,
    "INSERT INTO users (name, email) VALUES " +
      "('Alice', 'alice@example.com'), ('Bob', NULL), " +
      "('Charlie', 'charlie@example.com'), " +
      "('Diana', 'diana@example.com'), ('Eve', NULL)",
    "INSERT INTO posts (user_id, title, body) VALUES " +
      "(1, 'First Post', 'Hello world'), (2, 'Bobs Post', 'Content here')," +
      " (3, 'Thoughts', 'Some thoughts'), (4, 'Update', NULL), " +
      "(5, 'Hello', 'Eve here')",
    "INSERT INTO comments (post_id, user_id, content) VALUES " +
      "(1, 2, 'Nice post!'), (1, 3, 'Great read'), (2, 1, 'Thanks Bob')," +
      " (2, 4, 'Interesting'), (3, 5, 'I agree'), (3, 1, 'Me too'), " +
      "(4, 2, 'Good update'), (4, 3, 'Thanks'), (5, 1, 'Welcome Eve'), " +
      "(5, 4, 'Hi Eve!')",
    "SET FOREIGN_KEY_CHECKS=0",
    "INSERT INTO comments (post_id, user_id, content) VALUES " +
      "(999, 1, 'Orphan 1'), (998, 2, 'Orphan 2')",
    "SET FOREIGN_KEY_CHECKS=1")

  test("LIVE MySQL → PostgreSQL: seeded users/posts/comments with " +
      "orphans through the full CLI pipeline " +
      "(integration_test.go:20-175)") {
    val my = env("MYSQL_DSN"); val pg = env("POSTGRES_DSN")
    assume(my.isDefined && pg.isDefined,
      "MYSQL_DSN and POSTGRES_DSN env vars required")
    assume(haveDriver("com.mysql.cj.jdbc.Driver") ||
      haveDriver("org.mariadb.jdbc.Driver"),
      "MySQL/MariaDB JDBC driver jar required on the classpath (lib/)")
    assume(haveDriver("org.postgresql.Driver"),
      "PostgreSQL JDBC driver jar required on the classpath (lib/)")
    withConn(my.get)(seedMySql)
    val schema = "graft_inttest"
    withConn(pg.get)(exec(_,
      s"DROP SCHEMA IF EXISTS $schema CASCADE"))
    Main.runMigrateWith(
      writeCfg("mysql", my.get, pg.get, schema), SparkTestSession.spark)
    withConn(pg.get) { c =>
      try assertTarget(c, schema)
      finally exec(c, s"DROP SCHEMA IF EXISTS $schema CASCADE")
    }
  }

  test("LIVE MySQL spatial → PostGIS: the S5 scan rewrite end-to-end " +
      "(integration_test.go:665-812 TestIntegration_MySQL_PostGIS)") {
    val my = env("MYSQL_DSN"); val pg = env("POSTGRES_DSN")
    assume(my.isDefined && pg.isDefined,
      "MYSQL_DSN and POSTGRES_DSN env vars required")
    assume(env("GRAFT_LIVE_POSTGIS").isDefined,
      "GRAFT_LIVE_POSTGIS=1 required (target must have the postgis " +
        "extension available)")
    assume(haveDriver("com.mysql.cj.jdbc.Driver") ||
      haveDriver("org.mariadb.jdbc.Driver"),
      "MySQL/MariaDB JDBC driver jar required on the classpath (lib/)")
    assume(haveDriver("org.postgresql.Driver"),
      "PostgreSQL JDBC driver jar required on the classpath (lib/)")
    withConn(my.get) { c =>
      exec(c,
        "DROP TABLE IF EXISTS places",
        """CREATE TABLE places (
          |  id INT AUTO_INCREMENT PRIMARY KEY,
          |  name VARCHAR(100) NOT NULL,
          |  shape POINT NOT NULL)""".stripMargin,
        "INSERT INTO places (name, shape) VALUES " +
          "('origin', ST_GeomFromText('POINT(1 2)', 0))")
      // MySQL 8 accepts the axis-order option; MariaDB/5.7 don't
      // (error 1582/3057-class) — same fallback as the reference's
      // insertMySQLSpatialAmsterdam
      try exec(c, "INSERT INTO places (name, shape) VALUES " +
        "('amsterdam', ST_GeomFromText('POINT(4.9 52.37)', 4326, " +
        "'axis-order=long-lat'))")
      catch { case _: java.sql.SQLException =>
        exec(c, "INSERT INTO places (name, shape) VALUES " +
          "('amsterdam', ST_GeomFromText('POINT(4.9 52.37)', 4326))")
      }
    }
    val schema = "graft_inttest_gis"
    withConn(pg.get)(exec(_, s"DROP SCHEMA IF EXISTS $schema CASCADE"))
    Main.runMigrateWith(
      writeCfg("mysql", my.get, pg.get, schema,
        extra = "[postgis]\nenabled = true\ncreate_extension = true\n"),
      SparkTestSession.spark)
    withConn(pg.get) { c =>
      try {
        assert(queryLong(c,
          s"SELECT count(*) FROM $schema.places") == 2L)
        // the reassembled SRID survived the CONCAT(CHAR…)+ST_AsWKB
        // scan rewrite and the F12 EWKB splice
        assert(queryLong(c, "SELECT ST_SRID(shape) FROM " +
          s"$schema.places WHERE name = 'amsterdam'") == 4326L)
        // axis order: EWKB must carry lng/lat regardless of MySQL 8's
        // SRID-defined ordering
        assert(queryString(c, "SELECT ST_AsText(shape) FROM " +
          s"$schema.places WHERE name = 'amsterdam'")
          .startsWith("POINT(4.9 52.37"))
      } finally exec(c, s"DROP SCHEMA IF EXISTS $schema CASCADE")
    }
  }

  // ---- MSSQL ---------------------------------------------------------

  test("LIVE MSSQL → PostgreSQL: seeded graph + hierarchyid scan " +
      "rewrite (integration_test.go MSSQL tier; migrate.go:505-516)") {
    val ms = env("MSSQL_DSN"); val pg = env("POSTGRES_DSN")
    assume(ms.isDefined && pg.isDefined,
      "MSSQL_DSN and POSTGRES_DSN env vars required")
    assume(haveDriver("com.microsoft.sqlserver.jdbc.SQLServerDriver"),
      "MSSQL JDBC driver jar required on the classpath (lib/)")
    assume(haveDriver("org.postgresql.Driver"),
      "PostgreSQL JDBC driver jar required on the classpath (lib/)")
    withConn(ms.get) { c =>
      exec(c,
        "IF OBJECT_ID('dbo.org_nodes','U') IS NOT NULL " +
          "DROP TABLE dbo.org_nodes",
        """CREATE TABLE dbo.org_nodes (
          |  id INT IDENTITY PRIMARY KEY,
          |  name NVARCHAR(100) NOT NULL,
          |  node hierarchyid NOT NULL)""".stripMargin,
        "INSERT INTO dbo.org_nodes (name, node) VALUES " +
          "('root', hierarchyid::GetRoot()), " +
          "('child', hierarchyid::Parse('/1/'))")
    }
    val schema = "graft_inttest_ms"
    withConn(pg.get)(exec(_, s"DROP SCHEMA IF EXISTS $schema CASCADE"))
    Main.runMigrateWith(
      writeCfg("mssql", ms.get, pg.get, schema), SparkTestSession.spark)
    withConn(pg.get) { c =>
      try {
        assert(queryLong(c,
          s"SELECT count(*) FROM $schema.org_nodes") == 2L)
        // hierarchyid crossed the wire as its canonical path string —
        // the .ToString() scan rewrite, not opaque varbinary
        assert(queryString(c, s"SELECT node FROM $schema.org_nodes " +
          "WHERE name = 'child'") == "/1/")
      } finally exec(c, s"DROP SCHEMA IF EXISTS $schema CASCADE")
    }
  }

  // ---- SQLite --------------------------------------------------------

  test("LIVE SQLite → PostgreSQL: temp-file database through the full " +
      "pipeline (integration_test.go:279-393 TestIntegration_SQLite)") {
    val pg = env("POSTGRES_DSN")
    assume(pg.isDefined, "POSTGRES_DSN env var required")
    assume(haveDriver("org.sqlite.JDBC"),
      "sqlite-jdbc driver jar required on the classpath (lib/)")
    assume(haveDriver("org.postgresql.Driver"),
      "PostgreSQL JDBC driver jar required on the classpath (lib/)")
    val dbFile = java.nio.file.Files
      .createTempFile("graft-live-sqlite", ".db")
    val srcUrl = s"jdbc:sqlite:${dbFile}"
    withConn(srcUrl) { c =>
      exec(c,
        """CREATE TABLE users (
          |  id INTEGER PRIMARY KEY AUTOINCREMENT,
          |  name TEXT NOT NULL,
          |  email TEXT NULL)""".stripMargin,
        "INSERT INTO users (name, email) VALUES " +
          "('Alice', 'alice@example.com'), ('Bob', NULL), " +
          "('Charlie', 'charlie@example.com'), " +
          "('Diana', 'diana@example.com'), ('Eve', NULL)")
    }
    val schema = "graft_inttest_sq"
    withConn(pg.get)(exec(_, s"DROP SCHEMA IF EXISTS $schema CASCADE"))
    Main.runMigrateWith(
      writeCfg("sqlite", srcUrl, pg.get, schema), SparkTestSession.spark)
    withConn(pg.get) { c =>
      try {
        assert(queryLong(c,
          s"SELECT count(*) FROM $schema.users") == 5L)
        assert(queryString(c,
          s"SELECT name FROM $schema.users WHERE id = 1") == "Alice")
      } finally exec(c, s"DROP SCHEMA IF EXISTS $schema CASCADE")
    }
  }
}
