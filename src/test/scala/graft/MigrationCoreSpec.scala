package graft

import graft.sources._
import graft.checkpoint.CheckpointManager
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Unit coverage for the migration-parity core: identifier mapping,
  * enum/set parsing, dialect type mapping, DDL generation, default
  * rewriting, hook-SQL splitting, checkpoint round-trip + compat
  * rejection (mirrors the reference's config/ddl/hooks/checkpoint test
  * layers, SURVEY.md §5).
  */
class MigrationCoreSpec extends AnyFunSuite {
  import SchemaMapping._

  test("snake_case with acronym runs (schema.go:12-33)") {
    assert(snakeCase("HTMLParser") == "html_parser")
    assert(snakeCase("nameASCII") == "name_ascii")
    assert(snakeCase("userId") == "user_id")
    assert(snakeCase("already_snake") == "already_snake")
    assert(snakeCase("Simple") == "simple")
    assert(snakeCase("ABC") == "abc")
    assert(snakeCase("userID2Fast") == "user_id2_fast")
  }

  test("enum/set value parsing with '' doubling and backslash escapes") {
    assert(parseEnumSetValues("enum('a','b','c')") == Seq("a", "b", "c"))
    assert(parseEnumSetValues("enum('it''s','a\\'b')") ==
      Seq("it's", "a'b"))
    assert(parseEnumSetValues("set('x y','')") == Seq("x y", ""))
  }

  test("enum type naming is value-set-stable (ddl.go:117-128)") {
    val n1 = enumTypeName(Seq("b", "a"))
    val n2 = enumTypeName(Seq("a", "b"))
    assert(n1 == n2 && n1.startsWith("pgferry_enum_") && n1.length == 29)
    assert(enumTypeName(Seq("a", "c")) != n1)
    // pinned to the reference pgEnumTypeName (ddl.go:117-128): FNV-1a-64
    // over each sorted value followed by a 0x00 terminator
    assert(enumTypeName(Seq("a")) == "pgferry_enum_089be207b544f1e4")
    assert(enumTypeName(Seq("small", "medium", "large")) ==
      "pgferry_enum_56a4f7cfa86f9c40")
    assert(n1 == "pgferry_enum_ab40d7820d408076")
  }

  test("identifier truncation to 63 bytes with FNV suffix") {
    val long = "x" * 100
    val t = truncateIdentifier(long)
    assert(t.getBytes("UTF-8").length <= 63)
    assert(t != truncateIdentifier("y" * 100))
    assert(truncateIdentifier("short") == "short")
  }

  test("mysql type mapping matrix (source_mysql.go:524-643)") {
    val o = TypeOptions()
    def m(dt: String, ct: String = "", p: Option[Int] = None,
        s: Option[Int] = None, len: Option[Int] = None) =
      MySqlDialect.resolve(SourceColumn("c", dt, columnType = ct,
        precision = p, scale = s, charMaxLen = len), o)
    // reference default tinyint1_as_boolean = false (config.go:342)
    assert(m("tinyint", "tinyint(1)").spark == ShortType)
    assert(MySqlDialect.resolve(
      SourceColumn("c", "tinyint", columnType = "tinyint(1)"),
      o.copy(tinyint1AsBoolean = true)).spark == BooleanType)
    assert(m("tinyint", "tinyint(4)").spark == ShortType)
    assert(m("bigint", "bigint unsigned").spark == DecimalType(20, 0))
    assert(m("bigint", "bigint unsigned").pg == "numeric(20)")
    assert(m("int").spark == IntegerType)
    assert(m("int", "int unsigned").spark == LongType)
    assert(m("decimal", p = Some(10), s = Some(2)).spark ==
      DecimalType(10, 2))
    assert(m("varchar", len = Some(50)).pg == "varchar(50)")
    assert(m("longtext").spark == StringType)
    assert(m("json").pg == "jsonb")
    // reference default set_mode = "text" (config.go:347)
    assert(m("set").spark == StringType && m("set").pg == "text")
    assert(m("timestamp").spark == TimestampType)
    assert(m("datetime").spark == TimestampNTZType)
    // spatial_mode default "off" → unsupported; postgis/native modes map
    intercept[IllegalArgumentException] {
      MySqlDialect.resolve(SourceColumn("c", "geometry"), o)
    }
    assert(MySqlDialect.resolve(SourceColumn("c", "geometry"),
      o.copy(usePostGis = true)).pg == "geometry")
    assert(MySqlDialect.resolve(SourceColumn("c", "geometry"),
      o.copy(spatialMode = "wkb_bytea")).pg == "bytea")
    assert(MySqlDialect.resolve(SourceColumn("c", "point"),
      o.copy(spatialMode = "wkt_text")).pg == "text")
    assert(m("mediumblob").spark == BinaryType)
    intercept[IllegalArgumentException] {
      MySqlDialect.resolve(SourceColumn("c", "weirdtype"), o)
    }
    assert(MySqlDialect.resolve(SourceColumn("c", "weirdtype"),
      o.copy(unknownAsText = true)).pg == "text")
  }

  test("mysql type-mapping MODES: enum/set/bit/time/zero-date/datetime " +
      "(source_mysql.go:568-628, ddl.go:132-214)") {
    def col(dt: String, ct: String = "", p: Option[Int] = None) =
      SourceColumn("c", dt, columnType = ct, precision = p)
    def m(o: TypeOptions, dt: String, ct: String = "",
        p: Option[Int] = None) = MySqlDialect.resolve(col(dt, ct, p), o)
    val o = TypeOptions()
    // enum: default mode for mysql is "check" → text type (DDL adds
    // the CHECK); explicit text → text; native → shared FNV type name
    assert(o.effectiveEnumMode("mysql") == "check")
    assert(o.effectiveEnumMode("sqlite") == "text")
    assert(m(o, "enum", "enum('a','b')").pg == "text")
    val native = m(o.copy(enumMode = "native"), "enum", "enum('a','b')")
    assert(native.pg == SchemaMapping.enumTypeName(Seq("a", "b")))
    // set modes
    assert(m(o.copy(setMode = "text_array"), "set", "set('x','y')").pg ==
      "text[]")
    assert(m(o.copy(setMode = "text_array_check"), "set",
      "set('x','y')").spark == ArrayType(StringType))
    // bit modes: width from column_type, then precision, floor 1
    assert(m(o, "bit", "bit(5)").pg == "bytea")
    assert(m(o.copy(bitMode = "bit"), "bit", "bit(5)").pg == "bit(5)")
    assert(m(o.copy(bitMode = "bit"), "bit", "bit",
      p = Some(7)).pg == "bit(7)")
    assert(m(o.copy(bitMode = "bit"), "bit").pg == "bit(1)")
    assert(m(o.copy(bitMode = "varbit"), "bit", "bit(9)").pg == "varbit")
    // time modes
    assert(m(o, "time").pg == "time")
    assert(m(o.copy(timeMode = "text"), "time").pg == "text")
    assert(m(o.copy(timeMode = "interval"), "time").pg == "interval")
    // datetime_as_timestamptz
    assert(m(o.copy(datetimeAsTimestamptz = true), "datetime").pg ==
      "timestamptz")
    assert(m(o.copy(datetimeAsTimestamptz = true), "datetime").spark ==
      TimestampType)
  }

  test("mssql type-mapping MODES: money/nvarchar/xml/spatial " +
      "(source_mssql.go:624-724)") {
    def m(o: TypeOptions, dt: String, len: Option[Int] = None) =
      MssqlDialect.resolve(SourceColumn("c", dt, charMaxLen = len), o)
    val o = TypeOptions()
    assert(m(o.copy(moneyAsNumeric = false), "money").pg == "text")
    assert(m(o.copy(moneyAsNumeric = false), "smallmoney").pg == "text")
    assert(m(o.copy(nvarcharAsText = true), "nvarchar", Some(40)).pg ==
      "text")
    assert(m(o.copy(nvarcharAsText = true), "nchar", Some(4)).pg ==
      "text")
    assert(m(o, "nchar", Some(4)).pg == "char(4)")
    // xml is native by default (source_mssql.go:697-701)
    assert(m(o, "xml").pg == "xml")
    assert(m(o.copy(xmlAsText = true), "xml").pg == "text")
    // spatial: off → unsupported, fallback encodings map
    intercept[IllegalArgumentException] { m(o, "geography") }
    assert(m(o.copy(spatialMode = "wkb_bytea"), "geography").pg ==
      "bytea")
    assert(m(o.copy(spatialMode = "wkt_text"), "geometry").pg == "text")
    assert(m(o.copy(datetimeAsTimestamptz = true), "datetime2").pg ==
      "timestamptz")
  }

  test("collation policy: citext promotion, collation_map, COLLATE C " +
      "(collation_compat.go:28-42,127-155)") {
    import graft.sources.CollationCompat.applyConfigPolicy
    val ci = SourceColumn("e", "varchar", charMaxLen = Some(20),
      collation = "utf8mb4_general_ci")
    val bin = SourceColumn("b", "varchar", charMaxLen = Some(10),
      collation = "utf8mb4_bin")
    val o = TypeOptions()
    // default: no promotion, no clause
    assert(applyConfigPolicy(ci, "varchar(20)", o) == "varchar(20)")
    // ci_as_citext promotes unmapped _ci text-likes
    assert(applyConfigPolicy(ci, "varchar(20)",
      o.copy(ciAsCitext = true)) == "citext")
    // collation_map entry wins over citext promotion and emits COLLATE
    assert(applyConfigPolicy(ci, "varchar(20)",
      o.copy(ciAsCitext = true, collationMode = "auto",
        collationMap = Map("utf8mb4_general_ci" -> "en-US-x-icu"))) ==
      "varchar(20) COLLATE \"en-US-x-icu\"")
    // _bin → COLLATE "C" under auto
    assert(applyConfigPolicy(bin, "varchar(10)",
      o.copy(collationMode = "auto")) == "varchar(10) COLLATE \"C\"")
    // citext (not text-like) never gets a clause
    assert(applyConfigPolicy(ci, "varchar(20)",
      o.copy(ciAsCitext = true, collationMode = "auto")) == "citext")
    // non-text-like types unchanged
    assert(applyConfigPolicy(bin, "bytea",
      o.copy(collationMode = "auto")) == "bytea")
  }

  test("mssql type mapping incl. money and nvarchar(max)") {
    val o = TypeOptions()
    def m(dt: String, len: Option[Int] = None) =
      MssqlDialect.resolve(SourceColumn("c", dt, charMaxLen = len), o)
    assert(m("money").spark == DecimalType(19, 4))
    assert(m("nvarchar", Some(-1)).pg == "text")
    assert(m("nvarchar", Some(40)).pg == "varchar(40)")
    assert(m("uniqueidentifier").pg == "uuid")
    assert(m("rowversion").spark == BinaryType)
    assert(m("datetimeoffset").spark == TimestampType)
  }

  test("sqlite affinity mapping and worker cap") {
    val o = TypeOptions()
    def m(dt: String) = SqliteDialect.resolve(SourceColumn("c", dt), o)
    assert(m("INTEGER").spark == LongType)
    assert(m("int").spark == LongType)
    assert(m("").spark == BinaryType) // undeclared → BLOB
    assert(m("VARCHAR(20)").spark == StringType)
    assert(SqliteDialect.maxWorkers(8) == 1)
    assert(MySqlDialect.maxWorkers(8) == 8)
  }

  test("jdbc url normalization (source_mysql.go:52-70, " +
      "source_sqlite.go:37-48)") {
    val m = MySqlDialect.normalizeUrl("jdbc:mysql://h:3306/db")
    assert(m.contains("connectionTimeZone=UTC"))
    assert(m.contains("characterEncoding=utf8mb4"))
    // idempotent + existing params respected
    val m2 = MySqlDialect.normalizeUrl(
      "jdbc:mysql://h/db?characterEncoding=latin1")
    assert(m2.contains("characterEncoding=latin1") &&
      !m2.contains("utf8mb4"))
    assert(MySqlDialect.normalizeUrl(m) == m)
    assert(SqliteDialect.normalizeUrl("jdbc:sqlite:/tmp/x.db")
      .endsWith("?open_mode=1"))
    assert(MssqlDialect.normalizeUrl("jdbc:sqlserver://h;db=x") ==
      "jdbc:sqlserver://h;db=x")
  }

  test("SourceTable → TableMeta bridge: types, identifiers, defaults, " +
      "unsigned + on-update detection") {
    val st = graft.SourceTable("UserEvents", Seq(
      SourceColumn("eventID", "bigint", "bigint", nullable = false),
      SourceColumn("clickCount", "int", "int unsigned"),
      SourceColumn("isActive", "tinyint", "tinyint(1)"),
      SourceColumn("updatedAt", "timestamp", "timestamp",
        default = Some("CURRENT_TIMESTAMP"),
        extra = "DEFAULT_GENERATED on update CURRENT_TIMESTAMP")),
      indexes = Seq(
        IndexMeta("pk", Seq("eventID"), isPrimary = true),
        IndexMeta("ixClick", Seq("clickCount"))))
    val fks = Seq(ForeignKeyMeta("fkUser", Seq("eventID"), "Users",
      Seq("id")))
    val t = SchemaMapping.toTableMeta(MySqlDialect, st, fks,
      TypeOptions(tinyint1AsBoolean = true))
    assert(t.name == "user_events")
    assert(t.columns.head == ("event_id", "bigint", false, None))
    assert(t.columns(1)._2 == "bigint") // int unsigned widened
    assert(t.columns(2)._2 == "boolean") // tinyint(1)
    assert(t.columns(3)._4 == Some("CURRENT_TIMESTAMP"))
    assert(t.primaryKey.exists(_.columns == Seq("event_id")))
    assert(t.indexes.map(_.name) == Seq("ix_click"))
    assert(t.foreignKeys.head.refTable == "users")
    // tinyint(1)→boolean excluded from unsigned checks; int unsigned in
    assert(t.unsignedColumns == Seq(("click_count", "int")))
    assert(t.onUpdateColumns == Seq("updated_at"))
  }

  test("scan SQL quotes identifiers per dialect, never SELECT *") {
    assert(MySqlDialect.scanSql("t", Seq("a", "b")) ==
      "SELECT `a`, `b` FROM `t`")
    assert(MssqlDialect.scanSql("t", Seq("a")) == "SELECT [a] FROM [t]")
    assert(SqliteDialect.scanSql("t", Seq("a")) ==
      "SELECT \"a\" FROM \"t\"")
  }

  test("create table: bare, unlogged, defaults inline (ddl.go:16-98)") {
    val t = TableMeta("users", Seq(
      ("id", "bigint", false, None),
      ("name", "varchar(100)", false, None),
      ("created", "timestamptz", true, Some("CURRENT_TIMESTAMP"))))
    val ddl = DdlGenerator.createTable("public", t)
    assert(ddl.startsWith("CREATE UNLOGGED TABLE \"public\".\"users\""))
    assert(ddl.contains("\"id\" bigint NOT NULL"))
    assert(ddl.contains("\"created\" timestamptz DEFAULT CURRENT_TIMESTAMP"))
    assert(!ddl.contains("PRIMARY KEY")) // constraints deferred
    assert(DdlGenerator.createTable("public", t, unlogged = false)
      .startsWith("CREATE TABLE"))
  }

  test("constraint DDL: pk, index, fk, sequence reset (post.go)") {
    val t = TableMeta("posts", Seq(("id", "bigint", false, None)),
      primaryKey = Some(IndexMeta("pk", Seq("id"), isPrimary = true)),
      foreignKeys = Seq(ForeignKeyMeta("fk_user", Seq("user_id"), "users",
        Seq("id"), onDelete = "CASCADE")))
    assert(DdlGenerator.addPrimaryKey("public", t).get ==
      "ALTER TABLE \"public\".\"posts\" ADD PRIMARY KEY (\"id\")")
    assert(DdlGenerator.createIndex("public", "posts",
      IndexMeta("ix_t", Seq("a", "b"), unique = true)) ==
      "CREATE UNIQUE INDEX \"ix_t\" ON \"public\".\"posts\" (\"a\", \"b\")")
    val fk = DdlGenerator.addForeignKey("public", "posts",
      t.foreignKeys.head)
    assert(fk.contains("ON DELETE CASCADE ON UPDATE NO ACTION"))
    assert(DdlGenerator.resetSequence("public", "posts", "id")
      .contains("COALESCE((SELECT MAX(\"id\")"))
  }

  test("default-expression rewrite (F17)") {
    import DdlGenerator.mapDefault
    assert(mapDefault("mysql", "CURRENT_TIMESTAMP") ==
      Some("CURRENT_TIMESTAMP"))
    assert(mapDefault("mssql", "(getdate())") == Some("CURRENT_TIMESTAMP"))
    assert(mapDefault("mssql", "((0))") == Some("0"))
    assert(mapDefault("mssql", "(N'x')") == Some("'x'"))
    assert(mapDefault("mssql", "(newid())") == Some("gen_random_uuid()"))
    assert(mapDefault("mysql", "b'101'") == Some("B'101'"))
    assert(mapDefault("mysql", "3.14") == Some("3.14"))
    assert(mapDefault("mysql", "some_function(x)") == None)
  }

  test("hook splitter: quotes, comments, dollar quoting (hooks.go:42-188)") {
    val script =
      """-- leading comment
        |CREATE VIEW v AS SELECT 'a;b' AS x; /* multi ;
        |  /* nested */ still comment */
        |INSERT INTO t VALUES ('it''s');
        |DO $fn$ BEGIN PERFORM 1; END $fn$;
        |""".stripMargin
    val stmts = Hooks.splitStatements(script)
    assert(stmts.size == 3, stmts.mkString("\n---\n"))
    assert(stmts(0).contains("'a;b'"))
    assert(stmts(1).contains("'it''s'"))
    assert(stmts(2).contains("PERFORM 1; END $fn$"))
    assert(Hooks.substituteSchema("SET search_path TO {{schema}}", "s1") ==
      "SET search_path TO s1")
    assert(!Hooks.isExecutable("-- nope\n/* also no */"))
    assert(Hooks.isExecutable("SELECT 1 -- trailing"))
  }

  test("checkpoint: round-trip, idempotent marks, compat rejection") {
    val dir = Files.createTempDirectory("graft_ckpt")
    val path = dir.resolve("state.json").toString
    val fp = CheckpointManager.fingerprint(Seq(
      "table.users" -> "id:bigint", "mode" -> "parallel"))
    val mgr = CheckpointManager.load(path, fp)
    mgr.markDone("users", 0)
    mgr.markDone("users", 3)
    mgr.markDone("posts", 1)
    mgr.flush()
    val reloaded = CheckpointManager.load(path, fp)
    assert(reloaded.completed("users") == Set(0L, 3L))
    assert(reloaded.completed("posts") == Set(1L))
    assert(reloaded.isDone("users", 3) && !reloaded.isDone("users", 1))
    // changed config → different fingerprint → refuse resume
    val fp2 = CheckpointManager.fingerprint(Seq(
      "table.users" -> "id:bigint", "mode" -> "single_tx"))
    intercept[IllegalArgumentException] {
      CheckpointManager.load(path, fp2)
    }
  }

  test("checkpoint: row counts above 2^53 round-trip exactly " +
      "(integral JSON tokens lex as Long, not Double)") {
    val dir = Files.createTempDirectory("graft_ckpt_big")
    val path = dir.resolve("state.json").toString
    val fp = CheckpointManager.fingerprint(Seq("k" -> "v"))
    val mgr = CheckpointManager.load(path, fp, Seq("k" -> "v"))
    val big = (1L << 53) + 1L // first value a Double cannot represent
    val big2 = (1L << 60) + 7L
    mgr.markDone("huge", 0L, big)
    mgr.markDone("huge", 1L, big2)
    mgr.flush()
    val back = CheckpointManager.load(path, fp, Seq("k" -> "v"))
    assert(back.rowsCopied("huge") == big + big2)
    assert(back.completed("huge") == Set(0L, 1L))
  }

  test("checkpoint: reference-shaped versioned JSON, rows_copied, " +
      "table named 'fingerprint' survives") {
    val dir = Files.createTempDirectory("graft_ckpt2")
    val path = dir.resolve("state.json").toString
    val fp = CheckpointManager.fingerprint(Seq("k" -> "v"))
    val mgr = CheckpointManager.load(path, fp)
    mgr.setChunkCount("fingerprint", 4)
    mgr.markDone("fingerprint", 0, rowsCopied = 100)
    mgr.markDone("fingerprint", 2, rowsCopied = 50)
    mgr.markTableDone("events")
    mgr.flush()
    val json = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    // reference checkpoint.go:14-35 schema fields
    assert(json.contains("\"version\": 2"))
    assert(json.contains("\"started_at\""))
    assert(json.contains("\"compatibility\""))
    assert(json.contains("\"completed_chunks\""))
    assert(json.contains("\"rows_copied\": 100"))
    assert(json.contains("\"total_rows_copied\": 150"))
    val re = CheckpointManager.load(path, fp)
    assert(re.completed("fingerprint") == Set(0L, 2L))
    assert(re.rowsCopied("fingerprint") == 150L)
    assert(re.isTableDone("events") && !re.isTableDone("fingerprint"))
    // unsupported version rejected (checkpoint.go:68-72)
    Files.writeString(Paths.get(path),
      json.replace("\"version\": 2", "\"version\": 99"))
    intercept[IllegalArgumentException] {
      CheckpointManager.load(path, fp)
    }
  }

  test("checkpoint compat rejection reports a structured diff " +
      "(checkpoint_compat.go:240-332)") {
    val dir = Files.createTempDirectory("graft_ckpt3")
    val path = dir.resolve("state.json").toString
    val parts1 = Seq("mode" -> "parallel", "chunk_size" -> "100000",
      "hook.before_data" -> "sha:aaa")
    val mgr = CheckpointManager.load(path, CheckpointManager
      .fingerprint(parts1), parts1)
    mgr.markDone("t", 0)
    mgr.flush()
    val parts2 = Seq("mode" -> "single_tx", "chunk_size" -> "100000",
      "hook.after_all" -> "sha:bbb")
    val e = intercept[IllegalArgumentException] {
      CheckpointManager.load(path,
        CheckpointManager.fingerprint(parts2), parts2)
    }
    assert(e.getMessage.contains("mode changed: was 'parallel', " +
      "now 'single_tx'"))
    assert(e.getMessage.contains("hook.before_data removed"))
    assert(e.getMessage.contains("hook.after_all added"))
    assert(!e.getMessage.contains("chunk_size"))
  }

  test("checkpoint load replays without flushing (no partial-state " +
      "overwrite window) and preserves completed_at") {
    val dir = Files.createTempDirectory("graft_ckpt4")
    val path = dir.resolve("s.json")
    val fp = CheckpointManager.fingerprint(Seq("k" -> "v"))
    val mgr = CheckpointManager.load(path.toString, fp)
    // 25 chunks — enough to cross the every-10 flush threshold twice
    (0 until 25).foreach(i => mgr.markDone("t", i, rowsCopied = i))
    mgr.flush()
    val before = Files.readAllBytes(path)
    val re = CheckpointManager.load(path.toString, fp)
    assert(re.completed("t").size == 25)
    // the file must be byte-identical after a pure load: replay ran
    // without any intermediate flush and kept original timestamps
    assert(java.util.Arrays.equals(before, Files.readAllBytes(path)))
    re.flush()
    // even an explicit flush after load preserves original completed_at
    // AND the original started_at
    val after = new String(Files.readAllBytes(path), "UTF-8")
    val orig = new String(before, "UTF-8")
    assert(after.contains(orig.split("\"completed_at\": \"")(1)
      .split("\"")(0)))
    assert(after.contains(orig.split("\"started_at\": \"")(1)
      .split("\"")(0)))
  }

  test("property: checkpoint JSON round-trips hostile table names " +
      "(300 seeded cases)") {
    val rnd = new scala.util.Random(7)
    val alphabet =
      "ab\"\\\n\tü語 fingerprint{}[]:,0".toCharArray
    for (i <- 1 to 300) {
      val dir = Files.createTempDirectory(s"graft_pj")
      val path = dir.resolve("s.json").toString
      val fp = CheckpointManager.fingerprint(Seq("i" -> i.toString))
      val mgr = CheckpointManager.load(path, fp)
      val tables = (0 until rnd.between(1, 4)).map { _ =>
        val name = Seq.fill(rnd.between(1, 12))(
          alphabet(rnd.nextInt(alphabet.length))).mkString
        val chunks = (0 until rnd.between(1, 5))
          .map(_ => (rnd.between(0L, 1000L), rnd.between(0L, 99999L)))
          .distinctBy(_._1)
        name -> chunks
      }.distinctBy(_._1)
      tables.foreach { case (t, cs) =>
        cs.foreach { case (id, rows) => mgr.markDone(t, id, rows) }
      }
      mgr.flush()
      val re = CheckpointManager.load(path, fp)
      tables.foreach { case (t, cs) =>
        assert(re.completed(t) == cs.map(_._1).toSet, s"table '$t'")
        assert(re.rowsCopied(t) == cs.map(_._2).sum)
      }
    }
  }

  test("fingerprint is order-insensitive over parts") {
    val a = CheckpointManager.fingerprint(Seq("a" -> "1", "b" -> "2"))
    val b = CheckpointManager.fingerprint(Seq("b" -> "2", "a" -> "1"))
    assert(a == b && a.length == 64)
  }

  test("jdbc source: planning SQL and partition predicates") {
    assert(JdbcSource.planningSql(MySqlDialect, "users", "id") ==
      "SELECT MIN(`id`) AS lo, MAX(`id`) AS hi FROM `users`")
    val preds = JdbcSource.partitionPredicates(MySqlDialect, "id",
      Some((0L, 250L)), 100L, 8)
    assert(preds.toSeq == Seq(
      "`id` >= 0 AND `id` < 100",
      "`id` >= 100 AND `id` < 200",
      "`id` >= 200 AND `id` <= 250"))
    // SQLite caps to 1 worker → unpartitioned
    assert(JdbcSource.partitionPredicates(SqliteDialect, "id",
      Some((0L, 250L)), 100L, 8).isEmpty)
    // empty table → unpartitioned
    assert(JdbcSource.partitionPredicates(MySqlDialect, "id", None,
      100L, 8).isEmpty)
  }

  test("copy sink insert SQL") {
    assert(CopySink.insertSql("public", "users", Seq("id", "name")) ==
      "INSERT INTO \"public\".\"users\" (\"id\", \"name\") " +
        "VALUES (?, ?)")
  }
}
