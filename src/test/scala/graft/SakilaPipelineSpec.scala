package graft

import graft.config.JobConfig
import graft.sources.{DdlGenerator, ForeignKeyMeta, GenericJdbcDialect,
  Introspection, SchemaMapping, TableMeta, TypeOptions}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.DriverManager
import scala.collection.mutable.ArrayBuffer

/** Sakila-shaped full-pipeline e2e on live Derby — the closest sandbox
  * analog of the reference's `TestIntegration_MySQLSakila`
  * (`integration_test.go:1316-1400`, 16-table corpus) plus the orphan
  * seeding of its seedMySQL scenario.
  *
  * Two deliberate bridges, both asserted rather than silently skipped:
  *
  *  - Orphan rows: MySQL admits FK-violating rows via
  *    `SET FOREIGN_KEY_CHECKS=0`; Derby has no equivalent and validates
  *    FKs at INSERT and at ADD CONSTRAINT, so the two orphan-carrying
  *    relationships (film_text→film, staff→store — the latter also
  *    standing in for Sakila's circular staff↔store) are declared at the
  *    IR level only, exactly the state MySQL introspection would hand
  *    the pipeline. Their cleanup DELETE/UPDATE and ADD CONSTRAINT run
  *    as real SQL on the live target, and Derby VALIDATING the added FK
  *    is a stronger check than PG's NOT VALID attach.
  *  - PG-isms: `setval(pg_get_serial_sequence…)` and
  *    `DISABLE/ENABLE TRIGGER ALL` don't exist on Derby. A bridge
  *    executor asserts their exact PG form, then executes the Derby
  *    equivalent (identity RESTART WITH; FK drop/re-add — re-add
  *    VALIDATES, again stronger than PG's enable-without-revalidate).
  *
  * MySQL value transforms (enum/set/uuid/…) cannot fire here by
  * design — `Transforms.forColumn` is dialect-keyed and this is a live
  * generic-JDBC source; their selection and wiring into BOTH load paths
  * are covered by `TransformsSpec` and the single_tx/parallel specs.
  */
class SakilaPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // FK-safe order (parents before children) — required for the
  // data_only phase, where rows land in an already-constrained schema.
  private val order = Seq("country", "language", "category", "actor",
    "city", "address", "staff", "store", "film", "film_actor",
    "film_category", "film_text", "customer", "inventory", "rental",
    "payment")

  private val seedCounts = Map(
    "country" -> 5L, "language" -> 3L, "category" -> 5L, "actor" -> 20L,
    "city" -> 10L, "address" -> 20L, "staff" -> 4L, "store" -> 2L,
    "film" -> 40L, "film_actor" -> 80L, "film_category" -> 40L,
    "film_text" -> 40L, "customer" -> 30L, "inventory" -> 60L,
    "rental" -> 200L, "payment" -> 200L)

  /** Seeds the 16-table corpus. `withOrphans` adds two film_text rows
    * referencing nonexistent films and points one staff row at a
    * nonexistent store (the reference's seeded-orphan shape).
    */
  private def seed(url: String, withOrphans: Boolean): Unit = {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE COUNTRY (COUNTRY_ID INT NOT NULL PRIMARY KEY, " +
        "COUNTRY VARCHAR(50) NOT NULL)")
      st.execute("CREATE TABLE CITY (CITY_ID INT NOT NULL PRIMARY KEY, " +
        "CITY VARCHAR(50) NOT NULL, COUNTRY_ID INT NOT NULL, " +
        "CONSTRAINT FK_CITY_COUNTRY FOREIGN KEY (COUNTRY_ID) " +
        "REFERENCES COUNTRY (COUNTRY_ID) ON DELETE CASCADE)")
      st.execute("CREATE TABLE ADDRESS (ADDRESS_ID INT NOT NULL PRIMARY KEY, " +
        "ADDRESS VARCHAR(50) NOT NULL, DISTRICT VARCHAR(20), " +
        "CITY_ID INT NOT NULL, POSTAL_CODE VARCHAR(10), " +
        "CONSTRAINT FK_ADDRESS_CITY FOREIGN KEY (CITY_ID) " +
        "REFERENCES CITY (CITY_ID) ON DELETE CASCADE)")
      st.execute("CREATE TABLE LANGUAGE (LANGUAGE_ID INT NOT NULL PRIMARY KEY, " +
        "NAME VARCHAR(20) NOT NULL)")
      st.execute("CREATE TABLE CATEGORY (CATEGORY_ID INT NOT NULL PRIMARY KEY, " +
        "NAME VARCHAR(25) NOT NULL)")
      st.execute("CREATE TABLE ACTOR (ACTOR_ID INT NOT NULL PRIMARY KEY, " +
        "FIRST_NAME VARCHAR(45) NOT NULL, LAST_NAME VARCHAR(45) NOT NULL)")
      st.execute("CREATE TABLE FILM (FILM_ID INT NOT NULL PRIMARY KEY, " +
        "TITLE VARCHAR(128) NOT NULL, DESCRIPTION VARCHAR(255), " +
        "LANGUAGE_ID INT NOT NULL, RELEASE_YEAR INT, LENGTH INT, " +
        "RENTAL_RATE DECIMAL(4,2), " +
        "CONSTRAINT FK_FILM_LANGUAGE FOREIGN KEY (LANGUAGE_ID) " +
        "REFERENCES LANGUAGE (LANGUAGE_ID))")
      st.execute("CREATE TABLE FILM_ACTOR (ACTOR_ID INT NOT NULL, " +
        "FILM_ID INT NOT NULL, PRIMARY KEY (ACTOR_ID, FILM_ID), " +
        "CONSTRAINT FK_FILM_ACTOR_ACTOR FOREIGN KEY (ACTOR_ID) " +
        "REFERENCES ACTOR (ACTOR_ID) ON DELETE CASCADE, " +
        "CONSTRAINT FK_FILM_ACTOR_FILM FOREIGN KEY (FILM_ID) " +
        "REFERENCES FILM (FILM_ID) ON DELETE CASCADE)")
      st.execute("CREATE TABLE FILM_CATEGORY (FILM_ID INT NOT NULL, " +
        "CATEGORY_ID INT NOT NULL, PRIMARY KEY (FILM_ID, CATEGORY_ID), " +
        "CONSTRAINT FK_FILM_CATEGORY_FILM FOREIGN KEY (FILM_ID) " +
        "REFERENCES FILM (FILM_ID) ON DELETE CASCADE, " +
        "CONSTRAINT FK_FILM_CATEGORY_CATEGORY FOREIGN KEY (CATEGORY_ID) " +
        "REFERENCES CATEGORY (CATEGORY_ID) ON DELETE CASCADE)")
      // film_text: Sakila's MyISAM FULLTEXT table — no physical FK even
      // in the reference corpus; the FK exists only at the IR level
      st.execute("CREATE TABLE FILM_TEXT (FILM_ID INT NOT NULL PRIMARY KEY, " +
        "TITLE VARCHAR(128) NOT NULL, DESCRIPTION VARCHAR(255))")
      // staff.store_id: half of Sakila's circular staff↔store pair —
      // physically unconstrained (MySQL seeds it under FK_CHECKS=0)
      st.execute("CREATE TABLE STAFF (STAFF_ID INT NOT NULL PRIMARY KEY, " +
        "FIRST_NAME VARCHAR(45) NOT NULL, LAST_NAME VARCHAR(45) NOT NULL, " +
        "ADDRESS_ID INT NOT NULL, STORE_ID INT, EMAIL VARCHAR(50), " +
        "CONSTRAINT FK_STAFF_ADDRESS FOREIGN KEY (ADDRESS_ID) " +
        "REFERENCES ADDRESS (ADDRESS_ID))")
      st.execute("CREATE TABLE STORE (STORE_ID INT NOT NULL PRIMARY KEY, " +
        "MANAGER_STAFF_ID INT NOT NULL, ADDRESS_ID INT NOT NULL, " +
        "CONSTRAINT FK_STORE_STAFF FOREIGN KEY (MANAGER_STAFF_ID) " +
        "REFERENCES STAFF (STAFF_ID), " +
        "CONSTRAINT FK_STORE_ADDRESS FOREIGN KEY (ADDRESS_ID) " +
        "REFERENCES ADDRESS (ADDRESS_ID))")
      st.execute("CREATE TABLE CUSTOMER (CUSTOMER_ID INT NOT NULL PRIMARY KEY, " +
        "STORE_ID INT NOT NULL, FIRST_NAME VARCHAR(45) NOT NULL, " +
        "LAST_NAME VARCHAR(45) NOT NULL, EMAIL VARCHAR(50), " +
        "ADDRESS_ID INT NOT NULL, ACTIVE SMALLINT NOT NULL, " +
        "CONSTRAINT FK_CUSTOMER_STORE FOREIGN KEY (STORE_ID) " +
        "REFERENCES STORE (STORE_ID), " +
        "CONSTRAINT FK_CUSTOMER_ADDRESS FOREIGN KEY (ADDRESS_ID) " +
        "REFERENCES ADDRESS (ADDRESS_ID))")
      st.execute("CREATE TABLE INVENTORY (INVENTORY_ID INT NOT NULL PRIMARY KEY, " +
        "FILM_ID INT NOT NULL, STORE_ID INT NOT NULL, " +
        "CONSTRAINT FK_INVENTORY_FILM FOREIGN KEY (FILM_ID) " +
        "REFERENCES FILM (FILM_ID), " +
        "CONSTRAINT FK_INVENTORY_STORE FOREIGN KEY (STORE_ID) " +
        "REFERENCES STORE (STORE_ID))")
      st.execute("CREATE TABLE RENTAL (RENTAL_ID INT NOT NULL PRIMARY KEY, " +
        "RENTAL_DATE TIMESTAMP NOT NULL, INVENTORY_ID INT NOT NULL, " +
        "CUSTOMER_ID INT NOT NULL, RETURN_DATE TIMESTAMP, " +
        "STAFF_ID INT NOT NULL, " +
        "CONSTRAINT FK_RENTAL_INVENTORY FOREIGN KEY (INVENTORY_ID) " +
        "REFERENCES INVENTORY (INVENTORY_ID), " +
        "CONSTRAINT FK_RENTAL_CUSTOMER FOREIGN KEY (CUSTOMER_ID) " +
        "REFERENCES CUSTOMER (CUSTOMER_ID), " +
        "CONSTRAINT FK_RENTAL_STAFF FOREIGN KEY (STAFF_ID) " +
        "REFERENCES STAFF (STAFF_ID))")
      st.execute("CREATE INDEX IX_RENTAL_CUSTOMER ON RENTAL (CUSTOMER_ID)")
      st.execute("CREATE TABLE PAYMENT (PAYMENT_ID INT NOT NULL PRIMARY KEY, " +
        "CUSTOMER_ID INT NOT NULL, STAFF_ID INT NOT NULL, RENTAL_ID INT, " +
        "AMOUNT DECIMAL(5,2) NOT NULL, PAYMENT_DATE TIMESTAMP NOT NULL, " +
        "CONSTRAINT FK_PAYMENT_CUSTOMER FOREIGN KEY (CUSTOMER_ID) " +
        "REFERENCES CUSTOMER (CUSTOMER_ID), " +
        "CONSTRAINT FK_PAYMENT_STAFF FOREIGN KEY (STAFF_ID) " +
        "REFERENCES STAFF (STAFF_ID), " +
        "CONSTRAINT FK_PAYMENT_RENTAL FOREIGN KEY (RENTAL_ID) " +
        "REFERENCES RENTAL (RENTAL_ID) ON DELETE SET NULL)")
      st.execute("CREATE INDEX IX_PAYMENT_CUSTOMER ON PAYMENT (CUSTOMER_ID)")

      val base = java.sql.Timestamp.valueOf("2005-05-25 11:30:00").getTime
      def ts(i: Int) = new java.sql.Timestamp(base + i * 60000L)
      def dec(s: String) = new java.math.BigDecimal(s)
      def batch(sql: String)(fill: (java.sql.PreparedStatement, Int) => Unit,
          n: Int): Unit = {
        val ps = c.prepareStatement(sql)
        (1 to n).foreach { i => fill(ps, i); ps.addBatch() }
        ps.executeBatch(); ps.close()
      }
      batch("INSERT INTO COUNTRY VALUES (?, ?)")(
        (p, i) => { p.setInt(1, i); p.setString(2, s"country_$i") }, 5)
      batch("INSERT INTO CITY VALUES (?, ?, ?)")((p, i) => {
        p.setInt(1, i); p.setString(2, s"city_$i")
        p.setInt(3, (i % 5) + 1) }, 10)
      batch("INSERT INTO ADDRESS VALUES (?, ?, ?, ?, ?)")((p, i) => {
        p.setInt(1, i); p.setString(2, s"addr_$i")
        p.setString(3, s"district_${i % 4}"); p.setInt(4, (i % 10) + 1)
        p.setString(5, f"$i%05d") }, 20)
      batch("INSERT INTO LANGUAGE VALUES (?, ?)")(
        (p, i) => { p.setInt(1, i); p.setString(2, s"lang_$i") }, 3)
      batch("INSERT INTO CATEGORY VALUES (?, ?)")(
        (p, i) => { p.setInt(1, i); p.setString(2, s"cat_$i") }, 5)
      batch("INSERT INTO ACTOR VALUES (?, ?, ?)")((p, i) => {
        p.setInt(1, i); p.setString(2, s"fn_$i")
        p.setString(3, s"ln_$i") }, 20)
      batch("INSERT INTO FILM VALUES (?, ?, ?, ?, ?, ?, ?)")((p, i) => {
        p.setInt(1, i); p.setString(2, s"film_$i")
        p.setString(3, s"desc_$i"); p.setInt(4, (i % 3) + 1)
        p.setInt(5, 2000 + (i % 20)); p.setInt(6, 60 + i)
        p.setBigDecimal(7, dec(s"${(i % 5)}.99")) }, 40)
      batch("INSERT INTO FILM_ACTOR VALUES (?, ?)")((p, i) => {
        // two actors per film: i in 1..80 → film (i+1)/2
        val f = (i + 1) / 2
        val a = if (i % 2 == 1) (f % 20) + 1 else ((f + 7) % 20) + 1
        p.setInt(1, a); p.setInt(2, f) }, 80)
      batch("INSERT INTO FILM_CATEGORY VALUES (?, ?)")((p, i) => {
        p.setInt(1, i); p.setInt(2, (i % 5) + 1) }, 40)
      batch("INSERT INTO FILM_TEXT VALUES (?, ?, ?)")((p, i) => {
        p.setInt(1, i); p.setString(2, s"film_$i")
        p.setString(3, s"text_$i") }, 40)
      if (withOrphans) batch("INSERT INTO FILM_TEXT VALUES (?, ?, ?)")(
        (p, i) => { p.setInt(1, 900 + i); p.setString(2, s"orphan_$i")
          p.setString(3, "no such film") }, 2)
      batch("INSERT INTO STAFF VALUES (?, ?, ?, ?, ?, ?)")((p, i) => {
        p.setInt(1, i); p.setString(2, s"sfn_$i")
        p.setString(3, s"sln_$i"); p.setInt(4, (i % 20) + 1)
        // staff 4 points at store 99 in the orphan corpus
        p.setInt(5, if (i == 4 && withOrphans) 99 else ((i - 1) % 2) + 1)
        p.setString(6, s"staff$i@example.com") }, 4)
      batch("INSERT INTO STORE VALUES (?, ?, ?)")((p, i) => {
        p.setInt(1, i); p.setInt(2, i); p.setInt(3, i) }, 2)
      batch("INSERT INTO CUSTOMER VALUES (?, ?, ?, ?, ?, ?, ?)")((p, i) => {
        p.setInt(1, i); p.setInt(2, (i % 2) + 1)
        p.setString(3, s"cfn_$i"); p.setString(4, s"cln_$i")
        p.setString(5, s"cust$i@example.com"); p.setInt(6, (i % 20) + 1)
        p.setInt(7, i % 2) }, 30)
      batch("INSERT INTO INVENTORY VALUES (?, ?, ?)")((p, i) => {
        p.setInt(1, i); p.setInt(2, (i % 40) + 1)
        p.setInt(3, (i % 2) + 1) }, 60)
      batch("INSERT INTO RENTAL VALUES (?, ?, ?, ?, ?, ?)")((p, i) => {
        p.setInt(1, i); p.setTimestamp(2, ts(i))
        p.setInt(3, (i % 60) + 1); p.setInt(4, (i % 30) + 1)
        if (i % 10 == 0) p.setNull(5, java.sql.Types.TIMESTAMP)
        else p.setTimestamp(5, ts(i + 2880))
        p.setInt(6, (i % 3) + 1) }, 200)
      batch("INSERT INTO PAYMENT VALUES (?, ?, ?, ?, ?, ?)")((p, i) => {
        p.setInt(1, i); p.setInt(2, (i % 30) + 1); p.setInt(3, (i % 3) + 1)
        if (i % 20 == 0) p.setNull(4, java.sql.Types.INTEGER)
        else p.setInt(4, i)
        p.setBigDecimal(5, dec(s"${(i % 9)}.99"))
        p.setTimestamp(6, ts(i)) }, 200)
      st.close()
    } finally c.close()
  }

  /** Introspects the live source and returns pipeline-ordered metas with
    * the two IR-level FKs (film_text→film CASCADE, staff→store SET NULL)
    * appended — the state MySQL introspection would produce.
    */
  private def introspectWithIrFks(srcUrl: String)
      : (Seq[SourceTable], Seq[TableMeta]) = {
    val conn = DriverManager.getConnection(srcUrl)
    val (sts, fks) = try Introspection.fromJdbcMetadata(conn, "APP")
      finally conn.close()
    val fks2 = fks
      .updated("FILM_TEXT", fks.getOrElse("FILM_TEXT", Nil) :+
        ForeignKeyMeta("FK_FILM_TEXT_FILM", Seq("FILM_ID"), "FILM",
          Seq("FILM_ID"), onDelete = "CASCADE"))
      .updated("STAFF", fks.getOrElse("STAFF", Nil) :+
        ForeignKeyMeta("FK_STAFF_STORE", Seq("STORE_ID"), "STORE",
          Seq("STORE_ID"), onDelete = "SET NULL"))
    val metas = sts.map(st => SchemaMapping.toTableMeta(GenericJdbcDialect,
      st, fks2.getOrElse(st.name, Nil), TypeOptions()))
    val byName = metas.map(m => m.name -> m).toMap
    (sts, order.map(byName))
  }

  /** Executes pipeline SQL on Derby, bridging the three PG-isms after
    * asserting their exact PG form:
    *  - CREATE TABLE for `identity` tables gains GENERATED BY DEFAULT AS
    *    IDENTITY on the PK (the serial/identity column a PG target
    *    would carry);
    *  - `SELECT setval(pg_get_serial_sequence(…), MAX+1, false)` becomes
    *    `ALTER TABLE … RESTART WITH max+1` for identity tables, and is
    *    recorded (PG's setval(NULL,…) no-op) for the rest;
    *  - `DISABLE/ENABLE TRIGGER ALL` becomes FK drop/re-add (PG disables
    *    FK enforcement via its internal constraint triggers; Derby's
    *    re-add VALIDATES, which is strictly stronger).
    */
  private final class DerbyBridge(url: String,
      identity: Map[String, String],
      fksByTable: Map[String, Seq[ForeignKeyMeta]],
      schema: String) extends SqlExecutor {
    val setvals = ArrayBuffer[String]()
    val triggerToggles = ArrayBuffer[String]()
    private val setvalRe =
      ("""SELECT setval\(pg_get_serial_sequence\('(.+?)', '(.+?)'\), """ +
        """COALESCE\(\(SELECT MAX\("(.+?)"\) FROM .+?\), 0\) \+ 1, """ +
        """false\)""").r
    private val trigRe =
      """ALTER TABLE (".+?")\.("(.+?)") (DISABLE|ENABLE) TRIGGER ALL""".r
    private lazy val conn = DriverManager.getConnection(url)
    def close(): Unit = conn.close()
    private def run(sql: String): Unit = {
      val st = conn.createStatement()
      try st.execute(sql) finally st.close()
    }
    def execute(sql: String): Unit = sql match {
      case setvalRe(qt, col, col2) =>
        assert(col == col2, s"setval col mismatch in: $sql")
        setvals += sql
        val tbl = qt.split("\\.").last.replace("\"", "")
        if (identity.contains(tbl)) {
          val st = conn.createStatement()
          val next = try {
            val rs = st.executeQuery(
              s"""SELECT COALESCE(MAX("$col"), 0) + 1 FROM $qt""")
            rs.next(); rs.getLong(1)
          } finally st.close()
          run(s"""ALTER TABLE $qt ALTER COLUMN "$col" RESTART WITH $next""")
        }
      case trigRe(qSchema, qTbl, tbl, dir) =>
        triggerToggles += sql
        fksByTable.getOrElse(tbl, Nil).foreach { fk =>
          if (dir == "DISABLE")
            run(s"""ALTER TABLE $qSchema.$qTbl DROP CONSTRAINT """ +
              s""""${fk.name}"""")
          else run(DdlGenerator.addForeignKey(schema, tbl, fk))
        }
      case _ =>
        val spliced = identity.foldLeft(sql) { case (s, (tbl, col)) =>
          if (s.startsWith("CREATE TABLE") && s.contains(s""".\"$tbl\" ("""))
            s.replace(s""""$col" integer NOT NULL""",
              s""""$col" integer GENERATED BY DEFAULT AS IDENTITY NOT NULL""")
          else s
        }
        run(spliced)
    }
  }

  private def importedKeys(url: String, schema: String,
      table: String): Map[String, Int] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.getMetaData.getImportedKeys(null, schema, table)
      val b = Map.newBuilder[String, Int]
      while (rs.next())
        b += rs.getString("FK_NAME") -> rs.getInt("DELETE_RULE")
      rs.close(); b.result()
    } finally c.close()
  }

  private def scalar(url: String, sql: String): Long = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(sql)
      rs.next(); rs.getLong(1)
    } finally c.close()
  }

  test("Sakila e2e (parallel): 16 tables, checksum validation, both " +
      "orphan-cleanup paths, validated FK attach, identity reset " +
      "insertability") {
    val srcUrl = "jdbc:derby:memory:sakilasrcA;create=true"
    val tgtUrl = "jdbc:derby:memory:sakilatgtA;create=true"
    seed(srcUrl, withOrphans = true)
    val (sts, metas) = introspectWithIrFks(srcUrl)
    val cfg = JobConfig(sourceDialect = "jdbc", sourceUrl = srcUrl,
      targetUrl = tgtUrl, targetSchema = "sakila_a", chunkSize = 64L,
      workers = 4, validation = "checksum", unloggedTables = false)
    val bridge = new DerbyBridge(tgtUrl,
      identity = Map("film" -> "film_id", "rental" -> "rental_id"),
      fksByTable = Map.empty, schema = "sakila_a")
    try {
      val loader = new SparkTableLoader(spark, cfg, sts)
      val report = new MigrationPipeline(cfg, bridge, loader).migrate(metas)

      assert(report.tablesCreated == order)
      // loads include the orphans (they exist source-side; cleanup is a
      // POST step, reference post.go:57-66)
      val expected = seedCounts.updated("film_text", 42L)
      assert(report.rowsLoaded == expected)
      // validation runs BEFORE orphan cleanup — counts and digests match
      assert(report.validationMismatches.isEmpty)
      assert(report.checksumMismatches.isEmpty)

      // DELETE path: the 2 film_text orphans are gone
      assert(scalar(tgtUrl,
        """SELECT COUNT(*) FROM "sakila_a"."film_text"""") == 40L)
      assert(scalar(tgtUrl,
        """SELECT COUNT(*) FROM "sakila_a"."film_text" """ +
          """WHERE "film_id" > 900""") == 0L)
      // SET NULL path: staff 4's dangling store_id is nullified, the
      // three valid ones survive
      assert(scalar(tgtUrl, """SELECT COUNT(*) FROM "sakila_a"."staff" """ +
        """WHERE "store_id" IS NULL""") == 1L)
      assert(scalar(tgtUrl, """SELECT COUNT(*) FROM "sakila_a"."staff" """ +
        """WHERE "store_id" IS NOT NULL""") == 3L)
      // source remains untouched
      assert(scalar(srcUrl, "SELECT COUNT(*) FROM FILM_TEXT") == 42L)

      // every FK attached AND validated by the live engine (22 = 20
      // physical + 2 IR-level), with the delete rules preserved
      val fkCount = order.map(t =>
        importedKeys(tgtUrl, "sakila_a", t).size).sum
      assert(fkCount == 22, s"expected 22 FKs attached, got $fkCount")
      val payFks = importedKeys(tgtUrl, "sakila_a", "payment")
      assert(payFks.size == 3)
      assert(payFks("fk_payment_rental") ==
        java.sql.DatabaseMetaData.importedKeySetNull)
      assert(importedKeys(tgtUrl, "sakila_a", "staff")("fk_staff_store") ==
        java.sql.DatabaseMetaData.importedKeySetNull)
      assert(importedKeys(tgtUrl, "sakila_a", "film_text")
        ("fk_film_text_film") == java.sql.DatabaseMetaData.importedKeyCascade)

      // sequence resets were emitted for every single-int-PK table (14 —
      // the two composite-PK link tables are rightly skipped)…
      assert(bridge.setvals.size == 14)
      // …and the bridged identity restart makes the table INSERTABLE:
      // without RESTART WITH 41 the identity would hand out 1 and
      // collide with the loaded PK
      val c = DriverManager.getConnection(tgtUrl)
      try c.createStatement().execute(
        """INSERT INTO "sakila_a"."film" ("title", "description", """ +
          """"language_id", "release_year", "length", "rental_rate") """ +
          """VALUES ('new film', 'post-migration insert', 1, 2024, 90, """ +
          """4.99)""")
      finally c.close()
      assert(scalar(tgtUrl,
        """SELECT MAX("film_id") FROM "sakila_a"."film"""") == 41L)
      // no trigger toggles in parallel mode
      assert(bridge.triggerToggles.isEmpty)
    } finally bridge.close()
  }

  test("Sakila e2e (two-phase): schema_only attaches constraints, " +
      "data_only loads into the constrained schema with trigger-disable " +
      "semantics bridged as FK drop/revalidating-re-add") {
    val srcUrl = "jdbc:derby:memory:sakilasrcB;create=true"
    val tgtUrl = "jdbc:derby:memory:sakilatgtB;create=true"
    seed(srcUrl, withOrphans = false)
    val (sts, metas) = introspectWithIrFks(srcUrl)
    val fksByTable = metas.map(m => m.name -> m.foreignKeys).toMap
    val base = JobConfig(sourceDialect = "jdbc", sourceUrl = srcUrl,
      targetUrl = tgtUrl, targetSchema = "sakila_b", chunkSize = 64L,
      workers = 4, validation = "row_count", unloggedTables = false)
    val bridge = new DerbyBridge(tgtUrl,
      identity = Map("film" -> "film_id", "rental" -> "rental_id"),
      fksByTable = fksByTable, schema = "sakila_b")
    try {
      val loader = new SparkTableLoader(spark, base, sts)

      // phase 1: schema_only — tables + PK + indexes + FKs, no data
      val r1 = new MigrationPipeline(base.copy(schemaOnly = true), bridge,
        loader).migrate(metas)
      assert(r1.rowsLoaded.isEmpty && r1.validationMismatches.isEmpty)
      assert(scalar(tgtUrl,
        """SELECT COUNT(*) FROM "sakila_b"."payment"""") == 0L)
      assert(order.map(t =>
        importedKeys(tgtUrl, "sakila_b", t).size).sum == 22)

      // phase 2: data_only — triggers off → load (FK-safe order) →
      // triggers on (re-add validates against the loaded data) →
      // sequence resets; no schema DDL
      val r2 = new MigrationPipeline(base.copy(dataOnly = true), bridge,
        loader).migrate(metas)
      assert(r2.rowsLoaded == seedCounts)
      assert(r2.validationMismatches.isEmpty)
      // 16 DISABLE before the load, 16 ENABLE after — all PG-form
      assert(bridge.triggerToggles.size == 32)
      assert(bridge.triggerToggles.take(16).forall(
        _.endsWith("DISABLE TRIGGER ALL")))
      assert(bridge.triggerToggles.drop(16).forall(
        _.endsWith("ENABLE TRIGGER ALL")))
      // constraints are back and validated over the loaded rows
      assert(order.map(t =>
        importedKeys(tgtUrl, "sakila_b", t).size).sum == 22)
      assert(scalar(tgtUrl,
        """SELECT COUNT(*) FROM "sakila_b"."rental"""") == 200L)
      // identity restart ran in data_only too (the one post step that
      // mode keeps, main.go:350-402)
      val c = DriverManager.getConnection(tgtUrl)
      try c.createStatement().execute(
        """INSERT INTO "sakila_b"."rental" ("rental_date", """ +
          """"inventory_id", "customer_id", "staff_id") """ +
          """VALUES (TIMESTAMP('2024-01-01 00:00:00'), 1, 1, 1)""")
      finally c.close()
      assert(scalar(tgtUrl,
        """SELECT MAX("rental_id") FROM "sakila_b"."rental"""") == 201L)
    } finally bridge.close()
  }
}
