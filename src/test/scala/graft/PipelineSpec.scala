package graft

import graft.config.{JobConfig, Toml}
import graft.operators.OrphanCleanup
import graft.sources._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Config parsing/validation matrix (reference config_test.go shapes),
  * pipeline phase ordering (reference main.go:125-348 / post.go:17-100),
  * and orphan-cleanup join semantics (reference clean_orphans_test.go +
  * the users/posts/comments orphan fixture, FIXTURES.md §1.1).
  */
class PipelineSpec extends AnyFunSuite {

  test("toml subset: sections, types, comments, arrays") {
    val kv = Toml.parse(
      """# top comment
        |mode = "parallel"
        |workers = 4
        |resume = false
        |[source]
        |dialect = "mysql"   # trailing comment
        |url = "jdbc:mysql://h/db?x=#notcomment"
        |[hooks]
        |before_data = ["a.sql", "b.sql"]
        |""".stripMargin)
    assert(kv("mode") == Toml.Str("parallel"))
    assert(kv("workers") == Toml.Str("4"))
    assert(kv("source.dialect") == Toml.Str("mysql"))
    assert(kv("source.url") == Toml.Str("jdbc:mysql://h/db?x=#notcomment"))
    assert(kv("hooks.before_data") == Toml.Arr(Seq("a.sql", "b.sql")))
  }

  test("toml array elements may contain commas inside quotes") {
    val kv = Toml.parse("""hooks = ["pre, with comma.sql", "b.sql"]""")
    assert(kv("hooks") == Toml.Arr(Seq("pre, with comma.sql", "b.sql")))
    val cfg = JobConfig.fromToml(
      "[hooks]\nbefore_data = [\"pre, with comma.sql\", \"b.sql\"]")
    assert(cfg.hooks("before_data") == Seq("pre, with comma.sql", "b.sql"))
  }

  test("config defaults and validation matrix") {
    val cfg = JobConfig.fromToml("mode = \"parallel\"")
    assert(cfg.chunkSize == 100000L && cfg.unloggedTables &&
      cfg.validation == "row_count")
    intercept[IllegalArgumentException] {
      JobConfig.fromToml("nonsense_key = 1")
    }
    intercept[IllegalArgumentException] {
      JobConfig.fromToml("resume = true\nrecreate = true")
    }
    intercept[IllegalArgumentException] {
      JobConfig.fromToml("schema_only = true\ndata_only = true")
    }
    intercept[IllegalArgumentException] {
      JobConfig.fromToml("mode = \"bogus\"")
    }
    intercept[IllegalArgumentException] {
      JobConfig.fromToml("mode = \"single_tx\"\nresume = true")
    }
    intercept[IllegalArgumentException] {
      JobConfig.fromToml("workers = 0")
    }
  }

  private val users = TableMeta("users",
    Seq(("id", "bigint", false, None), ("name", "text", false, None)),
    primaryKey = Some(IndexMeta("pk_users", Seq("id"), isPrimary = true)))
  private val posts = TableMeta("posts",
    Seq(("id", "bigint", false, None), ("user_id", "bigint", false, None)),
    primaryKey = Some(IndexMeta("pk_posts", Seq("id"), isPrimary = true)),
    indexes = Seq(IndexMeta("ix_posts_user", Seq("user_id"))),
    foreignKeys = Seq(ForeignKeyMeta("fk_posts_user", Seq("user_id"),
      "users", Seq("id"))))

  private class Recorder extends SqlExecutor {
    val stmts = mutable.Buffer[String]()
    def execute(sql: String): Unit = stmts += sql
  }
  private object NoopLoader extends TableLoader {
    def load(t: TableMeta): Long = 42L
    def sourceCount(t: TableMeta): Long = 42L
    def targetCount(t: TableMeta): Long = 42L
  }

  test("pipeline phase order matches the reference lifecycle") {
    val rec = new Recorder
    val cfg = JobConfig()
    val hooks = Map(
      "before_data" -> "-- prep\nSET search_path TO {{schema}};",
      "after_all" -> "ANALYZE;")
    val report = new MigrationPipeline(cfg, rec, NoopLoader, hooks)
      .migrate(Seq(users, posts))
    val s = rec.stmts
    def idx(p: String => Boolean): Int = s.indexWhere(p)
    val createT = idx(_.startsWith("CREATE UNLOGGED TABLE"))
    val hook = idx(_.contains("SET search_path TO public"))
    val logged = idx(_.contains("SET LOGGED"))
    val pk = idx(_.contains("ADD PRIMARY KEY"))
    val ix = idx(_.startsWith("CREATE INDEX"))
    val fk = idx(_.contains("ADD CONSTRAINT"))
    val seq = idx(_.contains("setval"))
    val analyze = idx(_ == "ANALYZE")
    assert(createT >= 0 && hook > createT && logged > hook && pk > logged &&
      ix > pk && fk > ix && seq > fk && analyze > seq,
      s.mkString("\n"))
    assert(report.rowsLoaded == Map("users" -> 42L, "posts" -> 42L))
    assert(report.validationMismatches.isEmpty)
  }

  test("schema_only stops after DDL; data_only skips DDL") {
    val rec1 = new Recorder
    new MigrationPipeline(JobConfig(schemaOnly = true), rec1, NoopLoader)
      .migrate(Seq(users))
    assert(rec1.stmts.forall(_.startsWith("CREATE UNLOGGED TABLE")))
    val rec2 = new Recorder
    new MigrationPipeline(JobConfig(dataOnly = true), rec2, NoopLoader)
      .migrate(Seq(users))
    assert(!rec2.stmts.exists(_.startsWith("CREATE")))
    // data_only: triggers disabled around the load, no constraint DDL
    val disable = rec2.stmts.indexWhere(_.contains("DISABLE TRIGGER ALL"))
    val enable = rec2.stmts.indexWhere(_.contains("ENABLE TRIGGER ALL"))
    assert(disable >= 0 && enable > disable)
    assert(!rec2.stmts.exists(_.contains("ADD PRIMARY KEY")))
    assert(rec2.stmts.exists(_.contains("setval"))) // sequences still reset
  }

  test("validation reports mismatched counts") {
    val badLoader = new TableLoader {
      def load(t: TableMeta): Long = 10L
      def sourceCount(t: TableMeta): Long = 10L
      def targetCount(t: TableMeta): Long = 9L
    }
    val report = new MigrationPipeline(JobConfig(), new Recorder, badLoader)
      .migrate(Seq(users))
    assert(report.validationMismatches == Map("users" -> ((10L, 9L))))
  }

  test("orphan cleanup: anti-join with MATCH SIMPLE null guard") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // users/posts/comments fixture shape with orphans + NULL components
    val parents = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val children = Seq(
      (10L, Some(1L)), (11L, Some(2L)), // valid
      (12L, Some(999L)),                // orphan
      (13L, None)                       // NULL FK → never an orphan
    ).toDF("cid", "user_id")

    val orphans = OrphanCleanup.findOrphans(children, parents,
      Seq("user_id"), Seq("id"))
    assert(orphans.select("cid").as[Long].collect().toSet == Set(12L))

    val kept = OrphanCleanup.deleteOrphans(children, parents,
      Seq("user_id"), Seq("id"))
    assert(kept.select("cid").as[Long].collect().toSet ==
      Set(10L, 11L, 13L))

    val repaired = OrphanCleanup.setNullOrphans(children, parents,
      Seq("user_id"), Seq("id"))
    val byId = repaired.collect()
      .map(r => r.getLong(r.fieldIndex("cid")) ->
        (if (r.isNullAt(r.fieldIndex("user_id"))) None
        else Some(r.getLong(r.fieldIndex("user_id"))))).toMap
    assert(byId == Map(10L -> Some(1L), 11L -> Some(2L), 12L -> None,
      13L -> None))
    assert(repaired.count() == 4)
  }
}
