package graft

import graft.config.JobConfig
import graft.sources._
import org.scalatest.funsuite.AnyFunSuite

/** Dry-run plan analyzer parity (reference plan.go:170-254): required
  * extensions, unsupported columns, generated columns, skipped indexes
  * with reasons, collation warnings, chunk eligibility.
  */
class PlanReportSpec extends AnyFunSuite {

  private val tables = Seq(
    SourceTable("users",
      columns = Seq(
        SourceColumn("id", "bigint"),
        SourceColumn("email", "varchar", charMaxLen = Some(200),
          collation = "utf8mb4_general_ci"),
        SourceColumn("geom", "geometry"),
        SourceColumn("odd", "weirdtype", columnType = "weirdtype(9)"),
        SourceColumn("full_name", "varchar", charMaxLen = Some(100),
          generationExpression = "concat(first,' ',last)")),
      indexes = Seq(
        IndexMeta("pk", Seq("id"), unique = true, isPrimary = true),
        IndexMeta("ux_email", Seq("email"), unique = true),
        IndexMeta("ft_name", Seq("full_name"), kind = "FULLTEXT"),
        IndexMeta("ix_prefix", Seq("email"), hasPrefix = true))),
    SourceTable("logs",
      columns = Seq(SourceColumn("id", "varchar", charMaxLen = Some(36))),
      indexes = Seq(IndexMeta("pk", Seq("id"), unique = true,
        isPrimary = true))))

  test("plan report assembles the reference's dry-run findings") {
    // default config: spatial_mode=off and no postgis → the geometry
    // column is UNSUPPORTED; _ci columns map to plain text without
    // ci_as_citext, so NO extension is required (extensions.go:20-34)
    val r0 = PlanReport.build(JobConfig(), tables)
    assert(r0.requiredExtensions.isEmpty)
    assert(r0.unsupportedColumns.toSet ==
      Set(("users", "odd", "weirdtype(9)"), ("users", "geom", "geometry")))
    // ci_as_citext produces citext columns → citext required
    assert(PlanReport.build(JobConfig(typeOptions =
      graft.sources.TypeOptions(ciAsCitext = true)), tables)
      .requiredExtensions == Seq("citext"))
    // postgis enabled → geometry maps natively and postgis is required
    val r = PlanReport.build(JobConfig(postgisEnabled = true,
      typeOptions = graft.sources.TypeOptions(ciAsCitext = true,
        usePostGis = true)), tables)
    assert(r.requiredExtensions == Seq("citext", "postgis"))
    assert(r.unsupportedColumns == Seq(("users", "odd", "weirdtype(9)")))
    assert(r.generatedColumns.map(g => (g._1, g._2)) ==
      Seq(("users", "full_name")))
    assert(r.skippedIndexes.map(x => (x._1, x._2)).toSet ==
      Set(("users", "ft_name"), ("users", "ix_prefix")))
    // warnings fire when _ci columns STAY plain text (default config);
    // ci_as_citext suppresses them (the semantics are then preserved)
    assert(r0.collationWarnings.map(_.index) == Seq("ux_email"))
    assert(r.collationWarnings.isEmpty)
    // users has integer PK → chunkable; logs has varchar PK → not
    assert(r.chunkableTables == Seq("users"))
    val text = r.renderText
    assert(text.contains("UNSUPPORTED") && text.contains("users.odd"))
    assert(r.renderJson.contains("\"required_extensions\":[\"citext\",\"postgis\"]"))
  }

  test("hook skeletons carry TODOs for generated columns and skipped " +
      "indexes (plan.go:362-495)") {
    val sk = PlanReport.build(JobConfig(), tables).hookSkeletons
    assert(sk.keySet == Set("after_data.sql", "after_all.sql"))
    val ad = sk("after_data.sql")
    assert(ad.contains("{{schema}}"))
    assert(ad.contains("Source expression: concat(first,' ',last)"))
    assert(ad.contains("\"full_name\""))
    val aa = sk("after_all.sql")
    assert(aa.contains("ft_name") && aa.contains("FULLTEXT"))
    assert(aa.contains("ix_prefix"))
    // a clean schema produces no skeleton files
    assert(PlanReport.build(JobConfig(),
      Seq(tables.last)).hookSkeletons.isEmpty)
  }

  test("source objects are report-only with after_all TODO stubs " +
      "(source_objects.go, main.go:194-201)") {
    val objs = graft.sources.Introspection.SourceObjects(
      views = Seq("v_active"),
      routines = Seq("PROCEDURE refresh_stats"),
      triggers = Seq("trg_audit"))
    val r = PlanReport.build(JobConfig(), tables, objs)
    val text = r.renderText
    assert(text.contains("view v_active"))
    assert(text.contains("routine PROCEDURE refresh_stats"))
    assert(text.contains("trigger trg_audit"))
    assert(r.renderJson.contains("\"views\":[\"v_active\"]"))
    val aa = r.hookSkeletons("after_all.sql")
    assert(aa.contains("CREATE VIEW \"{{schema}}\".\"v_active\""))
    assert(aa.contains("port routine PROCEDURE refresh_stats"))
  }

  test("unknown_as_text clears unsupported columns") {
    val cfg = JobConfig(typeOptions =
      graft.sources.TypeOptions(unknownAsText = true))
    assert(PlanReport.build(cfg, tables).unsupportedColumns.isEmpty)
  }

  test("collation treatments") {
    import CollationCompat._
    val ci = SourceColumn("e", "varchar", collation = "utf8_general_ci")
    val bin = SourceColumn("b", "varchar", collation = "utf8_bin")
    assert(treatment(ci, ciAsCitext = true) == ToCitext)
    assert(treatment(ci, ciAsCitext = false) == NoChange)
    assert(treatment(bin, ciAsCitext = true) == ToCollateC)
    assert(applyTreatment("varchar(10)", ToCollateC) ==
      "varchar(10) COLLATE \"C\"")
    assert(applyTreatment("text", ToCitext) == "citext")
    // citext enabled → no unique-index warnings
    assert(uniqueIndexWarnings("t", Seq(ci),
      Seq(IndexMeta("ux", Seq("e"), unique = true)),
      ciAsCitext = true).isEmpty)
  }
}
