package graft

import graft.config.JobConfig
import graft.sources._

/** One introspected source table for planning (reference `model.go:46-53`
  * with the fields the dry-run analyzer needs).
  */
final case class SourceTable(
    name: String,
    columns: Seq[SourceColumn],
    indexes: Seq[IndexMeta] = Nil,
    rowEstimate: Option[Long] = None)

/** The `plan` command's dry-run report (reference `plan.go:170-254`):
  * never touches the target; assembles required extensions, unsupported
  * columns (by dry-running the type mapping), generated columns, skipped
  * indexes with reasons, and collation warnings.
  */
final case class PlanReport(
    dialect: String,
    tables: Seq[String],
    requiredExtensions: Seq[String],
    unsupportedColumns: Seq[(String, String, String)], // (table, col, type)
    generatedColumns: Seq[(String, String, String)], // (table, col, source expr)
    skippedIndexes: Seq[(String, String, String)],     // (table, index, reason)
    collationWarnings: Seq[CollationCompat.CollationWarning],
    chunkableTables: Seq[String],
    sourceObjects: Introspection.SourceObjects =
      Introspection.SourceObjects()) {

  def renderText: String = {
    val sb = new StringBuilder
    sb.append(s"Migration plan ($dialect → postgresql)\n")
    sb.append(s"Tables: ${tables.size}\n")
    if (requiredExtensions.nonEmpty)
      sb.append(s"Required extensions: ${requiredExtensions.mkString(", ")}\n")
    if (unsupportedColumns.nonEmpty) {
      sb.append("UNSUPPORTED columns (migration would abort):\n")
      unsupportedColumns.foreach { case (t, c, ty) =>
        sb.append(s"  - $t.$c: $ty\n") }
    }
    if (generatedColumns.nonEmpty) {
      sb.append("Generated columns (recreate manually):\n")
      generatedColumns.foreach { case (t, c, _) =>
        sb.append(s"  - $t.$c\n") }
    }
    if (skippedIndexes.nonEmpty) {
      sb.append("Skipped indexes:\n")
      skippedIndexes.foreach { case (t, ix, r) =>
        sb.append(s"  - $t.$ix: $r\n") }
    }
    if (collationWarnings.nonEmpty) {
      sb.append("Collation warnings:\n")
      collationWarnings.foreach(w =>
        sb.append(s"  - ${w.table}.${w.index}: ${w.reason}\n"))
    }
    if (!sourceObjects.isEmpty) {
      sb.append("Source objects NOT migrated (manual follow-up, " +
        "reference source_objects.go):\n")
      sourceObjects.views.foreach(v => sb.append(s"  - view $v\n"))
      sourceObjects.routines.foreach(r => sb.append(s"  - routine $r\n"))
      sourceObjects.triggers.foreach(t => sb.append(s"  - trigger $t\n"))
    }
    sb.append(s"Chunk-parallel tables: ${chunkableTables.mkString(", ")}\n")
    sb.toString
  }

  /** TODO-commented hook-file skeletons for the manual follow-ups the
    * plan surfaces (reference `plan.go:362-495`): after_data for
    * generated-column expressions, after_all for skipped indexes. Files
    * use the `{{schema}}` template the hook runner substitutes.
    */
  def hookSkeletons: Map[String, String] = {
    val out = Map.newBuilder[String, String]
    if (generatedColumns.nonEmpty) {
      val sb = new StringBuilder
      sb.append("-- after_data hook: generated column expressions\n")
      sb.append("-- These columns were materialized as plain data " +
        "during migration.\n--\n-- Schema: {{schema}}\n\n")
      generatedColumns.groupBy(_._1).toSeq.sortBy(_._1)
        .foreach { case (table, cols) =>
          sb.append(s"-- Table: $table\n")
          cols.foreach { case (_, c, expr) =>
            sb.append(s"-- TODO: ALTER TABLE \"{{schema}}\".\"$table\"\n")
            sb.append(s"--        ALTER COLUMN \"$c\" " +
              "SET EXPRESSION AS (...);\n")
            sb.append(s"-- Source expression: $expr\n")
          }
          sb.append("\n")
        }
      out += "after_data.sql" -> sb.toString
    }
    if (skippedIndexes.nonEmpty || !sourceObjects.isEmpty) {
      val sb = new StringBuilder
      sb.append("-- after_all hook: indexes and source objects not " +
        "migrated\n")
      sb.append("--\n-- Schema: {{schema}}\n\n")
      skippedIndexes.foreach { case (t, ix, reason) =>
        sb.append(s"-- TODO: recreate index $ix on " +
          s"\"{{schema}}\".\"$t\" ($reason)\n")
        sb.append(s"-- CREATE INDEX \"$ix\" ON \"{{schema}}\".\"$t\" " +
          "(...);\n\n")
      }
      sourceObjects.views.foreach { v =>
        sb.append(s"-- TODO: translate view $v\n")
        sb.append(s"-- CREATE VIEW \"{{schema}}\".\"$v\" AS ...;\n\n")
      }
      sourceObjects.routines.foreach(r =>
        sb.append(s"-- TODO: port routine $r (plpgsql)\n\n"))
      sourceObjects.triggers.foreach(t =>
        sb.append(s"-- TODO: port trigger $t\n\n"))
      out += "after_all.sql" -> sb.toString
    }
    out.result()
  }

  def renderJson: String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    def arr(xs: Seq[String]) = xs.map(q).mkString("[", ",", "]")
    s"""{"dialect":${q(dialect)},"tables":${arr(tables)},""" +
      s""""required_extensions":${arr(requiredExtensions)},""" +
      s""""unsupported_columns":${arr(unsupportedColumns.map {
        case (t, c, ty) => s"$t.$c:$ty" })},""" +
      s""""generated_columns":${arr(generatedColumns.map {
        case (t, c, _) => s"$t.$c" })},""" +
      s""""skipped_indexes":${arr(skippedIndexes.map {
        case (t, ix, r) => s"$t.$ix:$r" })},""" +
      s""""collation_warnings":${arr(collationWarnings.map(w =>
        s"${w.table}.${w.index}"))},""" +
      s""""source_objects":{"views":${arr(sourceObjects.views)},""" +
      s""""routines":${arr(sourceObjects.routines)},""" +
      s""""triggers":${arr(sourceObjects.triggers)}},""" +
      s""""chunkable_tables":${arr(chunkableTables)}}"""
  }
}

object PlanReport {

  /** Index-skip rules (reference `indexUnsupportedReason`,
    * `plan.go:218-243`-adjacent; FULLTEXT/SPATIAL/prefix/expression
    * indexes have no direct PG analog in the bare DDL path).
    */
  def indexSkipReason(ix: IndexMeta): Option[String] =
    if (ix.kind == "FULLTEXT") Some("FULLTEXT index (use tsvector/GIN)")
    else if (ix.kind == "SPATIAL") Some("SPATIAL index (use PostGIS GiST)")
    else if (ix.hasPrefix) Some("prefix index (PG has no prefix indexes)")
    else if (ix.hasExpression) Some("expression index (recreate manually)")
    else None

  def build(cfg: JobConfig, tables: Seq[SourceTable],
      sourceObjects: Introspection.SourceObjects =
        Introspection.SourceObjects()): PlanReport = {
    val dialect = SourceDialect(cfg.sourceDialect)
    val o = cfg.typeOptions

    val unsupported = for {
      t <- tables; c <- t.columns
      if c.generationExpression.isEmpty && dialect.mapType(c, o).isEmpty &&
        !o.unknownAsText
    } yield (t.name, c.name,
      if (c.columnType.nonEmpty) c.columnType else c.dataType)

    val generated = for {
      t <- tables; c <- t.columns if c.generationExpression.nonEmpty
    } yield (t.name, c.name, c.generationExpression)

    val skipped = for {
      t <- tables; ix <- t.indexes
      r <- indexSkipReason(ix)
    } yield (t.name, ix.name, r)

    val collationWarnings = tables.flatMap(t =>
      CollationCompat.uniqueIndexWarnings(t.name, t.columns, t.indexes,
        ciAsCitext = o.ciAsCitext))

    // citext is required only when the config actually PRODUCES citext
    // columns (extensions.go:20-34 via pgTypeForCollation) — a plain
    // migration of _ci columns maps them to text and needs nothing
    val needsCitext = o.ciAsCitext && tables.exists(_.columns.exists(c =>
      dialect.mapType(c, o).exists(m =>
        CollationCompat.applyConfigPolicy(c, m.pg, o) == "citext")))
    val spatialTypes = Set("geometry", "point", "linestring", "polygon",
      "multipoint", "multilinestring", "multipolygon",
      "geometrycollection", "geography")
    val needsPostgis = tables.exists(_.columns.exists(c =>
      spatialTypes(c.dataType.toLowerCase) &&
        dialect.mapType(c, o).exists(_.pg == "geometry")))
    val extensions =
      (if (needsCitext) Seq("citext") else Nil) ++
        (if (needsPostgis) Seq("postgis") else Nil)

    // chunkable: single-column integer PK (reference chunk.go:96-150)
    val chunkable = tables.filter { t =>
      t.indexes.find(_.isPrimary).exists { pk =>
        pk.columns.size == 1 &&
          t.columns.find(_.name == pk.columns.head).exists(c =>
            dialect.mapType(c, o)
              .exists(m => ChunkPlanner.eligibleKeyType(m.spark)))
      }
    }.map(_.name)

    PlanReport(cfg.sourceDialect, tables.map(_.name), extensions,
      unsupported, generated, skipped, collationWarnings, chunkable,
      sourceObjects)
  }
}
