package graft

import graft.sources._
import org.scalatest.funsuite.AnyFunSuite

/** S5 — source-side scan-expression pushdown contract: the emitted
  * per-column SELECT expressions must match the reference's
  * `columnSelectExpr` / `mysqlPostGISSelectExpr` output shape-for-shape
  * (`migrate.go:492-531`), because those strings ARE the fix for types
  * the wire can't deliver raw (MySQL spatial, MSSQL CLR types). Also
  * pins the rewrite gate (`needsScanRewrite`), the capability fallback
  * (no axis-order option on pre-8.0/MariaDB), and that the Spark-side
  * value transforms compose with — not double-apply after — each
  * rewrite.
  */
class ScanExprSpec extends AnyFunSuite {

  private def col(name: String, dt: String): SourceColumn =
    SourceColumn(name, dt, dt)

  // ---- MySQL ---------------------------------------------------------

  test("MySQL spatial + wkt_text → ST_AsText at the source " +
      "(migrate.go:502-503)") {
    val o = TypeOptions(spatialMode = "wkt_text")
    for (dt <- Seq("geometry", "point", "linestring", "polygon",
        "multipoint", "multilinestring", "multipolygon",
        "geometrycollection"))
      assert(MySqlDialect.scanExpr(col("g", dt), o) ==
        "ST_AsText(`g`) AS `g`")
  }

  test("MySQL spatial + PostGIS → SRID byte-split CHARs + ST_AsWKB " +
      "with axis-order option (mysqlPostGISSelectExpr, " +
      "migrate.go:520-531)") {
    val o = TypeOptions(usePostGis = true)
    val e = MySqlDialect.scanExpr(col("g", "geometry"), o,
      ScanCaps(axisOrderExpr = true))
    assert(e ==
      "CONCAT(CHAR((ST_SRID(`g`)) & 255 USING binary), " +
        "CHAR(((ST_SRID(`g`)) >> 8) & 255 USING binary), " +
        "CHAR(((ST_SRID(`g`)) >> 16) & 255 USING binary), " +
        "CHAR(((ST_SRID(`g`)) >> 24) & 255 USING binary), " +
        "ST_AsWKB(`g`, 'axis-order=long-lat')) AS `g`")
  }

  test("MySQL PostGIS without axis-order capability drops the option " +
      "(source_mysql.go:842-845 fallback)") {
    val o = TypeOptions(usePostGis = true)
    val e = MySqlDialect.scanExpr(col("g", "point"), o,
      ScanCaps(axisOrderExpr = false))
    assert(e.contains("ST_AsWKB(`g`))"))
    assert(!e.contains("axis-order"))
  }

  test("MySQL spatial + wkb_bytea stays the plain column — the raw " +
      "SRID-prefixed payload IS the target encoding " +
      "(source_mysql.go:816-820)") {
    val o = TypeOptions(spatialMode = "wkb_bytea")
    assert(MySqlDialect.scanExpr(col("g", "geometry"), o) == "`g`")
  }

  test("MySQL non-spatial columns are never rewritten") {
    val o = TypeOptions(usePostGis = true, spatialMode = "wkt_text")
    for (dt <- Seq("int", "varchar", "json", "datetime", "binary"))
      assert(MySqlDialect.scanExpr(col("c", dt), o) == "`c`")
  }

  // ---- MSSQL ---------------------------------------------------------

  test("MSSQL hierarchyid → .ToString() (migrate.go:507-508)") {
    assert(MssqlDialect.scanExpr(col("h", "hierarchyid"),
      TypeOptions()) == "[h].ToString() AS [h]")
  }

  test("MSSQL spatial modes → STAsText / STAsBinary " +
      "(migrate.go:509-512)") {
    for (dt <- Seq("geography", "geometry")) {
      assert(MssqlDialect.scanExpr(col("g", dt),
        TypeOptions(spatialMode = "wkt_text")) ==
        "[g].STAsText() AS [g]")
      assert(MssqlDialect.scanExpr(col("g", dt),
        TypeOptions(spatialMode = "wkb_bytea")) ==
        "[g].STAsBinary() AS [g]")
    }
  }

  test("MSSQL sql_variant → CAST nvarchar(max) (migrate.go:513-514)") {
    assert(MssqlDialect.scanExpr(col("v", "sql_variant"),
      TypeOptions()) == "CAST([v] AS nvarchar(max)) AS [v]")
  }

  test("MSSQL quoting survives the rewrite (bracket-escaped names)") {
    assert(MssqlDialect.scanExpr(col("a]b", "hierarchyid"),
      TypeOptions()) == "[a]]b].ToString() AS [a]]b]")
  }

  // ---- scanSql assembly + gate ---------------------------------------

  test("expression scanSql assembles SELECT in column order and " +
      "aliases rewrites back to source names (migrate.go:484-490)") {
    val cols = Seq(col("id", "int"), col("g", "geometry"),
      col("name", "varchar"))
    val o = TypeOptions(spatialMode = "wkt_text")
    assert(MySqlDialect.scanSql("places", cols, o, ScanCaps()) ==
      "SELECT `id`, ST_AsText(`g`) AS `g`, `name` FROM `places`")
  }

  test("needsScanRewrite gates the derived-table swap: false when " +
      "every column is plain, true when any column rewrites") {
    val plain = Seq(col("id", "int"), col("name", "varchar"))
    val o = TypeOptions(spatialMode = "wkt_text")
    assert(!MySqlDialect.needsScanRewrite(plain, o))
    assert(MySqlDialect.needsScanRewrite(
      plain :+ col("g", "point"), o))
    assert(!MssqlDialect.needsScanRewrite(plain, TypeOptions()))
    assert(MssqlDialect.needsScanRewrite(
      plain :+ col("h", "hierarchyid"), TypeOptions()))
    // spatial_mode=off + unknownAsText must NOT rewrite (the column
    // maps to text via the unknown policy, raw value passthrough)
    assert(!MySqlDialect.needsScanRewrite(
      Seq(col("g", "geometry")), TypeOptions(unknownAsText = true)))
  }

  test("SQLite and Parquet dialects never rewrite (no special types)") {
    val cols = Seq(col("g", "geometry"), col("h", "hierarchyid"))
    assert(!SqliteDialect.needsScanRewrite(cols,
      TypeOptions(unknownAsText = true)))
    assert(!ParquetDialect.needsScanRewrite(cols,
      TypeOptions(unknownAsText = true)))
  }

  // ---- transform composition (no double-apply) -----------------------

  test("value-path composition: PostGIS rewrite feeds the F12 EWKB " +
      "splice; wkt/hierarchyid/sql_variant rewrites arrive finished " +
      "(no Spark-side transform)") {
    val oPg = TypeOptions(usePostGis = true)
    // PostGIS: scan emits SRID+WKB bytes; F12 must be selected to
    // splice EWKB — same pairing as the raw-bytes path
    assert(graft.functions.Transforms
      .valueForColumn("mysql", col("g", "geometry"), oPg).isDefined)
    // wkt_text: the value is finished WKT; no transform may touch it
    assert(graft.functions.Transforms.valueForColumn("mysql",
      col("g", "geometry"), TypeOptions(spatialMode = "wkt_text")).isEmpty)
    assert(graft.functions.Transforms.valueForColumn("mssql",
      col("h", "hierarchyid"), TypeOptions()).isEmpty)
    assert(graft.functions.Transforms.valueForColumn("mssql",
      col("v", "sql_variant"), TypeOptions()).isEmpty)
    assert(graft.functions.Transforms.valueForColumn("mssql",
      col("g", "geography"),
      TypeOptions(spatialMode = "wkt_text")).isEmpty)
  }

  test("PostGIS end-to-end value shape: the reassembled scan payload " +
      "(LE SRID prefix + WKB) splices to EWKB exactly as raw-mode " +
      "bytes do (source_mysql.go:940-986)") {
    // POINT(1 2), NDR WKB, SRID 4326 — built byte-for-byte as the
    // CONCAT(CHAR…, ST_AsWKB…) expression would deliver it
    val wkb = java.nio.ByteBuffer.allocate(21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(1).putDouble(1.0).putDouble(2.0).array()
    val srid = 4326
    val payload = Array[Byte](
      (srid & 255).toByte, ((srid >> 8) & 255).toByte,
      ((srid >> 16) & 255).toByte, ((srid >> 24) & 255).toByte) ++ wkb
    val ewkb = graft.functions.Transforms.spatialBytesToEwkb(payload)
    // EWKB: byte order marker, type word | 0x20000000, SRID, coords
    assert(ewkb(0) == 1.toByte)
    val bb = java.nio.ByteBuffer.wrap(ewkb)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(1) == (1 | 0x20000000))
    assert(bb.getInt(5) == 4326)
    assert(bb.getDouble(9) == 1.0 && bb.getDouble(17) == 2.0)
  }

  // ---- JDBC wiring ---------------------------------------------------

  test("ScanCaps.probe returns unsupported on an engine without " +
      "ST_AsWKB (Derby stands in for pre-8.0)") {
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val c = java.sql.DriverManager.getConnection(
      "jdbc:derby:memory:scancaps;create=true")
    try assert(!ScanCaps.probe(c).axisOrderExpr)
    finally c.close()
  }
}
