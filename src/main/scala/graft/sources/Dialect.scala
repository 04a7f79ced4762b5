package graft.sources

import org.apache.spark.sql.types._

/** A source column as introspected from a live database
  * (reference `model.go:4-19`).
  */
final case class SourceColumn(
    name: String,
    dataType: String,            // base type, e.g. "tinyint"
    columnType: String = "",     // full type, e.g. "tinyint(1)", "enum('a')"
    charMaxLen: Option[Int] = None,
    precision: Option[Int] = None,
    scale: Option[Int] = None,
    nullable: Boolean = true,
    default: Option[String] = None,
    extra: String = "",          // "auto_increment", "on update ..."
    unsigned: Boolean = false,
    collation: String = "",      // e.g. utf8mb4_general_ci
    charset: String = "",        // e.g. utf8mb4 (model.go:17)
    generationExpression: String = "") // non-empty = generated column

/** Mapped result: Spark type for the engine + PG DDL type for the sink. */
final case class MappedType(spark: DataType, pg: String)

/** Probed source-server capabilities that change scan-expression
  * shape. `axisOrderExpr`: MySQL ≥ 8.0 accepts
  * `ST_AsWKB(g, 'axis-order=long-lat')` (MariaDB and 5.7 don't);
  * the reference defaults to TRUE when the probe hasn't run
  * (`source_mysql.go:81-86`) and probes with a live
  * `SELECT ST_AsWKB(ST_GeomFromText('POINT(0 0)'), 'axis-order=…')`
  * (`source_mysql.go:71-79`) — [[ScanCaps.probe]] is the same test.
  */
final case class ScanCaps(axisOrderExpr: Boolean = true)

object ScanCaps {
  /** Live-probe the axis-order capability on an open connection —
    * the reference's detection, verbatim semantics: supported iff the
    * probe statement executes.
    */
  def probe(conn: java.sql.Connection): ScanCaps = {
    val ok =
      try {
        val st = conn.createStatement()
        try {
          st.executeQuery("SELECT ST_AsWKB(ST_GeomFromText(" +
            "'POINT(0 0)'), 'axis-order=long-lat')").close()
          true
        } finally st.close()
      } catch { case _: java.sql.SQLException => false }
    ScanCaps(axisOrderExpr = ok)
  }
}

/** The full `[type_mapping]` option surface of the reference
  * (`config.go:66-92`), with the reference's defaults
  * (`config.go:340-360`). `enumMode` empty = source-defaulted
  * (mysql → "check", else "text" — `config.go:362-375`); `usePostGis`
  * is derived from the `[postgis]` feature block, not a TOML key.
  */
final case class TypeOptions(
    tinyint1AsBoolean: Boolean = false,
    binary16AsUuid: Boolean = false,
    datetimeAsTimestamptz: Boolean = false,
    jsonAsJsonb: Boolean = true,
    enumMode: String = "",                // text|check|native
    setMode: String = "text",             // text|text_array|text_array_check
    widenUnsignedIntegers: Boolean = true,
    varcharAsText: Boolean = false,
    sanitizeJsonNullBytes: Boolean = true,
    unknownAsText: Boolean = false,
    collationMode: String = "none",       // none|auto
    collationMap: Map[String, String] = Map.empty,
    ciAsCitext: Boolean = false,
    bitMode: String = "bytea",            // bytea|bit|varbit (MySQL)
    stringUuidAsUuid: Boolean = false,
    binary16UuidMode: String = "rfc4122", // rfc4122|mysql_uuid_to_bin_swap
    timeMode: String = "time",            // text|time|interval (MySQL)
    zeroDateMode: String = "null",        // null|error (MySQL)
    spatialMode: String = "off",          // off|wkb_bytea|wkt_text
    nvarcharAsText: Boolean = false,      // MSSQL
    moneyAsNumeric: Boolean = true,       // MSSQL
    xmlAsText: Boolean = false,           // MSSQL
    usePostGis: Boolean = false) {

  /** `config.go:362-375` — enum_mode defaults per source engine. */
  def effectiveEnumMode(source: String): String =
    if (enumMode.nonEmpty) enumMode
    else if (source == "mysql") "check" else "text"

  /** Mode-value validation (`config.go:180-238`). */
  def validateModes(): Unit = {
    def in(k: String, v: String, allowed: Set[String]): Unit =
      require(allowed(v),
        s"type_mapping.$k must be one of: ${allowed.toSeq.sorted
          .mkString(", ")} (got '$v')")
    if (enumMode.nonEmpty) in("enum_mode", enumMode,
      Set("text", "check", "native"))
    in("set_mode", setMode, Set("text", "text_array", "text_array_check"))
    in("collation_mode", collationMode, Set("none", "auto"))
    in("bit_mode", bitMode, Set("bytea", "bit", "varbit"))
    in("binary16_uuid_mode", binary16UuidMode,
      Set("rfc4122", "mysql_uuid_to_bin_swap"))
    require(binary16UuidMode == "rfc4122" || binary16AsUuid,
      "type_mapping.binary16_uuid_mode requires binary16_as_uuid = true")
    in("time_mode", timeMode, Set("text", "time", "interval"))
    in("zero_date_mode", zeroDateMode, Set("null", "error"))
    in("spatial_mode", spatialMode, Set("off", "wkb_bytea", "wkt_text"))
  }

  /** Source-specific rejections, mirroring the three
    * `ValidateTypeMapping` vtables (`source_mysql.go:123-138`,
    * `source_sqlite.go:175-…`, `source_mssql.go:86-…`).
    */
  def validateForSource(source: String): Unit = {
    val errs = Seq.newBuilder[String]
    def mysqlOnly(flag: Boolean, key: String): Unit =
      if (flag && source != "mysql") errs += s"$key is a MySQL-only option"
    def mssqlOnly(flag: Boolean, key: String): Unit =
      if (flag && source != "mssql") errs += s"$key is a MSSQL-only option"
    mysqlOnly(tinyint1AsBoolean, "tinyint1_as_boolean")
    mysqlOnly(binary16AsUuid, "binary16_as_uuid")
    mysqlOnly(varcharAsText, "varchar_as_text")
    mysqlOnly(!widenUnsignedIntegers, "widen_unsigned_integers")
    mysqlOnly(effectiveEnumMode(source) != "text" && source != "mysql",
      s"enum_mode='$enumMode'")
    mysqlOnly(setMode != "text", s"set_mode='$setMode'")
    mysqlOnly(collationMode != "none", s"collation_mode='$collationMode'")
    mysqlOnly(collationMap.nonEmpty, "collation_map")
    mysqlOnly(ciAsCitext, "ci_as_citext")
    mysqlOnly(bitMode != "bytea", s"bit_mode='$bitMode'")
    mysqlOnly(stringUuidAsUuid, "string_uuid_as_uuid")
    mysqlOnly(binary16UuidMode != "rfc4122",
      s"binary16_uuid_mode='$binary16UuidMode'")
    mysqlOnly(timeMode != "time", s"time_mode='$timeMode'")
    mysqlOnly(zeroDateMode != "null", s"zero_date_mode='$zeroDateMode'")
    if (datetimeAsTimestamptz && source == "sqlite")
      errs += "datetime_as_timestamptz is a MySQL-only option"
    if (spatialMode != "off" && source == "sqlite")
      errs += "spatial_mode is a MySQL/MSSQL-only option"
    mssqlOnly(nvarcharAsText, "nvarchar_as_text")
    mssqlOnly(!moneyAsNumeric, "money_as_numeric")
    mssqlOnly(xmlAsText, "xml_as_text")
    val all = errs.result()
    require(all.isEmpty,
      s"invalid type_mapping for $source source: ${all.mkString("; ")}")
  }
}

/** Per-source-engine dialect vtable (reference `source.go:10-65` SourceDB):
  * identifier quoting, scan SQL shapes, parallelism caps, and the full
  * type-mapping table of SURVEY.md §1.2.
  */
trait SourceDialect {
  def name: String
  def quote(ident: String): String
  /** Max parallel read connections (SQLite forced 1,
    * reference `source_sqlite.go:173`).
    */
  def maxWorkers(requested: Int): Int = requested
  /** Map one introspected column to (Spark type, PG type);
    * None = unsupported (hard error unless unknownAsText).
    */
  def mapType(c: SourceColumn, o: TypeOptions): Option[MappedType]

  /** Resolve with the unknown-type policy (reference
    * `type_compat.go:8-22`, `main.go:228-238`).
    */
  final def resolve(c: SourceColumn, o: TypeOptions): MappedType =
    mapType(c, o).getOrElse {
      if (o.unknownAsText) MappedType(StringType, "text")
      else throw new IllegalArgumentException(
        s"[$name] unsupported column type '${c.columnType}' on ${c.name}")
    }

  /** Scan SQL with explicit projection (never `*`,
    * reference `migrate.go:484-490`).
    */
  def scanSql(table: String, cols: Seq[String]): String =
    s"SELECT ${cols.map(quote).mkString(", ")} FROM ${quote(table)}"

  /** S5 — per-column SELECT expression for the scan (reference
    * `migrate.go:492-531` columnSelectExpr): most columns are the
    * plain quoted name, but types the wire protocol can't deliver in
    * target form are rewritten AT THE SOURCE so the conversion runs
    * once inside the source engine — MySQL spatial → WKT/SRID+WKB
    * reassembly, MSSQL CLR types (`hierarchyid.ToString()`,
    * `.STAsText()`/`.STAsBinary()`, `CAST(sql_variant AS
    * nvarchar(max))`). Rewrites alias back to the original column
    * name, so downstream schema mapping and chunk predicates are
    * unaffected.
    */
  def scanExpr(c: SourceColumn, o: TypeOptions,
      caps: ScanCaps = ScanCaps()): String = quote(c.name)

  /** Expression-rewriting scan SQL (the S5 form of [[scanSql]]). */
  final def scanSql(table: String, cols: Seq[SourceColumn],
      o: TypeOptions, caps: ScanCaps): String =
    s"SELECT ${cols.map(c => scanExpr(c, o, caps)).mkString(", ")} " +
      s"FROM ${quote(table)}"

  /** True when any column's scan expression differs from its plain
    * quoted name — the gate for swapping the JDBC relation from the
    * bare table to a pushed-down derived table.
    */
  final def needsScanRewrite(cols: Seq[SourceColumn], o: TypeOptions,
      caps: ScanCaps = ScanCaps()): Boolean =
    cols.exists(c => scanExpr(c, o, caps) != quote(c.name))

  /** Normalize a JDBC URL with the connection options the reference
    * forces on its DSNs (UTC, parsed timestamps, read-only where the
    * engine demands it). Idempotent: present options are not duplicated.
    */
  def normalizeUrl(url: String): String = url

  /** Session-init statements that make the subsequent transaction a
    * consistent snapshot for single_tx mode (reference
    * `migrate.go:158-176`). The caller additionally sets JDBC
    * REPEATABLE READ isolation where the driver supports it; MSSQL
    * overrides with its statement-level SNAPSHOT switch.
    */
  def snapshotSessionSql: Seq[String] = Nil

  /** Append query params that aren't already present. Presence is decided
    * by exact key comparison on the parsed query string — a substring test
    * would false-positive when the key appears inside another parameter's
    * name or value (e.g. a password containing `open_mode=`), silently
    * skipping a required option.
    */
  protected final def withParams(url: String,
      params: Seq[(String, String)]): String = {
    val existing: Set[String] = url.indexOf('?') match {
      case -1 => Set.empty
      case q => url.substring(q + 1).split('&').toSet[String]
        .map(p => p.indexOf('=') match {
          case -1 => p
          case e => p.substring(0, e)
        })
    }
    params.foldLeft(url) { case (u, (k, v)) =>
      if (existing(k)) u
      else u + (if (u.contains("?")) "&" else "?") + s"$k=$v"
    }
  }
}

/** MySQL / MariaDB (reference `source_mysql.go:524-643`). */
object MySqlDialect extends SourceDialect {
  val name = "mysql"
  def quote(i: String): String = "`" + i.replace("`", "``") + "`"

  /** JDBC analog of the reference's DSN normalization
    * (`source_mysql.go:52-70`): UTC session timezone (the reference sets
    * `Loc = time.UTC`), timestamps parsed as temporal types
    * (`ParseTime = true`), utf8mb4 charset unless the URL already picks
    * one.
    */
  override def normalizeUrl(url: String): String =
    withParams(url, Seq(
      "connectionTimeZone" -> "UTC",
      "forceConnectionTimeZoneToSession" -> "true",
      "characterEncoding" -> "utf8mb4"))

  /** migrate.go:168-171 — explicit session statement, then the caller's
    * BEGIN picks up a consistent InnoDB snapshot.
    */
  override def snapshotSessionSql: Seq[String] =
    Seq("SET SESSION TRANSACTION ISOLATION LEVEL REPEATABLE READ")

  def mapType(c: SourceColumn, o: TypeOptions): Option[MappedType] = {
    val dt = c.dataType.toLowerCase
    val ct = c.columnType.toLowerCase
    def u = c.unsigned || ct.contains("unsigned")
    dt match {
      case "tinyint" if ct.startsWith("tinyint(1)") && o.tinyint1AsBoolean =>
        Some(MappedType(BooleanType, "boolean"))
      case "tinyint" =>
        if (u && o.widenUnsignedIntegers) Some(MappedType(ShortType, "smallint"))
        else Some(MappedType(ShortType, "smallint"))
      case "smallint" =>
        if (u && o.widenUnsignedIntegers) Some(MappedType(IntegerType, "integer"))
        else Some(MappedType(ShortType, "smallint"))
      case "mediumint" => Some(MappedType(IntegerType, "integer"))
      case "int" | "integer" =>
        if (u && o.widenUnsignedIntegers) Some(MappedType(LongType, "bigint"))
        else Some(MappedType(IntegerType, "integer"))
      case "bigint" =>
        if (u && o.widenUnsignedIntegers)
          Some(MappedType(DecimalType(20, 0), "numeric(20)"))
        else Some(MappedType(LongType, "bigint"))
      case "float" => Some(MappedType(FloatType, "real"))
      case "double" => Some(MappedType(DoubleType, "double precision"))
      case "decimal" | "numeric" =>
        val p = c.precision.getOrElse(10); val s = c.scale.getOrElse(0)
        Some(MappedType(DecimalType(p, s), s"numeric($p,$s)"))
      case "binary" if c.charMaxLen.contains(16) && o.binary16AsUuid =>
        Some(MappedType(StringType, "uuid"))
      case "char" | "varchar" =>
        if ((c.charMaxLen.contains(36)) && o.stringUuidAsUuid)
          Some(MappedType(StringType, "uuid"))
        else if (o.varcharAsText) Some(MappedType(StringType, "text"))
        else Some(MappedType(StringType,
          c.charMaxLen.map(n => s"varchar($n)").getOrElse("text")))
      case t if t.endsWith("text") => Some(MappedType(StringType, "text"))
      case "json" =>
        Some(MappedType(StringType, if (o.jsonAsJsonb) "jsonb" else "json"))
      // enum_mode (source_mysql.go:568-581): text and check are both
      // `text` at the type level (check adds a DDL CHECK clause,
      // ddl.go:177-195); native resolves to the shared FNV-named PG
      // enum type created up front (ddl.go:132-175)
      case "enum" => o.effectiveEnumMode(name) match {
        case "native" => Some(MappedType(StringType, SchemaMapping
          .enumTypeName(SchemaMapping.parseEnumSetValues(c.columnType))))
        case _ => Some(MappedType(StringType, "text"))
      }
      // set_mode (source_mysql.go:582-590): text keeps MySQL's
      // comma-joined string form; the array modes split to text[]
      // (text_array_check adds the `<@ ARRAY[…]` DDL check)
      case "set" => o.setMode match {
        case "text" => Some(MappedType(StringType, "text"))
        case _ => Some(MappedType(ArrayType(StringType), "text[]"))
      }
      case "timestamp" => Some(MappedType(TimestampType, "timestamptz"))
      case "datetime" =>
        if (o.datetimeAsTimestamptz)
          Some(MappedType(TimestampType, "timestamptz"))
        else Some(MappedType(TimestampNTZType, "timestamp"))
      case "date" => Some(MappedType(DateType, "date"))
      case "year" => Some(MappedType(IntegerType, "integer"))
      // time_mode (source_mysql.go:602-612); the interval conversion
      // itself is functions.Transforms.timeToInterval (F10)
      case "time" => o.timeMode match {
        case "text" => Some(MappedType(StringType, "text"))
        case "interval" =>
          Some(MappedType(DayTimeIntervalType(), "interval"))
        case _ => Some(MappedType(StringType, "time"))
      }
      // bit_mode (source_mysql.go:613-628): bit(n)/varbit carry the
      // value as a '0101…' bit string; bytea passes raw bytes
      case "bit" => o.bitMode match {
        case "bit" =>
          val n = MySqlDialect.typeLength(ct, "bit")
            .orElse(c.precision).filter(_ > 0).getOrElse(1)
          Some(MappedType(StringType, s"bit($n)"))
        case "varbit" => Some(MappedType(StringType, "varbit"))
        case _ => Some(MappedType(BinaryType, "bytea"))
      }
      case "binary" | "varbinary" => Some(MappedType(BinaryType, "bytea"))
      case t if t.endsWith("blob") => Some(MappedType(BinaryType, "bytea"))
      // spatial_mode (source_mysql.go:631-637): PostGIS native when the
      // feature block enables it; otherwise the fallback encodings, and
      // `off` makes spatial columns unsupported (unknown_as_text or
      // hard error) — exactly the reference's resolution order
      case "geometry" | "point" | "linestring" | "polygon" |
           "multipoint" | "multilinestring" | "multipolygon" |
           "geometrycollection" =>
        if (o.usePostGis) Some(MappedType(BinaryType, "geometry"))
        else o.spatialMode match {
          case "wkb_bytea" => Some(MappedType(BinaryType, "bytea"))
          case "wkt_text" => Some(MappedType(StringType, "text"))
          case _ => None
        }
      case _ => None
    }
  }

  private val spatialTypes = Set("geometry", "point", "linestring",
    "polygon", "multipoint", "multilinestring", "multipolygon",
    "geometrycollection")

  /** S5 scan-expression rewrite (reference `migrate.go:496-503`,
    * `mysqlPostGISSelectExpr` :520-531): spatial columns can't ship
    * raw when the target form needs server-side conversion.
    * - PostGIS mode: rebuild MySQL's internal encoding — 4-byte LE
    *   SRID prefix + WKB — from `ST_SRID` byte-split CHAR()s and
    *   `ST_AsWKB(g, 'axis-order=long-lat')` (axis option only where
    *   the server supports it), so geographic geometries arrive
    *   lng/lat-ordered regardless of MySQL 8's SRID-defined axis
    *   order; the Spark-side F12 transform then splices EWKB exactly
    *   as it does for raw bytes.
    * - wkt_text: `ST_AsText` at the source; the value crosses the
    *   wire as finished WKT.
    * wkb_bytea intentionally stays the plain column: the raw
    * SRID-prefixed payload IS the target encoding
    * (`source_mysql.go:816-820`).
    */
  override def scanExpr(c: SourceColumn, o: TypeOptions,
      caps: ScanCaps = ScanCaps()): String = {
    val q = quote(c.name)
    val dt = c.dataType.toLowerCase
    if (spatialTypes(dt) && o.usePostGis) {
      val wkb =
        if (caps.axisOrderExpr) s"ST_AsWKB($q, 'axis-order=long-lat')"
        else s"ST_AsWKB($q)"
      val srid = s"ST_SRID($q)"
      s"CONCAT(CHAR(($srid) & 255 USING binary), " +
        s"CHAR((($srid) >> 8) & 255 USING binary), " +
        s"CHAR((($srid) >> 16) & 255 USING binary), " +
        s"CHAR((($srid) >> 24) & 255 USING binary), $wkb) AS $q"
    } else if (spatialTypes(dt) && o.spatialMode == "wkt_text")
      s"ST_AsText($q) AS $q"
    else q
  }

  /** Parse the length of `base(n)` out of a MySQL column_type
    * (`source_mysql.go` mysqlColumnTypeLength).
    */
  private[graft] def typeLength(ct: String, base: String): Option[Int] = {
    val p = s"$base\\((\\d+)\\)".r
    p.findFirstMatchIn(ct).map(_.group(1).toInt)
  }
}

/** SQLite (reference `source_sqlite.go:723-813` affinity rules). */
object SqliteDialect extends SourceDialect {
  val name = "sqlite"
  def quote(i: String): String = "\"" + i.replace("\"", "\"\"") + "\""
  override def maxWorkers(requested: Int): Int = 1

  /** The reference forces `mode=ro` on the SQLite DSN
    * (`source_sqlite.go:37-48`) — the JDBC equivalent is
    * `open_mode=1` (SQLITE_OPEN_READONLY).
    */
  override def normalizeUrl(url: String): String =
    withParams(url, Seq("open_mode" -> "1"))

  def mapType(c: SourceColumn, o: TypeOptions): Option[MappedType] = {
    val t = c.dataType.toUpperCase
    if (t.isEmpty || t.contains("BLOB"))
      Some(MappedType(BinaryType, "bytea"))
    else if (t.contains("INT")) Some(MappedType(LongType, "bigint"))
    else if (t.contains("BOOLEAN")) Some(MappedType(BooleanType, "boolean"))
    else if (t.contains("DATETIME") || t.contains("TIMESTAMP"))
      Some(MappedType(TimestampNTZType, "timestamp"))
    else if (t.contains("DATE")) Some(MappedType(DateType, "date"))
    else if (t.contains("TIME")) Some(MappedType(StringType, "time"))
    else if (t.contains("JSON")) Some(MappedType(StringType,
      if (o.jsonAsJsonb) "jsonb" else "json"))
    else if (t.contains("NUMERIC") || t.contains("DECIMAL")) {
      val p = c.precision.getOrElse(10); val s = c.scale.getOrElse(0)
      Some(MappedType(DecimalType(p, s),
        if (c.scale.isDefined) s"numeric($p,$s)"
        else if (c.precision.isDefined) s"numeric($p)" else "numeric"))
    }
    else if (t.contains("REAL") || t.contains("DOUBLE") || t.contains("FLOA"))
      Some(MappedType(DoubleType, "double precision"))
    else if (t.contains("CHAR") || t.contains("TEXT") || t.contains("CLOB"))
      Some(MappedType(StringType, "text"))
    else None
  }
}

/** MSSQL (reference `source_mssql.go:605-724`). */
object MssqlDialect extends SourceDialect {
  val name = "mssql"
  def quote(i: String): String = "[" + i.replace("]", "]]") + "]"

  /** migrate.go:160-167 — requires ALLOW_SNAPSHOT_ISOLATION on the
    * source database, like the reference's hint says.
    */
  override def snapshotSessionSql: Seq[String] =
    Seq("SET TRANSACTION ISOLATION LEVEL SNAPSHOT")

  def mapType(c: SourceColumn, o: TypeOptions): Option[MappedType] = {
    val dtLower = c.dataType.toLowerCase
    dtLower match {
      case "int" => Some(MappedType(IntegerType, "integer"))
      case "bigint" => Some(MappedType(LongType, "bigint"))
      case "smallint" | "tinyint" => Some(MappedType(ShortType, "smallint"))
      case "bit" => Some(MappedType(BooleanType, "boolean"))
      case "decimal" | "numeric" =>
        val p = c.precision.getOrElse(18); val s = c.scale.getOrElse(0)
        Some(MappedType(DecimalType(p, s), s"numeric($p,$s)"))
      case "float" => Some(MappedType(DoubleType, "double precision"))
      case "real" => Some(MappedType(FloatType, "real"))
      // money_as_numeric (source_mssql.go:624-634, default true):
      // false falls back to text (exact string form, no precision loss)
      case "money" =>
        if (o.moneyAsNumeric)
          Some(MappedType(DecimalType(19, 4), "numeric(19,4)"))
        else Some(MappedType(StringType, "text"))
      case "smallmoney" =>
        if (o.moneyAsNumeric)
          Some(MappedType(DecimalType(10, 4), "numeric(10,4)"))
        else Some(MappedType(StringType, "text"))
      case "char" =>
        Some(MappedType(StringType,
          c.charMaxLen.filter(_ > 0).map(n => s"char($n)")
            .getOrElse("char(1)")))
      // nvarchar_as_text (source_mssql.go:649-664) also covers nchar
      case "nchar" =>
        if (o.nvarcharAsText) Some(MappedType(StringType, "text"))
        else Some(MappedType(StringType,
          c.charMaxLen.filter(_ > 0).map(n => s"char($n)")
            .getOrElse("char(1)")))
      case "varchar" | "nvarchar" =>
        if (o.nvarcharAsText && dtLower == "nvarchar")
          Some(MappedType(StringType, "text"))
        else Some(MappedType(StringType, c.charMaxLen match {
          case Some(-1) | None => "text" // (max)
          case Some(n) => s"varchar($n)"
        }))
      case "text" | "ntext" => Some(MappedType(StringType, "text"))
      // xml_as_text (source_mssql.go:697-701): native xml by default
      case "xml" =>
        Some(MappedType(StringType, if (o.xmlAsText) "text" else "xml"))
      case "binary" | "varbinary" | "image" | "timestamp" | "rowversion" =>
        Some(MappedType(BinaryType, "bytea"))
      case "date" => Some(MappedType(DateType, "date"))
      case "time" => Some(MappedType(StringType, "time"))
      case "datetime" | "datetime2" | "smalldatetime" =>
        if (o.datetimeAsTimestamptz)
          Some(MappedType(TimestampType, "timestamptz"))
        else Some(MappedType(TimestampNTZType, "timestamp"))
      case "datetimeoffset" => Some(MappedType(TimestampType, "timestamptz"))
      case "uniqueidentifier" => Some(MappedType(StringType, "uuid"))
      case "sql_variant" | "hierarchyid" => Some(MappedType(StringType, "text"))
      // spatial_mode (source_mssql.go:712-724): no PostGIS path for
      // MSSQL; off → unsupported (unknown_as_text or hard error)
      case "geography" | "geometry" => o.spatialMode match {
        case "wkb_bytea" => Some(MappedType(BinaryType, "bytea"))
        case "wkt_text" => Some(MappedType(StringType, "text"))
        case _ => None
      }
      case _ => None
    }
  }

  /** S5 scan-expression rewrite (reference `migrate.go:505-516`):
    * MSSQL's CLR types don't round-trip through the TDS wire in
    * target form — hierarchyid arrives as opaque varbinary,
    * geography/geometry as the internal CLR serialization,
    * sql_variant as whatever the driver guesses. The method-call /
    * CAST rewrites make the SERVER render the target encoding:
    * `.ToString()` (the canonical `/1/2/` path), `.STAsText()` WKT,
    * `.STAsBinary()` OGC WKB (no SRID prefix — MSSQL keeps SRID out
    * of band, so no F12 splice applies), `CAST(… AS nvarchar(max))`.
    */
  override def scanExpr(c: SourceColumn, o: TypeOptions,
      caps: ScanCaps = ScanCaps()): String = {
    val q = quote(c.name)
    c.dataType.toLowerCase match {
      case "hierarchyid" => s"$q.ToString() AS $q"
      case "geography" | "geometry" if o.spatialMode == "wkt_text" =>
        s"$q.STAsText() AS $q"
      case "geography" | "geometry" if o.spatialMode == "wkb_bytea" =>
        s"$q.STAsBinary() AS $q"
      case "sql_variant" => s"CAST($q AS nvarchar(max)) AS $q"
      case _ => q
    }
  }
}

/** Parquet lakehouse "dialect" (ours — S10): types are already Spark
  * types; mapping is identity.
  */
object ParquetDialect extends SourceDialect {
  val name = "parquet"
  def quote(i: String): String = "`" + i.replace("`", "``") + "`"
  def mapType(c: SourceColumn, o: TypeOptions): Option[MappedType] =
    Some(MappedType(StringType, "text"))
}

/** Generic JDBC dialect (ours — beyond the reference's three engines):
  * standard SQL type names as reported by `DatabaseMetaData`, so ANY
  * JDBC database can act as a source via
  * [[Introspection.fromJdbcMetadata]]. Double-quote identifier quoting
  * per the SQL standard.
  */
object GenericJdbcDialect extends SourceDialect {
  val name = "jdbc"
  def quote(i: String): String = "\"" + i.replace("\"", "\"\"") + "\""

  def mapType(c: SourceColumn, o: TypeOptions): Option[MappedType] = {
    val t = c.dataType.toLowerCase
    t match {
      case "tinyint" | "smallint" => Some(MappedType(ShortType, "smallint"))
      case "int" | "integer" => Some(MappedType(IntegerType, "integer"))
      case "bigint" => Some(MappedType(LongType, "bigint"))
      case "boolean" | "bool" => Some(MappedType(BooleanType, "boolean"))
      case "real" => Some(MappedType(FloatType, "real"))
      case "float" | "double" | "double precision" =>
        Some(MappedType(DoubleType, "double precision"))
      case "decimal" | "numeric" =>
        val p = c.precision.getOrElse(18); val s = c.scale.getOrElse(0)
        Some(MappedType(DecimalType(p, s), s"numeric($p,$s)"))
      case "char" | "character" =>
        Some(MappedType(StringType,
          c.charMaxLen.map(n => s"char($n)").getOrElse("text")))
      case "varchar" | "character varying" | "longvarchar" =>
        Some(MappedType(StringType,
          c.charMaxLen.map(n => s"varchar($n)").getOrElse("text")))
      case "clob" | "text" => Some(MappedType(StringType, "text"))
      case "date" => Some(MappedType(DateType, "date"))
      case "time" => Some(MappedType(StringType, "time"))
      case "timestamp" => Some(MappedType(TimestampNTZType, "timestamp"))
      case "binary" | "varbinary" | "longvarbinary" | "blob" =>
        Some(MappedType(BinaryType, "bytea"))
      case _ => None
    }
  }
}

object SourceDialect {
  val registry: Map[String, SourceDialect] = Map(
    MySqlDialect.name -> MySqlDialect,
    SqliteDialect.name -> SqliteDialect,
    MssqlDialect.name -> MssqlDialect,
    ParquetDialect.name -> ParquetDialect,
    GenericJdbcDialect.name -> GenericJdbcDialect)

  def apply(name: String): SourceDialect =
    registry.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(s"unknown source dialect: $name"))
}
