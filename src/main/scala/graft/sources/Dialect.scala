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
    generationExpression: String = "") // non-empty = generated column

/** Mapped result: Spark type for the engine + PG DDL type for the sink. */
final case class MappedType(spark: DataType, pg: String)

/** Type-mapping option flags (reference `config.go:340-360` defaults). */
final case class TypeOptions(
    tinyint1AsBoolean: Boolean = true,
    widenUnsignedIntegers: Boolean = true,
    varcharAsText: Boolean = false,
    binary16AsUuid: Boolean = false,
    stringUuidAsUuid: Boolean = false,
    jsonAsJsonb: Boolean = true,
    unknownAsText: Boolean = false)

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
      case "enum" => Some(MappedType(StringType, "text"))
      case "set" => Some(MappedType(ArrayType(StringType), "text[]"))
      case "timestamp" => Some(MappedType(TimestampType, "timestamptz"))
      case "datetime" => Some(MappedType(TimestampNTZType, "timestamp"))
      case "date" => Some(MappedType(DateType, "date"))
      case "year" => Some(MappedType(IntegerType, "integer"))
      case "time" => Some(MappedType(StringType, "time"))
      case "bit" => Some(MappedType(BinaryType, "bytea"))
      case "binary" | "varbinary" => Some(MappedType(BinaryType, "bytea"))
      case t if t.endsWith("blob") => Some(MappedType(BinaryType, "bytea"))
      case "geometry" | "point" | "linestring" | "polygon" |
           "multipoint" | "multilinestring" | "multipolygon" |
           "geometrycollection" =>
        Some(MappedType(BinaryType, "geometry"))
      case _ => None
    }
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
    c.dataType.toLowerCase match {
      case "int" => Some(MappedType(IntegerType, "integer"))
      case "bigint" => Some(MappedType(LongType, "bigint"))
      case "smallint" | "tinyint" => Some(MappedType(ShortType, "smallint"))
      case "bit" => Some(MappedType(BooleanType, "boolean"))
      case "decimal" | "numeric" =>
        val p = c.precision.getOrElse(18); val s = c.scale.getOrElse(0)
        Some(MappedType(DecimalType(p, s), s"numeric($p,$s)"))
      case "float" => Some(MappedType(DoubleType, "double precision"))
      case "real" => Some(MappedType(FloatType, "real"))
      case "money" => Some(MappedType(DecimalType(19, 4), "numeric(19,4)"))
      case "smallmoney" =>
        Some(MappedType(DecimalType(10, 4), "numeric(10,4)"))
      case "char" | "nchar" =>
        Some(MappedType(StringType,
          c.charMaxLen.filter(_ > 0).map(n => s"char($n)").getOrElse("text")))
      case "varchar" | "nvarchar" =>
        Some(MappedType(StringType, c.charMaxLen match {
          case Some(-1) | None => "text" // (max)
          case Some(n) => s"varchar($n)"
        }))
      case "text" | "ntext" | "xml" => Some(MappedType(StringType, "text"))
      case "binary" | "varbinary" | "image" | "timestamp" | "rowversion" =>
        Some(MappedType(BinaryType, "bytea"))
      case "date" => Some(MappedType(DateType, "date"))
      case "time" => Some(MappedType(StringType, "time"))
      case "datetime" | "datetime2" | "smalldatetime" =>
        Some(MappedType(TimestampNTZType, "timestamp"))
      case "datetimeoffset" => Some(MappedType(TimestampType, "timestamptz"))
      case "uniqueidentifier" => Some(MappedType(StringType, "uuid"))
      case "sql_variant" | "hierarchyid" => Some(MappedType(StringType, "text"))
      case "geography" | "geometry" => Some(MappedType(BinaryType, "bytea"))
      case _ => None
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
