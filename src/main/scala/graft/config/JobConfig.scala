package graft.config

import graft.sources.TypeOptions

/** Minimal TOML subset parser — enough for the reference's migration
  * config surface (`config.go:14-39`): top-level and `[section]` scoped
  * `key = value` pairs with string / integer / boolean / string-array
  * values and `#` comments. Unknown keys are surfaced to the caller so
  * config validation can reject them (the reference hard-rejects unknown
  * keys, `config.go:95-120`).
  */
object Toml {
  /** A parsed TOML value: a scalar (string/int/bool, kept as its string
    * form) or a string array. Arrays keep element boundaries — a quoted
    * element may contain commas (the previous split-then-strip approach
    * corrupted `["a,b.sql"]` into two bogus entries).
    */
  sealed trait Value { def scalar: String }
  final case class Str(s: String) extends Value { def scalar: String = s }
  final case class Arr(items: Seq[String]) extends Value {
    def scalar: String = items.mkString(",")
  }

  def parse(text: String): Map[String, Value] = {
    var section = ""
    val out = Map.newBuilder[String, Value]
    text.linesIterator.zipWithIndex.foreach { case (raw, ln) =>
      val line = stripComment(raw).trim
      if (line.nonEmpty) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
          require(section.nonEmpty, s"line ${ln + 1}: empty section name")
        } else {
          val eq = line.indexOf('=')
          require(eq > 0, s"line ${ln + 1}: expected key = value: $line")
          val key = line.substring(0, eq).trim
          val value = parseValue(line.substring(eq + 1).trim, ln + 1)
          out += (if (section.isEmpty) key else s"$section.$key") -> value
        }
      }
    }
    out.result()
  }

  private def stripComment(line: String): String = {
    var inStr = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inStr = !inStr
      else if (c == '#' && !inStr) return line.substring(0, i)
      i += 1
    }
    line
  }

  private def parseValue(v: String, ln: Int): Value = {
    if (v.startsWith("\"") && v.endsWith("\"") && v.length >= 2)
      Str(v.substring(1, v.length - 1))
    else if (v.startsWith("[") && v.endsWith("]"))
      Arr(splitArray(v.substring(1, v.length - 1), ln)
        .map(e => parseValue(e, ln).scalar))
    else Str(v)
  }

  /** Split array elements on commas OUTSIDE quotes, so quoted elements
    * containing commas survive intact.
    */
  private def splitArray(body: String, ln: Int): Seq[String] = {
    val items = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inStr = false
    body.foreach { c =>
      if (c == '"') { inStr = !inStr; cur += c }
      else if (c == ',' && !inStr) { items += cur.toString.trim; cur.clear() }
      else cur += c
    }
    require(!inStr, s"line $ln: unterminated string in array")
    items += cur.toString.trim
    items.result().filter(_.nonEmpty)
  }
}

/** Job specification mirroring the reference's MigrationConfig
  * (`config.go:14-39`) with its defaulting (`config.go:121-136`) and
  * cross-field validation matrix (`config.go:137-319`).
  */
final case class JobConfig(
    sourceDialect: String = "mysql",
    sourceUrl: String = "",
    sourceCharset: String = "utf8mb4",    // MySQL-only (config.go:276-289)
    sourceSchema: String = "",            // MSSQL-only, defaults to dbo
    targetUrl: String = "",
    targetSchema: String = "public",
    mode: String = "parallel",            // parallel | single_tx
    workers: Int = JobConfig.defaultWorkers,
    indexWorkers: Int = JobConfig.defaultWorkers,
    chunkSize: Long = 100000L,
    resume: Boolean = false,
    recreate: Boolean = false,            // = on_schema_exists "recreate"
    schemaOnly: Boolean = false,
    dataOnly: Boolean = false,
    unloggedTables: Boolean = true,
    preserveDefaults: Boolean = true,     // config.go:130
    cleanOrphans: Boolean = true,         // config.go:131
    addUnsignedChecks: Boolean = false,
    replicateOnUpdateCurrentTimestamp: Boolean = false,
    validation: String = "row_count",     // row_count | checksum | none
    snakeCaseIdentifiers: Boolean = true,
    postgisEnabled: Boolean = false,      // [postgis] block (config.go)
    postgisCreateExtension: Boolean = false,
    typeOptions: TypeOptions = TypeOptions(),
    hooks: Map[String, Seq[String]] = Map.empty) // phase → sql files

object JobConfig {
  def defaultWorkers: Int =
    math.min(Runtime.getRuntime.availableProcessors(), 8) // config.go:329-338

  val phases = Seq("before_data", "after_data", "before_fk", "after_all")

  /** Boolean type_mapping keys, each accepted under the reference's
    * `type_mapping.` section AND the engine's legacy `types.` alias.
    */
  private val tmBoolKeys = Seq(
    "tinyint1_as_boolean", "binary16_as_uuid", "datetime_as_timestamptz",
    "json_as_jsonb", "widen_unsigned_integers", "varchar_as_text",
    "sanitize_json_null_bytes", "unknown_as_text", "ci_as_citext",
    "string_uuid_as_uuid", "nvarchar_as_text", "money_as_numeric",
    "xml_as_text")
  private val tmStringKeys = Seq(
    "enum_mode", "set_mode", "collation_mode", "bit_mode",
    "binary16_uuid_mode", "time_mode", "zero_date_mode", "spatial_mode")

  private val knownKeys = Set(
    // engine-native names
    "source.dialect", "source.url", "target.url", "target.schema",
    "mode", "recreate",
    // reference-parity aliases (config.go:14-39 toml tags)
    "source.type", "source.dsn", "source.charset", "source.source_schema",
    "target.dsn", "schema", "on_schema_exists", "source_snapshot_mode",
    "postgis.enabled", "postgis.create_extension",
    // shared names
    "workers", "index_workers", "chunk_size", "resume",
    "schema_only", "data_only", "unlogged_tables", "preserve_defaults",
    "clean_orphans", "add_unsigned_checks",
    "replicate_on_update_current_timestamp",
    "validation", "snake_case_identifiers") ++
    phases.map(p => s"hooks.$p") ++
    tmBoolKeys.flatMap(k => Seq(s"type_mapping.$k", s"types.$k")) ++
    tmStringKeys.map(k => s"type_mapping.$k")

  /** Parse + validate. Error messages mirror the reference's conflicts:
    * resume×recreate, schema_only×data_only, resume×schema_only,
    * worker bounds, mode values, type-mapping mode enums and
    * source-specific rejections (`config.go:95-319`).
    */
  def fromToml(text: String): JobConfig = {
    val parsed = Toml.parse(text)
    // [type_mapping.collation_map] carries user-chosen collation names
    // as keys — any key under it is legal (config.go:78)
    val unknown = parsed.keySet.filterNot(_.startsWith(
      "type_mapping.collation_map.")).diff(knownKeys)
    require(unknown.isEmpty,
      s"unknown config keys: ${unknown.toSeq.sorted.mkString(", ")}")

    val kv = parsed.view.mapValues(_.scalar).toMap
    def bool(k: String, d: Boolean) = kv.get(k).map(_.toBoolean).getOrElse(d)
    def int(k: String, d: Int) = kv.get(k).map(_.toInt).getOrElse(d)
    def str(keys: Seq[String], d: String) =
      keys.flatMap(kv.get).headOption.getOrElse(d)
    // reference name first, then the engine's legacy alias
    def tmBool(k: String, d: Boolean) =
      kv.get(s"type_mapping.$k").orElse(kv.get(s"types.$k"))
        .map(_.toBoolean).getOrElse(d)
    def tmStr(k: String, d: String) = kv.getOrElse(s"type_mapping.$k", d)

    val dialect = str(Seq("source.type", "source.dialect"), "mysql")
    val collationMap = parsed.collect {
      case (k, v) if k.startsWith("type_mapping.collation_map.") =>
        k.stripPrefix("type_mapping.collation_map.") -> v.scalar
    }
    val onSchemaExists = kv.getOrElse("on_schema_exists",
      if (bool("recreate", d = false)) "recreate" else "error")
    require(Set("error", "recreate")(onSchemaExists),
      s"on_schema_exists must be one of: error, recreate " +
        s"(got '$onSchemaExists')")
    val mode = kv.get("source_snapshot_mode") match {
      case Some("none") => "parallel"
      case Some("single_tx") => "single_tx"
      case Some(other) => throw new IllegalArgumentException(
        s"source_snapshot_mode must be one of: none, single_tx " +
          s"(got '$other')")
      case None => kv.getOrElse("mode", "parallel")
    }

    // a non-default MySQL charset rides the JDBC URL from here on —
    // every downstream normalizeUrl() sees the key already present and
    // leaves it alone (the reference threads Charset into its DSN the
    // same way, source_mysql.go:52-70)
    val rawUrl = str(Seq("source.dsn", "source.url"), "")
    val charset = kv.getOrElse("source.charset", "utf8mb4")
    val urlWithCharset =
      if (dialect == "mysql" && charset != "utf8mb4" && rawUrl.nonEmpty &&
          !rawUrl.contains("characterEncoding="))
        rawUrl + (if (rawUrl.contains("?")) "&" else "?") +
          s"characterEncoding=$charset"
      else rawUrl

    val cfg = JobConfig(
      sourceDialect = dialect,
      sourceUrl = urlWithCharset,
      sourceCharset = charset,
      sourceSchema = kv.getOrElse("source.source_schema",
        if (dialect == "mssql") "dbo" else ""),
      targetUrl = str(Seq("target.dsn", "target.url"), ""),
      targetSchema = str(Seq("schema", "target.schema"), "public"),
      mode = mode,
      workers = int("workers", defaultWorkers),
      indexWorkers = int("index_workers", int("workers", defaultWorkers)),
      chunkSize = kv.get("chunk_size").map(_.toLong).getOrElse(100000L),
      resume = bool("resume", d = false),
      recreate = onSchemaExists == "recreate",
      schemaOnly = bool("schema_only", d = false),
      dataOnly = bool("data_only", d = false),
      unloggedTables = bool("unlogged_tables", d = true),
      preserveDefaults = bool("preserve_defaults", d = true),
      cleanOrphans = bool("clean_orphans", d = true),
      addUnsignedChecks = bool("add_unsigned_checks", d = false),
      replicateOnUpdateCurrentTimestamp =
        bool("replicate_on_update_current_timestamp", d = false),
      validation = kv.getOrElse("validation", "row_count"),
      snakeCaseIdentifiers = bool("snake_case_identifiers", d = true),
      postgisEnabled = bool("postgis.enabled", d = false),
      postgisCreateExtension = bool("postgis.create_extension", d = false),
      typeOptions = TypeOptions(
        tinyint1AsBoolean = tmBool("tinyint1_as_boolean", d = false),
        binary16AsUuid = tmBool("binary16_as_uuid", d = false),
        datetimeAsTimestamptz =
          tmBool("datetime_as_timestamptz", d = false),
        jsonAsJsonb = tmBool("json_as_jsonb", d = true),
        enumMode = tmStr("enum_mode", ""),
        setMode = tmStr("set_mode", "text"),
        widenUnsignedIntegers =
          tmBool("widen_unsigned_integers", d = true),
        varcharAsText = tmBool("varchar_as_text", d = false),
        sanitizeJsonNullBytes =
          tmBool("sanitize_json_null_bytes", d = true),
        unknownAsText = tmBool("unknown_as_text", d = false),
        collationMode = tmStr("collation_mode", "none"),
        collationMap = collationMap,
        ciAsCitext = tmBool("ci_as_citext", d = false),
        bitMode = tmStr("bit_mode", "bytea"),
        stringUuidAsUuid = tmBool("string_uuid_as_uuid", d = false),
        binary16UuidMode = tmStr("binary16_uuid_mode", "rfc4122"),
        timeMode = tmStr("time_mode", "time"),
        zeroDateMode = tmStr("zero_date_mode", "null"),
        spatialMode = tmStr("spatial_mode", "off"),
        nvarcharAsText = tmBool("nvarchar_as_text", d = false),
        moneyAsNumeric = tmBool("money_as_numeric", d = true),
        xmlAsText = tmBool("xml_as_text", d = false),
        usePostGis = bool("postgis.enabled", d = false)),
      hooks = phases.flatMap(p => parsed.get(s"hooks.$p").map {
        case Toml.Arr(items) => p -> items
        case Toml.Str(s) => p -> Seq(s).filter(_.nonEmpty)
      }).toMap)
    validate(cfg)
    cfg
  }

  def validate(c: JobConfig): Unit = {
    require(Set("parallel", "single_tx")(c.mode),
      s"invalid mode '${c.mode}' (parallel|single_tx)")
    require(Set("row_count", "checksum", "none")(c.validation),
      s"invalid validation '${c.validation}' (row_count|checksum|none)")
    require(c.workers >= 1 && c.workers <= 64,
      s"workers must be in [1,64], got ${c.workers}")
    require(c.indexWorkers >= 1 && c.indexWorkers <= 64,
      s"index_workers must be in [1,64], got ${c.indexWorkers}")
    require(c.chunkSize >= 1, s"chunk_size must be >= 1, got ${c.chunkSize}")
    require(!(c.resume && c.recreate),
      "resume and recreate are mutually exclusive")
    require(!(c.schemaOnly && c.dataOnly),
      "schema_only and data_only are mutually exclusive")
    require(!(c.resume && c.schemaOnly),
      "resume has no effect with schema_only")
    require(!(c.mode == "single_tx" && c.resume),
      "resume is not supported in single_tx mode")
    require(!(c.resume && c.unloggedTables),
      "resume requires unlogged_tables = false: an UNLOGGED table is " +
        "truncated on crash recovery, so resumed chunks would land in " +
        "empty tables (reference config.go:55)")
    require(graft.sources.SourceDialect.registry.contains(c.sourceDialect),
      s"unknown source dialect: ${c.sourceDialect}")
    require(c.targetSchema.trim.nonEmpty, "schema is required")
    // type_mapping mode values + source-specific rejections
    // (config.go:180-238 + the ValidateTypeMapping vtables)
    c.typeOptions.validateModes()
    c.typeOptions.validateForSource(c.sourceDialect)
    // [postgis] feature block (config.go:265-275)
    require(!(c.postgisCreateExtension && !c.postgisEnabled),
      "postgis.create_extension requires postgis.enabled = true")
    require(!(c.postgisEnabled && c.sourceDialect != "mysql"),
      "postgis is currently only supported for mysql sources")
    require(!(c.postgisEnabled && c.typeOptions.spatialMode != "off"),
      s"postgis.enabled is incompatible with type_mapping.spatial_mode " +
        s"= '${c.typeOptions.spatialMode}'; set spatial_mode = \"off\" " +
        "because native PostGIS migration replaces the fallback " +
        "spatial modes")
    // charset is a MySQL-only option (config.go:283-289)
    require(c.sourceDialect == "mysql" || c.sourceCharset == "utf8mb4",
      "source.charset is a MySQL-only option")
    // single_tx needs a snapshot-capable source
    // (config.go:278-282; source_sqlite.go:172)
    require(!(c.mode == "single_tx" && c.sourceDialect == "sqlite"),
      "source_snapshot_mode \"single_tx\" is not supported for sqlite " +
        "sources")
  }
}
