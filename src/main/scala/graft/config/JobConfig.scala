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
    targetUrl: String = "",
    targetSchema: String = "public",
    mode: String = "parallel",            // parallel | single_tx
    workers: Int = JobConfig.defaultWorkers,
    indexWorkers: Int = JobConfig.defaultWorkers,
    chunkSize: Long = 100000L,
    resume: Boolean = false,
    recreate: Boolean = false,
    schemaOnly: Boolean = false,
    dataOnly: Boolean = false,
    unloggedTables: Boolean = true,
    cleanOrphans: Boolean = true,         // config.go:131
    addUnsignedChecks: Boolean = false,
    replicateOnUpdateCurrentTimestamp: Boolean = false,
    validation: String = "row_count",     // row_count | checksum | none
    snakeCaseIdentifiers: Boolean = true,
    typeOptions: TypeOptions = TypeOptions(),
    hooks: Map[String, Seq[String]] = Map.empty) // phase → sql files

object JobConfig {
  def defaultWorkers: Int =
    math.min(Runtime.getRuntime.availableProcessors(), 8) // config.go:329-338

  val phases = Seq("before_data", "after_data", "before_fk", "after_all")

  private val knownKeys = Set(
    "source.dialect", "source.url", "target.url", "target.schema",
    "mode", "workers", "index_workers", "chunk_size", "resume", "recreate",
    "schema_only", "data_only", "unlogged_tables", "clean_orphans",
    "add_unsigned_checks", "replicate_on_update_current_timestamp",
    "validation", "snake_case_identifiers",
    "types.tinyint1_as_boolean", "types.widen_unsigned_integers",
    "types.varchar_as_text", "types.binary16_as_uuid",
    "types.string_uuid_as_uuid", "types.json_as_jsonb",
    "types.unknown_as_text") ++ phases.map(p => s"hooks.$p")

  /** Parse + validate. Error messages mirror the reference's conflicts:
    * resume×recreate, schema_only×data_only, resume×schema_only,
    * worker bounds, mode values (`config.go:137-319`).
    */
  def fromToml(text: String): JobConfig = {
    val parsed = Toml.parse(text)
    val unknown = parsed.keySet.diff(knownKeys)
    require(unknown.isEmpty,
      s"unknown config keys: ${unknown.toSeq.sorted.mkString(", ")}")

    val kv = parsed.view.mapValues(_.scalar).toMap
    def bool(k: String, d: Boolean) = kv.get(k).map(_.toBoolean).getOrElse(d)
    def int(k: String, d: Int) = kv.get(k).map(_.toInt).getOrElse(d)

    val cfg = JobConfig(
      sourceDialect = kv.getOrElse("source.dialect", "mysql"),
      sourceUrl = kv.getOrElse("source.url", ""),
      targetUrl = kv.getOrElse("target.url", ""),
      targetSchema = kv.getOrElse("target.schema", "public"),
      mode = kv.getOrElse("mode", "parallel"),
      workers = int("workers", defaultWorkers),
      indexWorkers = int("index_workers", int("workers", defaultWorkers)),
      chunkSize = kv.get("chunk_size").map(_.toLong).getOrElse(100000L),
      resume = bool("resume", d = false),
      recreate = bool("recreate", d = false),
      schemaOnly = bool("schema_only", d = false),
      dataOnly = bool("data_only", d = false),
      unloggedTables = bool("unlogged_tables", d = true),
      cleanOrphans = bool("clean_orphans", d = true),
      addUnsignedChecks = bool("add_unsigned_checks", d = false),
      replicateOnUpdateCurrentTimestamp =
        bool("replicate_on_update_current_timestamp", d = false),
      validation = kv.getOrElse("validation", "row_count"),
      snakeCaseIdentifiers = bool("snake_case_identifiers", d = true),
      typeOptions = TypeOptions(
        tinyint1AsBoolean = bool("types.tinyint1_as_boolean", d = true),
        widenUnsignedIntegers =
          bool("types.widen_unsigned_integers", d = true),
        varcharAsText = bool("types.varchar_as_text", d = false),
        binary16AsUuid = bool("types.binary16_as_uuid", d = false),
        stringUuidAsUuid = bool("types.string_uuid_as_uuid", d = false),
        jsonAsJsonb = bool("types.json_as_jsonb", d = true),
        unknownAsText = bool("types.unknown_as_text", d = false)),
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
  }
}
