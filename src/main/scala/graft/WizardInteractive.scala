package graft

import graft.config.JobConfig
import graft.sources.TypeOptions
import java.io.{BufferedReader, PrintWriter}

/** Interactive TTY config wizard — the reference's `pgferry wizard`
  * prompt flow (`wizard.go:54-141` runGenerateWizard,
  * `wizard.go:143-430` collectGeneratedConfig) over this engine's
  * config surface. Reads prompts from any `BufferedReader`, so tests
  * script the whole flow through a string.
  *
  * Prompt mechanics mirror the reference (`wizard.go:895-1060`): every
  * prompt shows a `[default]`, empty input accepts it, invalid input
  * re-prompts, choices list their keys with help text.
  */
final class WizardPrompter(in: BufferedReader, out: PrintWriter) {
  private var blocks = 0
  private def startBlock(): Unit = { if (blocks > 0) out.println(); blocks += 1 }

  private def readLine(): String = {
    val line = in.readLine()
    if (line == null)
      throw new IllegalStateException("input closed mid-wizard")
    line.trim
  }

  private def input(label: String, default: String): String = {
    out.print(if (default.isEmpty) s"$label: " else s"$label [$default]: ")
    out.flush()
    val v = readLine()
    if (v.isEmpty) default else v
  }

  def promptString(label: String, default: String,
      validate: String => Option[String] = _ => None): String = {
    startBlock()
    var result: Option[String] = None
    while (result.isEmpty) {
      val v = input(label, default)
      validate(v) match {
        case Some(err) => out.println(err)
        case None => result = Some(v)
      }
    }
    result.get
  }

  def promptStringGuided(label: String, default: String, guide: String,
      validate: String => Option[String] = _ => None): String = {
    startBlock()
    out.println(label)
    out.println(s"  $guide")
    var result: Option[String] = None
    while (result.isEmpty) {
      val v = input("Value", default)
      validate(v) match {
        case Some(err) => out.println(err)
        case None => result = Some(v)
      }
    }
    result.get
  }

  def promptBool(label: String, default: Boolean,
      guide: String = ""): Boolean = {
    startBlock()
    if (guide.nonEmpty) { out.println(label); out.println(s"  $guide") }
    val hint = if (default) "Y/n" else "y/N"
    val target = if (guide.nonEmpty) "Value" else label
    var result: Option[Boolean] = None
    while (result.isEmpty) {
      out.print(s"$target [$hint]: ")
      out.flush()
      readLine().toLowerCase match {
        case "" => result = Some(default)
        case "y" | "yes" | "true" => result = Some(true)
        case "n" | "no" | "false" => result = Some(false)
        case other => out.println(s"Please answer y or n, got '$other'.")
      }
    }
    result.get
  }

  def promptChoice(label: String, options: Seq[(String, String)],
      default: String): String = {
    startBlock()
    out.println(label)
    options.foreach { case (key, help) =>
      out.println(if (help.isEmpty) s"  - $key" else s"  - $key: $help")
    }
    var result: Option[String] = None
    while (result.isEmpty) {
      val v = input("Choice", default)
      if (options.exists(_._1 == v)) result = Some(v)
      else out.println(
        s"Choose one of: ${options.map(_._1).mkString(", ")}")
    }
    result.get
  }

  def promptInt(label: String, default: Int, min: Int,
      guide: String = ""): Int = {
    startBlock()
    if (guide.nonEmpty) { out.println(label); out.println(s"  $guide") }
    val target = if (guide.nonEmpty) "Value" else label
    var result: Option[Int] = None
    while (result.isEmpty) {
      val v = input(target, default.toString)
      v.toIntOption match {
        case Some(n) if n >= min => result = Some(n)
        case _ => out.println(s"Enter an integer >= $min.")
      }
    }
    result.get
  }

  def say(line: String): Unit = out.println(line)
}

object WizardInteractive {

  private def required(v: String): Option[String] =
    if (v.isEmpty) Some("A value is required.") else None

  /** The reference's question sequence (`wizard.go:143-430`) mapped to
    * this engine's JobConfig: dialect → DSNs → schema → mode →
    * recreate → snapshot mode → per-dialect knobs → type toggles.
    */
  def collect(w: WizardPrompter): JobConfig = {
    val dialect = w.promptChoice("Source type", Seq(
      ("mysql", ""), ("sqlite", ""), ("mssql", ""),
      ("jdbc", "any other JDBC database via generic metadata")),
      "mysql")
    val srcExample = dialect match {
      case "mysql" => "jdbc:mysql://host:3306/mydb"
      case "sqlite" => "jdbc:sqlite:/path/to/db.sqlite"
      case "mssql" => "jdbc:sqlserver://host:1433;databaseName=mydb"
      case _ => "jdbc:<driver>://host/db"
    }
    val srcUrl = w.promptStringGuided("Source JDBC URL", "",
      s"Example: $srcExample", required)
    val tgtUrl = w.promptStringGuided("Target PostgreSQL JDBC URL", "",
      "Example: jdbc:postgresql://host:5432/mydb", required)
    val schema = w.promptStringGuided("Target schema", "public",
      "Creates or loads into this PostgreSQL schema.", required)
    val loadMode = w.promptChoice("Migration mode", Seq(
      ("full", "Create tables, copy rows, then add constraints."),
      ("schema_only", "Create the target schema without copying data."),
      ("data_only", "Copy rows into existing compatible tables.")),
      "full")
    val recreate = w.promptBool("Drop and recreate existing target tables",
      default = false,
      guide = "Destructive: equivalent of the reference's " +
        "on_schema_exists=recreate. Off = fail on an existing table.")
    // sqlite reads single-connection; parallel snapshot modes are
    // mysql/mssql-only (reference wizard.go:197-209)
    val mode =
      if (dialect == "sqlite") "parallel"
      else w.promptChoice("Source snapshot mode", Seq(
        ("parallel", "Fastest. Workers read independently."),
        ("single_tx", "One sequential read for a consistent snapshot.")),
        "parallel")
    val unlogged =
      if (loadMode != "full") false
      else w.promptBool("Use UNLOGGED tables during bulk load",
        default = true,
        guide = "Speeds up large loads by reducing WAL; switched back " +
          "to LOGGED after the copy.")
    val snake = w.promptBool("Convert identifiers to snake_case",
      default = true,
      guide = "OrderItems -> order_items. If off, names are only " +
        "lowercased.")
    val cleanOrphans =
      if (loadMode == "schema_only") true
      else w.promptBool("Clean orphaned rows before adding foreign keys",
        default = true,
        guide = "Deletes rows that would break FK creation.")
    val workers =
      if (dialect == "sqlite") 1
      else w.promptInt("Parallel workers", JobConfig.defaultWorkers, 1,
        guide = "More workers = faster copy, more load on both ends.")
    val jsonb = w.promptBool("Map JSON columns to jsonb", default = true)
    val unknownAsText = w.promptBool(
      "Map unknown column types to text instead of failing",
      default = false)
    val tinyint1 = dialect == "mysql" &&
      w.promptBool("Map tinyint(1) to boolean", default = true)
    val bin16 = dialect != "sqlite" &&
      w.promptBool("Map binary(16) columns to uuid", default = false)
    val strUuid = w.promptBool("Map char(36) UUID strings to uuid",
      default = false)
    JobConfig(
      sourceDialect = dialect,
      sourceUrl = srcUrl,
      targetUrl = tgtUrl,
      targetSchema = schema,
      mode = mode,
      workers = workers,
      schemaOnly = loadMode == "schema_only",
      dataOnly = loadMode == "data_only",
      recreate = recreate,
      unloggedTables = unlogged,
      cleanOrphans = cleanOrphans,
      snakeCaseIdentifiers = snake,
      typeOptions = TypeOptions(
        tinyint1AsBoolean = tinyint1,
        binary16AsUuid = bin16,
        stringUuidAsUuid = strUuid,
        jsonAsJsonb = jsonb,
        unknownAsText = unknownAsText))
  }

  /** Full flow: collect → render → optional save → next step. Returns
    * (config, saved path, next step) so callers/tests can act on it.
    * `planner`/`runner` are injectable for tests (the reference wires
    * its real plan/migrate entry points, `wizard.go:117-140`).
    */
  def run(in: BufferedReader, out: PrintWriter,
      planner: JobConfig => Unit = _ => (),
      runner: JobConfig => Unit = _ => ())
      : (JobConfig, Option[java.nio.file.Path], String) = {
    val w = new WizardPrompter(in, out)
    w.say("graft config wizard")
    w.say("Press Enter to accept the default shown in brackets.")
    val cfg = collect(w)
    JobConfig.validate(cfg)
    val toml = Wizard.render(cfg)
    // round-trip check: the emitted TOML must parse back identically
    require(JobConfig.fromToml(toml) == cfg, "wizard round-trip mismatch")
    w.say("Generated config:")
    w.say(toml)
    w.say("Advanced options not covered by the wizard " +
      "(add manually to the TOML): resume, validation, chunk_size, " +
      "index_workers, hooks, unsigned checks, on-update triggers.")
    val save = w.promptBool("Save generated config to a file",
      default = true)
    val path =
      if (!save) None
      else {
        val p = w.promptString("Output file", "migration.toml", required)
        val abs = java.nio.file.Paths.get(p).toAbsolutePath
        java.nio.file.Files.writeString(abs, toml)
        w.say(s"Saved $abs")
        Some(abs)
      }
    val next = w.promptChoice("Next step", Seq(
      ("stop", "Finish here; inspect or edit the config manually."),
      ("plan", "Print a migration plan report (no target changes)."),
      ("run", "Start the migration now.")),
      "plan")
    next match {
      case "plan" => planner(cfg)
      case "run" => runner(cfg)
      case _ => ()
    }
    (cfg, path, next)
  }
}
