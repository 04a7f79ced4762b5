package graft

import org.scalatest.funsuite.AnyFunSuite
import java.io.{BufferedReader, PrintWriter, StringReader, StringWriter}

/** Scripted end-to-end drive of the interactive wizard prompt flow
  * (reference `wizard.go` runGenerateWizard/collectGeneratedConfig):
  * defaults accepted on empty input, invalid answers re-prompt, dialect
  * gates (sqlite skips snapshot/workers prompts), TOML round-trips, and
  * the next-step dispatch reaches the injected planner/runner.
  */
class WizardSpec extends AnyFunSuite {

  private def drive(script: Seq[String],
      planner: graft.config.JobConfig => Unit = _ => (),
      runner: graft.config.JobConfig => Unit = _ => ()) = {
    val in = new BufferedReader(new StringReader(script.mkString("\n") + "\n"))
    val sw = new StringWriter()
    val result = WizardInteractive.run(in, new PrintWriter(sw, true),
      planner, runner)
    (result, sw.toString)
  }

  test("mysql flow: defaults, re-prompts on invalid input, save, stop") {
    val outFile = java.nio.file.Files.createTempDirectory("graft-wiz")
      .resolve("m.toml").toString
    val script = Seq(
      "",                             // source type → default mysql
      "",                             // source url: empty → re-prompt
      "jdbc:mysql://h:3306/db",       //   then accepted
      "jdbc:postgresql://h:5432/db",  // target url
      "",                             // schema → public
      "bogus",                        // mode: invalid → re-prompt
      "",                             //   then default full
      "",                             // recreate → n
      "",                             // snapshot mode → parallel
      "n",                            // unlogged off
      "",                             // snake_case → y
      "",                             // clean orphans → y
      "3",                            // workers
      "",                             // jsonb → y
      "y",                            // unknown_as_text on
      "",                             // tinyint1 → y (mysql-only prompt)
      "",                             // binary16 uuid → n
      "x",                            // char36 uuid: invalid → re-prompt
      "n",                            //   then no
      "y",                            // save config
      outFile,                        // output path
      "stop")                         // next step
    val ((cfg, saved, next), transcript) = drive(script)
    assert(cfg.sourceDialect == "mysql" && cfg.workers == 3 &&
      !cfg.unloggedTables && cfg.typeOptions.unknownAsText &&
      cfg.typeOptions.tinyint1AsBoolean && !cfg.recreate)
    assert(saved.map(_.toString).contains(
      java.nio.file.Paths.get(outFile).toAbsolutePath.toString))
    assert(next == "stop")
    // saved file parses back to the same config
    val reparsed = graft.config.JobConfig.fromToml(
      java.nio.file.Files.readString(saved.get))
    assert(reparsed == cfg)
    // the re-prompt paths actually printed their errors
    assert(transcript.contains("A value is required."))
    assert(transcript.contains("Choose one of: full, schema_only, " +
      "data_only"))
    assert(transcript.contains("Please answer y or n"))
  }

  test("sqlite flow skips snapshot/workers/mysql-type prompts and " +
      "caps workers at 1; plan step reaches the injected planner") {
    var planned: Option[graft.config.JobConfig] = None
    val script = Seq(
      "sqlite",
      "jdbc:sqlite:/tmp/x.db",
      "jdbc:postgresql://h:5432/db",
      "",        // schema
      "",        // mode full
      "",        // recreate n
      "",        // unlogged y  (no snapshot prompt for sqlite)
      "",        // snake y
      "",        // orphans y   (no workers prompt)
      "",        // jsonb y
      "",        // unknown n
      "",        // char36 uuid n (no tinyint/binary16 prompts)
      "n",       // don't save
      "plan")
    val ((cfg, saved, next), _) =
      drive(script, planner = c => planned = Some(c))
    assert(cfg.sourceDialect == "sqlite" && cfg.workers == 1 &&
      cfg.mode == "parallel")
    assert(saved.isEmpty && next == "plan")
    assert(planned.contains(cfg))
  }

  test("closed input mid-flow raises instead of hanging") {
    val in = new BufferedReader(new StringReader("mysql\n"))
    intercept[IllegalStateException] {
      WizardInteractive.run(in,
        new PrintWriter(new StringWriter(), true))
    }
  }
}
