package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-side bench contract: the metric line must fit the
  * driver's ~2 KB stdout tail window AT WORST-CASE WIDTH for the
  * CURRENT headline catalog, stay a single line, and lead with the
  * `"metric"` key the driver greps for. BENCH_r9–r14 were silently
  * unparseable ("parsed": null) because the line outgrew the window
  * as the catalog grew — this spec makes that regression a build
  * failure instead of five blind rounds.
  */
class BenchContractSpec extends AnyFunSuite {

  // worst realistic per-query width: a 4-digit-second wall with the
  // full 3-decimal precision (9999.999 — nothing headline runs for
  // 2.7 h, and a wider value means the bench is broken anyway)
  private def worstLine: String = Bench.metricLine(
    SparkEntry.benchDefs.map(_.name -> 9999.999),
    unpreparedTotal = 99999.999, coldTotal = 99999.999, cores = 32,
    sf = "/root/testdata/sf0.1", fixture = "multi_row_group_rewrite")

  test("metric line fits the driver tail window at worst-case width " +
      "for every current headline query") {
    val line = worstLine
    assert(line.getBytes("UTF-8").length <= Bench.MetricLineBudgetBytes,
      s"metric line is ${line.getBytes("UTF-8").length} B for " +
        s"${SparkEntry.benchDefs.size} headline queries — over the " +
        s"${Bench.MetricLineBudgetBytes} B tail-window budget; move " +
        "fields to the diag line or trim the headline set")
  }

  test("metric line is one line, leads with the grepped key, and is " +
      "structurally closed JSON") {
    val line = worstLine
    assert(!line.contains("\n"))
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith("}"))
    // brace balance — a stray quote/brace in a query name would break
    // the driver's json.loads
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.count(_ == '"') % 2 == 0)
  }

  test("headline names are JSON-safe (no quotes/backslashes/control " +
      "chars that would escape the hand-rolled map)") {
    SparkEntry.benchDefs.map(_.name).foreach { n =>
      assert(n.matches("[A-Za-z0-9_]+"), s"unsafe bench name: $n")
    }
  }

  test("r16 headline swap: the dispatcher entry q207 is benched, " +
      "q58's fixed-geometry spelling is catalog-only") {
    val benched = SparkEntry.benchDefs.map(_.name).toSet
    assert(benched.contains("q207_oneshot_neardup"))
    assert(!benched.contains("q58_embed_neardup_lsh"))
    // q58 stays in the CATALOG (correctness + spec gates)
    assert(SparkEntry.defs.exists(_.name == "q58_embed_neardup_lsh"))
  }
}
