package graft

import graft.operators.TextAnalysis
import graft.tools.GenMojibakeFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q181 encoding-corruption detection: per-lang counts recompute from
  * the generator's emission rules (every planted artifact detected,
  * nothing else), and the crafted negatives hold — \t\n\r are legal
  * whitespace not control contamination, and "Ã" followed by ASCII is
  * a legitimate character, not mojibake.
  */
class MojibakeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001" // unused by the fixture read

  test("per-lang rollup equals the generator's planted counts " +
      "exactly — every artifact found, zero false positives") {
    val got = SparkEntry.queries("q181_encoding_quality")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    case class L(var docs: Long = 0, var dirty: Long = 0,
      var r: Long = 0, var c: Long = 0, var m: Long = 0)
    val exp = scala.collection.mutable.Map.empty[String, L]
    (0L until GenMojibakeFixture.NumDocs.toLong).foreach { d =>
      val l = exp.getOrElseUpdate(GenMojibakeFixture.langOf(d), L())
      val (nr, nc, nm) = GenMojibakeFixture.planted(d)
      l.docs += 1
      if (nr + nc + nm > 0) l.dirty += 1
      l.r += nr; l.c += nc; l.m += nm
    }
    assert(got.keySet == exp.keySet.toSet)
    exp.foreach { case (lang, l) =>
      assert(got(lang) == ((l.docs, l.dirty, l.r, l.c, l.m)),
        s"$lang: ${got(lang)} vs planted " +
          s"(${l.docs}, ${l.dirty}, ${l.r}, ${l.c}, ${l.m})")
    }
    // the fixture must exercise every signal
    assert(exp.values.map(_.r).sum > 0 && exp.values.map(_.c).sum > 0
      && exp.values.map(_.m).sum > 0)
  }

  test("plan: map-only + one lang-keyed exchange, no join") {
    val p = SparkEntry.queries("q181_encoding_quality")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      p.take(600))
    assert(!p.contains("Join"), p.take(600))
  }

  test("crafted negatives: legal whitespace and plain accented text " +
      "do not count as corruption") {
    def counts(text: String): (Int, Int, Int) = {
      val r = spark.range(1).select(
        size(regexp_extract_all(lit(text),
          lit(TextAnalysis.ReplRe), lit(0))).as("r"),
        size(regexp_extract_all(lit(text),
          lit(TextAnalysis.CtrlRe), lit(0))).as("c"),
        size(regexp_extract_all(lit(text),
          lit(TextAnalysis.MojiRe), lit(0))).as("m"))
        .collect()(0)
      (r.getInt(0), r.getInt(1), r.getInt(2))
    }
    assert(counts("a\tb\nc\rd") == ((0, 0, 0)),
      "tab/newline/CR are not control contamination")
    // "Ã" before ASCII is a real word boundary case, not mojibake
    assert(counts("Ã bcd Ãx") == ((0, 0, 0)))
    // but the planted artifact classes all fire
    assert(counts("\uFFFD") == ((1, 0, 0)))
    assert(counts("a\u0001b\u001Fc") == ((0, 2, 0)))
    assert(counts("Ã© and â€™") ==
      ((0, 0, 2)))
  }
}
