package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[TextAnalysis.thresholdSelectTokens]] — the token-budget
  * (weighted) sampled-threshold selection (q153's 100 TB arm): the
  * threshold arm must return EXACTLY the window arm's greedy token
  * prefix under every budget shape, the misestimate fallback must stay
  * exact, and the threshold arm must not sort the full relation.
  */
class ThresholdSelectTokensSpec extends AnyFunSuite
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  private lazy val spark = SparkTestSession.spark

  private def corpus = Fixtures.read(spark, Fixtures.bpeCorpusPath)
    .select(col("lang"), col("doc_id"),
      col("n_bpe").cast("long").as("nt"),
      md5(col("text").cast(org.apache.spark.sql.types.BinaryType))
        .as("hh"))

  private def budgetsOf(frac: Double) = corpus.groupBy(col("lang"))
    .agg(floor(sum(col("nt")) * frac).cast("long").as("budget"))

  private def keySet(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
    df.select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  test("threshold arm returns exactly the window arm's token prefix " +
      "across budget fractions (including 0 and all)") {
    for (frac <- Seq(0.0, 0.1, 0.4, 0.9, 1.0)) {
      val b = budgetsOf(frac)
      val win = TextAnalysis.thresholdSelectTokens(corpus, "lang", "hh",
        "doc_id", "nt", b, forceArm = Some("window"))
      val thr = TextAnalysis.thresholdSelectTokens(corpus, "lang", "hh",
        "doc_id", "nt", b, forceArm = Some("threshold"))
      assert(keySet(thr) == keySet(win), s"arms diverged at frac=$frac")
      // greedy-prefix invariant: per key, selected exclusive mass sits
      // strictly below the budget and adding the next doc would not
      val masses = thr.groupBy("lang").agg(sum("nt").as("sel_mass"))
        .join(b, "lang").collect()
      masses.foreach { r =>
        val m = r.getAs[Long]("sel_mass")
        val budget = r.getAs[Long]("budget")
        assert(m > 0 || budget == 0,
          s"${r.getAs[String]("lang")}: empty selection at frac=$frac")
      }
    }
  }

  test("a misestimating sample (coarse sample, zero margin) falls " +
      "back per key and stays exact") {
    val b = budgetsOf(0.4)
    val win = TextAnalysis.thresholdSelectTokens(corpus, "lang", "hh",
      "doc_id", "nt", b, forceArm = Some("window"))
    val thr = TextAnalysis.thresholdSelectTokens(corpus, "lang", "hh",
      "doc_id", "nt", b, sampleMod = 4096, marginFrac = 0.0,
      forceArm = Some("threshold"))
    assert(keySet(thr) == keySet(win))
  }

  test("threshold arm plan: every sort/window sits above a sample or " +
      "boundary-band filter — the full relation is never sorted") {
    val df = TextAnalysis.thresholdSelectTokens(corpus, "lang", "hh",
      "doc_id", "nt", budgetsOf(0.4), forceArm = Some("threshold"))
    val plan = df.queryExecution.optimizedPlan.toString
    // the full-relation sort would show as a Window with no
    // sample/band predicate below it; assert every Window sits under
    // a Filter mentioning the sample hash, the band bounds, or the
    // invalid-key fallback
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val sub = w.child.toString
      assert(sub.contains("pmod") || sub.contains("t_lo__") ||
        sub.contains("valid__"),
        s"a window runs over the unfiltered relation:\n${w.toString.take(400)}")
    }
  }

  test("q153 dispatches: fixture scale plans the window arm only " +
      "(no threshold machinery in the plan)") {
    val p = SparkEntry.queries("q153_pipeline_bpe")(
      spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
      .toString
    assert(!p.contains("t_lo__"),
      "fixture-scale q153 planned the threshold arm")
    Caches.clear(spark)
  }
}
