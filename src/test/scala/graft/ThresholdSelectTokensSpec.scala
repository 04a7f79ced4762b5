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

  test("zero-weight row at the acc_mass == budget boundary: arms stay " +
      "equal (the strict acc_mass < budget validity bound)") {
    import spark.implicits._
    // Construct the divergence case the ≤ bound allowed: a SAMPLED ord
    // s1 carrying exactly the budget, an UNSAMPLED zero-weight ord u
    // above it, and a SAMPLED ord s2 above both. The sample's scaled
    // mass puts t_lo at s2, so accept = {s1, u} with acc_mass ==
    // budget; u's exclusive cumulative mass == budget, which the
    // window arm's strict `cum < budget` drops — only the strict
    // validity bound (→ exact fallback) keeps the arms equal.
    val pool = (0 until 200).map(i => f"k$i%03d")
    val sampled = spark.createDataset(pool).toDF("o")
      .withColumn("s", pmod(xxhash64(col("o")), lit(16)) === 0)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val sOrds = pool.filter(sampled)
    val uOrds = pool.filterNot(sampled)
    // s1 < u < s2 lexicographically
    val s1 = sOrds.head
    val u = uOrds.find(_ > s1).get
    val s2 = sOrds.find(_ > u).get
    val budget = 10L
    val d = Seq(("k", s1, 1L, budget), ("k", u, 2L, 0L),
      ("k", s2, 3L, 7L)).toDF("lang", "hh", "doc_id", "nt")
    val b = Seq(("k", budget)).toDF("lang", "budget")
    val win = TextAnalysis.thresholdSelectTokens(d, "lang", "hh",
      "doc_id", "nt", b, forceArm = Some("window"))
    val thr = TextAnalysis.thresholdSelectTokens(d, "lang", "hh",
      "doc_id", "nt", b, sampleMod = 16, marginFrac = 0.25,
      forceArm = Some("threshold"))
    assert(keySet(win) == Set(("k", 1L)),
      "window arm must drop the zero-weight boundary row")
    assert(keySet(thr) == keySet(win),
      "threshold arm diverged on the zero-weight boundary")
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
