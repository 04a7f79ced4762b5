package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[TextAnalysis.thresholdSelect]] — the executable
  * sampled-threshold selection arm (the 100 TB swap for per-key rank
  * windows): the threshold arm must return EXACTLY the window arm's
  * rows under every take shape, the misestimate fallback must stay
  * exact, and the threshold arm's sorts must sit only above the
  * sample / boundary-band filters (never the full relation).
  */
class ThresholdSelectSpec extends AnyFunSuite
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def corpus = Tables.load(spark, dir, "documents")
    .select(col("lang"), col("doc_id"),
      md5(col("text").cast(org.apache.spark.sql.types.BinaryType))
        .as("hh"))

  private def takesOf(frac: Double) = corpus.groupBy(col("lang"))
    .agg(floor(count(lit(1)) * frac).cast("long").as("take"))

  private def keySet(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
    df.select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  test("threshold arm returns exactly the window arm's rows across " +
      "take fractions (including 0 and all)") {
    for (frac <- Seq(0.0, 0.1, 0.5, 0.9, 1.0)) {
      val t = takesOf(frac)
      val win = TextAnalysis.thresholdSelect(corpus, "lang", "hh",
        "doc_id", t, forceArm = Some("window"))
      val thr = TextAnalysis.thresholdSelect(corpus, "lang", "hh",
        "doc_id", t, forceArm = Some("threshold"))
      assert(keySet(thr) == keySet(win), s"arms diverged at frac=$frac")
      // and the count per key is the take
      val taken = thr.groupBy("lang").count()
        .join(t, "lang").collect()
      taken.foreach { r =>
        assert(r.getAs[Long]("count") == r.getAs[Long]("take"))
      }
    }
  }

  test("a misestimating sample (margin 0, coarse sample) falls back " +
      "per key and stays exact") {
    val t = takesOf(0.5)
    val win = TextAnalysis.thresholdSelect(corpus, "lang", "hh",
      "doc_id", t, forceArm = Some("window"))
    // sampleMod larger than most key populations → empty/1-row
    // samples, margin 0 → the validity check must catch the
    // misestimate and the window fallback must fire — rows identical
    val thr = TextAnalysis.thresholdSelect(corpus, "lang", "hh",
      "doc_id", t, sampleMod = 64, margin = 0L,
      forceArm = Some("threshold"))
    assert(keySet(thr) == keySet(win))
  }

  test("dispatcher: a fixture-scale corpus (≤ smallBytesBound by plan " +
      "stats) takes the window arm; lowering the byte bound flips the " +
      "plan to the threshold arm — results identical") {
    val t = takesOf(0.5)
    val auto = TextAnalysis.thresholdSelect(corpus, "lang", "hh",
      "doc_id", t)
    val win = TextAnalysis.thresholdSelect(corpus, "lang", "hh",
      "doc_id", t, forceArm = Some("window"))
    assert(keySet(auto) == keySet(win))
    // the auto plan at fixture scale is the window arm: none of the
    // threshold machinery is planned
    assert(!auto.queryExecution.optimizedPlan.toString.contains("t_lo__"))
    val flipped = TextAnalysis.thresholdSelect(corpus, "lang", "hh",
      "doc_id", t, smallBytesBound = 1L)
    assert(flipped.queryExecution.optimizedPlan.toString
      .contains("t_lo__"), "byte bound 1 must plan the threshold arm")
    assert(keySet(flipped) == keySet(win))
  }

  test("threshold arm plan: every sort/window sits above the sample " +
      "filter or the boundary-band filter — never the full relation") {
    val t = takesOf(0.5)
    val thr = TextAnalysis.thresholdSelect(corpus, "lang", "hh",
      "doc_id", t, forceArm = Some("threshold"))
    thr.collect()
    val plan = thr.queryExecution.executedPlan
    // hand-rolled walk: must pierce AQE stage boundaries AND
    // ReusedExchangeExec (a leaf whose referenced exchange subtree
    // holds the filter we're looking for)
    def subtreeHasReducingFilter(p: org.apache.spark.sql.execution
        .SparkPlan): Boolean = {
      var found = false
      def walk(n: org.apache.spark.sql.execution.SparkPlan): Unit = {
        n match {
          case f: org.apache.spark.sql.execution.FilterExec =>
            val c = f.condition.toString
            if (c.contains("pmod") || c.contains("t_lo__") ||
                c.contains("t_hi__") || c.contains("valid__"))
              found = true
          case r: org.apache.spark.sql.execution.exchange
              .ReusedExchangeExec => walk(r.child)
          case q: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => walk(q.plan)
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => walk(a.executedPlan)
          case _ => ()
        }
        n.children.foreach(walk)
      }
      walk(p)
      found
    }
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected sample/band rank windows")
    windows.foreach { w =>
      assert(subtreeHasReducingFilter(w),
        "a rank window runs over the FULL relation in the threshold " +
          s"arm:\n$w")
    }
    val sorts = collect(plan) {
      case s: org.apache.spark.sql.execution.SortExec
          if s.sortOrder.exists(_.child.toString.contains("hh")) => s
    }
    sorts.foreach { s =>
      assert(subtreeHasReducingFilter(s),
        s"an ord-sort runs over the FULL relation in the threshold arm:\n$s")
    }
  }
}
