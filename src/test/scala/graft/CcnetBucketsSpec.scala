package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for q162's CCNet-style perplexity split: every language gets
  * all three buckets at near-equal thirds (exact tertile cutpoints),
  * and the bucket boundaries are ordered — head's hardest doc is no
  * harder than middle's easiest, middle's than tail's. A cutpoint or
  * bucketing regression (wrong percentile definition, cutpoints
  * computed globally instead of per-lang) breaks one of these before
  * any oracle diff would localize it.
  */
class CcnetBucketsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("per-lang tertiles: all three buckets, near-equal thirds, " +
      "ordered bit boundaries") {
    val rows = SparkEntry.queries("q162_ccnet_buckets")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("docs"),
        r.getAs[Double]("min_bits"), r.getAs[Double]("max_bits")))
    val byLang = rows.groupBy(_._1)
    assert(byLang.nonEmpty)
    for ((lang, rs) <- byLang) {
      val m = rs.map(r => r._2 -> r).toMap
      assert(m.keySet === Set("head", "middle", "tail"),
        s"$lang: buckets ${m.keySet}")
      val counts = rs.map(_._3)
      assert(counts.max - counts.min <= 2,
        s"$lang: tertile counts $counts not near-equal")
      assert(m("head")._5 <= m("middle")._4 + 1e-9 &&
        m("middle")._5 <= m("tail")._4 + 1e-9,
        s"$lang: bucket boundaries out of order")
      assert(m("head")._4 <= m("head")._5 &&
        m("middle")._4 <= m("middle")._5 &&
        m("tail")._4 <= m("tail")._5)
    }
    Caches.clear(spark)
  }
}
