package graft

import org.scalatest.funsuite.AnyFunSuite

/** q205 leakage-free split: the property the relation guarantees (no
  * near-dup cluster straddles train/test), consistency with q66's
  * clustering, and the motivation made measurable — the naive per-doc
  * split DOES leak on this corpus.
  */
class LeakfreeSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private lazy val rows =
    SparkEntry.queries("q205_leakfree_split")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster"),
        r.getAs[String]("split"), r.getAs[Int]("clustered")))

  test("every document is assigned, clusters agree with q66, and NO " +
      "cluster straddles the split") {
    val docs = Tables.load(spark, dir, "documents").count()
    assert(rows.length == docs)
    val q66 = SparkEntry.queries("q66_dedup_clusters")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("cluster")).toMap
    rows.foreach { case (d, c, _, clustered) =>
      if (clustered == 1) assert(q66(d) == c,
        s"doc $d: cluster disagrees with q66")
      else assert(!q66.contains(d) && c == d,
        s"doc $d: singleton must self-cluster")
    }
    rows.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $c straddles the split")
    }
  }

  test("the naive per-doc split leaks near-dup pairs on this corpus " +
      "(the failure q205 exists to prevent)") {
    def naive(d: Long) = if (d % 100 < 80) "train" else "test"
    val multi = rows.filter(_._4 == 1).groupBy(_._2)
      .filter(_._2.length >= 2)
    assert(multi.nonEmpty, "no multi-member clusters — test is vacuous")
    val naiveLeaks = multi.values.count(ms =>
      ms.map(m => naive(m._1)).distinct.length > 1)
    assert(naiveLeaks > 0,
      "naive split never leaks here — the fixture can't demonstrate " +
        "the property")
    info(s"naive per-doc split leaks $naiveLeaks of ${multi.size} " +
      "multi-member clusters; q205 leaks 0")
  }
}
