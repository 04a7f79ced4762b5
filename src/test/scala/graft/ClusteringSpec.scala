package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components correctness on synthetic graphs (chain, star,
  * triangle-with-tail, isolated pair) plus q66's cluster invariants on
  * the real fixture. The chain is the adversarial case for min-label
  * propagation — the label must walk the full diameter — so it pins the
  * convergence loop, not just the easy star shapes near-dup data
  * produces.
  */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def cc(pairs: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    operators.Dedup.connectedComponents(pairs.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to its minimum over the full diameter") {
    val got = cc(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 6L -> 1L))
  }

  test("star, triangle-with-tail, and isolated pair stay separate") {
    val got = cc(
      // star centered high, min at a leaf
      10L -> 7L, 10L -> 8L, 10L -> 9L,
      // triangle with a tail
      20L -> 21L, 21L -> 22L, 20L -> 22L, 22L -> 23L,
      // isolated pair
      30L -> 31L)
    assert(got(7L) == 7L && got(8L) == 7L && got(9L) == 7L &&
      got(10L) == 7L)
    assert(Seq(20L, 21L, 22L, 23L).forall(got(_) == 20L))
    assert(got(30L) == 30L && got(31L) == 30L)
  }

  test("q66 invariants: one keep per cluster, members consistent, " +
      "clusters cover exactly the q22 pair vertices") {
    val rows = SparkEntry.queries("q66_dedup_clusters")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, ms) =>
      assert(ms.count(_._4 == 1) == 1, s"cluster $c keep-count != 1")
      assert(ms.forall(_._3 == ms.length), s"cluster $c members wrong")
      assert(ms.map(_._1).min == c, s"cluster $c id is not its min doc")
    }
    val pairVerts = SparkEntry.queries("q22_dedup_jaccard")(spark, dir)
      .select(explode(array(col("d1"), col("d2"))))
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == pairVerts,
      "component vertex set != near-dup pair vertex set")
  }

  test("q106 recursive-CTE closure reproduces q66's cluster sizes " +
      "(declarative vs pointer-jumping on the same pair graph)") {
    val viaSql = SparkEntry.queries("q106_dedup_closure_sql")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = SparkEntry.queries("q66_dedup_clusters")(spark, dir)
      .select(col("cluster"), col("members")).distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaLoop)
  }

  test("q67 quantiles are ordered and bracket the per-lang extremes") {
    SparkEntry.queries("q67_token_quantiles")(spark, dir)
      .collect().foreach { r =>
        val (p50, p90, p99) =
          (r.getDouble(2), r.getDouble(3), r.getDouble(4))
        assert(p50 <= p90 && p90 <= p99, s"${r.getString(0)}: unordered")
      }
  }

  test("q75 balances every source to the min source count and keeps " +
      "the lexicographically-lowest content hashes") {
    val rows = SparkEntry.queries("q75_mix_rebalance")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val perSource = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perSource.values.toSet.size == 1,
      s"unbalanced mix: $perSource")
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        md5(col("text").cast("binary")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val kept = rows.toSet
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val n = perSource(src)
      val expect = ds.sortBy(d => (d._3, d._2)).take(n)
        .map(d => (src, d._2)).toSet
      assert(kept.filter(_._1 == src) == expect,
        s"$src did not keep the lowest-hash docs")
    }
  }

  test("q68 emits at most 3 ranked terms per doc, scores non-increasing") {
    val rows = SparkEntry.queries("q68_tfidf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (doc, ts) =>
      assert(ts.length <= 3 && ts.map(_._2).sorted.sameElements(
        1 to ts.length), s"doc $doc ranks broken")
      val byRank = ts.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"doc $doc scores increase with rank")
    }
  }
}
