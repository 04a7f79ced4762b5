package graft

import graft.tools.{GenBlocklistFixture, GenUrlFixture}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q179 domain-suffix blocklist: per-domain counts recompute from the
  * URL generator's emission rules (exact, TLD-suffix, overlapping
  * parent, zero-match decoy), retention closes the ledger, and the
  * match is by dot-LABEL suffix — a blocklist entry must never match
  * mid-label ("site.org" does not block "news-site.org").
  */
class BlocklistSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001" // unused by the fixture read

  private def isLabelSuffix(domain: String, host: String): Boolean = {
    val hl = host.split('.')
    val dl = domain.split('.')
    dl.length <= hl.length && hl.takeRight(dl.length).sameElements(dl)
  }

  test("per-domain counts and retention recompute from the emission " +
      "rules; decoy reports 0; parent suffix multi-matches") {
    val got = SparkEntry.queries("q179_domain_blocklist")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pages = (0L until GenUrlFixture.NumCanon.toLong).map { b =>
      val host = GenUrlFixture.canonicalOf(b).takeWhile(c =>
        c != '/' && c != '?')
      (host, GenUrlFixture.aliasCount(b).toLong)
    }
    val total = pages.map(_._2).sum
    GenBlocklistFixture.Domains.foreach { d =>
      val exp = pages.filter(p => isLabelSuffix(d, p._1)).map(_._2).sum
      assert(got.get(d) == Some(exp),
        s"domain $d: got ${got.get(d)}, expected $exp")
    }
    assert(got("tracker.invalid") == 0L, "decoy must report 0")
    // 'org' (parent) covers BOTH exact .org entries — multi-match
    assert(got("org") ==
      got("news-site.org") + got("archive-mirror.org"))
    val blocked = pages.filter(p => GenBlocklistFixture.Domains
      .exists(isLabelSuffix(_, p._1))).map(_._2).sum
    assert(got("__kept__") == total - blocked,
      s"retention ledger: kept ${got("__kept__")} + blocked $blocked " +
        s"!= total $total")
    assert(got("__kept__") > 0 && blocked > 0,
      "fixture must exercise both outcomes")
  }

  test("q180 crawl capstone: per-domain frontier audit recomputes " +
      "from the emission rules; fully-blocked domains stay in the " +
      "report with unique_pages = 0") {
    val got = SparkEntry.queries("q180_crawl_pipeline")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // fold the generator's pages by host, applying gate + dedup
    case class H(var total: Long = 0, var blocked: Long = 0,
      var kept: Long = 0, var canons: Set[String] = Set.empty)
    val byHost = scala.collection.mutable.Map.empty[String, H]
    (0L until GenUrlFixture.NumCanon.toLong).foreach { b =>
      val canon = GenUrlFixture.canonicalOf(b)
      val host = canon.takeWhile(c => c != '/' && c != '?')
      val n = GenUrlFixture.aliasCount(b).toLong
      val h = byHost.getOrElseUpdate(host, H())
      h.total += n
      val isBlocked = GenBlocklistFixture.Domains
        .exists(isLabelSuffix(_, host))
      if (isBlocked) h.blocked += n
      else { h.kept += n; h.canons += canon }
    }
    assert(got.keySet == byHost.keySet.toSet)
    byHost.foreach { case (host, h) =>
      assert(got(host) ==
        ((h.total, h.blocked, h.kept, h.canons.size.toLong)),
        s"host $host: ${got(host)} vs (${h.total}, ${h.blocked}, " +
          s"${h.kept}, ${h.canons.size})")
    }
    // the gate must fully zero at least one domain, and that domain
    // must still report (the LEFT-join contract)
    val zeroed = got.filter { case (_, (_, _, kept, _)) => kept == 0 }
    assert(zeroed.nonEmpty, "fixture must fully block some domain")
    zeroed.foreach { case (host, (_, _, _, uniq)) =>
      assert(uniq == 0L, s"$host blocked but unique_pages = $uniq")
    }
  }

  test("plans: blocklist join is broadcast-class (no cartesian / " +
      "nested-loop product in q179 or q180)") {
    Seq("q179_domain_blocklist", "q180_crawl_pipeline").foreach { q =>
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(600)}")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q: ${p.take(600)}")
    }
  }

  test("suffix match is by dot label, never mid-label substring") {
    val sufs = spark.range(1)
      .select(operators.Urls.hostOf(lit("http://news-site.org/x"))
        .as("host"))
      .withColumn("labels", split(col("host"), "\\."))
      .select(transform(sequence(lit(1), size(col("labels"))), i =>
        array_join(slice(col("labels"), i,
          size(col("labels")) - i + 1), ".")).as("sufs"))
      .collect()(0).getSeq[String](0)
    assert(sufs.toSet == Set("news-site.org", "org"),
      s"suffix set wrong: $sufs")
    assert(!sufs.contains("site.org"),
      "mid-label substring must not be a suffix")
  }
}
