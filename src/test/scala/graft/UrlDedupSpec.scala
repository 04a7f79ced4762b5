package graft

import graft.tools.GenUrlFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q168 URL dedup against the generator's emission rules: every alias
  * class collapses to its canonical form with the right keeper and
  * size, single canonicalization rules behave on crafted edge cases
  * (default port vs real port, tracking-param removal, param sort,
  * fragment-before-query stripping), and the plan is map-only + one
  * keyed agg.
  */
class UrlDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001" // unused by the fixture read

  test("alias classes collapse exactly to the generator's canonical " +
      "pages (keeper = first doc, size = alias count)") {
    // classes whose canonical forms collide merge — fold the rules'
    // expectation the same way the query would
    val expected = (0L until GenUrlFixture.NumCanon.toLong)
      .groupBy(GenUrlFixture.canonicalOf)
      .map { case (canon, bs) =>
        canon -> ((bs.map(GenUrlFixture.firstDoc).min,
          bs.map(GenUrlFixture.aliasCount).sum.toLong))
      }
    val got = SparkEntry.queries("q168_url_dedup")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("canon") ->
        ((r.getAs[Long]("keep_doc"), r.getAs[Long]("n_aliases"))))
      .toMap
    assert(got.size == expected.size,
      s"${got.size} canonical pages vs expected ${expected.size}")
    expected.foreach { case (canon, exp) =>
      assert(got.get(canon) == Some(exp), s"class $canon: " +
        s"got ${got.get(canon)}, expected $exp")
    }
  }

  test("canonicalization rules on crafted edges") {
    def canon(url: String): String =
      spark.range(1)
        .select(operators.Urls.canonical(lit(url)).as("c"))
        .collect()(0).getString(0)
    // scheme case + www + default port + trailing slash + fragment
    assert(canon("HTTPS://WWW.Example.COM:443/A/b/#x") == "example.com/A/b")
    // a REAL port must survive; path case must survive
    assert(canon("http://h.io:8080/Path") == "h.io:8080/Path")
    // tracking params go, the rest sort; fragment strips BEFORE the
    // query parse so a '#' ends the param list
    assert(canon("http://h.io/p?b=2&utm_source=x&a=1#frag=9") ==
      "h.io/p?a=1&b=2")
    assert(canon("http://h.io/p?utm_campaign=z&fbclid=1&sessionid=s") ==
      "h.io/p")
    // only ONE trailing slash strips (the documented rule)
    assert(canon("http://h.io/a//") == "h.io/a/")
    // empty query from a bare '?' disappears
    assert(canon("http://h.io/p?") == "h.io/p")
  }

  test("root path + surviving query: host must come from " +
      "canonicalParts, not a re-parse of the canonical string") {
    // http://h.io/?id=1 — the trailing-slash rule empties the path,
    // so canon = 'h.io?id=1' contains no '/'; substring_index(canon,
    // '/', 1) would wrongly return 'h.io?id=1' as the host. The
    // carried host expression stays clean.
    val (hostC, canonC) = operators.Urls.canonicalParts(lit("http://h.io/?id=1"))
    val row = spark.range(1)
      .select(hostC.as("h"), canonC.as("c")).collect()(0)
    assert(row.getString(1) == "h.io?id=1")
    assert(row.getString(0) == "h.io",
      s"host re-derivation bug: got '${row.getString(0)}'")
    // same check through hostOf, the public helper rollups should use
    val h2 = spark.range(1)
      .select(operators.Urls.hostOf(lit("https://WWW.H.io:443/?id=1")).as("h"))
      .collect()(0).getString(0)
    assert(h2 == "h.io")
  }

  test("map-only plan: one hash exchange (the canonical-keyed agg)") {
    val p = SparkEntry.queries("q168_url_dedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      p.take(800))
    assert(!p.contains("Join"), p.take(800))
  }
}
