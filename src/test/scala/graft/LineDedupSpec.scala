package graft

import graft.tools.GenLineFixture
import org.scalatest.funsuite.AnyFunSuite

/** q167 line-level dedup against a full independent reimplementation:
  * expectations are recomputed in plain JVM collections from
  * [[GenLineFixture]]'s emission rules (document frequencies over the
  * generator's own lines, removal at the shared threshold, order-
  * preserving splice, md5 digests), so the Spark pipeline and the
  * DuckDB oracle can't co-drift. Also pins the planted df boundary:
  * at K = 4 the df-3 planted line survives and the df-4 one goes.
  */
class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001" // unused by the fixture read

  private lazy val result: Map[Long, (Long, Long, String)] =
    SparkEntry.queries("q167_line_dedup")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("lines_before"), r.getAs[Long]("lines_removed"),
          r.getAs[String]("clean_md5"))))
      .toMap

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  test("pipeline equals the from-rules reimplementation on every doc") {
    val lines: Map[Long, Seq[String]] =
      (0L until GenLineFixture.NumDocs.toLong)
        .map(d => d -> GenLineFixture.docLines(d)).toMap
    val df: Map[String, Int] = lines.values
      .flatMap(_.distinct).groupBy(identity).map { case (l, o) => l -> o.size }
    val boiler = df.filter(_._2 >= GenLineFixture.Threshold).keySet
    assert(result.size == GenLineFixture.NumDocs)
    lines.foreach { case (d, ls) =>
      val kept = ls.filterNot(boiler)
      val (before, removed, ck) = result(d)
      assert(before == ls.size, s"doc $d before")
      assert(removed == ls.size - kept.size, s"doc $d removed")
      assert(ck == md5hex(kept.mkString("\n")), s"doc $d digest")
    }
  }

  test("df boundary: the df-3 planted line survives, df-4 goes, and " +
      "every boilerplate-pool line is removed everywhere") {
    val lines = (0L until GenLineFixture.NumDocs.toLong)
      .map(d => d -> GenLineFixture.docLines(d)).toMap
    // j = 1 → df 3 < K: hosts keep it (it counts into lines - removed)
    GenLineFixture.plantedHosts(1).foreach { d =>
      val (before, removed, _) = result(d)
      val expectRemoved = lines(d).count(l =>
        GenLineFixture.Boilerplate.contains(l))
      assert(removed == expectRemoved,
        s"doc $d: df-3 planted line must not be removed")
      assert(before - removed >= 1)
    }
    // j = 2 → df 4 >= K: removed from every host
    GenLineFixture.plantedHosts(2).foreach { d =>
      val expectRemoved = lines(d).count(l =>
        GenLineFixture.Boilerplate.contains(l)) + 1
      assert(result(d)._2 == expectRemoved,
        s"doc $d: df-4 planted line must be removed")
    }
    // boilerplate saturates the threshold by construction
    val allText = lines.values.flatten.toSeq
    GenLineFixture.Boilerplate.foreach { b =>
      assert(allText.count(_ == b) >= GenLineFixture.Threshold)
    }
  }

  test("no pairwise join shapes: the executed plan is keyed joins " +
      "and aggs only") {
    val p = SparkEntry.queries("q167_line_dedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }
}
