package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q154 (substring-dedup APPLY) against an INDEPENDENT brute-force
  * reimplementation of the keep-first-owner semantics on a planted
  * corpus — position-marking over raw substring equality, no hashing,
  * no islands, no relational machinery — plus the containment and
  * keeper invariants on the real fixture that relate it to q152's
  * coverage report.
  */
class SubstringDedupApplySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val L = 40

  /** Brute force: mark every position covered by a cross-doc
    * duplicated L-gram whose minimal owner is a LOWER doc, drop marked
    * positions. The union of covering gram ranges equals q154's
    * island-merged cut ranges by construction (gap ≤ L merges), so
    * the two must agree byte-for-byte.
    */
  private def expectedCleaned(docs: Seq[(Long, String)])
      : Map[Long, String] = {
    val gramDocs = scala.collection.mutable.Map[String,
      scala.collection.mutable.Set[Long]]()
    for ((id, t) <- docs; i <- 0 to t.length - L)
      gramDocs.getOrElseUpdate(t.substring(i, i + L),
        scala.collection.mutable.Set()) += id
    val owner = gramDocs.collect {
      case (g, ds) if ds.size > 1 => g -> ds.min
    }
    docs.map { case (id, t) =>
      val cut = Array.fill(t.length)(false)
      for (i <- 0 to t.length - L) {
        owner.get(t.substring(i, i + L)).foreach { mn =>
          if (mn < id) (i until i + L).foreach(cut(_) = true)
        }
      }
      id -> t.indices.filterNot(cut).map(t.charAt).mkString
    }.toMap
  }

  test("planted corpus: cleaned bytes equal the brute-force " +
      "keep-first-owner semantics (exact dups, shared spans, " +
      "abutting spans, unique docs)") {
    import spark.implicits._
    def words(tag: String, n: Int): String =
      (0 until n).map(i => s"$tag${i % 23}w").mkString(" ")
    val shared = words("sh", 30) // ~150 chars, one shared span
    val sharedB = words("sb", 20)
    val docs: Seq[(Long, String)] = Seq(
      0L -> (words("a", 25) + " " + shared + " " + words("b", 25)),
      1L -> (words("c", 25) + " " + shared + " " + words("d", 25)),
      2L -> (words("e", 10) + " " + shared + " " + words("f", 10)),
      // exact duplicate pair: 4 cleans to empty, 3 keeps everything
      3L -> words("x", 40),
      4L -> words("x", 40),
      // two ABUTTING shared spans (exercises the gap == L merge)
      5L -> (words("g", 12) + " " + shared + " " + sharedB + " " +
        words("h", 12)),
      6L -> (shared + " " + sharedB),
      // unique doc: untouched
      7L -> words("u", 45))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sda").toString
    docs.map { case (id, t) =>
      (id, t, "en", "s0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    val expect = expectedCleaned(docs)
    val got = SparkEntry.queries("q154_substring_dedup_apply")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("h"), r.getAs[Long]("kept_chars"),
          r.getAs[Long]("cut_chars"))).toMap
    docs.foreach { case (id, t) =>
      val exp = expect(id)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(exp.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val (h, kept, cut) = got(id)
      assert(kept == exp.length && cut == t.length - exp.length,
        s"doc $id: kept=$kept cut=$cut vs expected ${exp.length}/" +
          s"${t.length - exp.length}")
      assert(h == md5, s"doc $id: cleaned bytes diverge from the " +
        s"brute-force reference")
    }
    // the planted shapes actually fired
    assert(expect(4L).isEmpty, "exact-dup later copy must clean empty")
    assert(expect(3L) == docs(3)._2, "exact-dup keeper must keep all")
    assert(expect(7L) == docs(7)._2, "unique doc must be untouched")
    assert(expect(6L).length < docs(6)._2.length / 2,
      "abutting shared spans must cut from the non-owner")
    Caches.clear(spark)
  }

  test("real fixture invariants: cuts are a subset of q152's dup " +
      "coverage; the lowest doc holding any duplicated gram is uncut") {
    val dir = "/root/testdata/sf0.01"
    val coverage = SparkEntry.queries("q152_substring_dedup")(spark, dir)
      .select(col("doc_id"), col("dup_chars")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_chars"))
      .toMap
    val applied = SparkEntry.queries("q154_substring_dedup_apply")(
      spark, dir).collect()
    applied.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("cut_chars") <= coverage(id),
        s"doc $id cuts more than its duplicated coverage")
    }
    val dupDocs = coverage.filter(_._2 > 0).keys
    assert(dupDocs.nonEmpty, "fixture has no duplicated spans at all")
    val lowest = dupDocs.min
    val lowestCut = applied
      .find(_.getAs[Long]("doc_id") == lowest).get
      .getAs[Long]("cut_chars")
    assert(lowestCut == 0,
      s"doc $lowest is the lowest id with duplicated grams — it owns " +
        s"every cluster it is in and must keep its text, cut $lowestCut")
    Caches.clear(spark)
  }
}
