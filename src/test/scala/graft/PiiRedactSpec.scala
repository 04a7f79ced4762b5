package graft

import graft.tools.GenPiiFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q149 PII redaction against the generator's OWN emission rules: the
  * fixture deliberately carries no ground-truth columns (a regex that
  * drifted could not be "confirmed" by a column it also generated), so
  * the expected counts are recomputed here from [[GenPiiFixture]]'s
  * mod-5 planting rule and compared to what the staged regex pass
  * actually finds — per document, not just in aggregate. Decoys
  * (version strings, ISO dates, floats, bare integers) must survive
  * verbatim.
  */
class PiiRedactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val result =
    SparkEntry.queries("q149_pii_redact")(spark, "/root/testdata/sf0.01")
      .collect()

  test("per-lang counts equal the planted ground truth exactly") {
    val expected = (0L until GenPiiFixture.NumDocs.toLong)
      .map { id =>
        val lang = GenPiiFixture.Langs(math.floorMod(
          scala.util.hashing.MurmurHash3.productHash(("lang", id, 0)),
          GenPiiFixture.Langs.size))
        val (ne, np, ni) = GenPiiFixture.planted(id)
        (lang, ne.toLong, ni.toLong, np.toLong)
      }
      .groupBy(_._1)
      .map { case (lang, rows) =>
        lang -> (rows.size.toLong, rows.map(_._2).sum,
          rows.map(_._3).sum, rows.map(_._4).sum)
      }
    assert(result.length == expected.size)
    result.foreach { r =>
      val (docs, ne, ni, np) = expected(r.getAs[String]("lang"))
      assert(r.getAs[Long]("docs") == docs)
      assert(r.getAs[Long]("n_emails") == ne,
        s"emails for ${r.getAs[String]("lang")}")
      assert(r.getAs[Long]("n_ips") == ni,
        s"ips for ${r.getAs[String]("lang")}")
      assert(r.getAs[Long]("n_phones") == np,
        s"phones for ${r.getAs[String]("lang")}")
    }
  }

  test("every planted string is redacted; every decoy survives") {
    // rebuild each doc's redacted text independently: token-wise
    // replacement of the EXACT planted strings (the generator knows
    // where they are), then compare md5s doc-for-doc with a re-run of
    // the staged regex pass emitting per-doc hashes
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val phone = "(?:\\+[0-9]{1,2}[ -]\\(?|\\(|\\b)" +
      "[0-9]{3}\\)?[ -][0-9]{3}[ -][0-9]{4}\\b"
    val perDoc = Fixtures.read(spark, Fixtures.piiDocsPath)
      .select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          email, "<EMAIL>"), ip, "<IP>"), phone, "<PHONE>")
          .as("scrubbed"))
      .collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[String]("scrubbed")).toMap
    (0L until GenPiiFixture.NumDocs.toLong).foreach { id =>
      val (ne, np, ni) = GenPiiFixture.planted(id)
      var t = GenPiiFixture.text(id)
      (0 until ne).foreach(i =>
        t = t.replace(GenPiiFixture.email(id, i), "<EMAIL>"))
      (0 until ni).foreach(i =>
        t = t.replace(GenPiiFixture.ipv4(id, i), "<IP>"))
      (0 until np).foreach(i =>
        t = t.replace(GenPiiFixture.phone(id, i), "<PHONE>"))
      assert(perDoc(id) == t,
        s"doc $id: staged regex pass diverges from exact-string " +
          s"replacement of the planted PII\nregex: ${perDoc(id)}\n" +
          s"plant: $t")
    }
  }
}
