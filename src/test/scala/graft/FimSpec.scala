package graft

import org.scalatest.funsuite.AnyFunSuite

/** q193 fill-in-the-middle: the rewrite against an independent JVM
  * reimplementation, plus the property that makes FIM trainable — the
  * render is lossless (prefix/middle/suffix reassemble to the
  * original document exactly).
  */
class FimSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def fimRender(text: String): String = {
    val n = text.length
    val p = n / 3
    val q = 2 * n / 3
    "<|fim_pre|>" + text.substring(0, p) +
      "<|fim_suf|>" + text.substring(q) +
      "<|fim_mid|>" + text.substring(p, q)
  }

  private def spanCorrupt(docId: Long, text: String): (String, String) = {
    val toks = text.split(" ", -1)
    def masked(i: Int) = (docId * 3 + i / 3) % 7 == 3
    val inp = toks.zipWithIndex.flatMap { case (x, i) =>
      if (!masked(i)) Some(x)
      else if (i % 3 == 0) Some(s"<extra_id_${i / 3}>") else None
    }.mkString(" ")
    val tgt = toks.zipWithIndex.flatMap { case (x, i) =>
      if (!masked(i)) None
      else if (i % 3 == 0) Some(s"<extra_id_${i / 3}> $x") else Some(x)
    }.mkString(" ")
    (inp, tgt)
  }

  test("q198 span corruption matches an independent reimplementation " +
      "and is lossless (sentinel substitution reassembles the doc)") {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("q198_span_corruption")(spark, dir)
      .collect()
    assert(out.length == docs.size)
    var sawMasked = false
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (inp, tgt) = spanCorrupt(id, docs(id))
      def h(s: String) = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert(r.getAs[String]("input_md5") == h(inp), s"doc $id input")
      assert(r.getAs[String]("target_md5") == h(tgt), s"doc $id target")
      if (r.getAs[Int]("n_masked") > 0) {
        sawMasked = true
        // losslessness: substitute each sentinel's span back in
        val spans = tgt.split("(?=<extra_id_)").filter(_.nonEmpty)
          .map { s =>
            val m = "^(<extra_id_\\d+>) ?(.*?) ?$".r
              .findFirstMatchIn(s).get
            m.group(1) -> m.group(2)
          }.toMap
        val rebuilt = inp.split(" ", -1).map { t =>
          spans.getOrElse(t, t)
        }.mkString(" ")
        assert(rebuilt == docs(id), s"doc $id does not reassemble")
      }
    }
    assert(sawMasked, "fixture produced no masked document")
  }

  test("operator md5s match an independent reimplementation, and the " +
      "FIM render reassembles to the original document") {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("q193_doc_fim")(spark, dir).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val text = docs(id)
      val expected =
        if (id % 2 == 0) fimRender(text) else text
      assert(r.getAs[String]("mode") ==
        (if (id % 2 == 0) "fim" else "plain"))
      assert(r.getAs[String]("render_md5") ==
        org.apache.commons.codec.digest.DigestUtils.md5Hex(
          expected.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
        s"doc $id: render drifted from the reimplementation")
      assert(r.getAs[Int]("n_chars") == expected.length)
      // losslessness: the three segments reassemble to the original
      if (id % 2 == 0) {
        val n = text.length
        assert(text.substring(0, n / 3) + text.substring(n / 3, 2 * n / 3) +
          text.substring(2 * n / 3) == text)
        assert(expected.length == text.length + 33)
      }
    }
  }
}
