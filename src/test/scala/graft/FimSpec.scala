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
