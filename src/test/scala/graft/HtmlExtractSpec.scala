package graft

import graft.tools.GenHtmlFixture
import org.scalatest.funsuite.AnyFunSuite

/** q151 extraction against [[GenHtmlFixture]]'s emission rules — the
  * structural ground truth the DuckDB hash-match can't see: exactly
  * the content paragraphs survive (chrome, link farms, script, and
  * comments never do), entities decode, and pure-chrome pages extract
  * to the empty string rather than to footer text.
  */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val rows =
    SparkEntry.queries("q151_html_extract")(spark, "/root/testdata/sf0.01")
      .collect()

  test("exactly the content paragraphs survive the block gates") {
    assert(rows.length == GenHtmlFixture.NumPages)
    rows.foreach { r =>
      val page = r.getAs[Long]("page_id")
      assert(r.getAs[Int]("n_kept") == GenHtmlFixture.numParagraphs(page),
        s"page $page: kept ${r.getAs[Int]("n_kept")} blocks, planted " +
          s"${GenHtmlFixture.numParagraphs(page)} content paragraphs " +
          s"(chrome or the link farm leaked, or content was dropped)")
      // chrome blocks (nav/sidebar/footer) + content are all visible
      // blocks; the farm page adds one more
      val minBlocks = GenHtmlFixture.numParagraphs(page) + 3
      assert(r.getAs[Int]("n_blocks") >= minBlocks,
        s"page $page: ${r.getAs[Int]("n_blocks")} visible blocks")
    }
  }

  test("no markup, script, entity, or chrome text leaks into extraction") {
    val probes = Seq("<", ">", "&amp;", "&lt;", "copyright", "href",
      "var x", "function f")
    // pure-chrome pages must be empty; others must not carry probes.
    // Recheck against the fixture html directly with an independent
    // JVM-side strip of ONLY the planted paragraph markup.
    (0L until GenHtmlFixture.NumPages.toLong).foreach { page =>
      val paras = (0 until GenHtmlFixture.numParagraphs(page))
        .map(p => GenHtmlFixture.paragraph(page, p))
      val expected = paras.map { para =>
        para.replaceAll("<a[^>]*>", "").replace("</a>", "")
          .replace("<b>", "").replace("</b>", "")
          .replace("<p>", "").replace("</p>", "")
          .replace("&amp;", "&").trim
      }.mkString(" ")
      val got = perPage(page)
      assert(got == expected,
        s"page $page extraction diverges\ngot:  $got\nwant: $expected")
      probes.foreach(pr => assert(!got.contains(pr),
        s"page $page: probe '$pr' leaked into extraction"))
    }
  }

  private lazy val perPage: Map[Long, String] = {
    // re-run the extraction pipeline up to the raw extracted string
    // (the catalog query hashes it; the spec wants the bytes)
    import org.apache.spark.sql.functions._
    val ScriptRe = "(?s)<script[^>]*>.*?</script>"
    val BoundaryRe =
      "</?(?:p|div|nav|footer|h1|ul|li|head|body|html|title)[^>]*>"
    def txt(b: String): String =
      s"trim(regexp_replace(replace(replace(replace(regexp_replace(" +
        s"$b, '<[^>]*>', ' '), '&amp;', '&'), '&lt;', '<'), " +
        s"'&gt;', '>'), ' +', ' '))"
    def link(b: String): String =
      s"aggregate(regexp_extract_all($b, '<a[^>]*>([^<]*)</a>', 1), 0, " +
        "(acc, x) -> acc + length(x))"
    Fixtures.read(spark, Fixtures.htmlPagesPath)
      .select(col("page_id"),
        split(regexp_replace(col("html"), ScriptRe, " "), BoundaryRe)
          .as("blocks"))
      .select(col("page_id"),
        expr(s"array_join(transform(filter(blocks, b -> " +
          s"length(${txt("b")}) >= 30 AND " +
          s"2 * ${link("b")} <= length(${txt("b")})), " +
          s"b -> ${txt("b")}), ' ')").as("extracted"))
      .collect()
      .map(r => r.getAs[Long]("page_id") -> r.getAs[String]("extracted"))
      .toMap
  }
}
