package graft.tools

import graft.{Fixtures, Sessions}
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.util.hashing.MurmurHash3

/** Writes `fixtures/html_pages.parquet` (page_id, html): synthetic web
  * pages with the structure a boilerplate remover has to handle —
  * nav / sidebar / footer blocks that are nearly all links, short
  * headers, a script payload that must not leak into text, HTML
  * comments, entities, inline markup — around genuine content
  * paragraphs of word-salad prose. Shapes exercised on purpose:
  *
  *  - every page: nav (link density ~1) + footer (links + copyright);
  *  - content paragraphs: 20–60 words, occasional inline `<b>` and
  *    `&amp;` entities, at most one inline link (density far below
  *    the 0.5 gate);
  *  - page_id % 7 == 3: an extra LONG paragraph that is mostly links
  *    (density ~0.6) — long enough to pass the min-length gate, so
  *    only the link-density rule can drop it;
  *  - page_id % 11 == 5: no content paragraphs at all (pure chrome) —
  *    the extractor must yield the empty string, not footer text.
  *
  * All tokens derive from MurmurHash3 of fixed tuples — byte-identical
  * re-runs. No ground-truth columns: HtmlExtractSpec recomputes
  * expectations from these emission rules and q151's oracle re-runs
  * the identical extraction in DuckDB.
  */
object GenHtmlFixture {
  val NumPages = 200

  private val Vocab = Seq("key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "part", "hash", "merge", "batch", "window",
    "spark", "order", "data", "column", "join", "small", "line",
    "customer", "query", "filter", "vector", "dup", "the", "a", "of")

  private def h(tag: String, page: Long, i: Int): Int =
    MurmurHash3.productHash((tag, page, i))

  private def word(tag: String, page: Long, i: Int): String =
    Vocab(math.floorMod(h(tag, page, i), Vocab.size))

  private def words(tag: String, page: Long, n: Int): String =
    (0 until n).map(i => word(tag, page, i)).mkString(" ")

  private def link(tag: String, page: Long, i: Int): String =
    s"""<a href="/${word(tag + "h", page, i)}">${word(tag, page, i)} """ +
      s"""${word(tag + "b", page, i)}</a>"""

  def nav(page: Long): String =
    "<nav>" + (0 until 5).map(i => link("nav", page, i)).mkString(" ") +
      "</nav>"

  def footer(page: Long): String =
    "<footer>" + (0 until 3).map(i => link("ft", page, i)).mkString(" ") +
      " copyright 2024</footer>"

  def sidebar(page: Long): String =
    """<div class="related">""" +
      (0 until 4).map(i => link("sb", page, i)).mkString(" ") + "</div>"

  def paragraph(page: Long, p: Int): String = {
    val n = 20 + math.floorMod(h("plen", page, p), 41)
    val body = (0 until n).map { i =>
      val w = word("p" + p, page, i)
      math.floorMod(h("dec", page, p * 100 + i), 17) match {
        case 0 => s"<b>$w</b>"
        case 1 => s"$w &amp; ${word("amp" + p, page, i)}"
        case 2 if i == n / 2 => link("pl" + p, page, i) // ≤1 inline link
        case _ => w
      }
    }.mkString(" ")
    s"<p>$body</p>"
  }

  /** Long link-farm paragraph: passes min-length, fails density. */
  def linkFarm(page: Long): String =
    "<p>" + (0 until 12).map(i => link("lf", page, i))
      .mkString(" and ") + "</p>"

  def numParagraphs(page: Long): Int =
    if (page % 11 == 5) 0 else 2 + math.floorMod(h("np", page, 0), 4)

  def html(page: Long): String = {
    val title = words("ti", page, 3)
    val paras = (0 until numParagraphs(page))
      .map(p => paragraph(page, p)).mkString("")
    val farm = if (page % 7 == 3) linkFarm(page) else ""
    s"""<html><head><title>$title</title>""" +
      s"""<script type="text/javascript">var x = ${page}; """ +
      s"""function f() { return x < 2 }</script></head>""" +
      s"""<body><!-- page $page -->${nav(page)}<h1>$title</h1>""" +
      paras + farm + sidebar(page) + footer(page) +
      "</body></html>"
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-html", coresOverride = Some("2"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def writeSingle(df: org.apache.spark.sql.DataFrame,
        dest: String): Unit = {
      val tmp = Files.createTempDirectory("graft-fix").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .map(_.getPath)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
        .head
      Files.createDirectories(Paths.get(dest).getParent)
      Files.move(Paths.get(part), Paths.get(dest),
        StandardCopyOption.REPLACE_EXISTING)
    }

    val pages = (0L until NumPages.toLong).map(id => (id, html(id)))
      .toDF("page_id", "html")
    writeSingle(pages, Fixtures.htmlPagesPath)
    println(s"wrote ${Fixtures.htmlPagesPath}")
    spark.stop()
  }
}
