package graft.tools

import graft.{Fixtures, Sessions}
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.util.hashing.MurmurHash3

/** Writes `fixtures/line_corpus.parquet` (doc_id, lang, text): a
  * MULTI-LINE document corpus with planted cross-document boilerplate
  * — the input the line-level dedup pass (q167, the RefinedWeb /
  * CCNet line-wise correction) needs, because the driver's synthetic
  * documents are single-line word salad with no shared lines at all.
  *
  * Three line populations, all derived from MurmurHash3 of fixed
  * tuples (byte-identical re-runs):
  *
  *  - BOILERPLATE: 12 fixed web-chrome lines (cookie banners, nav,
  *    footers) planted into ~1/4 of every document's line slots —
  *    each ends up in hundreds of documents, far above any sane
  *    document-frequency threshold;
  *  - CONTENT: per-slot word-salad lines carrying a doc+slot-derived
  *    salt word, so no two content lines collide across documents —
  *    document frequency exactly 1;
  *  - PLANTED NEAR-THRESHOLD: six special lines, line j copied into
  *    exactly j+2 distinct documents (df 2..7) — the population that
  *    pins the df >= K boundary exactly (at K = 4: df-3 lines must
  *    survive, df-4 lines must go). Appended at the END of their host
  *    docs so LineDedupSpec can recompute expectations positionally.
  *
  * No ground-truth columns are written (the PiiFixture discipline):
  * the q167 oracle recomputes document frequencies relationally in
  * DuckDB, and LineDedupSpec recomputes expected removals from these
  * emission rules, so a dedup that drifts fails loudly.
  */
object GenLineFixture {
  val NumDocs = 400
  val Langs: Seq[String] = Seq("en", "de", "es", "fr")

  /** df >= Threshold ⇒ boilerplate (q167 and the spec share it). */
  val Threshold = 4

  val Boilerplate: Seq[String] = Seq(
    "accept all cookies to continue",
    "subscribe to our newsletter for updates",
    "home news sports opinion contact",
    "all rights reserved 2024",
    "share this article on social media",
    "sign in or create an account",
    "advertisement continue reading below",
    "related articles you may also like",
    "terms of service and privacy policy",
    "download our app for the best experience",
    "comments are closed for this article",
    "back to top of page")

  /** Special line j (j = 0..5) with document frequency j+2. */
  def plantedLine(j: Int): String =
    s"planted shared passage number $j repeated across documents"

  /** The doc ids hosting [[plantedLine]](j) — j+2 docs, disjoint
    * blocks of 10 so hosts never overlap.
    */
  def plantedHosts(j: Int): Seq[Long] =
    (0 until j + 2).map(k => (j * 10 + k).toLong)

  private val Vocab = Seq("stream", "corpus", "token", "shard", "batch",
    "window", "filter", "sample", "metric", "vector", "index", "query",
    "cache", "merge", "scan", "order", "value", "table", "layer",
    "model", "epoch", "buffer", "signal", "record", "output")

  private def h(tag: String, doc: Long, i: Int): Int =
    MurmurHash3.productHash((tag, doc, i))

  private def pick[T](xs: Seq[T], tag: String, doc: Long, i: Int): T =
    xs(math.floorMod(h(tag, doc, i), xs.size))

  /** One content line: 4–8 vocab words plus a doc+slot salt word
    * (hex of the slot hash) — cross-document df is 1 by construction.
    */
  def contentLine(doc: Long, slot: Int): String = {
    val n = 4 + math.floorMod(h("cn", doc, slot), 5)
    val words = (0 until n).map(i => pick(Vocab, "cw" + i, doc, slot))
    val salt = Integer.toHexString(h("salt", doc, slot))
    (words :+ s"x$salt").mkString(" ")
  }

  /** The document's lines, in order: ~1/4 boilerplate slots, content
    * elsewhere, planted lines appended at the end for host docs.
    */
  def docLines(doc: Long): Seq[String] = {
    val n = 6 + math.floorMod(h("nl", doc, 0), 13) // 6..18 body lines
    val body = (0 until n).map { slot =>
      if (math.floorMod(h("bp?", doc, slot), 4) == 0)
        pick(Boilerplate, "bp", doc, slot)
      else contentLine(doc, slot)
    }
    val planted = (0 until 6)
      .filter(j => plantedHosts(j).contains(doc))
      .map(plantedLine)
    body ++ planted
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-lines", coresOverride = Some("2"))
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

    val docs = (0L until NumDocs.toLong)
      .map(id => (id, Langs(math.floorMod(h("lang", id, 0), Langs.size)),
        docLines(id).mkString("\n")))
      .toDF("doc_id", "lang", "text")
    writeSingle(docs, Fixtures.lineCorpusPath)
    println(s"wrote ${Fixtures.lineCorpusPath} ($NumDocs docs)")
    spark.stop()
  }
}
