package graft.tools

import graft.{Fixtures, Sessions}
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.util.hashing.MurmurHash3

/** Writes `fixtures/moji_docs.parquet` (doc_id, lang, text): ASCII
  * word-salad documents with PLANTED encoding-corruption artifacts —
  * the input the q181 mojibake detector needs. Like the PII fixture,
  * no ground-truth columns are written: the spec recomputes every
  * expected count from these emission rules.
  *
  * Classes by `doc_id mod 5`:
  *  0 — clean;
  *  1 — 1–3 U+FFFD replacement characters (a decoder already gave
  *      up — the strongest corruption signal);
  *  2 — 1–2 C0 control characters from the q181 control set
  *      (U+0001, U+000B, U+001F — never \t\n\r, which are legal);
  *  3 — 1–3 classic UTF-8-read-as-Latin-1/cp1252 artifacts from
  *      [[MojiTokens]] ("Ã©" = C3 A9, "Ã¼" = C3 BC, "â€™" = E2 80 99,
  *      "â€œ" = E2 80 9C — the sequences ftfy's detector keys on);
  *  4 — one of each class (mixed corruption).
  *
  * Artifacts are space-separated tokens appended to the salad, so no
  * planted sequence can overlap another or the ASCII base.
  */
object GenMojibakeFixture {
  val NumDocs = 300
  val Langs: Seq[String] = Seq("en", "de", "es", "fr")
  val MojiTokens: Seq[String] = Seq("Ã©", "Ã¼", "â€™", "â€œ")
  val CtrlChars: Seq[Char] = Seq('\u0001', '\u000B', '\u001F')

  private val Words = Seq("data", "model", "train", "corpus", "token",
    "filter", "clean", "sample", "batch", "shard", "metric", "index")

  private def h(tag: String, d: Long, i: Int): Int =
    MurmurHash3.productHash((tag, d, i))

  def langOf(d: Long): String =
    Langs(math.floorMod(h("lg", d, 0), Langs.size))

  /** (n_repl, n_ctrl, n_moji) planted in doc d — the ground truth the
    * spec and the oracle-side expectations derive from.
    */
  def planted(d: Long): (Int, Int, Int) = math.floorMod(d, 5) match {
    case 1 => (1 + math.floorMod(h("r", d, 0), 3), 0, 0)
    case 2 => (0, 1 + math.floorMod(h("c", d, 0), 2), 0)
    case 3 => (0, 0, 1 + math.floorMod(h("m", d, 0), 3))
    case 4 => (1, 1, 1)
    case _ => (0, 0, 0)
  }

  def textOf(d: Long): String = {
    val nw = 6 + math.floorMod(h("nw", d, 0), 8)
    val salad = (0 until nw)
      .map(i => Words(math.floorMod(h("w", d, i), Words.size)))
      .mkString(" ")
    val (nr, nc, nm) = planted(d)
    val repl = Seq.fill(nr)("\uFFFD")
    val ctrl = (0 until nc).map(i =>
      CtrlChars(math.floorMod(h("cc", d, i), CtrlChars.size)).toString)
    val moji = (0 until nm).map(i =>
      MojiTokens(math.floorMod(h("mt", d, i), MojiTokens.size)))
    (salad +: (repl ++ ctrl ++ moji)).mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-moji", coresOverride = Some("2"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (0L until NumDocs.toLong)
      .map(d => (d, langOf(d), textOf(d)))
      .toDF("doc_id", "lang", "text")
    val tmp = Files.createTempDirectory("graft-fix").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .map(_.getPath)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      .head
    Files.createDirectories(Paths.get(Fixtures.mojiDocsPath).getParent)
    Files.move(Paths.get(part), Paths.get(Fixtures.mojiDocsPath),
      StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${Fixtures.mojiDocsPath} ($NumDocs docs)")
    spark.stop()
  }
}
