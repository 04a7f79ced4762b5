package graft.tools

import graft.{Fixtures, Sessions}
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.util.hashing.MurmurHash3

/** Writes `fixtures/nfc_docs.parquet` (doc_id, lang, text): ASCII
  * word salad with PLANTED Unicode-normalization variance — the input
  * q183's NFC pass needs. Accented vocabulary appears in BOTH spellings
  * of the same canonical text: precomposed (NFC, "café" = U+00E9) and
  * decomposed (NFD, "cafe" + U+0301) — visually identical strings that
  * hash apart until normalized. No ground-truth columns: the spec and
  * expectations derive from these emission rules.
  *
  * Classes by `doc_id mod 4`: 0 — pure ASCII (already NFC); 1 — 1–3
  * decomposed accent words (normalization CHANGES the text, one
  * combining mark folds per word); 2 — accent words precomposed
  * (already NFC — a detector keying on "has accents" instead of "is
  * normalized" false-positives here); 3 — the NFD TWIN of doc d−1
  * (class 2): same salad, same picks, decomposed spelling —
  * byte-distinct raw, byte-identical after NFC, same lang (the
  * planted signal q184's normalization-aware dedup must fold).
  */
object GenNfcFixture {
  val NumDocs = 240
  val Langs: Seq[String] = Seq("en", "de", "es", "fr")

  /** (precomposed NFC form, decomposed NFD form) pairs. */
  val AccentWords: Seq[(String, String)] = Seq(
    ("caf\u00e9", "cafe\u0301"),
    ("na\u00efve", "nai\u0308ve"),
    ("\u00fcber", "u\u0308ber"),
    ("se\u00f1or", "sen\u0303or"))

  private val Words = Seq("data", "model", "train", "corpus", "token",
    "filter", "clean", "sample", "batch", "shard", "metric", "index")

  private def h(tag: String, d: Long, i: Int): Int =
    MurmurHash3.productHash((tag, d, i))

  /** Class-3 docs are NFD TWINS of their class-2 predecessor (same
    * salad, same accent picks in the same order, decomposed spelling)
    * — byte-distinct raw, byte-IDENTICAL after NFC, and deliberately
    * same-lang so the per-lang dedup audit (q184) stays closed.
    */
  private def baseOf(d: Long): Long =
    if (math.floorMod(d, 4) == 3) d - 1 else d

  def langOf(d: Long): String =
    Langs(math.floorMod(h("lg", baseOf(d), 0), Langs.size))

  /** (decomposed words, precomposed words) planted in doc d. */
  def planted(d: Long): (Seq[String], Seq[String]) = {
    def pick(b: Long, tag: String, n: Int,
        f: ((String, String)) => String) =
      (0 until n).map(i => f(AccentWords(
        math.floorMod(h(tag, b, i), AccentWords.size))))
    math.floorMod(d, 4) match {
      case 1 => (pick(d, "de", 1 + math.floorMod(h("nd", d, 0), 3),
        _._2), Seq.empty)
      case 2 => (Seq.empty,
        pick(d, "pr", 1 + math.floorMod(h("np", d, 0), 3), _._1))
      case 3 => // the twin: d-1's picks, decomposed spelling
        (pick(d - 1, "pr", 1 + math.floorMod(h("np", d - 1, 0), 3),
          _._2), Seq.empty)
      case _ => (Seq.empty, Seq.empty)
    }
  }

  def textOf(d: Long): String = {
    val b = baseOf(d)
    val nw = 6 + math.floorMod(h("nw", b, 0), 8)
    val salad = (0 until nw)
      .map(i => Words(math.floorMod(h("w", b, i), Words.size)))
      .mkString(" ")
    val (de, pre) = planted(d)
    (salad +: (de ++ pre)).mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-nfc", coresOverride = Some("2"))
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
    Files.createDirectories(Paths.get(Fixtures.nfcDocsPath).getParent)
    Files.move(Paths.get(part), Paths.get(Fixtures.nfcDocsPath),
      StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${Fixtures.nfcDocsPath} ($NumDocs docs)")
    spark.stop()
  }
}
