package graft.tools

import graft.{Fixtures, Sessions}
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.util.hashing.MurmurHash3

/** Writes `fixtures/pii_docs.parquet` (doc_id, lang, text): a document
  * corpus with PLANTED personally-identifying strings — emails, North-
  * American-shaped phone numbers, IPv4 addresses — interleaved with
  * word-salad filler and NEGATIVE decoys (version strings, ISO dates,
  * bare integers, floats) that a correct redactor must leave alone.
  * The driver's synthetic documents corpus contains no PII at all,
  * which is why the q149 cleaning pass (C4/Dolma-style pre-training
  * scrub; reference analog: the reference engine's per-row transform
  * family stops at type repair, `migrate.go:459-466`) needs its own
  * committed corpus, like the τ=0.9 near-dup fixture did.
  *
  * Every token derives from MurmurHash3 of fixed tuples — re-running
  * the generator is byte-identical. Planted-count ground truth is NOT
  * written to the fixture on purpose: q149's oracle re-runs the same
  * regexes in DuckDB, and PiiRedactSpec recomputes expected counts
  * from this generator's own emission rules, so a regex that drifts
  * from the planted shapes fails loudly rather than being "confirmed"
  * by a column it also generated.
  */
object GenPiiFixture {
  val NumDocs = 600
  val Langs: Seq[String] = Seq("en", "de", "es", "fr", "zh")

  private val Vocab = Seq("key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "part", "hash", "merge", "batch", "window",
    "spark", "order", "data", "column", "join", "small", "line",
    "customer", "query", "filter", "vector", "dup")
  private val Domains = Seq("example", "mail", "corp", "data", "test")
  private val Tlds = Seq("com", "org", "net", "io")
  private val Decoys = Seq("v1.2.3", "2024-01-15", "3.14", "12345",
    "build 4567", "1.2.3",
    // phone-adjacent shapes the boundary guards must reject: a
    // hyphenated serial and a trailing-digit overrun
    "12345-678-9012", "555-123-45678")

  private def h(tag: String, doc: Long, i: Int): Int =
    MurmurHash3.productHash((tag, doc, i))

  private def pick[T](xs: Seq[T], tag: String, doc: Long, i: Int): T =
    xs(math.floorMod(h(tag, doc, i), xs.size))

  private def digits(tag: String, doc: Long, i: Int, n: Int,
      noLeadZero: Boolean = false): String = {
    val sb = new StringBuilder
    var k = 0
    while (k < n) {
      val d = math.floorMod(h(tag + k, doc, i), 10)
      sb.append(if (noLeadZero && k == 0 && d == 0) 1 else d)
      k += 1
    }
    sb.toString
  }

  def email(doc: Long, i: Int): String =
    s"${pick(Vocab, "eu", doc, i)}.${pick(Vocab, "ev", doc, i)}" +
      s"${digits("ed", doc, i, 2)}@${pick(Domains, "edm", doc, i)}" +
      s".${pick(Tlds, "et", doc, i)}"

  def phone(doc: Long, i: Int): String = {
    val a = digits("pa", doc, i, 3, noLeadZero = true)
    val b = digits("pb", doc, i, 3, noLeadZero = true)
    val c = digits("pc", doc, i, 4)
    math.floorMod(h("pf", doc, i), 4) match {
      case 0 => s"+1 $a $b $c"
      case 1 => s"($a) $b-$c"
      case 2 => s"$a-$b-$c"
      case _ => s"+44-$a-$b-$c"
    }
  }

  def ipv4(doc: Long, i: Int): String =
    (0 to 3).map(k => math.floorMod(h("ip" + k, doc, i), 256))
      .mkString(".")

  /** Planted PII per doc — the ground-truth rule PiiRedactSpec
    * recomputes: doc_id mod 5 selects the mix.
    */
  def planted(doc: Long): (Int, Int, Int) = (doc % 5) match {
    case 0 => (2, 0, 0) // two emails
    case 1 => (0, 1, 1) // a phone and an ip
    case 2 => (1, 1, 0)
    case 3 => (0, 0, 2)
    case _ => (0, 0, 0) // clean doc (only decoys)
  }

  def text(doc: Long): String = {
    val (ne, np, ni) = planted(doc)
    val words = 30 + math.floorMod(h("len", doc, 0), 40)
    val base = (0 until words).map(i => pick(Vocab, "w", doc, i))
    val inserts: Seq[String] =
      (0 until ne).map(i => email(doc, i)) ++
        (0 until np).map(i => phone(doc, i)) ++
        (0 until ni).map(i => ipv4(doc, i)) ++
        (0 until 2).map(i => pick(Decoys, "dc", doc, i))
    // splice each insert at a deterministic word offset (stable order:
    // inserts land left-to-right at increasing positions)
    val step = math.max(1, words / (inserts.size + 1))
    val out = scala.collection.mutable.ArrayBuffer(base: _*)
    inserts.zipWithIndex.foreach { case (ins, k) =>
      out.insert(math.min(out.size, (k + 1) * step + k), ins)
    }
    out.mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-pii", coresOverride = Some("2"))
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
        text(id)))
      .toDF("doc_id", "lang", "text")
    writeSingle(docs, Fixtures.piiDocsPath)
    println(s"wrote ${Fixtures.piiDocsPath}")
    spark.stop()
  }
}
