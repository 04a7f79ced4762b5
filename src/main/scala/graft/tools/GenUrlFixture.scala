package graft.tools

import graft.{Fixtures, Sessions}
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.util.hashing.MurmurHash3

/** Writes `fixtures/url_corpus.parquet` (doc_id, lang, url): a crawl
  * manifest whose URLs carry exactly the variation URL
  * canonicalization must collapse (q168 — the dedup-by-URL pass every
  * crawl pipeline runs before content dedup, cf. CCNet/RefinedWeb):
  * scheme differences (http/https, mixed case), a www. prefix, host
  * case, explicit default ports (:80/:443 — :8080 must SURVIVE),
  * trailing path slashes, tracking query params (utm_*, fbclid,
  * sessionid) interleaved with real ones, param order, and fragments.
  *
  * Structure: [[NumCanon]] canonical pages; page b emits `1 + b mod 4`
  * alias documents (consecutive doc_ids starting at [[firstDoc]](b)),
  * each a deterministic variant that canonicalizes back to the same
  * form. The generator writes NO ground-truth columns: the q168
  * oracle re-canonicalizes in DuckDB SQL, and UrlDedupSpec recomputes
  * alias-class sizes and keeper ids from these emission rules.
  *
  * All choices derive from MurmurHash3 of fixed tuples — re-running
  * is byte-identical. Every URL has a non-empty path starting at '/'
  * (the canonicalizer's documented precondition).
  */
object GenUrlFixture {
  val NumCanon = 250
  val Langs: Seq[String] = Seq("en", "de", "es", "fr")

  private val Hosts = Seq("example.com", "news-site.org", "data-hub.io",
    "crawl-target.net", "openweb.dev", "archive-mirror.org")
  private val Seg = Seq("article", "2024", "research", "data", "post",
    "index", "view", "item", "page", "topic")
  private val RealParams = Seq("id", "p", "ref", "lang", "q")
  private val TrackParams = Seq("utm_source", "utm_medium",
    "utm_campaign", "fbclid", "sessionid")

  private def h(tag: String, b: Long, i: Int): Int =
    MurmurHash3.productHash((tag, b, i))

  private def pick[T](xs: Seq[T], tag: String, b: Long, i: Int): T =
    xs(math.floorMod(h(tag, b, i), xs.size))

  def aliasCount(b: Long): Int = 1 + math.floorMod(h("na", b, 0), 4)

  /** First doc_id of canonical page b (aliases are consecutive). */
  def firstDoc(b: Long): Long =
    (0L until b).map(aliasCount).sum

  /** The CANONICAL form of page b (host + path [+ sorted real query])
    * — what q168 must reduce every alias to.
    */
  def canonicalOf(b: Long): String = {
    val host = pick(Hosts, "h", b, 0)
    val depth = 1 + math.floorMod(h("d", b, 0), 3)
    val path = (0 until depth)
      .map(i => pick(Seg, "s" + i, b, 0) + math.floorMod(h("sn" + i, b, 0), 100))
      .mkString("/", "/", "")
    val np = math.floorMod(h("np", b, 0), 3) // 0..2 real params
    val params = (0 until np)
      .map(i => s"${pick(RealParams, "pk" + i, b, 0)}=${math.floorMod(h("pv" + i, b, 0), 1000)}")
      .distinct.sorted
    host + path +
      (if (params.nonEmpty) "?" + params.mkString("&") else "")
  }

  /** Alias i of page b: re-dress the canonical form with
    * canonicalization-invariant noise.
    */
  def aliasUrl(b: Long, i: Int): String = {
    val canon = canonicalOf(b)
    val qPos = canon.indexOf('?')
    val hostPath = if (qPos < 0) canon else canon.substring(0, qPos)
    val slash = hostPath.indexOf('/')
    val host0 = hostPath.substring(0, slash)
    val path0 = hostPath.substring(slash)
    val params0 =
      if (qPos < 0) Seq.empty[String]
      else canon.substring(qPos + 1).split("&").toSeq

    val https = math.floorMod(h("sc", b, i), 2) == 0
    val scheme = math.floorMod(h("scc", b, i), 3) match {
      case 0 => if (https) "https" else "http"
      case 1 => if (https) "HTTPS" else "HTTP"
      case _ => if (https) "Https" else "Http"
    }
    val host1 = math.floorMod(h("hc", b, i), 3) match {
      case 0 => host0
      case 1 => host0.toUpperCase
      case _ => "www." + host0
    }
    val host2 =
      if (math.floorMod(h("pt", b, i), 3) == 0)
        host1 + (if (https) ":443" else ":80")
      else host1
    val path1 =
      if (math.floorMod(h("ts", b, i), 2) == 0) path0 + "/" else path0
    // interleave tracking params and shuffle order deterministically
    val track = (0 until math.floorMod(h("ntk", b, i), 3))
      .map(k => s"${pick(TrackParams, "tk" + k, b, i)}=${math.floorMod(h("tv" + k, b, i), 100)}")
    val allParams =
      new scala.util.Random(h("ord", b, i).toLong)
        .shuffle((params0 ++ track).toList)
    val frag =
      if (math.floorMod(h("fr", b, i), 2) == 0)
        "#" + pick(Seg, "fs", b, i)
      else ""
    s"$scheme://$host2$path1" +
      (if (allParams.nonEmpty) "?" + allParams.mkString("&") else "") +
      frag
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-urls", coresOverride = Some("2"))
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

    val rows = (0L until NumCanon.toLong).flatMap { b =>
      val d0 = firstDoc(b)
      (0 until aliasCount(b)).map { i =>
        (d0 + i, Langs(math.floorMod(h("lang", b, i), Langs.size)),
          aliasUrl(b, i))
      }
    }.toDF("doc_id", "lang", "url")
    writeSingle(rows, Fixtures.urlCorpusPath)
    println(s"wrote ${Fixtures.urlCorpusPath} (${rows.count()} urls, " +
      s"$NumCanon canonical pages)")
    spark.stop()
  }
}
