package graft.operators

import graft.QueryDef
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + dedup-by-URL — the cheapest dedup pass a
  * crawl pipeline runs, BEFORE any content hashing (CCNet/RefinedWeb
  * dedup stacks start here): collapse the alias noise crawlers see
  * (scheme, host case, `www.`, explicit default ports, trailing
  * slashes, tracking query params, param order, fragments) and keep
  * one document per canonical page.
  *
  * Canonical form = `host + path [+ '?' + sorted surviving params]`
  * where: the fragment and scheme are stripped ((?i)https?://), the
  * host lowercases, loses a leading `www.` and an explicit default
  * port (:80/:443 — other ports survive), the path loses ONE trailing
  * slash, and query params drop the tracking family
  * (`utm_*`/`fbclid`/`sessionid`) then sort. Every rule is a regex in
  * the Java∩RE2 subset or a list op both engines state identically
  * (the q149 discipline); no URL-parsing library on either side, so
  * the two engines cannot diverge on a parser quirk. Precondition
  * (guaranteed by the fixture, documented for callers): the URL has a
  * path — the first '/' after the scheme separates host from path.
  */
object Urls {

  /** The (clean host, canonical form) pair — one shared expression
    * tree so callers that need BOTH never re-parse the canonical
    * string (re-deriving host via `substring_index(canon, '/', 1)` is
    * wrong when the trailing-slash rule empties a root path and a
    * query survives: `http://h.io/?id=1` → canon `h.io?id=1` has no
    * '/', so the re-parse would return `h.io?id=1` as the host).
    */
  def canonicalParts(url: Column): (Column, Column) = {
    val ns = regexp_replace(regexp_replace(url, "#.*$", ""),
      "(?i)^https?://", "")
    val rawHost = substring_index(ns, "/", 1)
    val rest = substr(ns, length(rawHost) + 1)
    val host = regexp_replace(
      regexp_replace(lower(rawHost), "^www\\.", ""), ":(80|443)$", "")
    val path = regexp_replace(substring_index(rest, "?", 1), "/$", "")
    val query = when(instr(rest, "?") > 0,
      substr(rest, instr(rest, "?") + 1)).otherwise(lit(""))
    val params = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[a-z]+|fbclid|sessionid)=")))
    val canon = concat(host, path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
    (host, canon)
  }

  /** Canonicalize a URL column — pure per-row Column expressions
    * (map-only, codegen'd; no UDF, no parser object).
    */
  def canonical(url: Column): Column = canonicalParts(url)._2

  /** The cleaned host alone (lowercased, `www.`/default-port
    * stripped) — carry THIS into per-domain rollups, never a re-parse
    * of the canonical string.
    */
  def hostOf(url: Column): Column = canonicalParts(url)._1

  // Dedup by canonical URL over the committed crawl manifest: one
  // in-row canonicalization pass + ONE canonical-keyed agg (keeper =
  // min doc_id, alias count) — the 100 TB shape is exactly this
  // (map-only rewrite, one keyed exchange; the canonical string is
  // the shuffle key the content-dedup tier then reuses for
  // co-partitioned joins). Output row per canonical page keeps the
  // host column so the per-domain rollup is a free regroup.
  val q168UrlDedup: QueryDef = QueryDef(
    "q168_url_dedup",
    (s, dir) => {
      val (hostC, canonC) = canonicalParts(col("url"))
      graft.Fixtures.read(s, graft.Fixtures.urlCorpusPath)
        .withColumn("canon", canonC)
        .withColumn("host", hostC)
        .groupBy(col("canon"), col("host"))
        .agg(min(col("doc_id")).as("keep_doc"),
          count(lit(1)).as("n_aliases"))
        .orderBy("canon")
    },
    Some(s"""WITH c AS (
           |  SELECT doc_id,
           |    regexp_replace(regexp_replace(url, '#.*$$', ''),
           |      '(?i)^https?://', '') AS ns
           |  FROM read_parquet('${graft.Fixtures.urlCorpusPath}')),
           |h AS (
           |  SELECT doc_id,
           |    regexp_replace(regexp_replace(
           |      lower(split_part(ns, '/', 1)), '^www\\.', ''),
           |      ':(80|443)$$', '') AS host,
           |    substr(ns, length(split_part(ns, '/', 1)) + 1) AS rest
           |  FROM c),
           |p AS (
           |  SELECT doc_id, host,
           |    regexp_replace(split_part(rest, '?', 1), '/$$', '')
           |      AS path,
           |    CASE WHEN strpos(rest, '?') > 0
           |         THEN substr(rest, strpos(rest, '?') + 1)
           |         ELSE '' END AS q
           |  FROM h),
           |n AS (
           |  SELECT doc_id, host,
           |    host || path ||
           |    CASE WHEN len(ps) > 0
           |         THEN '?' || array_to_string(ps, '&')
           |         ELSE '' END AS canon
           |  FROM (SELECT doc_id, host, path,
           |          list_sort(list_filter(string_split(q, '&'),
           |            x -> x <> '' AND NOT regexp_matches(x,
           |              '^(utm_[a-z]+|fbclid|sessionid)='))) AS ps
           |        FROM p) f)
           |SELECT canon, host, MIN(doc_id) AS keep_doc,
           |  COUNT(*) AS n_aliases
           |FROM n GROUP BY canon, host ORDER BY canon""".stripMargin),
    bench = true, lowLatency = true)

  val all: Seq[QueryDef] = Seq(q168UrlDedup)
}
