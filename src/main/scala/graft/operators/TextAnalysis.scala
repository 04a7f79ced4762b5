package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators over `documents` — language-ID heuristic,
  * quality scoring, token accounting, content fingerprinting
  * (SURVEY.md §2.11 #15 + the training-data-pipeline tier).
  *
  * Everything is built from codegen'd column expressions whose semantics
  * are bit-identical in DuckDB (length/replace/split/md5), so every query
  * here is oracle-checked. All are embarrassingly partition-parallel:
  * per-document scalar work then a keyed aggregation.
  */
object TextAnalysis {

  /** # occurrences of `w` in `t` (non-overlapping), via length deltas —
    * avoids engine-specific regex count functions.
    */
  private def occ(t: Column, w: String): Column =
    (length(t) - length(expr(s"replace($tName, '$w', '')"))) / w.length
  private val tName = "text"

  private def occSql(w: String): String =
    s"(length(text) - length(replace(text, '$w', ''))) / ${w.length}"

  // Language-ID n-gram/stopword heuristic: deterministic CASE over
  // marker-token occurrence counts, reported as a confusion matrix
  // against the labeled lang column.
  val q28LangId: QueryDef = QueryDef(
    "q28_lang_id",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val pred = when(occ(col("text"), " the ") >= 2, "en")
        .when(occ(col("text"), " a ") >= 3, "es")
        .when(occ(col("text"), "window") >= 2, "de")
        .when(occ(col("text"), "stream") >= 2, "fr")
        .otherwise("zh")
      d.select(col("lang"), pred.as("pred"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")
    },
    Some(s"""SELECT lang,
            |  CASE WHEN ${occSql(" the ")} >= 2 THEN 'en'
            |       WHEN ${occSql(" a ")} >= 3 THEN 'es'
            |       WHEN ${occSql("window")} >= 2 THEN 'de'
            |       WHEN ${occSql("stream")} >= 2 THEN 'fr'
            |       ELSE 'zh' END AS pred,
            |  COUNT(*) AS n
            |FROM documents GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin))

  // Quality scoring: token counts, average token length, stopword ratio,
  // quality bucket. Ratios are single double divisions of exact integers.
  val q29Quality: QueryDef = QueryDef(
    "q29_quality",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .withColumn("w", split(lower(col("text")), " "))
        .withColumn("n_tokens", size(col("w")))
        .withColumn("n_stop", expr(
          "size(filter(w, t -> t = 'the' OR t = 'a' OR t = 'of'))"))
      d.select(
        col("doc_id"),
        col("n_tokens"),
        graft.Round4(col("n_chars").cast(DoubleType) / col("n_tokens"))
          .as("avg_tok_len"),
        graft.Round4(col("n_stop").cast(DoubleType) / col("n_tokens"))
          .as("stop_ratio"),
        when(col("n_tokens") < 20, "short")
          .when(col("n_tokens") > 80, "long")
          .otherwise("good").as("bucket"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  len(string_split(lower(text), ' ')) AS n_tokens,
           |  floor((CAST(n_chars AS DOUBLE) /
           |        len(string_split(lower(text), ' '))) * 10000 + 0.5)
           |    / 10000 AS avg_tok_len,
           |  floor((CAST(len(list_filter(string_split(lower(text), ' '),
           |          t -> t = 'the' OR t = 'a' OR t = 'of')) AS DOUBLE) /
           |        len(string_split(lower(text), ' '))) * 10000 + 0.5)
           |    / 10000 AS stop_ratio,
           |  CASE WHEN len(string_split(lower(text), ' ')) < 20 THEN 'short'
           |       WHEN len(string_split(lower(text), ' ')) > 80 THEN 'long'
           |       ELSE 'good' END AS bucket
           |FROM documents ORDER BY doc_id""".stripMargin))

  // Token accounting per (lang, source) — corpus-statistics aggregation.
  val q30TokenStats: QueryDef = QueryDef(
    "q30_token_stats",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("docs"),
          sum(size(split(col("text"), " "))).as("tokens"),
          sum(col("n_chars")).as("chars"))
        .orderBy("lang", "source"),
    // CAST sums to BIGINT: DuckDB SUM(int) yields HUGEINT, which arrives
    // as decimal128 through Arrow and hash-mismatches Spark's int64.
    Some("""SELECT lang, source, COUNT(*) AS docs,
           |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens,
           |  CAST(SUM(n_chars) AS BIGINT) AS chars
           |FROM documents GROUP BY lang, source
           |ORDER BY lang, source""".stripMargin),
    bench = true)

  // Content fingerprinting: md5 of normalized text (the reference
  // fingerprints config/schema state the same way, SHA-256 at
  // checkpoint_compat.go:48-87).
  val q31Fingerprint: QueryDef = QueryDef(
    "q31_fingerprint",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          md5(lower(col("text")).cast(BinaryType)).as("fp"))
        .orderBy("doc_id"),
    Some("SELECT doc_id, md5(lower(text)) AS fp FROM documents " +
      "ORDER BY doc_id"))

  // F2-analog: binary → canonical 8-4-4-4-12 UUID formatting, built from
  // the md5 hex digest (reference binary16→uuid is the same reshaping,
  // source_mysql.go:652-668).
  val q32UuidFormat: QueryDef = QueryDef(
    "q32_uuid_format",
    (s, dir) => {
      val hex = md5(col("text").cast(BinaryType))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), concat_ws("-",
          substring(hex, 1, 8), substring(hex, 9, 4), substring(hex, 13, 4),
          substring(hex, 17, 4), substring(hex, 21, 12)).as("uuid"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  concat_ws('-', substring(md5(text), 1, 8),
           |    substring(md5(text), 9, 4), substring(md5(text), 13, 4),
           |    substring(md5(text), 17, 4), substring(md5(text), 21, 12))
           |    AS uuid
           |FROM documents ORDER BY doc_id""".stripMargin))

  // BPE-ish subword-style token accounting: a GPT-2-shaped regex
  // (letter runs / digit runs / punctuation runs, each with optional
  // leading space) rather than whitespace splitting. The pattern stays
  // within the regex subset Java and RE2 interpret identically.
  val q47BpeTokens: QueryDef = QueryDef(
    "q47_bpe_tokens",
    (s, dir) => {
      val pat = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0)))
            .as("bpe_tokens"),
          size(split(col("text"), " ")).as("ws_tokens"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("docs"),
          sum(col("bpe_tokens")).as("bpe_total"),
          sum(col("ws_tokens")).as("ws_total"))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS docs,
           |  CAST(SUM(len(regexp_extract_all(text,
           |    ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))) AS BIGINT)
           |    AS bpe_total,
           |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_total
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  // Rolling-hash document fingerprint: polynomial hash over codepoints,
  // h := (h*31 + cp) mod 1e9+7 — the incremental-hash shape a
  // Rabin-Karp chunker builds on. Runs as the native codegen'd
  // graft_rolling_hash expression (plans.RollingHash), not an
  // interpreted aggregate() lambda; mod keeps every intermediate
  // < 2^63 so both engines evaluate identical arithmetic.
  val q48RollingHash: QueryDef = QueryDef(
    "q48_rolling_hash",
    (s, dir) => {
      graft.functions.VectorOps.register(s)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.VectorOps.rollingHash(col("text")).as("rh"))
        .orderBy("doc_id")
    },
    // list_filter drops the '' element DuckDB yields for an empty
    // string (unicode('') = -1 would poison the fold; Spark returns 0)
    Some("""SELECT doc_id,
           |  list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    list_transform(
           |      list_filter(regexp_split_to_array(text, ''),
           |        c -> c <> ''),
           |      c -> CAST(unicode(c) AS BIGINT))),
           |    (h, c) -> (h * 31 + c) % 1000000007) AS rh
           |FROM documents ORDER BY doc_id""".stripMargin))

  // Scrubbing/redaction (training-data cleaning): numeric literals in
  // the events props JSON replaced by a placeholder; counts verify how
  // many values were touched. Pattern stays in the Java∩RE2 subset.
  val q56Redact: QueryDef = QueryDef(
    "q56_redact",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          regexp_replace(col("props"), "[0-9]+", "<NUM>").as("scrubbed"),
          size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)))
            .as("n_redacted"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
           |  regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS scrubbed,
           |  len(regexp_extract_all(props, '[0-9]+')) AS n_redacted
           |FROM events ORDER BY event_id""".stripMargin))

  // Deterministic train/val/test split — the reproducible alternative
  // to rand()-based sampling: assignment is a pure function of the key
  // (doc_id mod 100 → 80/10/10), so every engine and every rerun agrees,
  // and the split survives repartitioning. Reported as per-(lang, split)
  // counts.
  val q57Split: QueryDef = QueryDef(
    "q57_split",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("split",
          when(col("doc_id") % 100 < 80, "train")
            .when(col("doc_id") % 100 < 90, "val")
            .otherwise("test"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
        .select(col("lang"), col("split"), col("docs"),
          col("chars").cast("long").as("chars"))
        .orderBy("lang", "split"),
    Some("""SELECT lang,
           |  CASE WHEN doc_id % 100 < 80 THEN 'train'
           |       WHEN doc_id % 100 < 90 THEN 'val'
           |       ELSE 'test' END AS split,
           |  COUNT(*) AS docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS chars
           |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin))

  // Deterministic CONTENT-hash sampling — the key-based split above
  // (q57) follows ids; this follows bytes, so exact duplicates land in
  // or out of the sample TOGETHER regardless of id, and the subset is
  // stable across reruns, engines, and repartitioning (no rand()).
  // Selection compares an md5-prefix lexicographically ('1a'/'100' hex
  // buckets ≈ 10.16%), which both engines compute identically. Per-row
  // hash inside the partial aggregate → one keyed exchange. (A pipeline
  // that only needs the SAMPLE — not this query's per-source rates over
  // the full corpus — applies the same predicate as a plain filter and
  // never materializes the unsampled rows.)
  val q60SampleHash: QueryDef = QueryDef(
    "q60_sample_hash",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("in_sample",
          substring(md5(col("text").cast("binary")), 1, 2) < "1a")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("total"),
          sum(when(col("in_sample"), 1L).otherwise(0L)).as("sampled"))
        .select(col("source"), col("total"), col("sampled"),
          graft.Round4(col("sampled").cast("double") / col("total"))
            .as("rate"))
        .orderBy("source"),
    Some("""SELECT source, COUNT(*) AS total,
           |  CAST(SUM(CASE WHEN substr(md5(text), 1, 2) < '1a'
           |           THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
           |  floor((CAST(SUM(CASE WHEN substr(md5(text), 1, 2) < '1a'
           |              THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*))
           |        * 10000 + 0.5) / 10000 AS rate
           |FROM documents GROUP BY source ORDER BY source""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    q28LangId, q29Quality, q30TokenStats, q31Fingerprint, q32UuidFormat,
    q47BpeTokens, q48RollingHash, q56Redact, q57Split, q60SampleHash)
}
