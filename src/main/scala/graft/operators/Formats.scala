package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Non-parquet ingest formats. The reference's sources are live JDBC
  * catalogs (graft.sources covers those); training-data pipelines
  * additionally ingest line-delimited JSON dumps — web scrapes, API
  * exports, CommonCrawl derivatives all arrive as JSONL — so the
  * engine needs a first-class schema'd JSONL scan, not just parquet.
  *
  * The scan reads with an EXPLICIT schema (the documents table's),
  * never inference: at 100 TB, schema inference is a full extra pass
  * over the corpus before the first real job, and a silently widened
  * type (one row's "3.0") corrupts every downstream agg. Line-delimited
  * JSON is splittable, so a large dump parallelizes per-line like any
  * text source.
  */
object Formats {

  /** The committed JSONL ingest fixture (sf0.01 documents, one JSON
    * object per line) — SF-independent like the LSH-plane fixture, so
    * both engines read the identical absolute path at every SF.
    * Regenerate: `sbt "runMain graft.tools.GenJsonlFixture"`.
    */
  val JsonlPath = "/root/repo/fixtures/jsonl/documents.jsonl"

  // JSONL scan → the q30-shaped accounting aggregate, proving the
  // parsed rows (ints, strings, full text bytes) match what the parquet
  // path produced them from: token sums exercise the text verbatim,
  // char sums the numeric fields.
  val q69JsonlScan: QueryDef = QueryDef(
    "q69_jsonl_scan",
    (s, dir) => {
      val schema = Tables.load(s, dir, "documents").schema
      s.read.schema(schema).json(JsonlPath)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("docs"),
          sum(size(split(col("text"), " "))).as("tokens"),
          sum(col("n_chars")).as("chars"))
        .orderBy("lang", "source")
    },
    Some(s"""SELECT lang, source, COUNT(*) AS docs,
            |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens,
            |  CAST(SUM(n_chars) AS BIGINT) AS chars
            |FROM read_json_auto('$JsonlPath')
            |GROUP BY lang, source ORDER BY lang, source""".stripMargin))

  /** The committed CSV ingest fixture (sf0.01 documents with header) —
    * same SF-independence contract as [[JsonlPath]]. Regenerate:
    * `sbt "runMain graft.tools.GenCsvFixture"`.
    */
  val CsvPath = "/root/repo/fixtures/csv/documents.csv"

  // CSV scan — the other wire format batch metadata arrives in. Same
  // explicit-schema discipline as q69 (inference is an extra corpus
  // pass and a type-widening hazard); header row skipped by the
  // reader, not by row filtering, so the scan stays splittable.
  val q73CsvScan: QueryDef = QueryDef(
    "q73_csv_scan",
    (s, dir) => {
      val schema = Tables.load(s, dir, "documents").schema
      s.read.schema(schema).option("header", "true").csv(CsvPath)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs"),
          sum(size(split(col("text"), " "))).as("tokens"),
          sum(col("n_chars")).as("chars"))
        .orderBy("source")
    },
    Some(s"""SELECT source, COUNT(*) AS docs,
            |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens,
            |  CAST(SUM(n_chars) AS BIGINT) AS chars
            |FROM read_csv_auto('$CsvPath', header = true)
            |GROUP BY source ORDER BY source""".stripMargin))

  val all: Seq[QueryDef] = Seq(q69JsonlScan, q73CsvScan)
}
