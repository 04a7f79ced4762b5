package graft.tools

import graft.{Sessions, Tables}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Writes the JSONL ingest fixture (`fixtures/jsonl/documents.jsonl`)
  * — the sf0.01 documents table serialized as one JSON object per line,
  * the wire format web-scrape corpora actually arrive in. A single
  * FILE (not a Spark part-directory) so DuckDB's `read_json` and
  * Spark's `read.json` both open the identical bytes; derived
  * deterministically from the committed sf0.01 parquet, so regeneration
  * is byte-stable (row order fixed by doc_id before serialization).
  */
object GenJsonlFixture {
  val Dest = "/root/repo/fixtures/jsonl/documents.jsonl"

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-jsonl", coresOverride = Some("2"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .orderBy("doc_id")
    val tmp = Files.createTempDirectory("graft-jsonl").toString
    docs.toJSON.coalesce(1).write.mode("overwrite").text(tmp)
    val part = new java.io.File(tmp).listFiles()
      .map(_.getPath).filter(_.endsWith(".txt")).head
    Files.createDirectories(Paths.get(Dest).getParent)
    Files.move(Paths.get(part), Paths.get(Dest),
      StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $Dest (${docs.count()} lines)")
    spark.stop()
  }
}
