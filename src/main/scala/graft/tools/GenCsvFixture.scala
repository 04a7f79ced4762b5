package graft.tools

import graft.{Sessions, Tables}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Writes the CSV ingest fixture (`fixtures/csv/documents.csv`, with
  * header) — the sf0.01 documents table in the other wire format batch
  * metadata commonly arrives in. Single FILE so DuckDB's `read_csv`
  * and Spark's `read.csv` open identical bytes; row order fixed by
  * doc_id so regeneration is byte-stable.
  */
object GenCsvFixture {
  val Dest = "/root/repo/fixtures/csv/documents.csv"

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-csv", coresOverride = Some("2"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .orderBy("doc_id")
    val tmp = Files.createTempDirectory("graft-csv").toString
    docs.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(tmp)
    val part = new java.io.File(tmp).listFiles()
      .map(_.getPath).filter(_.endsWith(".csv")).head
    Files.createDirectories(Paths.get(Dest).getParent)
    Files.move(Paths.get(part), Paths.get(Dest),
      StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $Dest (${docs.count()} rows)")
    spark.stop()
  }
}
