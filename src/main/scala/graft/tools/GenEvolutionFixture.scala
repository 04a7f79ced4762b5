package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Writes the schema-evolution ingest fixture: the sf0.01 documents
  * split into two parquet "snapshots" whose schemas differ the way
  * real recurring dumps drift —
  *
  *  - `snap1.parquet`: doc_ids ending 0–6, original five columns;
  *  - `snap2.parquet`: doc_ids ending 7–9, DROPS `source` and ADDS a
  *    `quality` double (a deterministic function of n_chars).
  *
  * Single FILES (not part-directories) so DuckDB's
  * `read_parquet([..], union_by_name=true)` and Spark's per-file reads
  * open identical bytes; derived deterministically from the committed
  * sf0.01 parquet (row order fixed by doc_id), so regeneration is
  * byte-stable.
  */
object GenEvolutionFixture {
  val Dir = "/root/repo/fixtures/evolution"

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-evolution",
      coresOverride = Some("2"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-evo").toString
      df.orderBy("doc_id").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .map(_.getPath).filter(_.endsWith(".parquet")).head
      Files.createDirectories(Paths.get(Dir))
      Files.move(Paths.get(part), Paths.get(s"$Dir/$name"),
        StandardCopyOption.REPLACE_EXISTING)
      println(s"wrote $Dir/$name")
    }
    writeOne(docs.filter(col("doc_id") % 10 <= 6), "snap1.parquet")
    writeOne(docs.filter(col("doc_id") % 10 >= 7)
      .drop("source")
      .withColumn("quality",
        round(col("n_chars").cast("double") / 1000d, 4)),
      "snap2.parquet")
    spark.stop()
  }
}
