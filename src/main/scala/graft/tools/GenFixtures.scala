package graft.tools

import graft.{Fixtures, Sessions}
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.util.hashing.MurmurHash3

/** Writes the LSH hyperplane fixture (see [[graft.Fixtures]]) as a
  * single parquet FILE (not a Spark part-directory) so DuckDB's
  * `read_parquet('<path>')` and Spark's `read.parquet` both open it.
  *
  * All values derive from MurmurHash3 of fixed tuples — byte-identical
  * across runs, no RNG state. The LSH planes reproduce the exact ±1
  * pattern the round-2 in-query generator used
  * (`Similarity.planeSign`), so q27 results are unchanged by the move
  * to a fixture.
  *
  * The IVF centroid fixture is NOT written here: centroids are trained
  * (k-means over the embeddings corpus, seeded from
  * [[centroidComponent]]) — regenerate via
  * `sbt "runMain graft.tools.TrainCentroids"` so a fixture refresh
  * can't silently revert to the untrained init.
  */
object GenFixtures {
  val Dim = 64
  val LshTables = 8
  val LshBits = 4
  val NumCentroids = 16

  def planeSign(tbl: Int, bit: Int, d: Int): Double =
    if ((MurmurHash3.productHash((tbl, bit, d)) & 1) == 1) 1.0 else -1.0

  /** Centroid component: full signed 32-bit hash scaled by
    * Int.MaxValue — range is (-1 − 2⁻³¹, 1], i.e. marginally below −1
    * when the hash lands on Int.MinValue. Nothing downstream assumes a
    * unit cube (cosine normalizes), and the exact values are frozen in
    * the committed fixture, so the formula is documented rather than
    * re-ranged.
    */
  def centroidComponent(cid: Int, d: Int): Double =
    (MurmurHash3.productHash(("ivf", cid, d)) / Int.MaxValue.toDouble)

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-fixtures",
      coresOverride = Some("2"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val planes = (for {
      tbl <- 0 until LshTables; bit <- 0 until LshBits
    } yield (tbl, bit, (0 until Dim).map(planeSign(tbl, bit, _)).toArray))
      .toDF("tbl", "bit", "plane")

    def writeSingle(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
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
    writeSingle(planes, Fixtures.lshPlanesPath)
    println(s"wrote ${Fixtures.lshPlanesPath} (centroids: run " +
      "graft.tools.TrainCentroids)")
    spark.stop()
  }
}
