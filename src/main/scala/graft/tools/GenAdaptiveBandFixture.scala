package graft.tools

import graft.{Fixtures, Sessions}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Writes `fixtures/adaptive_planes_tau04.parquet`: the ρ-bound
  * sign-LSH geometry at the q58 near-dup threshold (τ = 0.4), sized for
  * the largest driver corpus (N = 2000 embeddings at sf0.1) —
  * `Similarity.adaptiveGeometry(2000, 0.4)` = 11 bits × 623 tables.
  * q135 runs `wideBandNeardup` over the DRIVER embeddings with these
  * planes; with the randomness materialized the query is exact
  * relational algebra and DuckDB reproduces it bit-for-bit.
  *
  * Plane values are `Similarity.adaptivePlanes`' MurmurHash3 of fixed
  * tuples — byte-identical across runs.
  */
object GenAdaptiveBandFixture {
  /** sf0.1 embeddings cardinality — the largest corpus the driver
    * feeds the catalog; the geometry must hold THERE (a bigger corpus
    * than the geometry's N only degrades bucket occupancy, never
    * correctness).
    */
  val CorpusN = 2000L
  val Tau = 0.4

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-adaptive",
      coresOverride = Some("2"))
    spark.sparkContext.setLogLevel("WARN")

    val planes = graft.operators.Similarity
      .adaptivePlanes(spark, CorpusN, Tau, GenFixtures.Dim)

    val tmp = Files.createTempDirectory("graft-fix").toString
    planes.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .map(_.getPath)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      .head
    Files.createDirectories(
      Paths.get(Fixtures.adaptivePlanesTau04Path).getParent)
    Files.move(Paths.get(part),
      Paths.get(Fixtures.adaptivePlanesTau04Path),
      StandardCopyOption.REPLACE_EXISTING)

    val (b, l) = graft.operators.Similarity
      .adaptiveGeometry(CorpusN, Tau)
    println(s"wrote ${Fixtures.adaptivePlanesTau04Path} " +
      s"(B=$b bits x L=$l tables)")
    spark.stop()
  }
}
