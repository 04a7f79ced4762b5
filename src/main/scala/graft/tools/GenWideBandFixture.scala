package graft.tools

import graft.{Fixtures, Sessions}
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.util.hashing.MurmurHash3

/** Writes the q128 wide-band near-dup fixtures:
  *
  *  - `neardup_embeddings.parquet` (vec_id, embedding float[64]): a
  *    corpus with PLANTED ≥0.9-cosine twins — every id with
  *    id % 10 == 1 is id−1 plus small noise (cos ≈ 0.99), the rest
  *    uniform-random (pairwise cosine ≈ 0 ± 0.12, far below τ). The
  *    driver's own embeddings fixture contains no ≥0.9 pairs, which is
  *    why the τ=0.9 formulation needs its own committed corpus.
  *  - `wideband_planes.parquet` (tbl, bit, plane double[64]): the
  *    ρ-bound geometry at N=400 — B = ⌈log₂N⌉ = 9 sign bits,
  *    L = ⌈4·N^0.154⌉ = 11 tables (ln(1/p₁)/ln(1/p₂) for τ=0.9
  *    twins vs random pairs; same formulas ScaleGrowthSpec scales).
  *    Per-table twin collision ≈ 0.95⁹ ≈ 0.65 ⇒ 11-table recall
  *    ≈ 1 − 0.35¹¹ > 0.999.
  *
  * All values derive from MurmurHash3 of fixed tuples — byte-identical
  * across runs.
  */
object GenWideBandFixture {
  val NumVecs = 400
  val Dim: Int = GenFixtures.Dim
  val BBits = 9
  val LTables = 11
  /** Noise amplitude: cos ≈ 1/√(1+ε²/3·3) … measured ≈ 0.989 at 0.15. */
  val NoiseAmp = 0.15f

  private def u(tag: String, a: Long, b: Int): Float =
    (MurmurHash3.productHash((tag, a, b)) / Int.MaxValue.toDouble).toFloat

  def embedding(id: Long): Array[Float] =
    if (id % 10 == 1)
      Array.tabulate(Dim)(d =>
        u("nd", id - 1, d) + NoiseAmp * u("ndn", id, d))
    else Array.tabulate(Dim)(d => u("nd", id, d))

  def plane(tbl: Int, bit: Int): Array[Double] =
    Array.tabulate(Dim)(d =>
      MurmurHash3.productHash(("wb", tbl, bit, d)) / Int.MaxValue.toDouble)

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-wideband",
      coresOverride = Some("2"))
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

    val emb = (0L until NumVecs.toLong).map(id => (id, embedding(id)))
      .toDF("vec_id", "embedding")
    writeSingle(emb, Fixtures.neardupEmbeddingsPath)

    val planes = (for { t <- 0 until LTables; b <- 0 until BBits }
      yield (t, b, plane(t, b))).toDF("tbl", "bit", "plane")
    writeSingle(planes, Fixtures.widebandPlanesPath)

    println(s"wrote ${Fixtures.neardupEmbeddingsPath} and " +
      Fixtures.widebandPlanesPath)
    spark.stop()
  }
}
