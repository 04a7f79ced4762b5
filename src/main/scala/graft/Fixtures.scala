package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared engine-neutral fixtures (parquet files under `fixtures/`) that
  * BOTH Spark queries and the DuckDB oracle SQL read, so approximate
  * operators (sign-LSH ANN, IVF ANN) become exactly reproducible in two
  * engines: the random element (hyperplanes, centroids) is materialized
  * once, and everything downstream is pure relational algebra.
  *
  * Regenerate with `sbt "runMain graft.tools.GenFixtures"` (deterministic
  * — same bytes every run).
  */
object Fixtures {
  /** Absolute dir so driver-side DuckDB `read_parquet` resolves it
    * regardless of working directory.
    */
  val dir: String =
    sys.env.getOrElse("GRAFT_FIXTURES_DIR", "/root/repo/fixtures")

  val lshPlanesPath = s"$dir/lsh_planes.parquet"
  val ivfCentroidsPath = s"$dir/ivf_centroids.parquet"
  val pqCodebookPath = s"$dir/pq_codebook.parquet"

  def lshPlanes(s: SparkSession): DataFrame = s.read.parquet(lshPlanesPath)
  def ivfCentroids(s: SparkSession): DataFrame =
    s.read.parquet(ivfCentroidsPath)

  /** (m: subspace, cid, cv: double[8]) — trained by
    * [[graft.tools.TrainPqCodebook]].
    */
  def pqCodebook(s: SparkSession): DataFrame =
    s.read.parquet(pqCodebookPath)
}
