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

  /** The PQ codebook flattened for the in-row [[graft.plans.PqCodes]] /
    * [[graft.plans.PqLut]] kernels: entry (m, cid) dim d at
    * `(m*K + cid)*subDim + d`. Driver-side collect of a 128-row
    * broadcast-sized fixture (same class as the chunk-bounds and
    * k-means-training collects — metadata, not a data path), cached per
    * session so repeated query builds don't re-read the parquet.
    */
  def pqCodebookFlat(s: SparkSession, k: Int, subDim: Int): Array[Double] =
    flatCache.computeIfAbsent((s, k, subDim), _ => {
      val rows = pqCodebook(s).collect()
      val m = rows.length / k
      val flat = new Array[Double](m * k * subDim)
      rows.foreach { r =>
        val mi = r.getAs[Int]("m")
        val cid = r.getAs[Int]("cid")
        val cv = r.getAs[scala.collection.Seq[Double]]("cv")
        var d = 0
        while (d < subDim) {
          flat((mi * k + cid) * subDim + d) = cv(d)
          d += 1
        }
      }
      flat
    })

  private val flatCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, Int, Int),
      Array[Double]]()

  /** The IVF centroid table packed for the in-row
    * [[graft.plans.CentroidTopK]] kernel: per cid (ascending, dense),
    * `[cn, cv(0), …, cv(dim-1)]` where cn is the L2 norm computed with
    * the same sequential accumulation as [[graft.plans.L2Norm]] (so
    * cosines downstream are bit-identical to the relational spelling).
    */
  def ivfCentroidsPacked(s: SparkSession): Array[Double] =
    packedCache.computeIfAbsent(s, _ => {
      val rows = ivfCentroids(s).collect()
      val dim = rows.head.getAs[scala.collection.Seq[Double]]("cv").length
      val flat = new Array[Double](rows.length * (dim + 1))
      rows.foreach { r =>
        val cid = r.getAs[Int]("cid")
        val cv = r.getAs[scala.collection.Seq[Double]]("cv")
        var acc = 0.0
        var d = 0
        while (d < dim) { val x = cv(d); acc += x * x; d += 1 }
        val off = cid * (dim + 1)
        flat(off) = math.sqrt(acc)
        d = 0
        while (d < dim) { flat(off + 1 + d) = cv(d); d += 1 }
      }
      flat
    })

  private val packedCache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      Array[Double]]()

  /** Drop this session's packed-fixture entries — called from
    * [[Caches.clear]] so a long-lived process creating many sessions
    * doesn't pin dead sessions (and their arrays) in these maps.
    */
  private[graft] def dropSession(s: SparkSession): Unit = {
    packedCache.remove(s)
    val it = flatCache.keySet.iterator()
    while (it.hasNext) if (it.next()._1 eq s) it.remove()
  }
}
