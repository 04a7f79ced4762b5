package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** PCA component training for the q145 projection operator — the
  * production path for `fixtures/pca_components.parquet`, the same
  * train-offline / apply-in-plan contract as [[TrainCentroids]] /
  * [[TrainPqCodebook]]: the expensive decomposition runs once on a
  * corpus (or a sample — same plan), the resulting tiny component
  * table is committed, and the at-scale query only ever does in-row
  * dot products against it.
  *
  * Covariance comes from the distributed one-pass
  * [[graft.functions.MomentMatrixAggregator]] (kilobytes per task);
  * the d×d eigendecomposition is driver-side deflated power iteration
  * (d = 64 — microseconds; public-domain textbook method) with a
  * deterministic start vector, so reruns produce identical components
  * including sign.
  *
  * Fixture schema: (pcid, w: double[d] — unit-norm component,
  * lambda: double — its eigenvalue, wmu: double — w·mean, so the
  * centered projection is `dot(v, w) − wmu` without shipping the mean
  * vector into every query).
  */
object TrainWhitener {

  /** Top-k eigenpairs of a symmetric PSD matrix by deflated power
    * iteration, deterministic start.
    */
  def topEig(c: Array[Array[Double]], k: Int,
      iters: Int = 1000): Seq[(Double, Array[Double])] = {
    val dim = c.length
    def mul(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(dim)(i => {
        var s = 0.0; var j = 0
        while (j < dim) { s += m(i)(j) * v(j); j += 1 }
        s
      })
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val work = c.map(_.clone())
    (0 until k).map { e =>
      var v = Array.tabulate(dim)(d => math.sin(e + d + 1.0))
      var n = math.sqrt(dot(v, v))
      v = v.map(_ / n)
      for (_ <- 0 until iters) {
        val w = mul(work, v)
        n = math.sqrt(dot(w, w))
        v = w.map(_ / n)
      }
      val lambda = dot(v, mul(work, v))
      for (i <- 0 until dim; j <- 0 until dim)
        work(i)(j) -= lambda * v(i) * v(j)
      (lambda, v)
    }
  }

  final case class Trained(comps: Seq[(Int, Array[Double], Double,
    Double)])

  /** Train on (vec_id, v) vectors: ONE distributed moment pass (the
    * finished buffer carries n, the mean AND the covariance triangle)
    * + a driver-side d×d decomposition.
    */
  def train(vecs: org.apache.spark.sql.DataFrame, dim: Int,
      k: Int): Trained = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val agg = new graft.functions.MomentMatrixAggregator(dim)
    val fin = vecs.select(col("v")).as[Seq[Double]]
      .select(agg.toColumn).head()
    val mu = Array.tabulate(dim)(d => fin(1 + d))
    val c = Array.ofDim[Double](dim, dim)
    var idx = 1 + dim
    for (i <- 0 until dim; j <- i until dim) {
      c(i)(j) = fin(idx); c(j)(i) = fin(idx); idx += 1
    }
    val eigs = topEig(c, k)
    Trained(eigs.zipWithIndex.map { case ((lambda, w), pcid) =>
      (pcid, w, lambda, w.zip(mu).map { case (a, b) => a * b }.sum)
    })
  }

  /** usage: TrainWhitener [sfDir] [k] [outPath] */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 8
    val out = if (args.length > 2) args(2)
      else graft.Fixtures.pcaComponentsPath
    val spark = graft.Sessions.build("graft-train-whitener")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val trained = train(e, GenFixtures.Dim, k)
    val tmp = java.nio.file.Files.createTempDirectory("graft-pca").toString
    trained.comps.toDF("pcid", "w", "lambda", "wmu").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .map(_.getPath)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(out),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $out (k=$k, lambdas=" +
      trained.comps.map(c => f"${c._3}%.5f").mkString(",") + ")")
    spark.stop()
  }
}
