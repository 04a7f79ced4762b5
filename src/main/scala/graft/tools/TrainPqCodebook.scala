package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Product-quantization codebook trainer for the PQ/ADC ANN operator
  * (`Similarity.q64AnnPq`): the 64-dim embedding space splits into 8
  * subspaces of 8 dims, each with its own 16-centroid L2 k-means
  * codebook — so a vector encodes to 8 bytes and approximate distances
  * come from 8 table lookups (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011). This is the memory-bound ANN
  * shape for a 10⁹-vector corpus: the encoded corpus is ~64× smaller
  * than raw float vectors.
  *
  * Training runs ON THE DRIVER over a bounded sample — deliberately:
  * PQ codebooks train on ~10⁵ sampled vectors at any corpus scale
  * (k·subDim parameters per subspace), so the industry shape is
  * "sample to the driver, train locally, broadcast the codebook". The
  * distributed part of PQ is the ENCODE + ADC query, which is what
  * q64's Spark plan covers. Init is deterministic (MurmurHash3 of
  * fixed tuples), updates are sequential sums over a stable
  * single-file read order → byte-identical fixture every run.
  */
object TrainPqCodebook {
  val Dim = GenFixtures.Dim // 64
  val NumSub = 8
  val SubDim: Int = Dim / NumSub // 8
  val K = 16
  val SampleCap = 100000

  def initComponent(m: Int, cid: Int, d: Int): Double =
    (scala.util.hashing.MurmurHash3.productHash(("pq", m, cid, d))
      / Int.MaxValue.toDouble)

  private def sq(x: Double) = x * x

  /** L2 Lloyd's over one subspace's sample; ties go to the lower cid
    * (the same tie rule the encode query uses). Returns (centroids,
    * mean squared quantization error).
    */
  def lloydL2(data: Array[Array[Double]], init: Array[Array[Double]],
      iters: Int): (Array[Array[Double]], Double) = {
    var cents = init.map(_.clone())
    def nearest(v: Array[Double]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        var d = 0.0
        var i = 0
        while (i < v.length) { d += sq(v(i) - cents(c)(i)); i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    for (_ <- 1 to iters) {
      val sums = Array.fill(cents.length)(new Array[Double](SubDim))
      val counts = new Array[Long](cents.length)
      data.foreach { v =>
        val c = nearest(v)
        counts(c) += 1
        var i = 0
        while (i < SubDim) { sums(c)(i) += v(i); i += 1 }
      }
      cents = cents.zipWithIndex.map { case (prev, c) =>
        if (counts(c) == 0) prev // empty cell keeps its centroid
        else sums(c).map(_ / counts(c))
      }
    }
    val mse = data.map { v =>
      val c = nearest(v)
      var d = 0.0
      var i = 0
      while (i < SubDim) { d += sq(v(i) - cents(c)(i)); i += 1 }
      d
    }.sum / math.max(data.length, 1)
    (cents, mse)
  }

  /** usage: TrainPqCodebook [sfDir] [iters] [outPath] */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 20
    val out = if (args.length > 2) args(2) else graft.Fixtures.pqCodebookPath
    val spark = graft.Sessions.build("graft-train-pq",
      coresOverride = Some("4"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sample: Array[Array[Double]] =
      Tables.load(spark, sfDir, "embeddings")
        .select(col("embedding").cast("array<double>"))
        .limit(SampleCap)
        .collect().map(_.getSeq[Double](0).toArray)
    val rows = (0 until NumSub).flatMap { m =>
      val sub = sample.map(_.slice(m * SubDim, (m + 1) * SubDim))
      val init = Array.tabulate(K, SubDim)(initComponent(m, _, _))
      val (cents, mse) = lloydL2(sub, init, iters)
      println(f"subspace $m: mse=$mse%.5f")
      cents.zipWithIndex.map { case (cv, cid) => (m, cid, cv) }
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq").toString
    rows.toDF("m", "cid", "cv").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles().map(_.getPath)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(out),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $out (8 subspaces x $K centroids, $iters iters)")
    spark.stop()
  }
}
