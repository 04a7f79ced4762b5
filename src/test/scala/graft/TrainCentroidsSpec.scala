package graft

import graft.tools.{GenFixtures, TrainCentroids}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd's iterations must strictly improve quantization quality (mean
  * best-centroid cosine) over the random-fixture init, keep k centroids
  * with the right dimensionality, and be a pure function of
  * (data, init, iters).
  */
class TrainCentroidsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def vecs = {
    graft.functions.VectorOps.register(spark)
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", graft.functions.VectorOps.l2norm(col("v")))
  }

  test("k-means improves mean best-centroid similarity over random init") {
    val init = TrainCentroids.defaultInit(GenFixtures.NumCentroids,
      GenFixtures.Dim)
    val zero = TrainCentroids.lloyd(vecs, init, 0) // quality AT init
    val five = TrainCentroids.lloyd(vecs, init, 5)
    assert(five.cents.size == GenFixtures.NumCentroids)
    assert(five.cents.forall(_._2.length == GenFixtures.Dim))
    // >= because the mean-update step optimizes squared error, not the
    // cosine it is measured by (a converged plateau yields equality);
    // on this fixture the improvement is decisively real, which the
    // margin below pins
    assert(five.meanBestSim >= zero.meanBestSim,
      s"training regressed: ${zero.meanBestSim} → ${five.meanBestSim}")
    assert(five.meanBestSim - zero.meanBestSim > 0.01,
      s"training did not measurably improve: ${zero.meanBestSim} → " +
        s"${five.meanBestSim}")
  }

  test("training is reproducible given (data, init, iters)") {
    val init = TrainCentroids.defaultInit(4, GenFixtures.Dim)
    val a = TrainCentroids.lloyd(vecs, init, 2)
    val b = TrainCentroids.lloyd(vecs, init, 2)
    // per-dimension double averages can differ in the last ulp between
    // runs (shuffle partial-merge order is not fixed) — assert equality
    // to float-noise tolerance, not bitwise
    val maxDiff = a.cents.map(_._2).zip(b.cents.map(_._2))
      .flatMap { case (x, y) => x.zip(y).map(p => math.abs(p._1 - p._2)) }
      .max
    assert(maxDiff < 1e-12, s"centroids diverged by $maxDiff")
  }
}
