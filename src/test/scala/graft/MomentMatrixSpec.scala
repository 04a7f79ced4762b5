package graft

import graft.functions.MomentMatrixAggregator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed moment-matrix aggregation behind q144: exact parity
  * with a local fold, partitioning-independence to fp precision, and a
  * power-iteration PCA gate proving the covariance it emits is usable
  * for the whitening / dimensionality-reduction step it exists for.
  */
class MomentMatrixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dim = 8

  private def vecs(n: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(5)
    // correlated structure so the spectrum is non-trivial: component 0
    // leaks into all others
    Seq.fill(n) {
      val base = rnd.nextGaussian()
      Seq.tabulate(dim)(d =>
        if (d == 0) base else 0.5 * base + rnd.nextGaussian())
    }
  }

  private def covUpper(rows: Seq[Seq[Double]]): Array[Double] = {
    val agg = new MomentMatrixAggregator(dim)
    rows.foldLeft(agg.zero)(agg.reduce) match {
      case buf => agg.finish(buf)
    }
  }

  test("distributed fold equals the local fold exactly on one " +
      "partition, and to fp precision across partitionings") {
    import spark.implicits._
    val data = vecs(500)
    val local = covUpper(data)
    val agg = new MomentMatrixAggregator(dim)
    val one = spark.createDataset(data).coalesce(1)
      .select(agg.toColumn).head()
    assert(one.sameElements(local),
      "single-partition distributed fold must be bit-identical")
    val eight = spark.createDataset(data).repartition(8)
      .select(agg.toColumn).head()
    local.indices.foreach { k =>
      val scale = math.max(1.0, math.abs(local(k)))
      assert(math.abs(eight(k) - local(k)) / scale < 1e-12,
        s"slot $k diverged across partitionings: ${eight(k)} vs ${local(k)}")
    }
  }

  test("covariance and mean match the textbook two-pass computation; " +
      "fewer than 2 rows fails loudly") {
    val data = vecs(300)
    val got = covUpper(data)
    val n = data.length
    val mean = Array.tabulate(dim)(d => data.map(_(d)).sum / n)
    for (d <- 0 until dim)
      assert(math.abs(got(1 + d) - mean(d)) < 1e-12,
        s"mean($d): ${got(1 + d)} vs ${mean(d)}")
    var k = 1 + dim
    for (i <- 0 until dim; j <- i until dim) {
      val ref = data.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum /
        (n - 1)
      assert(math.abs(got(k) - ref) < 1e-9,
        s"cov($i,$j): ${got(k)} vs $ref")
      k += 1
    }
    assert(got(0) == n.toDouble)
    val agg = new MomentMatrixAggregator(dim)
    intercept[IllegalArgumentException] {
      agg.finish(vecs(1).foldLeft(agg.zero)(agg.reduce))
    }
    intercept[IllegalArgumentException] { agg.finish(agg.zero) }
  }

  test("power-iteration PCA on the emitted covariance: orthonormal " +
      "top-4 eigenpairs, non-negative descending eigenvalues, " +
      "residual within tolerance") {
    val data = vecs(800)
    val upper = covUpper(data)
    // densify
    val c = Array.ofDim[Double](dim, dim)
    var k = 1 + dim
    for (i <- 0 until dim; j <- i until dim) {
      c(i)(j) = upper(k); c(j)(i) = upper(k); k += 1
    }
    def mul(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(dim)(i =>
        (0 until dim).map(j => m(i)(j) * v(j)).sum)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def norm(v: Array[Double]): Double = math.sqrt(dot(v, v))
    // the SAME implementation production uses — no private spec copy
    // of the algorithm that could drift from it
    val eigs = tools.TrainWhitener.topEig(c, 4)
    val lambdas = eigs.map(_._1).toSeq
    assert(lambdas.forall(_ > 0), s"non-positive eigenvalue: $lambdas")
    assert(lambdas == lambdas.sorted.reverse,
      s"eigenvalues not descending: $lambdas")
    val trace = (0 until dim).map(i => c(i)(i)).sum
    assert(lambdas.sum <= trace + 1e-9,
      s"top-4 mass ${lambdas.sum} exceeds trace $trace")
    // the planted structure concentrates variance on the leak direction
    assert(lambdas.head > trace / dim * 2,
      s"top eigenvalue ${lambdas.head} shows no structure (trace $trace)")
    for (a <- eigs.indices; b <- a until eigs.size) {
      val d = dot(eigs(a)._2, eigs(b)._2)
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-6,
        s"eigenvectors $a,$b not orthonormal: $d")
    }
    eigs.foreach { case (l, v) =>
      val r = mul(c, v).zip(v.map(_ * l)).map { case (x, y) => x - y }
      assert(norm(r.toArray) < 1e-6 * math.max(1.0, lambdas.head),
        s"residual ${norm(r.toArray)} too large for eigenvalue $l")
    }
  }
}
