package graft

import graft.tools.TrainPqCodebook
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side PQ sub-quantizer training: quantization error improves
  * over the deterministic init, training is reproducible, empty cells
  * keep their centroids, and ties resolve to the lower cid (the same
  * rule the q64 encode query uses).
  */
class TrainPqCodebookSpec extends AnyFunSuite {

  private def sample(n: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    // two separated blobs per dimension so k-means has real structure
    Array.fill(n)(Array.fill(TrainPqCodebook.SubDim)(
      (if (rnd.nextBoolean()) 2.0 else -2.0) + rnd.nextGaussian() * 0.3))
  }

  test("training reduces quantization error and is deterministic") {
    val data = sample(500)
    val init = Array.tabulate(TrainPqCodebook.K, TrainPqCodebook.SubDim)(
      TrainPqCodebook.initComponent(0, _, _))
    val (_, mse0) = TrainPqCodebook.lloydL2(data, init, 0)
    val (c1, mse1) = TrainPqCodebook.lloydL2(data, init, 10)
    val (c2, mse2) = TrainPqCodebook.lloydL2(data, init, 10)
    assert(mse1 < mse0 * 0.8,
      s"training did not improve quantization: $mse0 -> $mse1")
    assert(mse1 == mse2)
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
    assert(c1.length == TrainPqCodebook.K)
    assert(c1.forall(_.length == TrainPqCodebook.SubDim))
  }

  test("empty cells keep their previous centroid") {
    // all points identical → exactly one non-empty cell; the other 15
    // centroids must survive untouched (standard Lloyd's)
    val data = Array.fill(50)(Array.fill(TrainPqCodebook.SubDim)(1.0))
    val init = Array.tabulate(TrainPqCodebook.K, TrainPqCodebook.SubDim)(
      TrainPqCodebook.initComponent(1, _, _))
    val (cents, mse) = TrainPqCodebook.lloydL2(data, init, 3)
    assert(mse == 0.0) // the winning cell converged onto the point
    val moved = cents.indices.count(c => !cents(c).sameElements(init(c)))
    assert(moved == 1, s"$moved cells moved; expected exactly 1")
  }
}
