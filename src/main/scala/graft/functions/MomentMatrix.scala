package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass distributed second-moment matrix of a vector column —
  * the covariance/PCA/whitening building block (the [[BloomSketchAggregator]]
  * / [[MisraGriesAggregator]] mergeable-summary family).
  *
  * Buffer layout (flat primitive array, d(d+1)/2 + d + 1 doubles):
  * `[n, Σv(0..d-1), upper-triangle Σ v_i·v_j row-major]`. Each task
  * folds its partition locally and the exchange carries ONE ~d²/2
  * buffer per task (17 KB at d = 64) — never a per-(row, i, j)
  * explode, which is the d²-rows-per-vector shuffle this Aggregator
  * exists to avoid. Merge is element-wise addition — associative and
  * commutative up to floating-point summation order, so different
  * partitionings agree to ~1e-15 relative (MomentMatrixSpec pins it);
  * a µunit-boundary flip from that residual is the same accepted risk
  * class as every other quantized-double gate in the catalog.
  *
  * `finish` converts moments to `[n, mean(0..d-1), SAMPLE covariance
  * upper triangle]` (`(Σxy − Σx·Σy/n)/(n−1)`, the textbook one-pass
  * formula — both engines evaluate the same algebra, so a rounding
  * gate holds). Carrying the mean keeps consumers one-pass: the PCA
  * trainer needs µ for the centered projection and must not re-scan
  * the corpus for sums the buffer already accumulated. Fewer than 2
  * rows is a loud error — NaN covariances downstream would silently
  * diverge from the oracle's empty result instead.
  */
final class MomentMatrixAggregator(dim: Int)
    extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
  private val tri = dim * (dim + 1) / 2

  def zero: Array[Double] = new Array[Double](1 + dim + tri)

  def reduce(buf: Array[Double], v: Seq[Double]): Array[Double] = {
    require(v.length == dim,
      s"MomentMatrix: expected dim $dim, got ${v.length}")
    val a = v.toArray
    buf(0) += 1.0
    var i = 0
    var k = 1 + dim
    while (i < dim) {
      buf(1 + i) += a(i)
      var j = i
      while (j < dim) {
        buf(k) += a(i) * a(j)
        j += 1
        k += 1
      }
      i += 1
    }
    buf
  }

  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  /** `[n, mean(0..d-1), cov upper triangle row-major]`. */
  def finish(buf: Array[Double]): Array[Double] = {
    val n = buf(0)
    require(n >= 2.0,
      s"MomentMatrix: sample covariance needs >= 2 rows, got ${n.toLong}")
    val out = new Array[Double](1 + dim + tri)
    out(0) = n
    var i = 0
    while (i < dim) { out(1 + i) = buf(1 + i) / n; i += 1 }
    i = 0
    var k = 1 + dim
    var o = 1 + dim
    while (i < dim) {
      var j = i
      while (j < dim) {
        out(o) = (buf(k) - buf(1 + i) * buf(1 + j) / n) / (n - 1.0)
        j += 1; k += 1; o += 1
      }
      i += 1
    }
    out
  }

  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}
