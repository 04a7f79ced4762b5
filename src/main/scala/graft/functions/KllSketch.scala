package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KLL quantile sketch (Karnin, Lang & Liberty, FOCS'16) as a typed
  * Aggregator — the ONE-PASS, MERGEABLE arm of the exact quantile
  * tier (q220's integer histogram walk and q226's iterative
  * refinement are exact but driver-coordinated multi-pass loops;
  * a 100 TB length-distribution dashboard runs THIS: fixed-size
  * state, one scan, mergeable across tasks/micro-batches — the
  * mergeable-summaries property, Agarwal et al. PODS'12).
  *
  * Structure: a ladder of compactors; level h holds items of weight
  * 2^h. Inserts land in level 0; when level h exceeds its capacity
  * ⌈k·(2/3)^(H−h)⌉ (geometrically shrinking below the top, the KLL
  * memory trick), the level sorts, pairs adjacent items, keeps one
  * per pair at level h+1 (the classic compaction — each kept item
  * inherits both weights) and leaves an odd remainder in place, so
  * TOTAL WEIGHT IS CONSERVED EXACTLY: Σ_h |level_h|·2^h always
  * equals the inserted count (spec-pinned). State is O(k) items
  * regardless of input size; merge concatenates ladders level-wise
  * and re-compacts — associative up to the rank-error guarantee.
  *
  * Determinism posture: the pair-selection coin derives from the
  * level's CONTENT (splitmix64 of the first item's bits, length and
  * level), not from an RNG — a rerun over the same partitions
  * reproduces the same sketch. Estimates still vary with MERGE ORDER
  * (any compacting sketch's do), so queries never hash the estimate:
  * they emit exact quantiles plus an in-query rank-error GATE
  * (|rank(estimate) − p·n| ≤ ε·n — the q93/q132 discipline; KLL
  * theory gives ε = O(1/k), the gate pins 3× headroom).
  *
  * Three Aggregator faces over the ONE [[KllLadder]] op set (r20: the
  * artifact tier — r19 VERDICT ask #5 — needs the ladder itself as a
  * value, not just in-flight state):
  *  - [[KllAggregator]]: values in → estimates out (q234/q235, the
  *    in-plan/in-state form);
  *  - [[KllLadderAggregator]]: values in → LADDER out — the artifact
  *    WRITER's aggregator (per-slice ladders persist to a layout);
  *  - [[KllMergeAggregator]]: stored ladders in → estimates out — the
  *    artifact READER's aggregator (a report folds persisted ladders
  *    without rescanning the facts, q142's HLL discipline for
  *    quantiles).
  */
private[graft] object KllLadder {

  /** Capacity of the level `depth` steps below the top. */
  def capacity(k: Int, depth: Int): Int =
    math.max(2, math.ceil(k * math.pow(2.0 / 3.0, depth)).toInt)

  /** Content-derived coin: which of each adjacent pair survives. */
  private def coin(sorted: Array[Double], h: Int): Int = {
    val z = graft.plans.BloomContains.mix(
      java.lang.Double.doubleToLongBits(sorted(0)) ^
        (sorted.length.toLong << 32) ^ h.toLong)
    (z & 1L).toInt
  }

  /** The ONE per-row append both value-folding aggregators share
    * ([[KllAggregator]]'s in-plan estimates and
    * [[KllLadderAggregator]]'s artifact writer — r20 review: two
    * pasted copies of the append-then-maybe-compact body would let
    * the writer and in-plan sketches silently drift apart on a
    * future compaction-trigger fix). Mutates the buffer in place —
    * the Aggregator contract permits it, so there is no spine clone
    * per row, and the full-ladder compaction scan only runs when
    * level 0 is genuinely over capacity; the remaining per-row cost
    * is one ≤k-double append copy.
    */
  def append(k: Int, b: Array[Array[Double]],
      x: Double): Array[Array[Double]] = {
    b(0) = b(0) :+ x
    if (b(0).length > capacity(k, b.length - 1)) compacted(k, b)
    else b
  }

  /** Compact any over-capacity level until the ladder fits. Each
    * compaction halves a level into the one above (pairs → one item
    * of doubled weight; odd remainder stays), so weight is conserved
    * exactly and the loop terminates (every pass strictly shrinks
    * the total item count).
    */
  def compacted(k: Int,
      levels0: Array[Array[Double]]): Array[Array[Double]] = {
    var ls = levels0
    var again = true
    while (again) {
      again = false
      val top = ls.length - 1
      var h = 0
      while (h < ls.length && !again) {
        if (ls(h).length > capacity(k, top - h)) {
          val sorted = ls(h).sorted
          val m = (sorted.length / 2) * 2
          val off = coin(sorted, h)
          val promoted = Array.tabulate(m / 2)(i => sorted(2 * i + off))
          val withNext =
            if (h + 1 < ls.length) ls.clone()
            else ls :+ Array.empty[Double]
          withNext(h) =
            if (m < sorted.length) Array(sorted(m))
            else Array.empty[Double]
          withNext(h + 1) = withNext(h + 1) ++ promoted
          ls = withNext
          again = true
        }
        h += 1
      }
    }
    ls
  }

  /** Level-wise concatenate + re-compact — the mergeable-summaries
    * half; associative up to the rank-error guarantee.
    */
  def merge(k: Int, a: Array[Array[Double]],
      b: Array[Array[Double]]): Array[Array[Double]] = {
    val out = Array.tabulate(math.max(a.length, b.length)) { h =>
      val xa = if (h < a.length) a(h) else Array.empty[Double]
      val xb = if (h < b.length) b(h) else Array.empty[Double]
      xa ++ xb
    }
    compacted(k, out)
  }

  /** Weighted-rank estimates for each requested fraction: smallest
    * item whose cumulative weight reaches ⌈p·W⌉ (W = conserved total
    * weight = exact input count).
    */
  def estimate(pcts: Seq[Double],
      ls: Array[Array[Double]]): Array[Double] = {
    val items = (for {
      h <- ls.indices; v <- ls(h)
    } yield (v, 1L << h)).sortBy(_._1)
    if (items.isEmpty) return pcts.map(_ => Double.NaN).toArray
    val total = items.iterator.map(_._2).sum
    pcts.map { p =>
      val target = math.max(1L, math.ceil(p * total).toLong)
      var cum = 0L
      var i = 0
      var ans = items.last._1
      var found = false
      while (i < items.length && !found) {
        cum += items(i)._2
        if (cum >= target) { ans = items(i)._1; found = true }
        i += 1
      }
      ans
    }.toArray
  }

  /** Total conserved weight of a buffer — the spec's invariant probe. */
  def weightOf(ls: Array[Array[Double]]): Long =
    ls.indices.iterator.map(h => ls(h).length.toLong << h).sum

  /** Total retained items — the O(k) state-bound probe. */
  def sizeOf(ls: Array[Array[Double]]): Int =
    ls.iterator.map(_.length).sum
}

/** Values in → estimates out (see [[KllLadder]]). */
final class KllAggregator(k: Int, pcts: Seq[Double])
    extends Aggregator[Double, Array[Array[Double]], Array[Double]] {
  require(k >= 8, s"KLL k must be >= 8, got $k")

  def zero: Array[Array[Double]] = Array(Array.empty[Double])

  def reduce(b: Array[Array[Double]],
      x: Double): Array[Array[Double]] =
    KllLadder.append(k, b, x)

  def merge(a: Array[Array[Double]],
      b: Array[Array[Double]]): Array[Array[Double]] =
    KllLadder.merge(k, a, b)

  def finish(ls: Array[Array[Double]]): Array[Double] =
    KllLadder.estimate(pcts, ls)

  private[graft] def weightOf(ls: Array[Array[Double]]): Long =
    KllLadder.weightOf(ls)

  private[graft] def sizeOf(ls: Array[Array[Double]]): Int =
    KllLadder.sizeOf(ls)

  def bufferEncoder: Encoder[Array[Array[Double]]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}

/** Values in → LADDER out — the artifact writer's face: a per-slice
  * fold whose output is the O(k) compactor ladder itself, persisted
  * as an `array<array<double>>` column (see [[KllLadder]]).
  */
final class KllLadderAggregator(k: Int) extends Aggregator[
    Double, Array[Array[Double]], Array[Array[Double]]] {
  require(k >= 8, s"KLL k must be >= 8, got $k")

  def zero: Array[Array[Double]] = Array(Array.empty[Double])

  def reduce(b: Array[Array[Double]],
      x: Double): Array[Array[Double]] =
    KllLadder.append(k, b, x)

  def merge(a: Array[Array[Double]],
      b: Array[Array[Double]]): Array[Array[Double]] =
    KllLadder.merge(k, a, b)

  def finish(ls: Array[Array[Double]]): Array[Array[Double]] = ls

  def bufferEncoder: Encoder[Array[Array[Double]]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Array[Double]]] = ExpressionEncoder()
}

/** Stored ladders in → estimates out — the artifact reader's face: a
  * report folds persisted per-slice ladders with [[KllLadder.merge]]
  * (one keyed agg over KB-sized sketch rows) instead of rescanning
  * the fact table (see [[KllLadder]]).
  */
final class KllMergeAggregator(k: Int, pcts: Seq[Double])
    extends Aggregator[Array[Array[Double]], Array[Array[Double]],
      Array[Double]] {
  require(k >= 8, s"KLL k must be >= 8, got $k")

  def zero: Array[Array[Double]] = Array(Array.empty[Double])

  def reduce(b: Array[Array[Double]],
      x: Array[Array[Double]]): Array[Array[Double]] =
    KllLadder.merge(k, b, x)

  def merge(a: Array[Array[Double]],
      b: Array[Array[Double]]): Array[Array[Double]] =
    KllLadder.merge(k, a, b)

  def finish(ls: Array[Array[Double]]): Array[Double] =
    KllLadder.estimate(pcts, ls)

  def bufferEncoder: Encoder[Array[Array[Double]]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}
