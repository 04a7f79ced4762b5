package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** k-minimum-values distinct sketch as a typed Aggregator (the
  * SURVEY §2.10 aggregation extension point, like [[TopKAggregator]]).
  *
  * Keeps the k smallest DISTINCT hash values seen per group with an
  * O(k) buffer through partial aggregation. The KMV estimator
  * (Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07's unbiased
  * form) reads the k-th smallest of n distinct uniform hashes as a
  * uniform order statistic: E[h₍k₎] ≈ k/(n+1)·M over hash space M, so
  * n ≈ (k−1)·M / h₍k₎. Unlike the engine-internal HLL (q142) the
  * sketch is a pure function of the hash values — both engines
  * compute the SAME estimate, so the oracle hash-matches the estimate
  * itself, not just an error gate.
  *
  * Scale posture: `COUNT(DISTINCT x)` shuffles every distinct value
  * to its group's reducer; this aggregator ships one ≤k-entry sorted
  * vector per (task, group) — at 100 TB the exchange is O(tasks·k)
  * per group regardless of corpus cardinality, and sketches for
  * disjoint slices UNION by merge (the mergeable-summaries property
  * q142 exploits for rolling windows).
  *
  * Buffer is sorted ascending and deduplicated; once saturated, a
  * value ≥ the current k-th minimum is rejected in O(1) — the common
  * case (acceptance probability ~k/seen). An ACCEPTED value inserts
  * at its sorted position in O(k) (one walk, duplicate check en
  * route); merges are one linear two-pointer pass. The r17 spelling
  * re-sorted the whole buffer (`distinct.sorted.take(k)`) on every
  * accept — O(k log k) per row through the whole warm-up, the
  * ADVICE r17 finding.
  */
final class KmvAggregator(k: Int)
    extends Aggregator[Long, List[Long], List[Long]] {

  /** Sorted-position insert with duplicate rejection, capped at k.
    * `xs` is sorted ascending and duplicate-free by construction.
    */
  private def insert(xs: List[Long], h: Long): List[Long] = {
    val b = List.newBuilder[Long]
    var rest = xs
    var n = 0
    while (rest.nonEmpty && rest.head < h) {
      b += rest.head; rest = rest.tail; n += 1
    }
    if (rest.nonEmpty && rest.head == h) xs
    else {
      b += h; n += 1
      while (rest.nonEmpty && n < k) {
        b += rest.head; rest = rest.tail; n += 1
      }
      b.result()
    }
  }

  /** Linear merge of two sorted duplicate-free lists, capped at k. */
  private def mergeSorted(a: List[Long], b: List[Long]): List[Long] = {
    val out = List.newBuilder[Long]
    var (xa, xb, n) = (a, b, 0)
    while (n < k && (xa.nonEmpty || xb.nonEmpty)) {
      if (xb.isEmpty || (xa.nonEmpty && xa.head < xb.head)) {
        out += xa.head; xa = xa.tail
      } else {
        if (xa.nonEmpty && xa.head == xb.head) xa = xa.tail
        out += xb.head; xb = xb.tail
      }
      n += 1
    }
    out.result()
  }

  def zero: List[Long] = Nil
  def reduce(buf: List[Long], h: Long): List[Long] =
    if (buf.lengthCompare(k) >= 0 && h >= buf.last) buf
    else insert(buf, h)
  def merge(a: List[Long], b: List[Long]): List[Long] = mergeSorted(a, b)
  def finish(buf: List[Long]): List[Long] = buf

  def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[List[Long]] = bufferEncoder
}
