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
  * case (acceptance probability ~k/seen).
  */
final class KmvAggregator(k: Int)
    extends Aggregator[Long, List[Long], List[Long]] {

  private def trim(xs: List[Long]): List[Long] = xs.distinct.sorted.take(k)

  def zero: List[Long] = Nil
  def reduce(buf: List[Long], h: Long): List[Long] =
    if (buf.lengthCompare(k) >= 0 && h >= buf.last) buf
    else trim(h :: buf)
  def merge(a: List[Long], b: List[Long]): List[Long] = trim(a ++ b)
  def finish(buf: List[Long]): List[Long] = buf

  def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[List[Long]] = bufferEncoder
}
