package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary as a typed Aggregator
  * (SURVEY §2.10 aggregation extension point, same family as
  * [[TopKAggregator]]).
  *
  * Consumes whole token ARRAYS (one row per document, tokens split
  * in-row) so the summary pass shuffles NOTHING per token: each task
  * folds its partition into an O(k) counter map and the exchange
  * carries one ≤k-entry map per task. At 100 TB that is the difference
  * between a full per-token-occurrence shuffle (the q68 anti-pattern
  * removed in r8) and a few kilobytes per task.
  *
  * Guarantees (Misra-Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): after summarizing N token
  * occurrences with capacity k, every item with true frequency
  * > N/(k+1) has a surviving counter, and each counter undercounts by
  * at most N/(k+1). WHICH sub-threshold items survive — and the exact
  * counter values — depend on fold/merge order, so the summary alone
  * is not deterministic. The operator (q122) therefore treats the
  * survivors only as a CANDIDATE SET and re-counts them exactly in a
  * second pass: any true heavy hitter is guaranteed present, any
  * order-dependent extra is filtered by its exact count, making the
  * final result exactly the true ≥-threshold set on every execution.
  *
  * The buffer also carries the total token count N, so the threshold
  * scalar comes from the same single pass.
  */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[Seq[String], (Long, Map[String, Long]),
      (Long, Map[String, Long])] {

  def zero: (Long, Map[String, Long]) = (0L, Map.empty)

  def reduce(buf: (Long, Map[String, Long]),
      toks: Seq[String]): (Long, Map[String, Long]) = {
    var (n, m) = buf
    val it = toks.iterator
    while (it.hasNext) {
      val t = it.next()
      if (t.nonEmpty) {
        n += 1
        m.get(t) match {
          case Some(c) => m = m.updated(t, c + 1)
          case None =>
            if (m.size < k) m = m.updated(t, 1L)
            // full: decrement every counter (the classic k-way cancel);
            // O(k) on a miss, amortized O(1) per occurrence overall
            else m = m.transform((_, c) => c - 1).filter(_._2 > 0)
        }
      }
    }
    (n, m)
  }

  def merge(a: (Long, Map[String, Long]),
      b: (Long, Map[String, Long])): (Long, Map[String, Long]) = {
    val summed = b._2.foldLeft(a._2) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    val trimmed =
      if (summed.size <= k) summed
      else {
        // subtract the (k+1)-th largest counter from all and drop ≤0 —
        // keeps ≤k counters and preserves the N/(k+1) error bound
        val cut =
          summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
        summed.transform((_, c) => c - cut).filter(_._2 > 0)
      }
    (a._1 + b._1, trimmed)
  }

  def finish(buf: (Long, Map[String, Long])): (Long, Map[String, Long]) =
    buf

  def bufferEncoder: Encoder[(Long, Map[String, Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[(Long, Map[String, Long])] = bufferEncoder
}
