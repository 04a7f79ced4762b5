package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator (SURVEY §2.10 aggregation
  * extension point: `Aggregator[IN, BUF, OUT]`).
  *
  * The window formulation (`row_number <= k`) sorts every partition of
  * every group; this aggregator keeps an O(k) buffer per group through
  * partial aggregation — at 100 TB the difference between a full
  * sort-shuffle and a map-side-combined k-row state per group.
  *
  * Ordering: value DESC, then tiebreak ASC — deterministic and identical
  * to `ORDER BY value DESC, id` ranking.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)],
      List[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sortWith(better).take(k)

  def zero: List[(Double, Long)] = Nil
  // trim keeps the buffer sorted best-first, so a full buffer whose
  // k-th entry beats the incoming row can reject in O(1) — the common
  // case once the buffer saturates (r16: q26 routes the whole
  // brute-force q×N sim stream through here)
  def reduce(buf: List[(Double, Long)],
      in: (Double, Long)): List[(Double, Long)] =
    if (buf.lengthCompare(k) >= 0 && !better(in, buf.last)) buf
    else trim(in :: buf)
  def merge(a: List[(Double, Long)],
      b: List[(Double, Long)]): List[(Double, Long)] = trim(a ++ b)
  def finish(buf: List[(Double, Long)]): List[(Double, Long)] =
    buf.sortWith(better)

  def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[List[(Double, Long)]] = bufferEncoder
}

/** [[TopKAggregator]] with a String tiebreak — `ORDER BY value DESC,
  * term ASC` ranking with an O(k) per-group buffer. Used by the TF-IDF
  * keyword extraction (q68): map-side partial aggregation emits at most
  * k rows per document per task, so the doc-keyed exchange carries
  * ~k rows/doc instead of the full per-doc term list the window
  * formulation shuffles and sorts.
  */
final class TopKTermAggregator(k: Int)
    extends Aggregator[(Double, String), List[(Double, String)],
      List[(Double, String)]] {

  private def better(a: (Double, String), b: (Double, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(xs: List[(Double, String)]): List[(Double, String)] =
    xs.sortWith(better).take(k)

  def zero: List[(Double, String)] = Nil
  def reduce(buf: List[(Double, String)],
      in: (Double, String)): List[(Double, String)] =
    if (buf.lengthCompare(k) >= 0 && !better(in, buf.last)) buf
    else trim(in :: buf)
  def merge(a: List[(Double, String)],
      b: List[(Double, String)]): List[(Double, String)] = trim(a ++ b)
  def finish(buf: List[(Double, String)]): List[(Double, String)] =
    buf.sortWith(better)

  def bufferEncoder: Encoder[List[(Double, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[List[(Double, String)]] = bufferEncoder
}
