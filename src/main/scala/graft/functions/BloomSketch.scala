package graft.functions

import graft.plans.BloomContains
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Distributed Bloom-bitset build as a typed Aggregator (the
  * [[MisraGriesAggregator]] family): each task folds its partition's
  * 64-bit keys into a local bitset, the exchange carries ONE bitset
  * per task, and merge is bitwise OR — associative and commutative, so
  * any merge order yields the identical filter (the mergeable-summary
  * property, Agarwal et al. PODS'12). The finished bitset is a bounded
  * broadcast-build artifact: numBits/8 bytes regardless of input
  * cardinality, collected once by the driver exactly like a broadcast
  * join's build side, then embedded as a constant in the
  * [[graft.plans.BloomContains]] probe.
  *
  * Bit positions come from [[BloomContains.set]], so build and probe
  * share one hashing kernel by construction.
  *
  * Sizing (Bloom 1970): fpp ≈ (1 − e^(−k·n/m))^k. The caller sizes m
  * to the KNOWN small-relation cardinality (e.g. an eval suite's
  * n-gram count) — at m/n ≥ 20 bits/key and k = 7, fpp < 10⁻³.
  * False positives only ever ADD candidates to a downstream exact
  * verify; they can never change a result that re-checks exactly.
  */
/** The ONE sizing shared by every decontamination bloom build AND
  * probe (q138 / q141 / q147): build k and probe k must agree or the
  * probe checks bit positions the build never set — Bloom false
  * NEGATIVES, which (unlike false positives) the downstream exact
  * verify cannot repair. Callers must never hardcode these.
  */
object BloomDefaults {
  val NumBits: Int = 1 << 20
  val NumHashes: Int = 7
}

final class BloomSketchAggregator(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")

  def zero: Array[Long] = new Array[Long](numBits >>> 6)

  def reduce(bits: Array[Long], key: Long): Array[Long] = {
    BloomContains.set(bits, numHashes, key)
    bits
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  def finish(bits: Array[Long]): Array[Long] = bits

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
