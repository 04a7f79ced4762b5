package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Pins for q157's training-shard manifest contract: shard placement
  * is content-addressed and epoch-independent (an epoch reshuffle
  * moves ZERO bytes), the seeded intra-shard order actually changes
  * with the seed (the digest is order-sensitive, not just
  * membership-sensitive), and shards stay balanced (no hot shard —
  * the precursor of a straggler at scale).
  */
class TrainShardsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def manifest(seed: String): Map[Long, (Long, Long, Long)] =
    TextAnalysis.shardManifest(spark, dir, seed).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap

  test("epoch reshuffle keeps every shard's population and byte " +
      "count, changes every shard's order digest") {
    val e0 = manifest("epoch0")
    val e1 = manifest("epoch1")
    assert(e0.keySet === e1.keySet)
    for (sh <- e0.keySet) {
      val ((d0, c0, g0), (d1, c1, g1)) = (e0(sh), e1(sh))
      assert(d0 === d1, s"shard $sh docs moved across epochs")
      assert(c0 === c1, s"shard $sh chars moved across epochs")
      assert(g0 !== g1, s"shard $sh order digest did not change " +
        "with the epoch seed — the digest is not order-sensitive")
    }
  }

  test("all 8 shards populated and balanced within 3x of the mean") {
    val e0 = manifest("epoch0")
    assert(e0.keySet === (0L until 8L).toSet)
    val docs = e0.values.map(_._1)
    val mean = docs.sum.toDouble / docs.size
    assert(docs.min > 0)
    assert(docs.max <= mean * 3,
      s"hot shard: max ${docs.max} vs mean $mean")
  }
}
