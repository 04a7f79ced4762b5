package graft

import org.scalatest.funsuite.AnyFunSuite

/** q227 rendezvous-sharding invariants: the minimal-movement law that
  * is the operator's whole reason to exist (grow S → S+1 and only
  * ~1/(S+1) of the corpus relocates, all of it TO the new shard),
  * plus balance, totality, and the contrast with mod-hashing (which
  * relocates ~S/(S+1) of everything on the same reshard).
  */
class RendezvousSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("reshard 8 -> 9 moves ~1/9 of docs, every one to the new " +
      "shard; shards stay balanced; mod-hash would move ~8/9") {
    val rows = SparkEntry.queries("q227_rendezvous_shards")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = rows.map(_._2).sum
    val newShard = operators.Formats.ShardsAfter - 1
    // moved ⟹ destination is the NEW shard (the rendezvous law:
    // removing no shard leaves every old argmax intact)
    rows.foreach { case (shard, n, arrived) =>
      if (shard == newShard) assert(arrived == n)
      else assert(arrived == 0, s"shard $shard absorbed moved docs")
    }
    // every shard populated and roughly balanced (uniform hashes)
    assert(rows.length == operators.Formats.ShardsAfter)
    val counts = rows.map(_._2)
    assert(counts.min > 0)
    // ~55 docs/shard at sf0.01 — Poisson noise allows ~2x spread
    assert(counts.max.toDouble / counts.min < 2.0,
      s"imbalance: ${counts.mkString(",")}")
    // expected movement 1/9 of the corpus, generous 2x band
    val moved = rows.map(_._3).sum.toDouble / total
    assert(moved > 1.0 / 18 && moved < 2.0 / 9, s"moved share $moved")
    // the scheme this replaces: doc_id % S relocates almost everything
    val ids = Tables.load(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val modMoved = ids.count(id => id % 8 != id % 9).toDouble / ids.length
    assert(modMoved > 0.8, s"mod-hash moved only $modMoved")
  }
}
