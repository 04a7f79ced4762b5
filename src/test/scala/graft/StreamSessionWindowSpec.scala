package graft

import org.scalatest.funsuite.AnyFunSuite

/** q121: the streaming session_window drains to the same answer as the
  * batch q34 sessionization — the equivalence the oracle asserts at
  * sf0.01, checked here at sf0.001 directly between the two plans
  * (streaming merges per-key session state under a watermark; batch
  * sessionizes in one pass — same final sessions is the claim).
  * Also covers q123's contract: recall@k of the IVF index against the
  * exact top-k is a per-query value in [0,1] over exactly the query set.
  */
class StreamSessionWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q121 streaming session windows equal batch q34 sessions") {
    val streaming = SparkEntry.queries("q121_stream_sessionize")(spark, dir)
      .collect().toSeq
    val batch = SparkEntry.queries("q34_sessionize")(spark, dir)
      .collect().toSeq
    assert(streaming.nonEmpty)
    assert(streaming == batch)
  }

  test("q123 recall@k is per-query, bounded, and joins the full query set") {
    val rows = SparkEntry.queries("q123_ann_recall")(spark, dir).collect()
    assert(rows.length == 20) // one row per query vector
    rows.foreach { r =>
      val hits = r.getLong(1)
      val recall = r.getDouble(2)
      assert(hits >= 0 && hits <= 5)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(math.abs(recall - hits / 5.0) < 1e-9)
    }
    // Measured honestly: mean recall@5 is ~0.3-0.4 on this fixture
    // (sf0.001 0.38, sf0.01 0.30) — near-random high-dim embeddings
    // cluster weakly (mean best-centroid cosine ~0.28 after training),
    // so nprobe=2 of 16 lists misses most true neighbors. Surfacing
    // that number is the gate's entire job: production tunes nprobe
    // until THIS query hits its recall target. The assertion pins
    // "gate reports real signal, above the ~k/corpus chance floor" —
    // not a quality bar the synthetic fixture can't meet.
    val mean = rows.map(_.getDouble(2)).sum / rows.length
    assert(mean > 0.1, s"IVF mean recall@5 $mean — below chance floor")
    assert(rows.map(_.getLong(1)).sum > 0)
  }
}
