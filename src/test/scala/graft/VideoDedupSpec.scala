package graft

import graft.tools.GenVideoDedupFixture
import org.scalatest.funsuite.AnyFunSuite

/** q201 video near-dup: the decode arm and the plan shape — the video
  * member of the [[ImageDedupSpec]]/[[AudioDedupSpec]] triad.
  */
class VideoDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001" // unused by the fixture read

  test("decoded clip fingerprint equals the committed generator-side fp " +
      "for every clip (GIF encode -> ImageIO multi-frame decode " +
      "fidelity)") {
    val decoded = operators.Multimodal.videoFingerprints(spark)
      .collect()
      .map(r => r.getAs[Long]("vid_id") -> r.getAs[Long]("fp"))
      .toMap
    val committed = Fixtures.read(spark, Fixtures.mediaNeardupVideoPath)
      .select("vid_id", "fp")
      .collect()
      .map(r => r.getAs[Long]("vid_id") -> r.getAs[Long]("fp"))
      .toMap
    assert(decoded.size == committed.size && decoded.nonEmpty)
    committed.foreach { case (id, fp) =>
      assert(decoded.get(id) == Some(fp),
        s"clip $id: decoded ${decoded.get(id)} != committed $fp")
    }
    (0L until GenVideoDedupFixture.NumBases.toLong).foreach { b =>
      val first = GenVideoDedupFixture.firstId(b)
      (0 until GenVideoDedupFixture.copyCount(b)).foreach { k =>
        assert(committed(first + k) ==
          GenVideoDedupFixture.expectedFp(b, k),
          s"base $b copy $k: committed fp drifted from generator rules")
      }
    }
  }

  test("planted variants: trim stays within the mining threshold, " +
      "uniform brightness is fingerprint-identical, distinct bases " +
      "sit far outside") {
    (0L until GenVideoDedupFixture.NumBases.toLong).foreach { b =>
      val cc = GenVideoDedupFixture.copyCount(b)
      if (cc >= 2) {
        val d = java.lang.Long.bitCount(
          GenVideoDedupFixture.expectedFp(b, 0) ^
            GenVideoDedupFixture.expectedFp(b, 1))
        assert(d <= GenVideoDedupFixture.Threshold,
          s"base $b: trimmed copy at dist $d escaped")
      }
      if (cc >= 3)
        assert(GenVideoDedupFixture.expectedFp(b, 0) ==
          GenVideoDedupFixture.expectedFp(b, 2),
          s"base $b: uniform brightness must not move the fingerprint")
    }
    val fps = (0L until GenVideoDedupFixture.NumBases.toLong)
      .map(GenVideoDedupFixture.expectedFp(_, 0))
    val crossMin = (for {
      i <- fps.indices; j <- fps.indices if i < j
    } yield java.lang.Long.bitCount(fps(i) ^ fps(j))).min
    assert(crossMin > GenVideoDedupFixture.Threshold,
      s"distinct bases collide at dist $crossMin")
  }

  test("banded-Hamming plan: no cartesian or nested-loop product " +
      "ever forms") {
    val plan = SparkEntry.queries("q201_video_neardup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }
}
