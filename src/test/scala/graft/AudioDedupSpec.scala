package graft

import graft.tools.GenAudioDedupFixture
import org.scalatest.funsuite.AnyFunSuite

/** q189 audio near-dup: the decode arm and the plan shape — the audio
  * twin of [[ImageDedupSpec]].
  *
  * The q189 oracle recomputes the pair relation from the fixture's
  * COMMITTED `fp` column, so the CORRECTNESS hash-match alone would
  * stay green even if the WAV encode → javax.sound decode →
  * fingerprint path drifted. This spec closes that gap directly:
  * every clip's fingerprint decoded from payload BYTES must equal the
  * fingerprint the generator computed from its own sample function
  * (byte-level encode/decode fidelity), the planted ×2-volume copy
  * must be fingerprint-identical pairwise, the perturbed copy must
  * stay within the mining threshold, and the banded candidate join
  * must plan with no cartesian/nested-loop product.
  */
class AudioDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001" // unused by the fixture read

  test("decoded fingerprint equals the committed generator-side fp for " +
      "every clip (WAV encode -> javax.sound decode fidelity)") {
    val decoded = operators.Multimodal.audioFingerprints(spark)
      .collect()
      .map(r => r.getAs[Long]("aud_id") -> r.getAs[Long]("fp"))
      .toMap
    val committed = Fixtures.read(spark, Fixtures.mediaNeardupAudioPath)
      .select("aud_id", "fp")
      .collect()
      .map(r => r.getAs[Long]("aud_id") -> r.getAs[Long]("fp"))
      .toMap
    assert(decoded.size == committed.size && decoded.nonEmpty)
    committed.foreach { case (id, fp) =>
      assert(decoded.get(id) == Some(fp),
        s"clip $id: decoded ${decoded.get(id)} != committed $fp")
    }
    // and the committed column itself matches the generator rules
    // (fixture reproducibility — no stale parquet)
    (0L until GenAudioDedupFixture.NumBases.toLong).foreach { b =>
      val first = GenAudioDedupFixture.firstId(b)
      (0 until GenAudioDedupFixture.copyCount(b)).foreach { k =>
        assert(committed(first + k) == GenAudioDedupFixture.expectedFp(b, k),
          s"base $b copy $k: committed fp drifted from generator rules")
      }
    }
  }

  test("planted x2-volume copies are fingerprint-identical " +
      "(dist-0 pairs survive any threshold)") {
    (0L until GenAudioDedupFixture.NumBases.toLong)
      .filter(GenAudioDedupFixture.copyCount(_) >= 2).foreach { b =>
        assert(GenAudioDedupFixture.expectedFp(b, 0) ==
          GenAudioDedupFixture.expectedFp(b, 1),
          s"base $b: exact volume scaling must not move the fingerprint")
      }
  }

  test("planted perturbed copies stay within the mining threshold; " +
      "distinct bases sit far outside it") {
    val withPerturbed = (0L until GenAudioDedupFixture.NumBases.toLong)
      .filter(GenAudioDedupFixture.copyCount(_) >= 3)
    assert(withPerturbed.nonEmpty)
    withPerturbed.foreach { b =>
      val d = java.lang.Long.bitCount(
        GenAudioDedupFixture.expectedFp(b, 0) ^
          GenAudioDedupFixture.expectedFp(b, 2))
      assert(d <= GenAudioDedupFixture.Threshold,
        s"base $b: perturbed copy at dist $d escaped the threshold")
    }
    // cross-base distances concentrate near the random expectation of
    // 32 bits — no false positive comes near the threshold
    val fps = (0L until GenAudioDedupFixture.NumBases.toLong)
      .map(b => GenAudioDedupFixture.expectedFp(b, 0))
    val crossMin = (for {
      i <- fps.indices; j <- fps.indices if i < j
    } yield java.lang.Long.bitCount(fps(i) ^ fps(j))).min
    assert(crossMin > GenAudioDedupFixture.Threshold,
      s"distinct bases collide at dist $crossMin")
  }

  test("banded-Hamming plan: no cartesian or nested-loop product " +
      "ever forms (candidates meet on the band bucket key)") {
    val plan = SparkEntry.queries("q189_audio_neardup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }
}
