package graft

import graft.tools.GenImageDedupFixture
import org.scalatest.funsuite.AnyFunSuite

/** q173 image near-dup: the decode arm and the plan shape.
  *
  * The q173 oracle recomputes the pair relation from the fixture's
  * COMMITTED `ah` column, so the CORRECTNESS hash-match alone would
  * stay green even if the BMP encode → ImageIO decode → aHash path
  * drifted. This spec closes that gap directly: every image's hash
  * decoded from payload BYTES must equal the hash the generator
  * computed from its own source-pixel function (byte-level encode/
  * decode fidelity), the planted copy-1 dist-0 invariance must hold
  * pairwise, and the banded candidate join must plan with no
  * cartesian/nested-loop product.
  */
class ImageDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001" // unused by the fixture read

  test("decoded aHash equals the committed generator-side hash for " +
      "every image (BMP encode -> ImageIO decode fidelity)") {
    val decoded = operators.Multimodal.imageHashes(spark)
      .collect()
      .map(r => r.getAs[Long]("img_id") -> r.getAs[Long]("ah"))
      .toMap
    val committed = Fixtures.read(spark, Fixtures.mediaNeardupImagesPath)
      .select("img_id", "ah")
      .collect()
      .map(r => r.getAs[Long]("img_id") -> r.getAs[Long]("ah"))
      .toMap
    assert(decoded.size == committed.size && decoded.nonEmpty)
    committed.foreach { case (id, ah) =>
      assert(decoded.get(id) == Some(ah),
        s"img $id: decoded ${decoded.get(id)} != committed $ah")
    }
    // and the committed column itself matches the generator rules
    // (fixture reproducibility — no stale parquet)
    (0L until GenImageDedupFixture.NumBases.toLong).foreach { b =>
      val first = GenImageDedupFixture.firstId(b)
      (0 until GenImageDedupFixture.copyCount(b)).foreach { k =>
        assert(committed(first + k) == GenImageDedupFixture.expectedHash(b, k),
          s"base $b copy $k: committed hash drifted from generator rules")
      }
    }
  }

  test("planted uniform-brightness copies are aHash-identical " +
      "(dist-0 pairs survive any threshold)") {
    (0L until GenImageDedupFixture.NumBases.toLong)
      .filter(GenImageDedupFixture.copyCount(_) >= 2).foreach { b =>
        assert(GenImageDedupFixture.expectedHash(b, 0) ==
          GenImageDedupFixture.expectedHash(b, 1),
          s"base $b: +5 uniform shift must not move the aHash")
      }
  }

  test("banded-Hamming plan: no cartesian or nested-loop product " +
      "ever forms (candidates meet on the band bucket key)") {
    val plan = SparkEntry.queries("q173_image_neardup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }
}
