package graft

import graft.operators.Intervals
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The banded interval-join rewrite must be PAIR-FOR-PAIR equal to the
  * naive O(n²) range join — including window-boundary events (the exact
  * band-edge cases the integer `div` quantization exists for).
  */
class IntervalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def naive(rows: Seq[(String, Long)], w: Long) =
    (for {
      (ka, a) <- rows
      (kb, b) <- rows
      if ka == kb && b > a && b <= a + w
    } yield (ka, a, b)).sorted

  test("banded pairs equal the naive range join on seeded random data " +
      "with boundary collisions") {
    import spark.implicits._
    val rnd = new Random(42)
    val w = 1000L
    // cluster timestamps near band edges: multiples of w ± small jitter,
    // plus exact-boundary duplicates and same-timestamp events
    val rows = (1 to 300).map { _ =>
      val key = "k" + rnd.nextInt(3)
      val base = rnd.nextInt(20).toLong * w
      val jitter = rnd.nextInt(5) match {
        case 0 => 0L               // exactly on a band edge
        case 1 => w                // exactly one window later
        case _ => rnd.nextLong(2 * w)
      }
      (key, 1700000000000000L + base + jitter)
    }
    val got = Intervals
      .bandedPairs(rows.toDF("key", "us"), w)
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(got == naive(rows, w))
  }

  test("band arithmetic is exact at 2024-epoch µs magnitudes (beyond " +
      "double's 2^53 range)") {
    import spark.implicits._
    val w = 60L * 1000000L
    // b exactly at a + w (inclusive edge) and a + w + 1 (exclusive)
    val a = 1704067200000000L // 2024-01-01 in µs
    val rows = Seq(("k", a), ("k", a + w), ("k", a + w + 1))
    val got = Intervals.bandedPairs(rows.toDF("key", "us"), w)
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(got == naive(rows, w))
    assert(got.contains(("k", a, a + w)))
    assert(!got.contains(("k", a, a + w + 1)))
  }
}
