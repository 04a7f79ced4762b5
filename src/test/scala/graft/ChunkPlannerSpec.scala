package graft

import graft.sources.{Chunk, ChunkPlanner}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's chunk-planning invariants
  * (`chunk_test.go:5-331`, properties at `chunk_test.go:314-331`):
  * full coverage of [min,max], no overlap, ordered, last chunk closed.
  */
class ChunkPlannerSpec extends AnyFunSuite {

  test("single chunk when range fits") {
    assert(ChunkPlanner.planChunks(1, 50, 100) ==
      Seq(Chunk(1, 50, closed = true)))
  }

  test("exact multiples and remainders") {
    val chunks = ChunkPlanner.planChunks(0, 250, 100)
    assert(chunks == Seq(
      Chunk(0, 100, closed = false),
      Chunk(100, 200, closed = false),
      Chunk(200, 250, closed = true)))
  }

  test("single-key table") {
    assert(ChunkPlanner.planChunks(7, 7, 100) ==
      Seq(Chunk(7, 7, closed = true)))
  }

  test("predicates match the reference's chunk SQL shape") {
    val preds = ChunkPlanner.jdbcPredicates(0, 250, "id", 100)
    assert(preds(0) == "id >= 0 AND id < 100")
    assert(preds.last == "id >= 200 AND id <= 250")
  }

  test("overflow-safe at Long extremes") {
    val chunks = ChunkPlanner.planChunks(
      Long.MaxValue - 150, Long.MaxValue, 100)
    assert(chunks.size == 2)
    assert(chunks.last.upper == Long.MaxValue && chunks.last.closed)
    val neg = ChunkPlanner.planChunks(Long.MinValue, Long.MinValue + 10, 100)
    assert(neg == Seq(Chunk(Long.MinValue, Long.MinValue + 10,
      closed = true)))
  }

  test("eligibility: signed integral only, unsigned-bigint decimal excluded") {
    assert(ChunkPlanner.eligibleKeyType(LongType))
    assert(ChunkPlanner.eligibleKeyType(IntegerType))
    assert(!ChunkPlanner.eligibleKeyType(DecimalType(20, 0)))
    assert(!ChunkPlanner.eligibleKeyType(StringType))
    assert(!ChunkPlanner.eligibleKeyType(DoubleType))
  }

  test("property: coverage, ordering, no overlap (500 seeded cases)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val min = rnd.between(-100000L, 100000L)
      val max = min + rnd.between(0L, 500000L)
      val size = rnd.between(1L, 10000L)
      val chunks = ChunkPlanner.planChunks(min, max, size)
      assert(chunks.head.lower == min)
      assert(chunks.last.upper == max && chunks.last.closed)
      assert(chunks.init.forall(!_.closed))
      // contiguous, ordered, non-overlapping
      chunks.sliding(2).foreach {
        case Seq(a, b) => assert(a.upper == b.lower && a.lower < a.upper)
        case _ =>
      }
      // every open chunk has one uniform width ≥ size (width widens
      // only when the range would exceed the MaxChunks cap)
      assert(chunks.size <= ChunkPlanner.MaxChunks + 1)
      chunks.init.foreach(c => assert(c.upper - c.lower >= size))
      assert(chunks.init.map(c => c.upper - c.lower).distinct.size <= 1)
      // a sample of keys is covered exactly once
      Seq(min, max, (min + max) / 2).foreach { k =>
        val n = chunks.count(c =>
          k >= c.lower && (if (c.closed) k <= c.upper else k < c.upper))
        assert(n == 1, s"key $k covered $n times")
      }
    }
  }

  test("sparse key space caps the plan instead of exploding the driver") {
    // snowflake-style ids: 2^41 range at chunk_size 100k would be ~22M
    // driver-side chunks without the cap
    val chunks = ChunkPlanner.planChunks(0L, 1L << 41, 100000L)
    assert(chunks.size <= ChunkPlanner.MaxChunks + 1)
    assert(chunks.head.lower == 0L)
    assert(chunks.last.upper == (1L << 41) && chunks.last.closed)
    // still covers the whole range contiguously
    chunks.sliding(2).foreach {
      case Seq(a, b) => assert(a.upper == b.lower)
      case _ =>
    }
    // dense ranges are untouched
    assert(ChunkPlanner.planChunks(0L, 999999L, 100000L).size == 10)
  }

  test("quantile chunks from skewed bounds") {
    val chunks = ChunkPlanner.chunksByQuantiles(Seq(0L, 10L, 1000000L))
    assert(chunks == Seq(
      Chunk(0, 10, closed = false),
      Chunk(10, 1000000, closed = true)))
    assert(ChunkPlanner.chunksByQuantiles(Seq(5L, 5L)) ==
      Seq(Chunk(5, 5, closed = true)))
  }
}
