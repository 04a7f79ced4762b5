package graft

import graft.functions.TopKAggregator
import org.scalatest.funsuite.AnyFunSuite

/** [[TopKAggregator]] contract: for ANY input order, ANY split into
  * partial buffers, and ANY merge order, the result equals the
  * sort-based top-k under (score desc, id asc) — the property that
  * makes the map-side-combinable spelling of q26's ranking exact, not
  * approximate.
  */
class TopKAggSpec extends AnyFunSuite {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (s, i) => (-s, i) }

  private def exact(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sorted(ord).take(k)

  private def seeded(seed: Int): Seq[(Double, Long)] = {
    val rnd = new scala.util.Random(seed)
    // duplicate scores on purpose: ties must break by id
    Seq.fill(rnd.nextInt(200)) {
      (rnd.nextInt(20) / 10.0, rnd.nextInt(50).toLong)
    }
  }

  test("property: reduce-fold equals sort-based top-k (300 seeded " +
      "cases, tie-heavy)") {
    for (seed <- 1 to 300; k <- Seq(1, 3, 10)) {
      val agg = new TopKAggregator(k)
      val xs = seeded(seed * 31 + k)
      val got = xs.foldLeft(agg.zero)(agg.reduce)
      assert(got == exact(xs, k), s"seed=$seed k=$k")
    }
  }

  test("property: any split + any merge order is invariant (the " +
      "partial-aggregation soundness q26 rests on)") {
    for (seed <- 1 to 150) {
      val k = 5
      val agg = new TopKAggregator(k)
      val xs = seeded(seed * 97)
      val rnd = new scala.util.Random(seed)
      // split into 1..6 random chunks, fold each, merge shuffled
      val n = rnd.nextInt(6) + 1
      val chunks = xs.grouped(math.max(1, (xs.size + n - 1) / n)).toSeq
      val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials)
        .foldLeft(agg.zero)(agg.merge)
      assert(merged == exact(xs, k), s"seed=$seed")
    }
  }

  test("full-buffer fast path rejects a loser and accepts a " +
      "boundary-tie winner by id") {
    val agg = new TopKAggregator(2)
    val b = List((3.0, 1L), (2.0, 5L))
    assert(agg.reduce(b, (1.0, 0L)) == b)          // loses on score
    assert(agg.reduce(b, (2.0, 9L)) == b)          // ties, loses on id
    assert(agg.reduce(b, (2.0, 2L)) ==
      Seq((3.0, 1L), (2.0, 2L)))                   // ties, wins on id
  }

  test("k larger than the input returns everything, ordered") {
    val agg = new TopKAggregator(100)
    val xs = Seq((1.0, 3L), (2.0, 1L), (1.0, 2L))
    assert(xs.foldLeft(agg.zero)(agg.reduce) ==
      Seq((2.0, 1L), (1.0, 2L), (1.0, 3L)))
  }
}
