package graft

import org.scalatest.funsuite.AnyFunSuite

/** q202 epoch-repetition schedule: the Muennighoff-style invariants the
  * oracle hash can't articulate — cap engagement, conservation, and
  * the flattening direction.
  */
class EpochScheduleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("the overflow-safe budget spelling equals ⌊a·w/10⁶⌋ exactly " +
      "(BigInt reference, seeded property sweep over 100 TB magnitudes)") {
    val rnd = new scala.util.Random(202)
    (1 to 500).foreach { _ =>
      // a up to 4·10¹⁴ (EpochBudgetMult × 100 TB-scale token totals),
      // w a µunit weight — exactly the domain where the naive a·w
      // product exceeds 2⁶³
      val a = math.abs(rnd.nextLong()) % 400000000000000L
      val w = math.abs(rnd.nextLong()) % 1000001L
      val split = (a * (w / 1000) + (a * (w % 1000)) / 1000) / 1000
      val ref = (BigInt(a) * BigInt(w) / BigInt(1000000)).toLong
      assert(split == ref, s"a=$a w=$w: $split != $ref")
    }
  }

  test("schedule invariants: cap, conservation, sqrt flattening") {
    val rows = SparkEntry.queries("q202_epoch_schedule")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.length >= 2)
    val cap = operators.TextAnalysis.EpochCapMilli
    rows.foreach { r =>
      val (u, w, b, e, served, stranded) = (
        r.getAs[Long]("unique_tokens"), r.getAs[Long]("weight_mu"),
        r.getAs[Long]("budget_tokens"), r.getAs[Long]("epochs_milli"),
        r.getAs[Long]("served_tokens"), r.getAs[Long]("stranded_tokens"))
      assert(e <= cap && e > 0)
      assert(served + stranded == b, s"budget leaks: $r")
      assert(served == u * e / 1000L)
      assert(w > 0 && b > 0)
    }
    // the cap must ENGAGE for the small languages and NOT for the
    // dominant one — otherwise the fixture never exercises the branch
    assert(rows.exists(r => r.getAs[Long]("epochs_milli") == cap &&
      r.getAs[Long]("stranded_tokens") > 0), "cap never engaged")
    // under-cap langs strand only QUANTIZATION residue (< one
    // milli-epoch of tokens), never cap-class budget
    assert(rows.exists(r => r.getAs[Long]("epochs_milli") < cap &&
      r.getAs[Long]("stranded_tokens") <
        r.getAs[Long]("unique_tokens") / 1000 + 1),
      "no lang under budget")
    // sqrt flattening: the token-richest lang gets the LOWEST epochs
    val byU = rows.sortBy(_.getAs[Long]("unique_tokens"))
    assert(byU.last.getAs[Long]("epochs_milli") ==
      rows.map(_.getAs[Long]("epochs_milli")).min,
      "flattening direction inverted")
  }
}
