package graft

import graft.tools.TrainCalibrator
import org.scalatest.funsuite.AnyFunSuite

/** q195 isotonic calibration: PAV semantics on crafted inputs, the
  * committed fixture's reproducibility + canonical-form invariants,
  * and the in-sample property that defines isotonic regression.
  */
class CalibrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("PAV pools a violating run and leaves monotone inputs alone") {
    // monotone input: untouched (three blocks, strictly increasing)
    assert(TrainCalibrator.pav(Seq(
      (1L, false), (2L, true), (2L, false), (3L, true))) ==
      Seq((1L, 0L, 1L), (2L, 1L, 2L), (3L, 1L, 1L)))
    // classic violation: 1,0 at ascending scores pools to mean 1/2
    assert(TrainCalibrator.pav(Seq((1L, true), (2L, false))) ==
      Seq((1L, 1L, 2L)))
    // cascade: pooling propagates left until means increase strictly
    assert(TrainCalibrator.pav(Seq(
      (1L, true), (2L, true), (3L, false), (4L, false))) ==
      Seq((1L, 2L, 4L)))
  }

  test("committed fixture reproduces from the trainer and is canonical " +
      "(strictly increasing pooled means, exact integer ratios)") {
    val committed = Fixtures.read(spark, Fixtures.scoreCalibratorPath)
      .collect()
      .map(r => (r.getAs[Long]("lo_mu"), r.getAs[Long]("cal_mu"),
        r.getAs[Long]("pos"), r.getAs[Long]("n")))
      .sortBy(_._1)
    val retrained = TrainCalibrator.train(spark, "/root/testdata/sf0.01")
      .map { case (lo, pos, n) => (lo, pos * 1000000L / n, pos, n) }
    assert(committed.toSeq == retrained,
      "committed calibrator drifted from the trainer")
    assert(committed.head._1 == TrainCalibrator.SentinelLo)
    committed.foreach { case (_, cal, pos, n) =>
      assert(cal == pos * 1000000L / n)
    }
    committed.sliding(2).foreach {
      case Array(a, b) =>
        // canonical PAV: pooled means strictly increase block to block
        assert(a._3 * b._4 < b._3 * a._4,
          s"blocks not strictly increasing: $a then $b")
      case _ => ()
    }
  }

  test("in-sample reliability is exact: on the training corpus every " +
      "step's empirical teacher rate equals its calibrated value") {
    val out = SparkEntry.queries("q195_score_calibration")(
      spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("emp_mu") == r.getAs[Long]("cal_mu"),
        s"in-sample step diverged: $r")
      assert(r.getAs[Long]("docs") > 0)
    }
    // ...and every training document is assigned to exactly one step
    val total = out.map(_.getAs[Long]("docs")).sum
    val corpus = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .count()
    assert(total == corpus)
  }
}
