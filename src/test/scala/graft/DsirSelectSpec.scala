package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for q163's DSIR importance selection: the target source must
  * dominate its own reference distribution — highest mean importance
  * weight AND a selection rate above every other source's — and the
  * 80th-percentile cutpoint must select ~20% of the corpus overall.
  * An inverted ratio, a swapped model, or a misnormalized constant
  * flips one of these long before an oracle diff would localize it.
  */
class DsirSelectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("target source dominates: max avg importance weight, max " +
      "selection rate; global selection ~20%") {
    val rows = SparkEntry.queries("q163_dsir_select")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("docs"),
        r.getAs[Double]("avg_iw"), r.getAs[Long]("selected")))
    assert(rows.nonEmpty)
    val target = rows.find(_._1 == "src0").get
    val others = rows.filterNot(_._1 == "src0")
    assert(others.nonEmpty)
    assert(target._3 > others.map(_._3).max,
      s"target avg_iw ${target._3} not above all others")
    val tRate = target._4.toDouble / target._2
    val oRates = others.map(r => r._4.toDouble / r._2)
    assert(tRate > oRates.max,
      s"target sel rate $tRate not above all others")
    val total = rows.map(_._2).sum
    val sel = rows.map(_._4).sum
    val frac = sel.toDouble / total
    assert(frac > 0.15 && frac < 0.25,
      s"global selection $frac not ~20% — cutpoint broken")
    Caches.clear(spark)
  }

  test("q161 DoReMi update: weights normalize to 1, zero-excess " +
      "domains keep ~their share, positive-excess domains up-weight") {
    val rows = SparkEntry.queries("q161_domain_reweight")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getAs[Double]("share4"),
        r.getAs[Double]("excess4"), r.getAs[Double]("weight4")))
    assert(rows.nonEmpty)
    val wSum = rows.map(_._4).sum
    assert(math.abs(wSum - 1.0) < 0.01,
      s"weights sum to $wSum, not ~1")
    // reference ratio 1/Z from the zero-excess domains; compare as
    // weight − share·ref (differences of 4dp-rounded values, ±1e-4
    // noise each) instead of ratios of rounded values, whose noise
    // blows up as 1/share for small shares
    val zeroExcess = rows.filter(_._3 == 0.0).filter(_._2 > 0.0)
    assert(zeroExcess.nonEmpty, "no zero-excess domain to anchor Z")
    val refRatio = zeroExcess.map(r => r._4 / r._2).max
    rows.foreach { case (src, share, excess, weight) =>
      if (excess == 0.0)
        // exp(0) = 1: weight = share / Z with Z ≥ 1, so never above
        // share (beyond rounding)
        assert(weight <= share + 2e-4,
          s"$src: zero-excess domain up-weighted ($share -> $weight)")
      else
        assert(weight - share * refRatio > -5e-4,
          s"$src: positive excess but weight $weight fell below " +
            s"share·(1/Z) = ${share * refRatio}")
    }
    Caches.clear(spark)
  }
}
