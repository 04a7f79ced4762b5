package graft

import graft.operators.Cutpoints
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[Cutpoints.cutpointOf]] — the size-guarded percentile
  * dispatcher (the 100 TB swap for exact per-group `percentile`, whose
  * aggregation state buffers every group value):
  *
  *  - the sketch-banded approx arm must be BIT-equal to the exact
  *    `percentile` arm (same interpolation operation order), on real
  *    fixture metrics and on adversarial synthetic groups (1-row,
  *    all-tied, boundary-tied, negative, integral positions p=0/1);
  *  - the forced-fallback path (every key misestimates) must equal
  *    exact — proving the per-key fallback stays exact;
  *  - the plan dispatch: fixture scale plans the exact arm only;
  *    the large arm plans NO full-width exact percentile — every
  *    exact Percentile aggregate in it sits above the left-semi join
  *    that gates the fallback to invalid keys.
  */
class CutpointSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def bits(df: DataFrame, keys: Seq[String]): Map[Seq[Any], Seq[Long]] =
    df.collect().map { r =>
      val k = keys.map(c => r.getAs[Any](c))
      val cuts = (keys.size until r.length).map { i =>
        if (r.isNullAt(i)) Long.MinValue
        else java.lang.Double.doubleToRawLongBits(r.getDouble(i))
      }
      k -> (cuts: Seq[Long])
    }.toMap

  private def assertArmsEqual(d: DataFrame, keys: Seq[String],
      value: String, ps: Seq[Double], ctx: String): Unit = {
    val ex = bits(Cutpoints.cutpointOf(d, keys, value, ps,
      forceArm = Some("exact")), keys)
    val ap = bits(Cutpoints.cutpointOf(d, keys, value, ps,
      forceArm = Some("approx")), keys)
    val fb = bits(Cutpoints.cutpointOf(d, keys, value, ps,
      forceArm = Some("fallback")), keys)
    assert(ap == ex, s"approx arm != exact arm ($ctx)")
    assert(fb == ex, s"fallback path != exact arm ($ctx)")
  }

  test("arm bit-equality on real per-doc µunit metrics (keyed + global)") {
    val d = Tables.load(spark, dir, "documents")
      .withColumn("nt",
        size(split(lower(col("text")), " ")).cast("long"))
      // µunit-style bigint metric with a nonlinear spread
      .withColumn("bu", (col("nt") * col("nt") * 1000L + col("doc_id")))
    assertArmsEqual(d, Seq("lang"), "bu",
      Seq(1.0 / 3, 2.0 / 3), "per-lang tertiles, bigint")
    assertArmsEqual(d, Nil, "bu", Seq(0.8), "global p80, bigint")
    assertArmsEqual(d, Seq("lang"), "nt",
      Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0), "per-lang incl. p0/p1")
  }

  test("arm bit-equality on events doubles (q96's shape)") {
    val e = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("value"))
    assertArmsEqual(e, Seq("event_type"), "value", Seq(0.5),
      "per-type median, double")
  }

  test("adversarial groups: 1-row, all-tied, boundary-tied, negative") {
    import spark.implicits._
    val rows =
      Seq(("one", 42.5)) ++ // single row
        (1 to 50).map(_ => ("tied", 7.0)) ++ // all values equal
        // half the mass tied exactly AT the median
        ((1 to 25).map(_ => ("btied", 1.0)) ++
          (1 to 25).map(_ => ("btied", 2.0))) ++
        (1 to 40).map(i => ("neg", -i * 0.37)) ++
        Seq(("two", 1.0), ("two", 1000.0)) // interpolation across a gap
    val d = rows.toDF("k", "v")
    assertArmsEqual(d, Seq("k"), "v",
      Seq(0.0, 1.0 / 3, 0.5, 2.0 / 3, 0.8, 1.0), "adversarial")
  }

  test("nulls in the value column are ignored (percentile contract)") {
    import spark.implicits._
    val d = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("a", Some(2.0)), ("b", None), ("b", Some(5.0)))
      .toDF("k", "v")
    val ex = bits(Cutpoints.cutpointOf(d, Seq("k"), "v", Seq(0.5),
      forceArm = Some("exact")), Seq("k"))
    val ap = bits(Cutpoints.cutpointOf(d, Seq("k"), "v", Seq(0.5),
      forceArm = Some("approx")), Seq("k"))
    assert(ap == ex)
    assert(ex(Seq("a")) ==
      Seq(java.lang.Double.doubleToRawLongBits(2.0)))
    assert(ex(Seq("b")) ==
      Seq(java.lang.Double.doubleToRawLongBits(5.0)))
  }

  test("dispatcher: fixture scale plans the exact arm; byte bound 1 " +
      "flips to the sketch-banded arm — results identical") {
    val e = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("value"))
    val auto = Cutpoints.cutpointOf(e, Seq("event_type"), "value",
      Seq(0.5))
    // exact arm: none of the band machinery in the plan
    assert(!auto.queryExecution.optimizedPlan.toString.contains("ab__"))
    val flipped = Cutpoints.cutpointOf(e, Seq("event_type"), "value",
      Seq(0.5), smallBytesBound = 1L)
    assert(flipped.queryExecution.optimizedPlan.toString
      .contains("ab__"), "byte bound 1 must plan the approx arm")
    assert(bits(flipped, Seq("event_type")) ==
      bits(auto, Seq("event_type")))
  }

  test("large arm plans no full-width exact percentile: every exact " +
      "Percentile aggregate sits above the fallback's left-semi join") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.catalyst.expressions.aggregate.Percentile
    val e = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("value"))
    val ap = Cutpoints.cutpointOf(e, Seq("event_type"), "value",
      Seq(0.25, 0.5, 0.75), forceArm = Some("approx"))
    val plan = ap.queryExecution.optimizedPlan
    val exactPctAggs = plan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.exists {
        case _: Percentile => true
        case _ => false
      }) => a
    }
    assert(exactPctAggs.nonEmpty,
      "expected the gated fallback subtree to exist")
    exactPctAggs.foreach { a =>
      val gated = a.exists {
        case j: Join => j.joinType == LeftSemi
        case _ => false
      }
      assert(gated,
        s"an exact Percentile aggregate runs full-width in the large arm:\n$a")
    }
  }
}
