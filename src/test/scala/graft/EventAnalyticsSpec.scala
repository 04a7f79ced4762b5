package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The single-shuffle window formulations in [[EventAnalytics]] proved
  * equal to their textbook self-join formulations on real fixture data
  * — the equivalence that justifies shipping the one-exchange plans.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def events: DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))

  test("funnel: chained window minima equal the step-join formulation") {
    val stepUs = 6L * 3600L * 1000000L
    val e = events
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("us") > col("t1") && col("us") <= col("t1") + stepUs)
      .groupBy("user_id").agg(min("us").as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("us") > col("t2") && col("us") <= col("t2") + stepUs)
      .groupBy("user_id").agg(min("us").as("t3"))
    val expected = (s1.count(), s2.count(), s3.count())

    val r = EventAnalytics.q83Funnel.build(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == expected)
  }

  test("burst window: RANGE frame count equals the banded-pair count " +
      "plus one (each event pairs with itself)") {
    // The trailing-1h frame over (user, us) counts exactly the pairs
    // (a, b) with same user, b.us in (a.us - 1h, a.us], plus the row
    // itself. Reuse the Intervals banded-pair machinery keyed by user
    // as an independent oracle for total frame mass.
    val burstUs = 3600L * 1000000L
    val perUserEvents = events
      .select(col("user_id").cast("string").as("key"), col("us"))
    val pairMass = operators.Intervals
      .bandedPairs(perUserEvents, burstUs).count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us").rangeBetween(-burstUs, 0)
    val frameMass = events.withColumn("c", count(lit(1)).over(w))
      .agg(sum("c")).collect()(0).getLong(0)
    assert(frameMass == pairMass + events.count())
  }

  test("histogram: bins partition the relation (counts sum to total)") {
    val hist = EventAnalytics.q86Histogram.build(spark, dir)
    val total = hist.agg(sum("n")).collect()(0).getLong(0)
    assert(total == Tables.load(spark, dir, "events").count())
    // bins non-negative (values are), and per-type bin keys distinct
    assert(hist.filter(col("bin") < 0).count() == 0)
    assert(hist.select("event_type", "bin").distinct().count() ==
      hist.count())
  }

  test("retention: offset-0 count equals cohort size (every user is " +
      "active in their own first week)") {
    val r = EventAnalytics.q89Retention.build(spark, dir)
    val offset0 = r.filter(col("week_offset") === 0)
      .agg(sum("n_users")).collect()(0).getLong(0)
    val users = events.select("user_id").distinct().count()
    assert(offset0 == users)
  }

  test("q88: the custdist distribution partitions the customer " +
      "relation (left outer keeps zero-order customers)") {
    val dist = operators.Relational.q88CustOrderDist.build(spark, dir)
    val total = dist.agg(sum("custdist")).collect()(0).getLong(0)
    assert(total == Tables.load(spark, dir, "customer").count())
  }

  test("scd2: per-user intervals are disjoint, ordered, and exactly " +
      "one open (NULL valid_to) interval per user") {
    val rows = operators.EventAnalytics.q95Scd2.build(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
    rows.groupBy(_._1).foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_._2)
      sorted.foreach { case (_, from, to) => assert(from < to) }
      sorted.sliding(2).foreach {
        case Array((_, _, to1), (_, from2, _)) => assert(to1 == from2,
          s"user $u: intervals not contiguous")
        case _ => ()
      }
      assert(ivs.count(_._3 == Long.MaxValue) == 1,
        s"user $u: open-interval count != 1")
    }
  }

  test("outliers: robust stats sane (0 <= outliers < n, mad >= 0)") {
    operators.EventAnalytics.q96Outliers.build(spark, dir)
      .collect().foreach { r =>
        val n = r.getLong(1); val out = r.getLong(2)
        assert(out >= 0 && out < n)
        assert(r.getDouble(4) >= 0) // mad
      }
  }

  test("cooccurrence: support bounded by the rarer member's user count") {
    val d = events.select("user_id", "event_type").distinct()
    val perType = d.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    operators.EventAnalytics.q102Cooccurrence.build(spark, dir)
      .collect().foreach { r =>
        val (t1, t2, n) = (r.getString(0), r.getString(1), r.getLong(2))
        assert(n <= math.min(perType(t1), perType(t2)))
        val s = r.getDouble(3)
        assert(s > 0 && s <= 1)
      }
  }

  test("growth: cumulative count is monotone and ends at the distinct " +
      "user total") {
    val rows = operators.EventAnalytics.q104Growth.build(spark, dir)
      .collect().map(r => r.getLong(2))
    assert(rows.sameElements(rows.sorted))
    assert(rows.last == events.select("user_id").distinct().count())
  }

  test("gap detection: spine is contiguous daily and counts sum to " +
      "the full event total") {
    val rows = operators.EventAnalytics.q105GapDetection.build(spark, dir)
      .collect()
    val days = rows.map(r => r.getDate(0).toLocalDate)
    days.sliding(2).foreach {
      case Array(a, b) => assert(b == a.plusDays(1), s"gap in spine: $a→$b")
      case _ => ()
    }
    assert(rows.map(_.getLong(1)).sum ==
      Tables.load(spark, dir, "events").count())
  }

  test("decay: weights bounded by (0, 1] so each type's decayed sum " +
      "is below its plain sum") {
    val decayed = EventAnalytics.q84Decay.build(spark, dir)
      .select(col("event_type"), col("decayed_sum"))
    val plain = Tables.load(spark, dir, "events")
      .groupBy("event_type").agg(sum("value").as("s"))
    val joined = decayed.join(plain, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val d = r.getDouble(1); val s = r.getDouble(2)
      assert(d > 0 && d <= s, s"${r.getString(0)}: decayed=$d plain=$s")
    }
  }
}
