package graft

import graft.functions.KllAggregator
import org.scalatest.funsuite.AnyFunSuite

/** The KLL compactor ladder's structural invariants (q234/q235's
  * sketch): exact weight conservation, the O(k) state bound, and the
  * rank-error guarantee under adversarial merge orders — the
  * properties the in-query gate rests on, pinned directly.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private val K = 64
  private val pcts = Seq(0.5, 0.9, 0.99)
  private def agg = new KllAggregator(K, pcts)

  private def fold(a: KllAggregator,
      xs: Seq[Double]): Array[Array[Double]] =
    xs.foldLeft(a.zero)(a.reduce)

  test("weight is conserved EXACTLY through inserts and merges, and " +
      "retained state stays O(k) while the input grows unbounded") {
    val a = agg
    val n = 50000
    // skewed, duplicate-heavy input (worst case for naive sketches)
    val xs = (0 until n).map(i =>
      if (i % 7 == 0) 42.0 else math.pow(1.0002, i % 9973))
    val b = fold(a, xs)
    assert(a.weightOf(b) == n.toLong,
      s"weight ${a.weightOf(b)} != inserted $n — compaction lost rows")
    assert(a.sizeOf(b) <= 4 * K,
      s"retained ${a.sizeOf(b)} items — state is not O(k)")
    // compaction genuinely happened (the bound test is non-vacuous)
    assert(a.sizeOf(b) < n)
  }

  test("merge conserves weight and the merged sketch's rank error " +
      "stays within the gate under adversarial merge orders") {
    val a = agg
    val n = 40000
    val xs = (0 until n).map(i => (i * 2654435761L % 100003).toDouble)
    val sortedXs = xs.sorted
    // the KLL guarantee is on the estimate's rank INTERVAL
    // [count(<est), count(<=est)] — the in-query gate's definition
    def rankErr(v: Double, p: Double): Double = {
      val lt = sortedXs.count(_ < v).toDouble
      val le = sortedXs.count(_ <= v).toDouble
      val t = p * n
      if (t < lt) lt - t else if (t > le) t - le else 0.0
    }
    // three merge topologies: sequential, balanced tree over 16
    // shards, and sorted-runs (each shard sees an ordered slice —
    // the pathological case for content-hash coins)
    val shards = xs.grouped(n / 16 + 1).toSeq
    val seqBuf = fold(a, xs)
    val treeBuf = shards.map(fold(a, _)).reduce(a.merge)
    val runBuf = sortedXs.grouped(n / 16 + 1).toSeq
      .map(fold(a, _)).reduce(a.merge)
    for ((name, buf) <- Seq("sequential" -> seqBuf,
        "tree" -> treeBuf, "sorted-runs" -> runBuf)) {
      assert(a.weightOf(buf) == n.toLong, s"$name lost weight")
      val est = a.finish(buf)
      pcts.zip(est).foreach { case (p, e) =>
        val err = rankErr(e, p)
        assert(err <= 0.02 * n + 1,
          f"$name p=$p rank error $err%.0f exceeds the 2%% gate " +
            f"(n=$n, estimate=$e)")
      }
    }
  }

  test("a duplicate-value atom spanning a percentile gates cleanly: " +
      "the interval rank definition is satisfiable where the " +
      "one-sided count(<=est) definition is not (r19 review fix)") {
    val a = agg
    val n = 30000
    // 60% of the mass is ONE value covering ranks 0.2n..0.8n — the
    // median lands inside the atom (integer token counts do this
    // constantly)
    val xs = (0 until n).map(i =>
      if (i % 5 == 0) (i % 997).toDouble - 2000 // 20% below
      else if (i % 5 == 1) (i % 997).toDouble + 2000 // 20% above
      else 42.0)
    val buf = fold(a, xs)
    val est = a.finish(buf)
    val sorted = xs.sorted
    // the p50 estimate must BE the atom value, and its rank interval
    // covers the target, so interval error is 0
    assert(est(0) == 42.0, s"median estimate ${est(0)} missed the atom")
    val lt = sorted.count(_ < est(0)).toDouble
    val le = sorted.count(_ <= est(0)).toDouble
    val t = 0.5 * n
    assert(lt <= t && t <= le)
    // the one-sided definition would be unsatisfiable here: distance
    // from t to count(<=est) alone exceeds any reasonable tolerance
    assert(math.abs(le - t) > 0.02 * n + 1,
      "atom too small — the regression this test pins is vacuous")
  }

  test("q238 artifact tier: persisted per-(type, day) ladders " +
      "conserve weight EXACTLY against the fact counts, and the " +
      "report's merged estimates — read from the artifact alone — " +
      "satisfy the rank gate (r19 VERDICT ask #5)") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val layout = java.nio.file.Files
      .createTempDirectory("graft_kll_art").toString + "/sketches"
    operators.Sampling.kllWriteArtifact(spark, dir, layout)
    // weight conservation across the persist/read boundary: the
    // stored ladders' summed weights equal the exact per-type fact
    // counts — the artifact IS the corpus, rank-wise
    val art = spark.read.parquet(layout).collect().map { r =>
      val lad = r.getSeq[scala.collection.Seq[Double]](
        r.fieldIndex("ladder")).map(_.toArray).toArray
      (r.getString(r.fieldIndex("event_type")),
        functions.KllLadder.weightOf(lad))
    }
    assert(art.nonEmpty, "empty artifact — vacuous")
    val weights = art.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(_._2).sum }
    val exact = Tables.load(spark, dir, "events")
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(weights == exact,
      s"stored ladder weights $weights != fact counts $exact")
    // the report: merged-from-artifact estimates pass every in-query
    // rank gate (the q238 entry end-to-end)
    val out = SparkEntry.queries("q238_kll_sketch_artifact")(
      spark, dir).collect()
    assert(out.map(_.getString(0)).toSet == exact.keySet)
    out.foreach { r =>
      Seq("kll_p50_ok", "kll_p90_ok", "kll_p99_ok").foreach { g =>
        assert(r.getBoolean(r.fieldIndex(g)),
          s"$g failed for ${r.getString(0)}")
      }
    }
  }

  test("small groups pass through EXACTLY (no compaction below " +
      "capacity) and the estimator answers the definitional rank") {
    val a = agg
    val xs = Seq(5.0, 1.0, 9.0, 3.0, 7.0)
    val b = fold(a, xs)
    assert(a.sizeOf(b) == 5 && a.weightOf(b) == 5)
    // ceil(0.5*5)=3rd smallest = 5.0; ceil(0.9*5)=5th = 9.0
    val est = a.finish(b)
    assert(est(0) == 5.0 && est(1) == 9.0 && est(2) == 9.0)
  }
}
