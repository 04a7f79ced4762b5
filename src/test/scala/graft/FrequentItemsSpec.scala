package graft

import graft.functions.MisraGriesAggregator
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries heavy-hitter properties (q122's pass-1 summary).
  *
  * The operator's correctness claim is NOT that the sketch counts are
  * exact — they are order-dependent undercounts — but that (a) every
  * item above the N/(k+1) bound survives any fold/merge order, and
  * (b) after the exact re-count pass the final set equals the true
  * ≥-threshold set. Both are checked here against brute-force counts
  * over randomized partitionings of a Zipf-ish stream.
  */
class FrequentItemsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Deterministic geometric-skew stream: tok_i appears max(1, 1000/2^i)
    * times over 97 distinct items — a heavy head over a long unit tail.
    */
  private def stream(): Vector[String] =
    (0 until 97).flatMap(i =>
      Vector.fill(math.max(1, 1000 >> i))(s"tok_$i")).toVector

  private def foldPartitions(toks: Vector[String], parts: Int,
      seed: Long, k: Int): (Long, Map[String, Long]) = {
    val rnd = new scala.util.Random(seed)
    val shuffled = rnd.shuffle(toks)
    val agg = new MisraGriesAggregator(k)
    val partials = shuffled.grouped(
      math.max(1, shuffled.size / parts)).toVector
      .map(chunk => agg.reduce(agg.zero, chunk))
    rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
  }

  test("survival bound holds under any partitioning and merge order") {
    val toks = stream()
    val n = toks.size.toLong
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 15
    for (seed <- 1L to 5L; parts <- Seq(1, 3, 8)) {
      val (total, summary) = foldPartitions(toks, parts, seed, k)
      assert(total == n)
      assert(summary.size <= k)
      val mustSurvive = exact.filter(_._2 > n / (k + 1)).keySet
      assert(mustSurvive.subsetOf(summary.keySet),
        s"seed=$seed parts=$parts lost ${mustSurvive -- summary.keySet}")
      // undercount bound: sketch count ∈ [exact - N/(k+1), exact]
      summary.foreach { case (t, c) =>
        assert(c <= exact(t), s"$t overcounted")
        assert(c >= exact(t) - n / (k + 1), s"$t undercut past the bound")
      }
    }
  }

  test("q133: the MG sketch merged across MICRO-BATCH state composes " +
      "to exactly the batch q122 answer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val texts = docs.select(col("text")).as[String].collect()
    assert(texts.length >= 3)

    val mg = new graft.functions.MisraGriesAggregator(511)
    val input = MemoryStream[String]
    val sketch = input.toDS()
      .select(split(lower(col("value")), " ").as("toks"))
      .as[Seq[String]]
      .select(mg.toColumn).toDF()
    val name = s"mg_stream_${System.nanoTime()}"
    val q = sketch.writeStream.outputMode("complete").format("memory")
      .queryName(name).start()
    try {
      // three uneven batches — the merge path across streaming state
      val (a, rest) = texts.splitAt(texts.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      for (batch <- Seq(a, b, c)) {
        input.addData(batch.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val summary = spark.table(name)
      .select(col("_1").as("total"),
        explode(map_keys(col("_2"))).as("tok"))
    val streamed = graft.operators.FrequentItems
      .exactRecount(docs, summary).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val batchAns = SparkEntry.queries("q122_heavy_hitters")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamed == batchAns)
    assert(streamed.nonEmpty)
  }

  test("q122 equals the exact heavy-hitter set on the fixture") {
    val df = SparkEntry.queries("q122_heavy_hitters")(
      spark, "/root/testdata/sf0.001")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1)))
    // brute force over the same fixture with the same tokenization
    import org.apache.spark.sql.functions._
    val t = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val total = t.count()
    val want = t.groupBy("tok").count()
      .filter(col("count").cast("double") >= total * 0.005)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (tok, c) => (-c, tok) }
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty, "fixture should contain heavy tokens")
  }
}
