package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval tier (q124/q125/q126): result invariants the DuckDB oracle
  * can't see (plan shape, the salted-rewrite equivalence) plus score
  * self-consistency. Exact value parity stays with the oracle gate.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q124 plan: no wide exchange of the corpus, top-k via heap") {
    val df = Retrieval.q124Bm25Topk.build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrderedAndProject, got:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"stats join must broadcast, got:\n$plan")
    // The only shuffle allowed is the 1-row stats aggregate (partials
    // → single partition); the corpus relation itself never exchanges.
    val exchanges = "Exchange (hashpartitioning|rangepartitioning)".r
      .findAllIn(plan).size
    assert(exchanges == 0,
      s"corpus must not hash/range-shuffle, got $exchanges in:\n$plan")
  }

  test("q124 results: only matching docs, descending rounded scores") {
    val rows = Retrieval.q124Bm25Topk.build(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= Retrieval.TopN)
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    val terms = Retrieval.QueryTerms.toSet
    val ids = rows.map(_.getLong(0)).toSet
    val texts = Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select("text").collect().map(_.getString(0))
    assert(texts.forall(t =>
      t.toLowerCase.split(" ").exists(terms.contains)),
      "a returned doc contains none of the query terms")
  }

  test("q125 fused score equals 1/(k+rb) + 1/(k+rv) at 4dp") {
    val rows = Retrieval.q125HybridRrf.build(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= Retrieval.TopN)
    rows.foreach { r =>
      val rb = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val rv = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(rb.isDefined || rv.isDefined)
      val expected =
        rb.map(x => 1.0 / (Retrieval.RrfK + x)).getOrElse(0.0) +
          rv.map(x => 1.0 / (Retrieval.RrfK + x)).getOrElse(0.0)
      val r4 = math.floor(expected * 10000 + 0.5) / 10000
      assert(math.abs(r4 - r.getDouble(3)) < 1e-12,
        s"row $r: expected $r4")
    }
  }

  test("q126 salted two-phase equals the direct per-source window") {
    val twoPhase = Retrieval.q126SourceCap.build(spark, dir)
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        md5(col("text").cast("binary")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val direct = docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= Retrieval.SourceCap)
      .select(col("source"), col("rk"), col("doc_id"))
    assert(twoPhase.exceptAll(direct).isEmpty &&
      direct.exceptAll(twoPhase).isEmpty,
      "salted rewrite changed the retained set")
    val over = twoPhase.groupBy("source")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > Retrieval.SourceCap)
    assert(over.isEmpty, "a source exceeds the cap")
  }

  test("q137 known-item eval: ranks well-formed, a doc queried by its " +
      "own top terms scores itself, MRR sane") {
    val rows = SparkEntry.queries("q137_retrieval_eval")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty, "no eval queries in the slice")
    rows.foreach { case (q, matched, rank, rr) =>
      // the source doc always matches its own top terms, so it is in
      // the matched set and the rank is within it
      assert(matched >= 1 && rank >= 1 && rank <= matched,
        s"q$q: rank $rank outside matched set $matched")
      val expect = math.floor(1e0 / rank * 10000 + 0.5) / 10000
      assert(math.abs(rr - expect) < 1e-12, s"q$q: rr $rr vs $expect")
    }
    // an index that cannot re-find a doc from the doc's own strongest
    // terms is broken; on this corpus the measured MRR is ~0.6 — gate
    // loosely below it so corpus regeneration noise doesn't flap
    val mrr = rows.map(_._4).sum / rows.length
    assert(mrr > 0.25, s"known-item MRR collapsed to $mrr")
    Caches.clear(spark)
  }

  test("q150 hybrid eval: fusion keeps the known item on top even " +
      "where the text channel ranks it deep; vector channel load-bearing") {
    val rows = SparkEntry.queries("q150_hybrid_eval")(spark, dir)
      .collect()
    assert(rows.nonEmpty, "no eval queries in the slice")
    rows.foreach { r =>
      val q = r.getAs[Long]("qdoc_id")
      assert(r.getAs[Int]("rv_src") == 1,
        s"q$q: self-retrieval must rank the source 1 in the vector " +
          s"channel, got ${r.getAs[Int]("rv_src")}")
      assert(r.getAs[Long]("src_rank") >= 1)
    }
    // the healthy stack fuses every known item to rank 1 — the gate a
    // fusion regression (wrong k, broken rank join, channel dropped)
    // trips immediately
    val fusedMrr = rows.map(_.getAs[Double]("rr4")).sum / rows.length
    assert(fusedMrr > 0.9, s"hybrid MRR collapsed to $fusedMrr")
    // the eval is only meaningful if fusion had work to do: some text
    // ranks must be > 1 (q137's channel alone would NOT put the source
    // first there — fusion rescued it)
    val deepText = rows.count(r => r.getAs[Int]("rb_src") > 1)
    assert(deepText > 0,
      "every text rank is already 1 — the fusion eval is vacuous")
    Caches.clear(spark)
  }

  test("q155: the ANN candidate stage preserves the fused known-item " +
      "quality on the fixture — self-retrieval intact, per-query " +
      "reciprocal ranks equal to the brute-force arm's") {
    val brute = SparkEntry.queries("q150_hybrid_eval")(spark, dir)
      .collect().map(r =>
        r.getAs[Long]("qdoc_id") -> r.getAs[Double]("rr4")).toMap
    val ann = SparkEntry.queries("q155_hybrid_eval_ann")(spark, dir)
      .collect()
    assert(ann.length == brute.size, "arms disagree on the eval slice")
    ann.foreach { r =>
      val q = r.getAs[Long]("qdoc_id")
      assert(r.getAs[Int]("rv_src") == 1,
        s"q$q: the source must be its own ANN candidate (its code " +
          "collides with itself in every table)")
      // on this fixture the Hamming-1 probes recover enough of the
      // depth-50 list that the fused rank is unchanged; a probe-stage
      // regression (mask set narrowed, bucket join broken) shows up
      // here as a recall drop before any production eval would see it
      assert(r.getAs[Double]("rr4") == brute(q),
        s"q$q: ANN arm fused rank diverged from brute force")
    }
    Caches.clear(spark)
  }

  test("q160 nDCG: values in (0,1], and a query whose known item " +
      "q137 puts at text rank 1 carries at least the grade-3 " +
      "contribution 3·w1 in its DCG") {
    val ndcg = SparkEntry.queries("q160_ndcg_eval")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("qdoc_id") ->
        ((r.getAs[Double]("dcg4"), r.getAs[Double]("ndcg4")))).toMap
    assert(ndcg.nonEmpty)
    ndcg.values.foreach { case (dcg, n) =>
      assert(n >= 0.0 && n <= 1.0, s"ndcg $n out of range")
      assert(dcg >= 0.0)
    }
    val rank1 = SparkEntry.queries("q137_retrieval_eval")(spark, dir)
      .collect()
      .filter(_.getAs[Long]("src_rank") == 1L)
      .map(_.getAs[Long]("qdoc_id"))
    assert(rank1.nonEmpty, "no rank-1 known items — text stack broken")
    rank1.foreach { q =>
      assert(ndcg(q)._1 >= 3.0,
        s"q$q: known item at rank 1 but dcg ${ndcg(q)._1} < 3.0")
    }
    Caches.clear(spark)
  }
}
