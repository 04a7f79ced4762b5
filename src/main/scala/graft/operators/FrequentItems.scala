package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.MisraGriesAggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Heavy-hitter (frequent-token) detection — the corpus-statistics
  * operator a tokenizer/vocab pipeline runs before training (stopword
  * discovery, vocabulary head sizing, Zipf profiling).
  *
  * Two-pass shape (the classic 2-pass exact heavy hitters):
  *
  *   pass 1  scan → in-row tokenize → Misra-Gries summary
  *           (O(k) state per task, one ≤k-entry map per task on the
  *           wire — NO per-token shuffle)
  *   pass 2  scan → in-row tokenize → broadcast-semi-join the ≤k
  *           candidates → exact counts of candidates only → threshold
  *
  * At 100 TB the fact table is scanned twice but never shuffled by
  * token: the only exchanges are the one-row summary merge and the
  * ≤k-group exact count. The naive single-pass alternative (GROUP BY
  * token over every occurrence) shuffles the full token stream — the
  * exact exchange class q68's r8 rework removed.
  *
  * Correctness does not depend on the sketch: MG with capacity k=511
  * guarantees every token with frequency > N/512 survives pass 1
  * (threshold here is 0.5%·N, 2.5× above the bound), and pass 2
  * replaces sketch counts with exact ones, so the output is exactly
  * the true ≥-threshold set — deterministic under any partitioning,
  * full hash-match oracle. See [[graft.functions.MisraGriesAggregator]].
  */
object FrequentItems {

  private val Capacity = 511     // error bound N/512 ≪ 0.5%·N threshold
  private val MinShare = 0.005   // heavy = ≥0.5% of all token occurrences

  /** Pass 2 over a pass-1 summary relation (total, tok): exact counts
    * of the ≤k candidates only, thresholded — shared by the batch q122
    * and the streaming-sketch q133 (whose pass 1 ran as streaming
    * state; MG merge order varies the CANDIDATE set but never the
    * final exact ≥-threshold output).
    */
  def exactRecount(docs: org.apache.spark.sql.DataFrame,
      summary: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .join(broadcast(summary), "tok")
      .groupBy(col("tok"), col("total"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c").cast(DoubleType) >= col("total") * MinShare)
      .select(col("tok"), col("c"),
        graft.Round4(col("c") / col("total")).as("share"))
      .orderBy(col("c").desc, col("tok"))

  val q122HeavyHitters: QueryDef = QueryDef(
    "q122_heavy_hitters",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val mg = new MisraGriesAggregator(Capacity)
      // pass 1: one merged (total, counters) row; candidates = keys
      val summary = docs
        .select(split(lower(col("text")), " ").as("toks"))
        .as[Seq[String]]
        .select(mg.toColumn)
        .select(col("_1").as("total"),
          explode(map_keys(col("_2"))).as("tok"))
      exactRecount(docs, summary)
    },
    Some(s"""WITH tk AS (
            |  SELECT unnest(string_split(lower(text), ' ')) AS tok
            |  FROM documents),
            |t AS (SELECT tok FROM tk WHERE len(tok) > 0),
            |n AS (SELECT COUNT(*) AS total FROM t)
            |SELECT tok, COUNT(*) AS c,
            |  floor(COUNT(*) / (SELECT total FROM n) * 10000 + 0.5)
            |    / 10000 AS share
            |FROM t GROUP BY tok
            |HAVING COUNT(*) >= (SELECT total FROM n) * $MinShare
            |ORDER BY c DESC, tok""".stripMargin))

  // q122's SKETCH pass run as REAL Structured Streaming state: the
  // Misra-Gries summary is a mergeable typed Aggregator, so the
  // corpus arrives as a document stream and the (total, counters)
  // buffer lives in streaming aggregation state, merged per
  // micro-batch in complete mode — the continuous corpus-statistics
  // monitor shape (vocabulary-head drift, stopword discovery over a
  // live crawl). MG merge order varies WHICH sub-threshold candidates
  // survive, but every true heavy hitter survives ANY order
  // (Agarwal et al., PODS'12 mergeability), and the exact-recount
  // pass filters the rest — so the final output is deterministic and
  // q122's oracle applies verbatim: the hash match proves the
  // streaming sketch state composes to the exact batch answer.
  val q133StreamHeavyHitters: QueryDef = QueryDef(
    "q133_stream_heavy_hitters",
    (s, dir) => {
      import s.implicits._
      val mg = new MisraGriesAggregator(Capacity)
      val sketch = graft.streaming.EventsStream.readDocuments(s, dir)
        .select(split(lower(col("text")), " ").as("toks"))
        .as[Seq[String]]
        .select(mg.toColumn)
        .toDF()
      val finalSummary = graft.streaming.EventsStream
        .runToCompletion(s, sketch)
        .select(col("_1").as("total"),
          explode(map_keys(col("_2"))).as("tok"))
      exactRecount(Tables.load(s, dir, "documents"), finalSummary)
    },
    q122HeavyHitters.oracle)

  val all: Seq[QueryDef] = Seq(q122HeavyHitters, q133StreamHeavyHitters)
}
