package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** Size-proportional corpus sampling. The catalog's existing sampling
  * ops are uniform-by-content (q60 hash gate, q75 min-md5 budgets,
  * q100 negative pools) — all select documents with probability
  * independent of their length. A mixture/inspection pass usually
  * wants the opposite: sample documents in proportion to the TOKENS
  * they contribute, so the sample's token mass mirrors the corpus
  * (probability-proportional-to-size systematic sampling; Madow 1949,
  * the standard survey-sampling estimator, and the shape token-level
  * pipeline audits use).
  *
  * Deterministic integer spelling (no RNG, no float): documents in
  * doc_id order carry an EXCLUSIVE running token sum; with
  * `stride = ⌊total_tokens / K⌋`, a document is selected iff its
  * token interval [cum, cum+nt) covers a multiple of the stride, and
  * `hits = (cum+nt) div stride − cum div stride` counts how many —
  * the PPS multiplicity (a doc longer than the stride is ALWAYS
  * selected, hits ≥ 1; the repo's exact-telescoping invariant
  * Σ hits = total div stride is pinned in [[graft.SamplingSpec]]).
  * Everything is BIGINT div BIGINT on both engines — a pure function
  * of the ordered corpus, bit-stable under repartitioning.
  *
  * Scale posture: the running sum is ONE global ordered window —
  * q71's documented serial→parallel tradeoff, global here because the
  * sample is corpus-level. At 100 TB the identical semantics run as
  * the two-pass prefix sum (per-shard partial sums → broadcast the
  * shard offset vector → shard-local windows); the selection math is
  * per-row either way and never changes.
  */
object Sampling {

  /** Target sample size (the stride denominator). */
  val SampleK = 40L

  val q209PpsSample: QueryDef = QueryDef(
    "q209_pps_sample",
    (s, dir) => {
      val w = Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast(LongType).as("nt"))
      val tot = broadcast(d.agg(sum(col("nt")).as("tw")))
      d.crossJoin(tot)
        .withColumn("cum", coalesce(sum(col("nt")).over(w), lit(0L)))
        .withColumn("stride",
          expr(s"greatest(tw div $SampleK, CAST(1 AS BIGINT))"))
        .withColumn("hits",
          expr("(cum + nt) div stride - cum div stride"))
        .filter(col("hits") > 0)
        .select(col("doc_id"), col("lang"), col("nt"), col("hits"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH d AS (
            |  SELECT doc_id, lang,
            |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
            |  FROM documents),
            |t AS (SELECT GREATEST(SUM(nt) // $SampleK, 1) AS stride
            |      FROM d),
            |c AS (
            |  SELECT doc_id, lang, nt,
            |    COALESCE(SUM(nt) OVER (ORDER BY doc_id
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            |      0) AS cum
            |  FROM d)
            |SELECT doc_id, lang, nt,
            |  (cum + nt) // stride - cum // stride AS hits
            |FROM c CROSS JOIN t
            |WHERE (cum + nt) // stride - cum // stride > 0
            |ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(q209PpsSample)
}
