package graft

import org.apache.spark.sql.DataFrame

/** Size signal for the two-arm scale dispatchers
  * ([[operators.Cutpoints.cutpointOf]],
  * [[operators.TextAnalysis.thresholdSelect]] and its token-weighted
  * form): how much DATA can flow into this relation?
  *
  * `optimizedPlan.stats.sizeInBytes` is the wrong signal for deep
  * pipelines: Catalyst's non-CBO estimates MULTIPLY through
  * join/explode chains (a per-doc metric over a token-exploded join
  * estimates 6.8 GB from a 4 MB fixture), and an unmaterialized
  * InMemoryRelation reports the same garbage — so a fixture-scale
  * input dispatches to the scale arm, and the nested cache-relation
  * plan trees that arm builds blow up plan stringification
  * (explainString OOM) long before any data moves.
  *
  * The LEAF sum is the signal that cannot lie upward-then-downward:
  * every leaf reports REAL bytes (file-source relations report actual
  * file sizes, local relations their row bytes), and transformations
  * only ever re-arrange or shrink what the leaves supply, so
  * Σ(leaf bytes) over the ANALYZED plan (pre cache-substitution — no
  * InMemoryRelation estimates involved) upper-bounds the relation's
  * true size up to join fan-out. A repeated scan double-counts and a
  * 99%-selective filter doesn't discount — both biases point the SAME
  * way (toward the scale arm), which costs only constant factors
  * (both arms are result-identical by construction) and never
  * correctness or an at-scale meltdown. A 100 TB corpus sums ≥
  * 100 TB at the leaves; a fixture sums a few MB.
  */
object PlanSize {
  /** Σ sizeInBytes over the analyzed plan's leaf nodes. */
  def leafInputBytes(d: DataFrame): BigInt =
    d.queryExecution.analyzed.collectLeaves()
      .map(_.stats.sizeInBytes).sum
}
