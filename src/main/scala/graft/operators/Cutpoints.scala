package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Size-guarded percentile-cutpoint dispatcher — the quantile analogue
  * of [[TextAnalysis.thresholdSelectTokens]]'s two-arm discipline.
  *
  * Exact `percentile` buffers EVERY group value in its aggregation
  * state (Spark's `Percentile` keeps an OpenHashMap of value→count and
  * sorts it at eval) — at 100 TB a per-language buffer holds billions
  * of per-doc metrics, which is the one aggregate shape that cannot
  * ship. `percentile_approx` (GK sketch, mergeable fixed-size state)
  * ships but is approximate. [[cutpointOf]] gets exactness AND the
  * at-scale shape the way `thresholdSelect` does for top-k:
  *
  *  - a SMALL relation (by [[graft.PlanSize.leafInputBytes]] — the sum
  *    of REAL leaf input sizes; propagated Catalyst estimates multiply
  *    garbage through join/explode chains) takes the exact
  *    `percentile` arm — one keyed agg, identical to the
  *    pre-dispatcher spelling;
  *  - a LARGE relation takes the sketch-banded arm: ONE keyed agg
  *    computes the group count and a GK sketch evaluated at
  *    `p ± marginFrac/accuracy` (clamped to [0,1]) for every requested
  *    p — a band of values guaranteed (up to sketch error) to straddle
  *    the two order statistics the exact interpolation needs. A second
  *    exact pass counts, per group and p, the rows strictly below the
  *    band and inside it; only the band rows (≈ 2·marginFrac·n/accuracy
  *    per group — thousands, not billions) are exactly ranked, and the
  *    interpolation `(higher−pos)·x_lo + (pos−lower)·x_hi` is replayed
  *    in the SAME operation order as Spark's `Percentile.getPercentile`
  *    so the result is bit-identical to the exact arm. Validity is
  *    PROVEN per group (the exact below/inside counts show both needed
  *    ranks land inside the band); a group whose sketch misestimated
  *    falls back to exact `percentile` over THAT group alone (the
  *    fallback's exact aggregate sits above a left-semi join on the
  *    invalid keys — never full-width). So the approx arm is exact
  *    ALWAYS, not w.h.p., and `CutpointSpec` pins arm equality.
  *
  * Contract notes, mirroring Spark's `percentile`:
  *  - nulls in `value` are ignored (filtered before either arm);
  *  - result is DOUBLE per p: `(higher−pos)·x_lo + (pos−lower)·x_hi`
  *    at pos = (n−1)·p, with the integral-position and equal-keys
  *    short-circuits returning x_lo directly (both matter for bit
  *    equality: interpolating between equal keys can round differently
  *    from returning the key);
  *  - BIGINT/INT inputs convert exactly for |v| < 2^53 (every µunit
  *    metric in this repo); ordering is unaffected by the early
  *    double cast.
  *
  * Cost (approx arm): persist(input projection) + 3 passes over the
  * cache (sketch agg, boundary-count agg, band extraction) + a
  * fallback pass that reads only misestimated keys. Every broadcast
  * here is group-cardinality (langs, event types) — broadcast-sized by
  * construction.
  */
object Cutpoints {

  /** Per-`keys` exact interpolated percentiles of `value` at `ps`.
    * Returns one row per key group with columns `keys ++ (cut0, cut1,
    * …)` (DOUBLE, in `ps` order), bit-equal to
    * `percentile(value, array(ps))` on every arm. `keys` may be empty
    * (global cutpoints — one output row).
    *
    * Contract note (empty/all-null input): a key group whose `value`s
    * are all NULL produces NO output row, and in the global
    * (keys-empty) case an empty or all-null input yields ZERO rows —
    * unlike a bare `d.agg(percentile(...))`, which emits one row with
    * NULL cuts. Callers that left-join the cutpoints or expect a
    * guaranteed row must handle the empty relation (current callers
    * cross-join against a fact side that is empty exactly when this
    * is).
    *
    * `forceArm`: None = plan-time size dispatch; Some("exact") /
    * Some("approx") pin an arm; Some("fallback") runs the approx arm
    * with validity forced false on every key — the spec's lever for
    * proving the per-key exact fallback equals the window-free path.
    */
  private[graft] def cutpointOf(
      d: DataFrame, keys: Seq[String], value: String, ps: Seq[Double],
      accuracy: Int = 10000, marginFrac: Double = 4.0,
      smallBytesBound: Long = 256L << 20,
      forceArm: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentages must be in [0,1]: $ps")
    val arm = forceArm.getOrElse {
      if (graft.PlanSize.leafInputBytes(d) <=
        BigInt(smallBytesBound)) "exact"
      else "approx"
    }
    // Constant dummy key unifies the global (keys-empty) case: grouping,
    // joins and windows all run on gk; the column drops on exit.
    val keyed = keys.nonEmpty
    val gk = if (keyed) keys else Seq("gk__")
    val dd0 = (if (keyed) d else d.withColumn("gk__", lit(0)))
      .select((gk.map(col) :+ col(value).cast(DoubleType).as("v__")): _*)
      .filter(col("v__").isNotNull)
    val cutCols = ps.indices.map(i => s"cut$i")
    def pick(out: DataFrame): DataFrame =
      out.select((keys.map(col) ++ cutCols.map(col)): _*)

    if (arm == "exact") {
      pick(dd0.groupBy(gk.map(col): _*)
        .agg(percentile(col("v__"),
          array(ps.map(p => lit(p)): _*)).as("cu__"))
        .select((gk.map(col) ++
          ps.indices.map(i => col("cu__")(i).as(s"cut$i"))): _*))
    } else {
      // ---- approx arm: sketch-banded exact quantiles ----
      val dd = graft.Caches.persist(dd0)
      val eps = marginFrac / accuracy
      val marks = ps.flatMap(p =>
        Seq(math.max(0.0, p - eps), math.min(1.0, p + eps)))
      // ONE keyed agg: group count + GK sketch at every band mark.
      // The sketch state is fixed-size and mergeable — this is the
      // only corpus-wide aggregate the large arm plans.
      val st = broadcast(dd.groupBy(gk.map(col): _*)
        .agg(count(lit(1)).as("n__"),
          percentile_approx(col("v__"),
            array(marks.map(m => lit(m)): _*), lit(accuracy))
            .as("ab__")))
      val cls = dd.join(st, gk)
      // Exact boundary counts per (group, p): rows strictly below the
      // band start and rows inside [lo, hi]. Plain mergeable sums.
      val bcAggs = ps.indices.flatMap { i =>
        Seq(
          sum(when(col("v__") < col("ab__")(2 * i), 1L).otherwise(0L))
            .as(s"nb${i}__"),
          sum(when(col("v__") >= col("ab__")(2 * i) &&
            col("v__") <= col("ab__")(2 * i + 1), 1L).otherwise(0L))
            .as(s"nin${i}__"))
      }
      // Needed 1-indexed order statistics per p: lower+1 and higher+1
      // at pos = (n−1)·p — Percentile.getPercentiles' exact spelling
      // ((count-1): Long→Double, then · p).
      def posOf(i: Int) =
        (col("n__") - 1).cast(DoubleType) * lit(ps(i))
      def rlOf(i: Int) = floor(posOf(i)) + 1L
      def rhOf(i: Int) = ceil(posOf(i)) + 1L
      val validCol =
        if (forceArm.contains("fallback")) lit(false)
        else ps.indices.map { i =>
          // both ranks provably inside (nb, nb+nin]
          (col(s"nb${i}__") < rlOf(i)) &&
            (col(s"nb${i}__") + col(s"nin${i}__") >= rhOf(i))
        }.reduce(_ && _)
      val bc = broadcast(cls.groupBy(gk.map(col): _*)
        .agg(first(col("n__")).as("n__"), bcAggs: _*)
        .withColumn("valid__", validCol))
      val bcSide = bc.select((gk.map(col) :+ col("valid__")) ++
        ps.indices.flatMap(i =>
          Seq(col(s"nb${i}__"), col(s"nin${i}__"))): _*)
      val good = cls.join(bcSide, gk).filter(col("valid__"))
      // Tag each band row with every p whose band contains it, then
      // compress ties: ranking runs over DISTINCT band values with
      // counts (a band holds ≈ 2·marginFrac·n/accuracy rows per
      // (group, p), and the distinct-value relation is smaller still —
      // a value massively tied at the percentile costs one row here,
      // not a billion-row sort partition).
      val tagArr = array(ps.indices.map(i =>
        when(col("v__") >= col("ab__")(2 * i) &&
          col("v__") <= col("ab__")(2 * i + 1), lit(i))): _*)
      val nbArr = array(ps.indices.map(i => col(s"nb${i}__")): _*)
      val bandVals = good
        .withColumn("pi__", explode(org.apache.spark.sql.functions
          .filter(tagArr, x => x.isNotNull)))
        .withColumn("nb__", element_at(nbArr, col("pi__") + 1))
        .groupBy((gk ++ Seq("pi__", "v__")).map(col): _*)
        .agg(count(lit(1)).as("c__"), first(col("n__")).as("n__"),
          first(col("nb__")).as("nb__"))
      // Exclusive cumulative count over distinct values → each value
      // covers the global-rank interval (nb+cum, nb+cum+c].
      val wv = Window.partitionBy((gk :+ "pi__").map(col): _*)
        .orderBy(col("v__"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = bandVals
        .withColumn("glo__",
          col("nb__") + coalesce(sum(col("c__")).over(wv), lit(0L)))
      // Per-group pivot: the value covering each needed rank, per p.
      def covers(rank: org.apache.spark.sql.Column) =
        col("glo__") < rank && col("glo__") + col("c__") >= rank
      val statAggs = ps.indices.flatMap { i =>
        Seq(
          min(when(col("pi__") === i && covers(rlOf(i)), col("v__")))
            .as(s"xlo${i}__"),
          min(when(col("pi__") === i && covers(rhOf(i)), col("v__")))
            .as(s"xhi${i}__"))
      }
      val stats = ranked.groupBy(gk.map(col): _*)
        .agg(first(col("n__")).as("n__"), statAggs: _*)
      // Percentile.getPercentile's exact branch order: integral
      // position → lower key; equal keys → lower key; else interpolate
      // (higher−pos)·lo + (pos−lower)·hi in THAT operation order.
      val goodCuts = stats.select((gk.map(col) ++
        ps.indices.map { i =>
          val pos = posOf(i)
          val lower = floor(pos)
          val higher = ceil(pos)
          when(higher === lower, col(s"xlo${i}__"))
            .when(col(s"xhi${i}__") === col(s"xlo${i}__"),
              col(s"xlo${i}__"))
            .otherwise(
              (higher.cast(DoubleType) - pos) * col(s"xlo${i}__") +
                (pos - lower.cast(DoubleType)) * col(s"xhi${i}__"))
            .as(s"cut$i")
        }): _*)
      // Per-key exact fallback — fires only for a key whose sketch
      // band missed a needed rank; its exact percentile aggregate is
      // gated BELOW by the left-semi join on invalid keys, so the
      // large arm never plans a full-width exact percentile
      // (CutpointSpec pins this shape).
      val invalid = bc.filter(!col("valid__")).select(gk.map(col): _*)
      val fb = dd.join(invalid, gk, "left_semi")
        .groupBy(gk.map(col): _*)
        .agg(percentile(col("v__"),
          array(ps.map(p => lit(p)): _*)).as("cu__"))
        .select((gk.map(col) ++
          ps.indices.map(i => col("cu__")(i).as(s"cut$i"))): _*)
      pick(goodCuts.unionByName(fb))
    }
  }
}
