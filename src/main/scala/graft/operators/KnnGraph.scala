package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mutual k-nearest-neighbor graph over the embedding corpus — the
  * substrate every semantic-structure pass sits on: SemDeDup-style
  * cluster discovery, graph-based label propagation, and the
  * NN-descent family (Dong, Moses & Li WWW'11) all consume exactly
  * this relation. The catalog's ANN tier answers QUERY→corpus top-k
  * (q26/q45/q136); this is the corpus→corpus ALL-nodes variant, whose
  * naive spelling is the N² trap — so candidates come from the same
  * IVF geometry the query tier uses (multiprobe list assignment vs
  * the committed centroid fixture), keeping every exchange keyed on
  * the centroid id: candidate volume is Σ over lists of
  * occupancy² ≈ (nprobe·N)²/L — O(N) under the k ∝ N centroid
  * operating contract (q139), the same class as the LSH band joins.
  *
  * Shape: every vector explodes to its [[NProbe]] nearest lists and
  * candidates are the CO-PROBE pairs — both endpoints assigned, a
  * pair survives when their probe sets intersect (one self-equi-join
  * on `cid`, symmetric by construction; this is the LSH band-join
  * move applied to IVF geometry). The asymmetric query-tier shape
  * (probe side vs rank-1 index side) measured 0.20 mutual recall
  * one-directional and 0.69 symmetrized on the fixture — a kNN GRAPH
  * needs both endpoints of a boundary-straddling pair to reach the
  * shared adjacent list, which co-probing gives (measured 0.92). An
  * exact integer-µcos re-rank scores the deduped pairs
  * (the q188 determinism contract: µ-quantized components, exact
  * integer dot, ONE float→integer floor per pair), a per-node window
  * keeps top-[[GraphK]] (bounded by probe-list volume, never N²), and
  * a self-semi-join on the (N·k)-row kNN relation keeps the MUTUAL
  * edges — the symmetrization that turns directed kNN into the graph
  * clustering consumes. At 10⁹ vectors every stage scales with list
  * occupancy (k ∝ N centroids, the q139 operating contract); nothing
  * here ever materializes more than candidates.
  */
object KnnGraph {

  /** Neighbors kept per node before symmetrization. */
  val GraphK = 3

  /** Lists probed per vector (both sides) in candidate generation. */
  val NProbe = 2

  /** Top-[[GraphK]] per node over a scored candidate relation
    * `(sx, ty, ucos)`, then keep the mutual pairs, canonical a < b.
    * Unordered: the catalog entries ORDER BY (a, b) for their output
    * contract; substrate consumers (q211's adjacency) would only
    * throw that sort away.
    */
  private[graft] def mutualTopK(scored: DataFrame): DataFrame = {
    val knn = scored
      .withColumn("r", row_number().over(Window.partitionBy("sx")
        .orderBy(col("ucos").desc, col("ty"))))
      .filter(col("r") <= GraphK)
      .select(col("sx"), col("ty"), col("ucos"))
    val rev = knn.select(col("ty").as("sx"), col("sx").as("ty"))
    knn.join(rev, Seq("sx", "ty"), "left_semi")
      .filter(col("sx") < col("ty"))
      .select(col("sx").as("a"), col("ty").as("b"), col("ucos"))
  }

  /** Exact integer-µcos score for a candidate pair relation, joined
    * back to the quantized corpus on both endpoints.
    */
  private def score(cand: DataFrame, e: DataFrame): DataFrame =
    cand
      .join(e.select(col("vec_id").as("sx"), col("qv").as("xq"),
        col("qn").as("xn")), "sx")
      .join(e.select(col("vec_id").as("ty"), col("qv").as("yq"),
        col("qn").as("yn")), "ty")
      .withColumn("ucos", Bitext.ucosCol)

  /** Co-probe candidate pairs from the IVF geometry. The centroid
    * table defaults to the committed fixture; callers operating the
    * k ∝ N contract (the q139 scale posture) pass their own packed
    * table — [[graft.ScaleGrowthSpec]] measures the resulting
    * candidate-volume exponent at ~1 under that contract.
    */
  private[graft] def probedScores(s: SparkSession, e: DataFrame,
      packed: Seq[Double] = null): DataFrame = {
    val cents = typedLit(Option(packed)
      .getOrElse(graft.Fixtures.ivfCentroidsPacked(s).toSeq))
    val probed = graft.Caches.persist(
      e.select(col("vec_id"),
        explode(graft.functions.VectorOps.centroidTopK(
          col("v"), col("nrm"), cents, NProbe)).as("cid")))
    val cand = probed.select(col("vec_id").as("sx"), col("cid"))
      .join(probed.select(col("vec_id").as("ty"), col("cid")), "cid")
      .filter(col("sx") =!= col("ty"))
      .dropDuplicates("sx", "ty")
    score(cand, e)
  }

  /** The exact small-corpus arm: one broadcast all-pairs pass (the
    * q188/q26 class — ground truth below
    * [[Similarity.SmallCorpusBound]]; above it, [[probedScores]] is
    * the arm a dispatcher hands out, the q207 pattern).
    */
  private[graft] def exactScores(e: DataFrame): DataFrame =
    e.select(col("vec_id").as("sx"), col("qv").as("xq"),
        col("qn").as("xn"))
      .join(broadcast(e.select(col("vec_id").as("ty"),
        col("qv").as("yq"), col("qn").as("yn"))),
        col("sx") =!= col("ty"))
      .withColumn("ucos", Bitext.ucosCol)

  /** Shared oracle prefix ending in a `mutual(a, b, ucos)` CTE — the
    * exact-arm mutual-kNN edge relation (q210's result before its
    * final ORDER BY; q211's propagation substrate).
    */
  private[graft] def oracleMutualCte: String =
    s"""${Bitext.oracleQuantCte},
       |p AS (
       |  ${Bitext.oracleUcosSelect("x.vec_id", "y.vec_id",
          "n x JOIN n y ON x.vec_id <> y.vec_id")}),
       |knn AS (
       |  SELECT sx, ty, ucos FROM (
       |    SELECT sx, ty, ucos, ROW_NUMBER() OVER (
       |      PARTITION BY sx ORDER BY ucos DESC, ty) AS r
       |    FROM p) t WHERE r <= $GraphK),
       |mutual AS (
       |  SELECT k1.sx AS a, k1.ty AS b, k1.ucos
       |  FROM knn k1 JOIN knn k2 ON k1.sx = k2.ty AND k1.ty = k2.sx
       |  WHERE k1.sx < k1.ty)""".stripMargin

  val q210KnnGraph: QueryDef = QueryDef(
    "q210_knn_graph",
    (s, dir) => mutualTopK(exactScores(
      Bitext.qrel(Similarity.normed(s, dir)))).orderBy("a", "b"),
    Some(s"""$oracleMutualCte
            |SELECT a, b, ucos FROM mutual
            |ORDER BY a, b""".stripMargin))

  /** q210b: the probed production arm oracle-checked end-to-end —
    * the co-probe candidate set is spelled relationally (the q188b
    * pattern), so candidate membership AND the restricted top-k are
    * pinned, not just recall-gated. On geometrically concentrated
    * corpora the probed graph approaches the exact one (planted-twin
    * recall is pinned at 1.0 in [[graft.KnnGraphSpec]]); on this
    * fixture's near-uniform tail it is a DIFFERENT, sparser graph —
    * measured mutual recall 0.52 vs exact, the honest cost of probing
    * 2/16 lists on data whose neighbors aren't concentrated.
    */
  val q210bKnnGraphProbed: QueryDef = QueryDef(
    "q210b_knn_graph_probed",
    (s, dir) => mutualTopK(probedScores(s,
      Bitext.qrel(Similarity.normed(s, dir)))).orderBy("a", "b"),
    Some(s"""${Bitext.oracleQuantCte},
            |ce AS (SELECT cid, cv
            |       FROM read_parquet('${graft.Fixtures.ivfCentroidsPath}')),
            |asn AS (
            |  SELECT n.vec_id, ce.cid,
            |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
            |      list_cosine_similarity(v, cv) DESC, ce.cid) AS crnk
            |  FROM n CROSS JOIN ce),
            |cand AS (
            |  SELECT DISTINCT a.vec_id AS sx, b.vec_id AS ty
            |  FROM asn a JOIN asn b ON a.cid = b.cid
            |    AND a.crnk <= $NProbe AND b.crnk <= $NProbe
            |    AND a.vec_id <> b.vec_id),
            |p AS (
            |  ${Bitext.oracleUcosSelect("c.sx", "c.ty",
               "cand c JOIN n x ON x.vec_id = c.sx " +
                 "JOIN n y ON y.vec_id = c.ty")}),
            |knn AS (
            |  SELECT sx, ty, ucos FROM (
            |    SELECT sx, ty, ucos, ROW_NUMBER() OVER (
            |      PARTITION BY sx ORDER BY ucos DESC, ty) AS r
            |    FROM p) t WHERE r <= $GraphK)
            |SELECT k1.sx AS a, k1.ty AS b, k1.ucos
            |FROM knn k1 JOIN knn k2 ON k1.sx = k2.ty AND k1.ty = k2.sx
            |WHERE k1.sx < k1.ty
            |ORDER BY a, b""".stripMargin))

  val all: Seq[QueryDef] = Seq(q210KnnGraph, q210bKnnGraphProbed)
}
