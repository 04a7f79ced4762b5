package graft.operators

import graft.{Caches, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative link-graph analytics — the operator class a crawl-scale
  * curation stack uses to PRIORITIZE what it fetches and keeps
  * (Common Crawl publishes exactly this: per-domain harmonic/PageRank
  * centrality over the host webgraph, used to rank the frontier the
  * q180/q182 crawl tier consumes). The catalog's graph story so far
  * is reachability (q66 pointer-jumping, q106 recursive closure);
  * PageRank adds the VALUE-propagation family — fixed-point iteration
  * of a sparse matrix-vector product — which no amount of closure
  * composition expresses.
  *
  * Spark-first shape: the edge relation is built ONCE (one keyed agg
  * off the fact join), pre-partitioned by `src`, and persisted; every
  * iteration is then one join against the rank vector plus one keyed
  * agg — at local scale AQE broadcasts the (V-row) rank side so the
  * persisted (E-row) edges NEVER shuffle again, and at web scale the
  * same plan runs as a co-partitioned join where each iteration
  * shuffles O(V) rank rows, never the O(E) edges (the GraphX/Pregel
  * cost model, expressed in plain DataFrame ops). Iteration count is
  * FIXED (5) so the computation is a pure function of the data — the
  * oracle unrolls the same 5 steps; a production run iterates to an
  * integer fixed point instead (the rank vector is BIGINT, so "no
  * rank moved" is an exact predicate, not an epsilon test).
  *
  * Determinism contract (the repo-wide integer-unit discipline): the
  * rank vector lives in parts-per-billion of total mass. Each edge
  * carries `(rank_src · w) div wsum_src` — BIGINT div BIGINT — and the
  * damping update is `150000000 div V + (85 · Σ contrib) div 100`
  * (= ⌊0.15·10⁹/V⌋ + ⌊0.85·Σ⌋ in exact rationals). Every intermediate
  * stays ≤ 85·10⁹ ≪ 2⁶³; both engines fold identical longs, so the
  * result is bit-stable under any partitioning/summation order
  * (the q188 lesson: no float crosses the engine boundary).
  *
  * Graph derivation (no link table in the star schema): the weighted
  * bipartite customer↔supplier graph — an edge per (custkey, suppkey)
  * with weight = their lineitem count, materialized in BOTH directions
  * so the walk is an undirected random walk with restart. Rank over it
  * is the stationary "importance" of each supplier weighted by how
  * much central-customer traffic flows through it (the BiRank/co-HITS
  * family; Page, Brin, Motwani & Winograd 1999 for the recurrence).
  * Reported: every supplier's rank, descending.
  */
object Graph {

  /** Total rank mass: ranks are parts-per-billion (ppb) BIGINTs. */
  val RankScale = 1000000000L

  /** Fixed iteration count (oracle unrolls the same number). */
  val Iterations = 5

  /** Node encoding over one BIGINT key space: customers even,
    * suppliers odd — a composite (type, id) key without a struct
    * join key on the iteration's hot path.
    */
  private def custNode(c: org.apache.spark.sql.Column) = c * 2L
  private def suppNode(p: org.apache.spark.sql.Column) = p * 2L + 1L

  /** Weighted out-normalized edge relation `(src, dst, w, wsum)`,
    * both directions, pre-partitioned by `src` and persisted — the
    * loop-invariant side of every iteration's join.
    */
  private[graft] def edges(s: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("p"))
      .agg(count(lit(1)).as("w"))
    val both = e0.select(custNode(col("c")).as("src"),
        suppNode(col("p")).as("dst"), col("w"))
      .unionAll(e0.select(suppNode(col("p")).as("src"),
        custNode(col("c")).as("dst"), col("w")))
    val ws = both.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
    Caches.persist(
      both.join(ws, "src").repartition(col("src")))
  }

  /** Five damped-update rounds of the integer recurrence; returns the
    * full `(node, rank)` vector. Every node has in-edges by
    * construction (edges are materialized in both directions and the
    * node set is the edge endpoints), so no dangling-mass term — and
    * no per-round join back to the node list either: the contribution
    * agg already emits exactly one row per node, so each round is ONE
    * join against the persisted edges + ONE keyed agg (+ the 1-row
    * broadcast for the teleport term). The equivalent left join the
    * oracle spells for clarity is a no-op dropped here: on a
    * floor-dominated local wall the extra join cost a stage per
    * round (measured 51 → 46 executed stages).
    */
  private[graft] def ranks(ew: DataFrame): DataFrame = {
    val nodes = Caches.persist(
      ew.select(col("dst").as("node")).distinct())
    val nn = broadcast(nodes.agg(count(lit(1)).as("nn")))
    var r = nodes.crossJoin(nn)
      .select(col("node"), expr(s"$RankScale div nn").as("rank"))
    for (_ <- 1 to Iterations) r = damped(ew, r, nn)
    r
  }

  /** One damped round: contributions along the persisted edges, then
    * teleport + damping. Emits one row per node (every node has
    * in-edges by construction).
    */
  private def damped(ew: DataFrame, r: DataFrame,
      nn: DataFrame): DataFrame =
    ew.join(r.select(col("node").as("src"), col("rank").as("srank")),
        "src")
      .select(col("dst").as("node"),
        expr("(srank * w) div wsum").as("c"))
      .groupBy(col("node")).agg(sum(col("c")).as("ctb"))
      .crossJoin(nn)
      .select(col("node"),
        expr("150000000 div nn + (85 * ctb) div 100").as("rank"))

  /** Production iteration: run the damped update until the rank
    * vector REVISITS a state — period-1 (a true fixed point) or
    * period-2. The period-2 case is real, not defensive: the walk is
    * bipartite (customer↔supplier), and integer flooring sustains a
    * small alternating cycle the real-valued contraction would damp
    * out (measured on the fixture: amplitude 66 ppb after ~94 rounds
    * — 0.007% of a typical rank; either cycle member is within that
    * of the rational fixed point). The stop predicate is exact BIGINT
    * equality — no float epsilon anywhere — and provably terminates:
    * an integer map on a bounded lattice must enter a cycle. Each
    * round materializes via `localCheckpoint` (the q66
    * pointer-jumping discipline: constant plan depth however many
    * rounds run); the revisit check is the per-round driver action
    * every convergent-iteration engine performs. The catalog entry
    * (q208) pins the FIXED 5-round recurrence instead because an
    * oracle needs a pure function of the data; this arm is the one a
    * production caller uses, spec-gated in [[graft.GraphSpec]] by the
    * exact period invariance f(f(r)) = r.
    *
    * @return (rank vector, rounds executed)
    */
  def ranksToConvergence(ew: DataFrame,
      maxRounds: Int = 200): (DataFrame, Int) = {
    val nodes = graft.Caches.persist(
      ew.select(col("dst").as("node")).distinct())
    val nn = broadcast(nodes.agg(count(lit(1)).as("nn")))
    def step(cur: DataFrame): DataFrame = damped(ew, cur, nn)
    def differs(a: DataFrame, b: DataFrame): Boolean =
      a.join(b.withColumnRenamed("rank", "prev"), "node")
        .filter(col("rank") =!= col("prev")).limit(1).count() > 0
    // release a superseded checkpoint's cached RDD: only the current
    // and previous vectors are ever read again, so without this every
    // round's V-row block stays resident for the whole call (~100
    // rounds of garbage at graph scale)
    def release(df: DataFrame): Unit =
      graft.Caches.releaseLocalCheckpoint(df)
    var prev: DataFrame = null
    var r = nodes.crossJoin(nn)
      .select(col("node"), expr(s"$RankScale div nn").as("rank"))
      .localCheckpoint()
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      val next = step(r).localCheckpoint()
      done = !differs(next, r) ||
        (prev != null && !differs(next, prev))
      if (prev != null) release(prev)
      prev = r
      r = next
      rounds += 1
    }
    // the caller only needs the FINAL vector: release the last prev
    // checkpoint and the per-call nodes cache too, or every call
    // leaves ~two V-row blocks resident for the session's life —
    // exactly the round-garbage this function exists to avoid
    if (prev != null && (prev ne r)) release(prev)
    // through Caches.release, not a bare unpersist: the registry entry
    // must go too, or each call leaks one dead DataFrame there
    graft.Caches.release(nodes)
    (r, rounds)
  }

  val q208SupplierPagerank: QueryDef = QueryDef(
    "q208_supplier_pagerank",
    (s, dir) => {
      val r = ranks(edges(s, dir))
      r.filter(expr("node % 2 = 1"))
        .select(expr("node div 2").as("s_suppkey"),
          col("rank").as("rank_ppb"))
        .join(Tables.load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name")), "s_suppkey")
        .select(col("s_suppkey"), col("s_name"), col("rank_ppb"))
        .orderBy(col("rank_ppb").desc, col("s_suppkey"))
    },
    Some {
      // unrolled 5-step twin of the integer recurrence above
      val steps = (1 to Iterations).map { i =>
        s"""c$i AS (
           |  SELECT ew.dst AS node,
           |    SUM((r.rank * ew.w) // ew.wsum) AS ctb
           |  FROM ew JOIN r${i - 1} r ON ew.src = r.node
           |  GROUP BY ew.dst),
           |r$i AS (
           |  SELECT n.node, 150000000 // nn.n
           |    + (85 * COALESCE(c$i.ctb, 0)) // 100 AS rank
           |  FROM nodes n CROSS JOIN nn
           |  LEFT JOIN c$i ON n.node = c$i.node)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (
         |  SELECT o_custkey AS c, l_suppkey AS p, COUNT(*) AS w
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  GROUP BY 1, 2),
         |e AS (
         |  SELECT c * 2 AS src, p * 2 + 1 AS dst, w FROM e0
         |  UNION ALL
         |  SELECT p * 2 + 1 AS src, c * 2 AS dst, w FROM e0),
         |ws AS (SELECT src, SUM(w) AS wsum FROM e GROUP BY src),
         |ew AS (SELECT e.src, e.dst, e.w, ws.wsum
         |       FROM e JOIN ws ON e.src = ws.src),
         |nodes AS (SELECT DISTINCT dst AS node FROM e),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |r0 AS (SELECT node, 1000000000 // nn.n AS rank
         |       FROM nodes CROSS JOIN nn),
         |$steps
         |SELECT node // 2 AS s_suppkey, s_name,
         |  CAST(rank AS BIGINT) AS rank_ppb
         |FROM r$Iterations JOIN supplier ON node // 2 = s_suppkey
         |WHERE node % 2 = 1
         |ORDER BY rank_ppb DESC, s_suppkey""".stripMargin
    },
    bench = true, lowLatency = true)

  /** Every 10th supplier is a trusted seed for q212. */
  val TrustSeedMod = 10

  /** TrustRank (Gyöngyi, Garcia-Molina & Pedersen VLDB'04) — the
    * seeded-teleport variant of q208 a crawl stack runs to PROPAGATE
    * TRUST from a small vetted seed set instead of ranking globally:
    * the teleport term lands only on seeds, so mass reaches a node
    * only through paths from the trusted set and spam/junk regions
    * score ~0 however well-linked they are internally. Identical
    * machinery to q208 (same persisted edge relation, same integer
    * recurrence, same 5 unrolled rounds) with the base term gated by
    * the seed predicate — a pure function of the node id, so both
    * engines state it identically. Output: every supplier reached by
    * trust, descending.
    */
  val q212TrustRank: QueryDef = QueryDef(
    "q212_trustrank",
    (s, dir) => {
      val ew = edges(s, dir)
      val nodes = Caches.persist(
        ew.select(col("dst").as("node")).distinct())
      val seedCond =
        s"node % 2 = 1 AND (node div 2) % $TrustSeedMod = 0"
      val ns = broadcast(nodes.filter(expr(seedCond))
        .agg(count(lit(1)).as("ns")))
      var t = nodes.crossJoin(ns).select(col("node"),
        expr(s"CASE WHEN $seedCond THEN $RankScale div ns " +
          "ELSE CAST(0 AS BIGINT) END").as("rank"))
      for (_ <- 1 to Iterations) {
        t = ew.join(t.select(col("node").as("src"),
            col("rank").as("srank")), "src")
          .select(col("dst").as("node"),
            expr("(srank * w) div wsum").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("ctb"))
          .crossJoin(ns)
          .select(col("node"),
            expr(s"CASE WHEN $seedCond THEN 150000000 div ns " +
              "ELSE CAST(0 AS BIGINT) END + (85 * ctb) div 100")
              .as("rank"))
      }
      t.filter(expr("node % 2 = 1 AND rank > 0"))
        .select(expr("node div 2").as("s_suppkey"),
          col("rank").as("trust_ppb"))
        .join(Tables.load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name")), "s_suppkey")
        .select(col("s_suppkey"), col("s_name"), col("trust_ppb"),
          expr(s"CAST(s_suppkey % $TrustSeedMod = 0 AS INT)")
            .as("is_seed"))
        .orderBy(col("trust_ppb").desc, col("s_suppkey"))
    },
    Some {
      val seedCond =
        s"node % 2 = 1 AND (node // 2) % $TrustSeedMod = 0"
      val steps = (1 to Iterations).map { i =>
        s"""c$i AS (
           |  SELECT ew.dst AS node,
           |    SUM((r.rank * ew.w) // ew.wsum) AS ctb
           |  FROM ew JOIN t${i - 1} r ON ew.src = r.node
           |  GROUP BY ew.dst),
           |t$i AS (
           |  SELECT n.node,
           |    CASE WHEN n.node % 2 = 1
           |      AND (n.node // 2) % $TrustSeedMod = 0
           |      THEN 150000000 // ns.n ELSE 0 END
           |    + (85 * COALESCE(c$i.ctb, 0)) // 100 AS rank
           |  FROM nodes n CROSS JOIN ns
           |  LEFT JOIN c$i ON n.node = c$i.node)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (
         |  SELECT o_custkey AS c, l_suppkey AS p, COUNT(*) AS w
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  GROUP BY 1, 2),
         |e AS (
         |  SELECT c * 2 AS src, p * 2 + 1 AS dst, w FROM e0
         |  UNION ALL
         |  SELECT p * 2 + 1 AS src, c * 2 AS dst, w FROM e0),
         |ws AS (SELECT src, SUM(w) AS wsum FROM e GROUP BY src),
         |ew AS (SELECT e.src, e.dst, e.w, ws.wsum
         |       FROM e JOIN ws ON e.src = ws.src),
         |nodes AS (SELECT DISTINCT dst AS node FROM e),
         |ns AS (SELECT COUNT(*) AS n FROM nodes
         |       WHERE $seedCond),
         |t0 AS (SELECT node, CASE WHEN $seedCond
         |         THEN 1000000000 // ns.n ELSE 0 END AS rank
         |       FROM nodes CROSS JOIN ns),
         |$steps
         |SELECT node // 2 AS s_suppkey, s_name,
         |  CAST(rank AS BIGINT) AS trust_ppb,
         |  CAST((node // 2) % $TrustSeedMod = 0 AS INT) AS is_seed
         |FROM t$Iterations JOIN supplier ON node // 2 = s_suppkey
         |WHERE node % 2 = 1 AND rank > 0
         |ORDER BY trust_ppb DESC, s_suppkey""".stripMargin
    })

  /** Every 5th vector keeps its label as a seed; the rest learn. */
  val SeedMod = 5

  /** Fixed propagation rounds (oracle unrolls the same number). */
  val PropRounds = 3

  /** Semi-supervised label propagation over the mutual-kNN graph
    * (Zhu & Ghahramani CMU-CALD-02-107; majority-vote LPA per
    * Raghavan et al. PRE'07) — the weak-supervision move a curation
    * stack uses to stretch a small labeled set across a corpus:
    * labels spread from seed nodes along the q210 edge relation,
    * each round re-labeling a node by the MAJORITY label of its
    * labeled neighbors (count desc, label asc — a deterministic
    * integer argmax, no RNG ordering as in the original async LPA),
    * seeds clamped, unreached nodes stay null. Fixed
    * [[PropRounds]] rounds for oracle purity (both engines unroll
    * identically); rounds are pure keyed relational algebra — one
    * adjacency join + one count agg + one argmax window + one left
    * join — all O(N·k) on the kNN graph, so at corpus scale the cost
    * per round is the kNN edge list, never N².
    */
  val q211LabelProp: QueryDef = QueryDef(
    "q211_label_propagation",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val edges = KnnGraph.mutualTopK(KnnGraph.exactScores(
        Bitext.qrel(Similarity.normed(s, dir))))
      val adj = Caches.persist(
        edges.select(col("a").as("u"), col("b").as("v"))
          .unionByName(edges.select(col("b").as("u"),
            col("a").as("v"))))
      var l = Tables.load(s, dir, "embeddings")
        .select(col("vec_id").as("node"),
          when(col("vec_id") % SeedMod === 0, col("label")).as("lab"))
      for (_ <- 1 to PropRounds) {
        val best = adj
          .join(l.select(col("node").as("v"), col("lab")), "v")
          .filter(col("lab").isNotNull)
          .groupBy(col("u").as("node"), col("lab"))
          .agg(count(lit(1)).as("c"))
          .withColumn("r", row_number().over(Window
            .partitionBy("node")
            .orderBy(col("c").desc, col("lab"))))
          .filter(col("r") === 1)
          .select(col("node"), col("lab").as("blab"))
        l = l.join(best, Seq("node"), "left")
          .select(col("node"),
            when(col("node") % SeedMod === 0, col("lab"))
              .otherwise(coalesce(col("blab"), col("lab")))
              .as("lab"))
      }
      l.select(col("node").as("vec_id"), col("lab").as("label"))
        .orderBy("vec_id")
    },
    Some {
      val steps = (1 to PropRounds).map { i =>
        s"""v$i AS (
           |  SELECT adj.u AS node, l.lab, COUNT(*) AS c
           |  FROM adj JOIN l${i - 1} l ON adj.v = l.node
           |  WHERE l.lab IS NOT NULL GROUP BY 1, 2),
           |b$i AS (
           |  SELECT node, lab FROM (
           |    SELECT node, lab, ROW_NUMBER() OVER (
           |      PARTITION BY node ORDER BY c DESC, lab) AS r
           |    FROM v$i) t WHERE r = 1),
           |l$i AS (
           |  SELECT p.node,
           |    CASE WHEN p.node % $SeedMod = 0 THEN p.lab
           |         ELSE COALESCE(b$i.lab, p.lab) END AS lab
           |  FROM l${i - 1} p LEFT JOIN b$i ON p.node = b$i.node)"""
          .stripMargin
      }.mkString(",\n")
      s"""${KnnGraph.oracleMutualCte},
         |adj AS (
         |  SELECT a AS u, b AS v FROM mutual
         |  UNION ALL SELECT b AS u, a AS v FROM mutual),
         |l0 AS (
         |  SELECT vec_id AS node,
         |    CASE WHEN vec_id % $SeedMod = 0 THEN label END AS lab
         |  FROM embeddings),
         |$steps
         |SELECT node AS vec_id, lab AS label FROM l$PropRounds
         |ORDER BY vec_id""".stripMargin
    })

  val all: Seq[QueryDef] =
    Seq(q208SupplierPagerank, q211LabelProp, q212TrustRank)
}
