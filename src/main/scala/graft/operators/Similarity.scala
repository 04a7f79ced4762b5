package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` fixture
  * (`Array[Float]`, dim 64) — SURVEY.md §7.1 step 8.
  *
  * Cosine is computed in double precision with a sequential
  * `aggregate`-fold (deterministic order), matching DuckDB's
  * `list_cosine_similarity(CAST(... AS DOUBLE[]))` to ~1 ulp; outputs are
  * rounded to 4 dp so both engines serialize identically.
  *
  * Scale posture: the brute-force paths broadcast the (tiny) query side
  * or block candidate generation; the LSH path buckets by
  * random-hyperplane sign codes so candidate generation is an equi-join —
  * the only shape that survives a 10⁹-vector corpus.
  */
object Similarity {
  private val NearDupThreshold = 0.4
  private val TopK = 5
  private val NumQueryVecs = 20
  // LSH: L hash tables × B hyperplanes (sign bits) each. For a pair at
  // cosine ≈ 0.4 (θ ≈ 1.16 rad) the per-table collision probability is
  // (1 − θ/π)^B ≈ 0.16 at B = 4; eight tables lift recall to ~0.75
  // while keeping per-table buckets ~N/16.
  private val LshTables = 8
  private val LshBits = 4

  /** vec_id, v (double[]), nrm (L2 norm) — native codegen'd expressions
    * (graft.plans.L2Norm), not interpreted higher-order-function lambdas.
    */
  private def normed(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorOps.register(s)
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", graft.functions.VectorOps.l2norm(col("v")))
  }

  private def cosine(va: Column, vb: Column, na: Column, nb: Column): Column =
    graft.functions.VectorOps.cosine(va, vb, na, nb)

  // All-pairs near-duplicate detection above a cosine threshold.
  // Self-join on vec_id< with broadcast of one side (embeddings tables
  // are the small side of the fixture; at real scale this operator is
  // the one you replace with the LSH variant below).
  val q25EmbedNeardup: QueryDef = QueryDef(
    "q25_embed_neardup",
    (s, dir) => {
      val e = normed(s, dir)
      val a = e.select(col("vec_id").as("v1"), col("v").as("va"),
        col("nrm").as("na"))
      val b = e.select(col("vec_id").as("v2"), col("v").as("vb"),
        col("nrm").as("nb"))
      a.join(b, col("v1") < col("v2"))
        .withColumn("sim", cosine(col("va"), col("vb"), col("na"), col("nb")))
        .filter(col("sim") > NearDupThreshold)
        .select(col("v1"), col("v2"), graft.Round4(col("sim")).as("sim"))
        .orderBy("v1", "v2")
    },
    Some(s"""SELECT a.vec_id AS v1, b.vec_id AS v2,
            |  floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
            |        CAST(b.embedding AS DOUBLE[])) * 10000 + 0.5) / 10000 AS sim
            |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
            |      CAST(b.embedding AS DOUBLE[])) > $NearDupThreshold
            |ORDER BY v1, v2""".stripMargin))

  // Brute-force cosine top-k: the exact ANN baseline. The query side
  // (vec_id < 20) broadcasts; ranking is a per-query window.
  val q26AnnTopk: QueryDef = QueryDef(
    "q26_ann_topk",
    (s, dir) => {
      val e = normed(s, dir)
      val q = broadcast(e.filter(col("vec_id") < NumQueryVecs)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn")))
      val cands = e.filter(col("vec_id") >= NumQueryVecs)
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("vec_id"))
      q.join(cands)
        .withColumn("sim", cosine(col("qv"), col("v"), col("qn"), col("nrm")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TopK)
        .select(col("qid"), col("rnk"), col("vec_id").as("neighbor"),
          graft.Round4(col("sim")).as("sim"))
        .orderBy("qid", "rnk")
    },
    Some(s"""SELECT qid, rnk, neighbor,
            |  floor(sim * 10000 + 0.5) / 10000 AS sim FROM (
            |  SELECT q.vec_id AS qid, c.vec_id AS neighbor,
            |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
            |        CAST(c.embedding AS DOUBLE[])) AS sim,
            |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
            |      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
            |          CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rnk
            |  FROM embeddings q JOIN embeddings c
            |    ON q.vec_id < $NumQueryVecs AND c.vec_id >= $NumQueryVecs
            |  ) sub
            |WHERE rnk <= $TopK ORDER BY qid, rnk""".stripMargin),
    bench = true)

  /** Deterministic ±1 hyperplane component for (table, bit, dim) —
    * MurmurHash3 parity, reproducible across runs with no RNG state.
    */
  private def planeSign(tbl: Int, bit: Int, dim: Int): Int =
    if ((scala.util.hashing.MurmurHash3.productHash(
      (tbl, bit, dim)) & 1) == 1) 1 else -1

  // Sign-random-projection LSH ANN: L tables of B sign bits; candidates
  // from bucket equality in any table; exact cosine re-rank. Approximate
  // (recall < 1) by construction → no SQL oracle; the spec asserts
  // rows>0 and recall against q26 on the fixture.
  val q27AnnLsh: QueryDef = QueryDef(
    "q27_ann_lsh",
    (s, dir) => {
      val e = normed(s, dir)
      // plane matrix as a broadcast-joined literal DataFrame:
      // (tbl, bit, d, sign)
      val planes = s.createDataFrame(
        for {
          tbl <- 0 until LshTables; bit <- 0 until LshBits; d <- 0 until 64
        } yield (tbl, bit, d, planeSign(tbl, bit, d).toDouble))
        .toDF("tbl", "bit", "d", "sign")
      val comps = e.select(col("vec_id"), posexplode(col("v"))
        .as(Seq("d", "x")))
      val codes = comps.join(broadcast(planes), "d")
        .groupBy(col("vec_id"), col("tbl"), col("bit"))
        .agg(sum(col("x") * col("sign")).as("proj"))
        .groupBy(col("vec_id"), col("tbl"))
        .agg(sum(when(col("proj") > 0, expr("shiftleft(1, bit)"))
          .otherwise(0)).as("code"))
      val q = codes.filter(col("vec_id") < NumQueryVecs)
        .select(col("vec_id").as("qid"), col("tbl"), col("code"))
      val c = codes.filter(col("vec_id") >= NumQueryVecs)
      val cand = q.join(c, Seq("tbl", "code"))
        .select(col("qid"), col("vec_id")).distinct()
      val qv = broadcast(e.filter(col("vec_id") < NumQueryVecs)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn")))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("vec_id"))
      cand.join(qv, "qid").join(e, "vec_id")
        .withColumn("sim", cosine(col("qv"), col("v"), col("qn"), col("nrm")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TopK)
        .select(col("qid"), col("rnk"), col("vec_id").as("neighbor"),
          graft.Round4(col("sim")).as("sim"))
        .orderBy("qid", "rnk")
    },
    None)

  // IVF-style ANN: coarse-quantize every vector to its nearest centroid
  // (inverted lists), probe the query's 2 nearest lists, exact re-rank.
  // Centroids here are a deterministic fixed sample of the corpus
  // (every Nth vector) so results are stable run-to-run with no RNG; a
  // production build would train them with k-means (same plan shape —
  // only the centroid table changes). Approximate → no SQL oracle; the
  // spec asserts recall against brute force.
  val q45AnnIvf: QueryDef = QueryDef(
    "q45_ann_ivf",
    (s, dir) => {
      val e = normed(s, dir)
      val nVecs = e.count()
      val nCentroids = 16
      val stride = math.max(nVecs / nCentroids, 1)
      val cents = broadcast(
        e.filter(col("vec_id") % stride === 0 &&
            col("vec_id") < stride * nCentroids)
          .select(col("vec_id").as("cid"), col("v").as("cv"),
            col("nrm").as("cn")))
      def nearest(df: DataFrame, keep: Int): DataFrame = {
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cid"))
        df.join(cents)
          .withColumn("csim",
            cosine(col("v"), col("cv"), col("nrm"), col("cn")))
          .withColumn("crnk", row_number().over(w))
          .filter(col("crnk") <= keep)
          .select(col("vec_id"), col("cid"))
      }
      val lists = nearest(e.filter(col("vec_id") >= NumQueryVecs), 1)
      val probes = nearest(e.filter(col("vec_id") < NumQueryVecs), 2)
        .withColumnRenamed("vec_id", "qid")
      val cand = probes.join(lists, "cid")
        .select(col("qid"), col("vec_id")).distinct()
      val qv = broadcast(e.filter(col("vec_id") < NumQueryVecs)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn")))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("vec_id"))
      cand.join(qv, "qid").join(e, "vec_id")
        .withColumn("sim", cosine(col("qv"), col("v"), col("qn"), col("nrm")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TopK)
        .select(col("qid"), col("rnk"), col("vec_id").as("neighbor"),
          graft.Round4(col("sim")).as("sim"))
        .orderBy("qid", "rnk")
    },
    None)

  val all: Seq[QueryDef] = Seq(q25EmbedNeardup, q26AnnTopk, q27AnnLsh,
    q45AnnIvf)
}
