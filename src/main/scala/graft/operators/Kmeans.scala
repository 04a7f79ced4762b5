package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-plan k-means training (Lloyd 1982) over the embeddings table —
  * the TRAIN half of the IVF/PQ story the catalog until now sourced
  * from offline fixture tools ([[graft.tools.TrainCentroids]]): the
  * coarse quantizer q45/q72/q139 serve from has to come from
  * somewhere, and at 100 TB that training run is itself a distributed
  * job. This is the Spark-iterative-ML shape (MLlib's KMeans does
  * exactly this): per round, ONE in-row assignment pass against K
  * broadcast-literal centroids (no corpus×K join — the q139
  * discipline) and ONE keyed aggregation whose partial-combined
  * output is K·dim rows collected to the driver, which folds them
  * into the next round's literals. Per-round cost O(N·K·dim) map-side
  * work + a K·dim-row exchange; the corpus never shuffles.
  *
  * Engine-exact integer spelling (the q210/q211 µcos contract —
  * ADVICE r16 on raw-float centroid ranking): vectors are µ-quantized
  * once; assignment maximizes µcos = floor(dot/(‖q‖·‖c‖)·10⁶ + 0.5)
  * with ties to the smaller centroid id (every fold is an exact
  * integer sum, both sqrt/division trees identical on both engines);
  * the centroid update is floor(Σqvᵢ / count) per component — exact
  * integer sums, one correctly-rounded division, one floor — so
  * round-r centroids are integer-valued and IDENTICAL in Spark and
  * the oracle's unrolled CTE chain, and the final ledger
  * (members / µcos mass / centroid checksum per cluster) hash-matches.
  *
  * Init is deterministic with no ordered pass: seed b = the minimum
  * vec_id in residue class vec_id mod K (a keyed agg, not a global
  * rank — the GlobalWindowAuditSpec class). Empty clusters drop out
  * of the update agg on both engines identically (k-means--).
  */
object Kmeans {

  /** Cluster count (the fixture quantizers use 16 on 500 vectors;
    * 8 keeps every cluster organically populated at sf0.001).
    */
  val K = 8

  /** Assignment rounds; updates happen between them (3 assignments,
    * 2 centroid updates — enough for measurable movement while the
    * oracle's unrolled CTE chain stays readable).
    */
  val Rounds = 3

  /** Embedding dimensionality (all testdata SFs emit 64). */
  val Dim = 64

  private[graft] case class Cent(cid: Long, cv: Array[Double], cn: Double)

  /** µ-quantized relation: vec_id, qv (integer-valued doubles), qn. */
  private[graft] def qrel(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorOps.register(s)
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorOps.quantizeMicro(
          col("embedding").cast("array<double>")).as("qv"))
      .withColumn("qn", graft.functions.VectorOps.l2norm(col("qv")))
  }

  /** best = (µcos, −cid) argmax over the K centroid literals as one
    * in-row expression (array_max over 8 structs — codegen'd, no join).
    */
  private def bestCol(cents: Seq[Cent]): Column =
    array_max(array(cents.map { c =>
      struct(
        floor(graft.functions.VectorOps.cosine(col("qv"),
          typedLit(c.cv.toSeq), col("qn"), lit(c.cn)) *
          lit(1000000.0) + lit(0.5)).cast("long").as("u"),
        lit(-c.cid).as("nc"))
    }: _*))

  private[graft] def withAssignment(n: DataFrame, cents: Seq[Cent]): DataFrame =
    n.withColumn("best", bestCol(cents))
      .withColumn("cid", -col("best.nc"))
      .withColumn("ucos", col("best.u"))

  private def centOf(cid: Long, cv: Array[Double]): Cent =
    Cent(cid, cv, math.sqrt(cv.map(x => x * x).sum))

  /** Deterministic seeds: qv of the minimum vec_id per residue class. */
  private[graft] def initCents(n: DataFrame): Seq[Cent] =
    n.withColumn("res", col("vec_id") % K)
      .groupBy(col("res")).agg(min(col("vec_id")).as("sv"))
      .join(n, col("sv") === col("vec_id"))
      .select(col("res"), col("qv"))
      .collect()
      .map(r => centOf(r.getLong(0),
        r.getSeq[Double](1).toArray))
      .sortBy(_.cid)

  /** One Lloyd update: component sums via posexplode + the K·Dim-group
    * keyed agg (map-side combined — each task emits ≤ K·Dim rows), the
    * floor-mean fold on the driver.
    */
  private[graft] def updated(asn: DataFrame): Seq[Cent] =
    asn.select(col("cid"), posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("cnt"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (cid, rows) =>
        val cv = new Array[Double](Dim)
        rows.foreach(r => cv(r.getInt(1)) =
          math.floor(r.getDouble(2) / r.getLong(3)))
        centOf(cid, cv)
      }
      .toSeq.sortBy(_.cid)

  def train(s: SparkSession, dir: String): DataFrame = {
    val n = graft.Caches.persist(qrel(s, dir))
    var cents = initCents(n)
    for (_ <- 1 until Rounds)
      cents = updated(withAssignment(n, cents))
    val csums = cents.map(c => c.cid -> c.cv.map(_.toLong).sum).toMap
    withAssignment(n, cents)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("members"), sum(col("ucos")).as("ucos_sum"))
      .withColumn("csum",
        element_at(typedLit(csums), col("cid")))
      .select(col("cid"), col("members"), col("ucos_sum"), col("csum"))
      .orderBy("cid")
  }

  private def assignSql(a: String, cPrev: String): String =
    s"""$a AS (
       |  SELECT vec_id, cid, ucos FROM (
       |    SELECT vec_id, cid, ucos, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY ucos DESC, cid) AS rk
       |    FROM (
       |      SELECT n.vec_id, c.cid,
       |        floor(list_inner_product(n.qv, c.cv) /
       |          (n.qn * sqrt(list_inner_product(c.cv, c.cv)))
       |          * 1000000.0 + 0.5) AS ucos
       |      FROM n CROSS JOIN $cPrev c) s1) s2
       |  WHERE rk = 1)""".stripMargin

  private def updateSql(c: String, a: String): String =
    s"""$c AS (
       |  SELECT cid, list(flo ORDER BY pos) AS cv FROM (
       |    SELECT a.cid, p.pos, floor(SUM(n.qv[p.pos]) / COUNT(*)) AS flo
       |    FROM $a a JOIN n USING (vec_id) CROSS JOIN p
       |    GROUP BY a.cid, p.pos) s
       |  GROUP BY cid)""".stripMargin

  val q221KmeansTrain: QueryDef = QueryDef(
    "q221_kmeans_train",
    (s, dir) => train(s, dir),
    Some {
      val rounds = (1 until Rounds).map(r =>
        assignSql(s"a$r", s"c${r - 1}") + ",\n" +
          updateSql(s"c$r", s"a$r")).mkString(",\n")
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id,
         |    list_transform(v, x -> floor(x * 1000000.0 + 0.5)) AS qv
         |  FROM e),
         |n AS (SELECT vec_id, qv,
         |    sqrt(list_inner_product(qv, qv)) AS qn FROM q),
         |p AS (SELECT unnest(range(1, ${Dim + 1})) AS pos),
         |i AS (SELECT vec_id % $K AS cid, MIN(vec_id) AS sv
         |      FROM n GROUP BY 1),
         |c0 AS (SELECT i.cid, n.qv AS cv
         |       FROM i JOIN n ON n.vec_id = i.sv),
         |$rounds,
         |${assignSql(s"a$Rounds", s"c${Rounds - 1}")},
         |cs AS (SELECT cid, CAST(list_sum(cv) AS BIGINT) AS csum
         |       FROM c${Rounds - 1})
         |SELECT a.cid, COUNT(*) AS members,
         |  CAST(SUM(CAST(a.ucos AS BIGINT)) AS BIGINT) AS ucos_sum,
         |  cs.csum
         |FROM a$Rounds a JOIN cs USING (cid)
         |GROUP BY a.cid, cs.csum
         |ORDER BY a.cid""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(q221KmeansTrain)
}
