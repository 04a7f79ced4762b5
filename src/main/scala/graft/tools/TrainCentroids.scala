package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-means (Lloyd's) centroid training for the IVF ANN operator — the
  * production path for `fixtures/ivf_centroids.parquet`
  * (`Similarity.q45AnnIvf` reads whatever centroid table the fixture
  * holds; training only improves list balance/recall, the query plan is
  * unchanged).
  *
  * Spark-first shape, scale-safe at any corpus size:
  *  - assignment: broadcast the k centroids, per-row codegen'd cosine,
  *    rank-1 window on (vec_id) — one pass over the corpus, no shuffle
  *    of vectors;
  *  - update: posexplode to (cid, dim, x) and average per (cid, dim) —
  *    one keyed exchange carrying k×dim partial sums per task, never
  *    raw vectors;
  *  - the k×dim result collects to the driver (tiny) to seed the next
  *    broadcast.
  *
  * Init is the deterministic pseudo-random fixture
  * ([[GenFixtures.centroidComponent]]), so training is reproducible
  * run-to-run up to float-sum ordering in the averages.
  */
object TrainCentroids {

  /** `meanBestSim` is the quantization quality of the RETURNED
    * centroids (mean best-centroid cosine over the corpus — what the
    * IVF probe depends on; higher = tighter lists).
    */
  final case class Trained(cents: Seq[(Int, Array[Double])],
      meanBestSim: Double)

  /** One assignment pass: every vector joined (broadcast) to its
    * rank-1 centroid. Persisted by callers that run several actions
    * over it.
    */
  private def assign(vecs: DataFrame,
      cents: Seq[(Int, Array[Double])]): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val centDf = broadcast(
      cents.toDF("cid", "cv")
        .withColumn("cn", graft.functions.VectorOps.l2norm(col("cv"))))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid"))
    vecs.join(centDf)
      .withColumn("csim", graft.functions.VectorOps.cosine(
        col("v"), col("cv"), col("nrm"), col("cn")))
      .withColumn("crnk", row_number().over(w))
      .filter(col("crnk") === 1)
      .select(col("cid"), col("v"), col("csim"))
  }

  /** vecs: (vec_id, v: array<double>, nrm). `iters = 0` measures the
    * init's quality without updating.
    */
  def lloyd(vecs: DataFrame, init: Seq[(Int, Array[Double])],
      iters: Int): Trained = {
    graft.functions.VectorOps.register(vecs.sparkSession)
    var cents = init
    for (_ <- 1 to iters) {
      val dims = assign(vecs, cents)
        .select(col("cid"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("cid"), col("d")).agg(avg(col("x")).as("m"))
        .collect()
      val byCid = dims.groupBy(_.getInt(0))
      // empty lists keep their previous centroid (standard Lloyd's)
      cents = cents.map { case (cid, prev) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val arr = new Array[Double](prev.length)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            cid -> arr
          case None => cid -> prev
        }
      }
    }
    // quality of the FINAL centroids — the ones the caller writes
    val meanBest = assign(vecs, cents)
      .agg(avg(col("csim"))).collect()(0).getDouble(0)
    Trained(cents, meanBest)
  }

  def defaultInit(k: Int, dim: Int): Seq[(Int, Array[Double])] =
    (0 until k).map(c =>
      c -> (0 until dim).map(GenFixtures.centroidComponent(c, _)).toArray)

  /** usage: TrainCentroids [sfDir] [k] [iters] [outPath]
    *
    * Defaults regenerate the committed IVF fixture from the sf0.1
    * corpus (the largest local SF — train on the data the index
    * serves; at production scale this runs on a sample of the real
    * corpus, same plan).
    */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else GenFixtures.NumCentroids
    val iters = if (args.length > 2) args(2).toInt else 10
    val out = if (args.length > 3) args(3)
      else graft.Fixtures.ivfCentroidsPath
    val spark = graft.Sessions.build("graft-train-centroids")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", graft.functions.VectorOps.l2norm(col("v")))
    val trained = lloyd(e, defaultInit(k, GenFixtures.Dim), iters)
    val tmp = java.nio.file.Files.createTempDirectory("graft-cent").toString
    trained.cents.toDF("cid", "cv").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .map(_.getPath)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(out),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $out (k=$k iters=$iters " +
      f"meanBestSim=${trained.meanBestSim}%.4f)")
    spark.stop()
  }
}
