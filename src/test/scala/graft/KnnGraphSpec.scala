package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q210/q210b mutual-kNN graph: the exact arm must equal a serial
  * all-pairs reference fold; the probed arm must recover planted
  * geometric structure (the property its candidate-restricted oracle
  * can't see — the oracle pins determinism, not approximation
  * quality).
  */
class KnnGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def collectEdges(name: String) =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("ucos")))

  /** Serial reference: exact integer-µcos mutual top-k. */
  private def refMutual(rows: Array[(Long, Array[Double], Double)])
      : Set[(Long, Long, Long)] = {
    def ucos(x: (Long, Array[Double], Double),
        y: (Long, Array[Double], Double)): Long = {
      var d = 0.0; var i = 0
      while (i < x._2.length) { d += x._2(i) * y._2(i); i += 1 }
      math.floor(d / (x._3 * y._3) * 1000000.0 + 0.5).toLong
    }
    val knn = rows.map { x =>
      x._1 -> rows.filter(_._1 != x._1)
        .map(y => (y._1, ucos(x, y)))
        .sortBy { case (id, u) => (-u, id) }
        .take(operators.KnnGraph.GraphK).toMap
    }.toMap
    (for {
      (a, nbrs) <- knn.toSeq; (b, u) <- nbrs
      if a < b && knn(b).contains(a)
    } yield (a, b, u)).toSet
  }

  private lazy val qrows = operators.Bitext.qrel(
    operators.Similarity.normed(spark, dir))
    .select(col("vec_id"), col("qv"), col("qn")).collect()
    .map(r => (r.getLong(0),
      r.getSeq[Double](1).toArray, r.getDouble(2)))

  test("exact arm equals the serial mutual-kNN reference exactly") {
    val got = collectEdges("q210_knn_graph").toSet
    assert(got == refMutual(qrows))
  }

  test("node degree never exceeds GraphK; edges canonical a < b") {
    Seq("q210_knn_graph", "q210b_knn_graph_probed").foreach { q =>
      val edges = collectEdges(q)
      val deg = scala.collection.mutable.Map.empty[Long, Int]
        .withDefaultValue(0)
      edges.foreach { case (a, b, _) =>
        assert(a < b)
        deg(a) += 1; deg(b) += 1
      }
      assert(deg.values.forall(_ <= operators.KnnGraph.GraphK), q)
      assert(edges.nonEmpty, q)
    }
  }

  test("probed arm recovers planted twins (geometrically " +
      "concentrated pairs survive the candidate restriction)") {
    // plant a near-identical twin for every 10th fixture vector:
    // cos(v, 0.95·v + 0.05·next) ≈ 0.999 — twins must co-probe and
    // mutually rank top-1
    import spark.implicits._
    val base = operators.Similarity.normed(spark, dir)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val twins = base.zipWithIndex.collect {
      case ((id, v), i) if i % 10 == 0 =>
        val w = base((i + 1) % base.length)._2
        (id + 1000000L,
          v.indices.map(j => 0.95 * v(j) + 0.05 * w(j)).toArray)
    }
    val df = spark.createDataset(
      (base ++ twins).toSeq.map { case (id, v) => (id, v.toSeq) })
      .toDF("vec_id", "v")
      .withColumn("v", col("v").cast("array<double>"))
      .withColumn("nrm", graft.functions.VectorOps.l2norm(col("v")))
    val e = operators.Bitext.qrel(df)
    val edges = operators.KnnGraph.mutualTopK(
      operators.KnnGraph.probedScores(spark, e))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = twins.map(t => (t._1 - 1000000L, t._1)).toSet
    val recovered = planted.count(edges.contains)
    assert(recovered.toDouble / planted.size >= 0.95,
      s"planted-twin recall ${recovered.toDouble / planted.size}")
  }
}
