package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q209 PPS systematic sample: the exact telescoping identity and the
  * guarantees that make it size-proportional (the properties the
  * oracle hash can't articulate).
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private lazy val corpus = {
    import org.apache.spark.sql.types.LongType
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("nt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
  }

  private lazy val sel = SparkEntry.queries("q209_pps_sample")(
    spark, dir).collect()
    .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("nt"),
      r.getAs[Long]("hits")))

  test("hit counts telescope to total div stride, >= K") {
    val tw = corpus.map(_._2).sum
    val stride = math.max(tw / operators.Sampling.SampleK, 1L)
    assert(sel.map(_._3).sum == tw / stride)
    assert(tw / stride >= operators.Sampling.SampleK)
  }

  test("every stride-or-longer document is selected (the PPS " +
      "certainty class)") {
    val tw = corpus.map(_._2).sum
    val stride = math.max(tw / operators.Sampling.SampleK, 1L)
    val selected = sel.map(_._1).toSet
    val must = corpus.collect { case (id, nt) if nt >= stride => id }
    assert(must.forall(selected.contains))
  }

  test("selection equals the serial systematic walk") {
    val tw = corpus.map(_._2).sum
    val stride = math.max(tw / operators.Sampling.SampleK, 1L)
    var cum = 0L
    val ref = corpus.flatMap { case (id, nt) =>
      val hits = (cum + nt) / stride - cum / stride
      cum += nt
      if (hits > 0) Some((id, nt, hits)) else None
    }
    assert(sel.toSeq == ref.toSeq)
  }
}
