package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q178 packed-sequence emission: every non-final sequence is exactly
  * SeqLen tokens (the whole point of splitting at boundaries — q148's
  * whole-doc bins overflow), tokens are conserved corpus-wide, and
  * each sequence's digest reconstructs from the committed reference
  * ids via an independent plain-JVM packer (no shared code with the
  * query). Plan: two keyed exchanges (lang window + (lang,bin) agg),
  * no join.
  */
class PackedSequencesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001" // unused by the fixture read
  private val SeqLen = 2048

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .map(b => f"$b%02x").mkString

  test("digests reconstruct from committed ids via an independent " +
      "JVM packer; full bins are exactly SeqLen; tokens conserved") {
    val got = SparkEntry.queries("q178_packed_sequences")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got.nonEmpty)
    // independent packer over the committed reference ids
    val docs = Fixtures.read(spark, Fixtures.bpeCorpusPath)
      .select("lang", "doc_id", "bpe_ids").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Int](2)))
      .sortBy(t => (t._1, t._2))
    val expected = docs.groupBy(_._1).flatMap { case (lang, ds) =>
      val stream = ds.sortBy(_._2)
        .flatMap(d => d._3.map(id => (d._2, id))) // (doc_id, id) in order
      stream.zipWithIndex.groupBy(_._2 / SeqLen).map {
        case (bin, toks) =>
          (lang, bin.toLong) -> ((toks.length.toLong,
            toks.map(_._1._1).distinct.length.toLong,
            md5hex(toks.map(_._1._2.toString).mkString(":"))))
      }
    }
    assert(got.size == expected.size,
      s"${got.size} sequences vs expected ${expected.size}")
    expected.foreach { case (k, exp) =>
      assert(got.get(k) == Some(exp), s"sequence $k: ${got.get(k)} " +
        s"vs expected $exp")
    }
    // shape invariants, independent of the reimpl
    val perLang = got.keys.groupBy(_._1)
    perLang.foreach { case (lang, ks) =>
      val lastBin = ks.map(_._2).max
      ks.filter(_._2 != lastBin).foreach { k =>
        assert(got(k)._1 == SeqLen.toLong,
          s"non-final sequence $k has ${got(k)._1} tokens")
      }
    }
    val totalTokens = got.values.map(_._1).sum
    val committed = docs.map(_._3.length.toLong).sum
    assert(totalTokens == committed,
      s"token conservation: packed $totalTokens vs committed $committed")
  }

  test("plan: two keyed exchanges (lang window + (lang,bin) agg), " +
      "no join") {
    val p = SparkEntry.queries("q178_packed_sequences")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      p.take(800))
    assert(!p.contains("Join"), p.take(800))
  }
}
