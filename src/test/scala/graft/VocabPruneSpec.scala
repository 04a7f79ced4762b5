package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q186 vocabulary pruning: the per-lang audit (counts, µunit rate,
  * ordered digest) recomputes from an independent plain-JVM
  * reimplementation over the same corpus, and the plan is map-only +
  * one lang-keyed agg (no explode, no join — the rewrite fuses with
  * the scan).
  */
class VocabPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  test("audit recomputes from an independent JVM reimplementation") {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // top-V vocab: count desc, token asc
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, _, text) =>
      text.toLowerCase.split(" ").filter(_.nonEmpty)
        .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1L)
    }
    val kept = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(graft.operators.TextAnalysis.VocabPruneTopV)
      .map(_._1).toSet
    case class L(var docs: Long = 0, var nt: Long = 0, var rep: Long = 0,
      val hs: scala.collection.mutable.ArrayBuffer[(Long, String)] =
        scala.collection.mutable.ArrayBuffer.empty)
    val exp = scala.collection.mutable.Map.empty[String, L]
    docs.foreach { case (id, lang, text) =>
      val w = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val l = exp.getOrElseUpdate(lang, L())
      l.docs += 1; l.nt += w.length
      l.rep += w.count(!kept.contains(_))
      l.hs += ((id, md5hex(
        w.map(t => if (kept.contains(t)) t else "<unk>")
          .mkString(" "))))
    }
    val got = SparkEntry.queries("q186_vocab_prune")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5)))).toMap
    assert(got.keySet == exp.keySet.toSet)
    exp.foreach { case (lang, l) =>
      val rate = math.floor(l.rep.toDouble / l.nt * 1e6 + 0.5).toLong
      val fp = md5hex(l.hs.sortBy(_._1).map(_._2).mkString(""))
      assert(got(lang) == ((l.docs, l.nt, l.rep, rate, fp)),
        s"$lang: ${got(lang)} vs (${l.docs}, ${l.nt}, ${l.rep}, " +
          s"$rate, $fp)")
      assert(l.rep > 0, s"$lang suppresses nothing — vacuous")
      assert(l.rep < l.nt, s"$lang suppresses everything")
    }
  }

  test("plan: map-only rewrite + one lang-keyed exchange, no " +
      "explode/join on the rewrite pass") {
    val p = SparkEntry.queries("q186_vocab_prune")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      p.take(600))
    assert(!p.contains("Join"), p.take(600))
    assert(!p.contains("Generate"), p.take(600))
  }
}
