package graft

import graft.tools.GenNfcFixture
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** q183 NFC pass: the per-lang audit recomputes from the generator's
  * emission rules (every decomposed word folds exactly one combining
  * mark; precomposed text never counts — the false-positive guard),
  * and the kernel is correct and idempotent on the planted pairs.
  */
class NfcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001" // unused by the fixture read

  test("per-lang rollup equals the generator's planted counts") {
    val got = SparkEntry.queries("q183_nfc_normalize")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    case class L(var docs: Long = 0, var nn: Long = 0, var cf: Long = 0)
    val exp = scala.collection.mutable.Map.empty[String, L]
    (0L until GenNfcFixture.NumDocs.toLong).foreach { d =>
      val l = exp.getOrElseUpdate(GenNfcFixture.langOf(d), L())
      val (de, _) = GenNfcFixture.planted(d)
      l.docs += 1
      if (de.nonEmpty) l.nn += 1
      // each decomposed word carries exactly one combining mark that
      // folds into its base on composition
      l.cf += de.size
    }
    assert(got.keySet == exp.keySet.toSet)
    exp.foreach { case (lang, l) =>
      assert(got(lang) == ((l.docs, l.nn, l.cf)),
        s"$lang: ${got(lang)} vs planted (${l.docs}, ${l.nn}, ${l.cf})")
    }
    assert(exp.values.map(_.nn).sum > 0, "fixture must plant NFD docs")
    // precomposed-only docs (class 2) exist and must NOT be flagged —
    // covered by the exact equality above, asserted explicitly here
    val class2 = (0L until GenNfcFixture.NumDocs.toLong)
      .filter(d => math.floorMod(d, 4) == 2)
    assert(class2.nonEmpty)
  }

  test("q184 normalization-aware dedup: every planted NFD twin folds " +
      "onto its original; raw dedup keeps both (the duplicate volume " +
      "an unnormalized pipeline ships)") {
    val got = SparkEntry.queries("q184_nfc_dedup")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // honest recomputation from the emission rules, including any
    // accidental salad collisions (don't assume planted-only dups)
    import java.text.Normalizer
    val byLang = (0L until GenNfcFixture.NumDocs.toLong)
      .map(d => (GenNfcFixture.langOf(d), GenNfcFixture.textOf(d)))
      .groupBy(_._1)
    assert(got.keySet == byLang.keySet)
    byLang.foreach { case (lang, ds) =>
      val texts = ds.map(_._2)
      val raw = texts.distinct.size.toLong
      val norm = texts.map(Normalizer.normalize(_,
        Normalizer.Form.NFC)).distinct.size.toLong
      assert(got(lang) == ((texts.size.toLong, raw, norm, raw - norm)),
        s"$lang: ${got(lang)} vs (${texts.size}, $raw, $norm, " +
          s"${raw - norm})")
      assert(raw > norm, s"$lang plants no folding twins")
    }
  }

  test("plans: q183/q184 are map-only + one lang-keyed exchange, " +
      "no join") {
    Seq("q183_nfc_normalize", "q184_nfc_dedup").foreach { q =>
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      // q184's countDistinct expands but stays within two exchanges
      assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
        s"$q: ${p.take(600)}")
      assert(!p.contains("Join"), s"$q: ${p.take(600)}")
    }
  }

  test("kernel: decomposed composes to the precomposed spelling, " +
      "idempotent, already-NFC strings return the SAME object " +
      "(zero-copy fast path)") {
    GenNfcFixture.AccentWords.foreach { case (pre, de) =>
      assert(pre != de, "fixture pair must be byte-distinct")
      val composed = graft.plans.NfcNormalize.nfc(
        UTF8String.fromString(de)).toString
      assert(composed == pre, s"NFC($de) = $composed, expected $pre")
      val u = UTF8String.fromString(pre)
      assert(graft.plans.NfcNormalize.nfc(u) eq u,
        "already-normalized input must take the zero-copy path")
    }
    // and through the column expression (codegen path)
    val r = spark.range(1).select(
      graft.functions.VectorOps.nfc(
        lit(GenNfcFixture.AccentWords.head._2)).as("n"))
      .collect()(0).getString(0)
    assert(r == GenNfcFixture.AccentWords.head._1)
  }
}
