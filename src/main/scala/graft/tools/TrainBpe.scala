package graft.tools

import graft.{Fixtures, Sessions, Tables}
import graft.functions.Bpe
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Trains the byte-level BPE merge table over the sf0.1 documents
  * corpus and commits BOTH halves of the tokenizer fixture (the
  * TrainCentroids / TrainWhitener train-offline/apply-in-plan
  * contract):
  *
  *  - `fixtures/bpe_merges.parquet` (rank, left, right, new_id,
  *    token): the merge list in rank order — `token` is the merged
  *    token's UTF-8 decode, for human inspection only; queries pack
  *    (left, right) into the codegen'd
  *    [[graft.plans.BpeTokenCount]] expression;
  *  - `fixtures/bpe_corpus.parquet` (doc_id, lang, source, text,
  *    n_bpe): the training corpus with per-doc REFERENCE token counts
  *    computed by this trainer's own encoder. q148 recomputes the
  *    counts in-plan from `text` and packs token-budget bins from
  *    them, while the DuckDB oracle packs from the committed `n_bpe`
  *    column — a hash match proves the in-row encoder reproduces the
  *    reference count for every document (any single-doc deviation
  *    shifts every downstream prefix sum). Same
  *    precomputed-expected-fixture oracle pattern as the media codecs.
  *
  * Training is greedy most-frequent-pair (Sennrich ACL'16), ties to
  * the smallest (left, right) — deterministic, no RNG, byte-identical
  * re-runs given the same corpus.
  */
object TrainBpe {
  /** Merge (vocab) budget. Deliberately BELOW the corpus's saturation
    * point (~126 merges fully merge the fixture vocabulary): with 64
    * merges the frequent words collapse to single tokens while rarer
    * words stay multi-token — so per-doc counts genuinely differ from
    * whitespace counts and the q148 oracle can tell a real merge loop
    * from word splitting. This is the authentic BPE regime: the vocab
    * budget is the knob, rare words decompose into subwords.
    */
  val MaxMerges = 64

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("graft-train-bpe", coresOverride = Some("4"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.load(spark, srcDir, "documents")
      .select("doc_id", "lang", "source", "text")
      .collect() // 5000 docs / ~1.5 MB at sf0.1 — training is driver-side

    val freq = new scala.collection.mutable.HashMap[String, Long]()
    docs.foreach { r =>
      val it = Bpe.preTokens(r.getAs[String]("text")).iterator()
      while (it.hasNext) {
        val w = it.next()
        freq.update(w, freq.getOrElse(w, 0L) + 1L)
      }
    }
    val (left, right) = Bpe.train(freq, MaxMerges)
    println(s"trained ${left.length} merges over ${freq.size} " +
      s"distinct pre-tokens from ${docs.length} docs")

    val merges = left.indices.map { r =>
      (r, left(r), right(r), 256 + r,
        new String(Bpe.tokenBytes(256 + r, left, right),
          java.nio.charset.StandardCharsets.UTF_8))
    }.toDF("rank", "left", "right", "new_id", "token")

    val table = new Bpe.Table(left, right)
    // n_bpe (count) and bpe_ids (full id sequence) are BOTH committed:
    // q148 proves the in-plan counter against n_bpe; q175 proves the
    // in-plan ENCODER id-for-id against bpe_ids (count equality can't
    // catch two wrong merges that cancel — sequence equality can)
    val corpus = docs.toSeq.map { r =>
      val text = r.getAs[String]("text")
      val ids = Bpe.tokenIds(text, table)
      (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), text, ids.length, ids.toSeq)
    }.toDF("doc_id", "lang", "source", "text", "n_bpe", "bpe_ids")

    def writeSingle(df: org.apache.spark.sql.DataFrame,
        dest: String): Unit = {
      val tmp = Files.createTempDirectory("graft-fix").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .map(_.getPath)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
        .head
      Files.createDirectories(Paths.get(dest).getParent)
      Files.move(Paths.get(part), Paths.get(dest),
        StandardCopyOption.REPLACE_EXISTING)
    }
    writeSingle(merges, Fixtures.bpeMergesPath)
    writeSingle(corpus.orderBy("doc_id"), Fixtures.bpeCorpusPath)
    val total = corpus.agg(org.apache.spark.sql.functions.sum("n_bpe"))
      .collect()(0).getLong(0)
    println(s"wrote ${Fixtures.bpeMergesPath} (${left.length} merges) " +
      s"and ${Fixtures.bpeCorpusPath} (${docs.length} docs, " +
      s"$total bpe tokens)")
    spark.stop()
  }
}
