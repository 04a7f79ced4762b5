package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q185 corpus datasheet: the card's metrics must close against each
  * other and against the stage queries they compose — a datasheet
  * whose splits don't sum to its doc count (or whose pass count
  * disagrees with the gate query) is worse than none.
  */
class DatasheetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("metrics close: splits sum to docs, pass <= docs, and the " +
      "composed values match the stage queries") {
    val m = SparkEntry.queries("q185_corpus_datasheet")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("split_train_docs") + m("split_val_docs") +
      m("split_test_docs") == m("docs_total"))
    assert(m("gopher_pass_docs") <= m("docs_total"))
    assert(m("gopher_pass_rate_mu") ==
      math.floor(m("gopher_pass_docs").toDouble / m("docs_total")
        * 1e6 + 0.5).toLong)
    assert(m("exact_dup_docs") >= 0 &&
      m("exact_dup_docs") < m("docs_total"))
    assert(m("tokens_total") > m("docs_total"),
      "documents average more than one token")
    // cross-checks against the stage queries the card composes
    val q117Pass = SparkEntry.queries("q117_gopher_gate")(spark, dir)
      .agg(sum("pass_all")).collect()(0).getLong(0)
    assert(m("gopher_pass_docs") == q117Pass,
      s"datasheet pass ${m("gopher_pass_docs")} != q117 $q117Pass")
    val q57Docs = SparkEntry.queries("q57_split")(spark, dir)
      .agg(sum("docs")).collect()(0).getLong(0)
    assert(m("docs_total") == q57Docs)
    val direct = Tables.load(spark, dir, "documents")
      .agg((count(lit(1)) -
        countDistinct(md5(col("text").cast("binary")))).as("d"))
      .collect()(0).getLong(0)
    assert(m("exact_dup_docs") == direct)
  }
}
