package graft

import graft.functions.Membership
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The size-dispatched membership swap (VERDICT r18 finding 2, the
  * third application of the assignArm recipe): both arms must be
  * EXACT and bit-identical — the dispatch can never change a result,
  * only the physical shape (plan literal + linear scan vs broadcast
  * handle + binary search).
  */
class MembershipSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("dispatch boundary: literal to LiteralMaxKeys, broadcast past " +
      "it; a big list routes to the broadcast expression in the plan") {
    spark // containsBcast broadcasts via the active session
    assert(Membership.arm(Membership.LiteralMaxKeys) ==
      Membership.LiteralArm)
    assert(Membership.arm(Membership.LiteralMaxKeys + 1) ==
      Membership.BcastArm)
    // a list past the threshold must produce a SetContainsBcast node,
    // not a typedLit the size of the list
    val big = (0 until Membership.LiteralMaxKeys + 10)
      .map(i => s"tok$i")
    import org.apache.spark.sql.GraftShims
    val e = GraftShims.expression(Membership.contains(lit("tok3"), big))
    assert(e.collectFirst {
      case b: graft.plans.SetContainsBcast => b
    }.nonEmpty, s"expected a broadcast probe, got: $e")
    // the overlaps PUBLIC route past the threshold also dispatches to
    // the probe (inside the exists lambda), and answers correctly
    // the probe sits inside the unresolved exists-lambda body, which
    // collectFirst cannot descend before resolution — the string form
    // shows it
    val eo = GraftShims.expression(
      Membership.overlaps(array(lit("x")), big)).toString
    assert(eo.contains("setcontainsbcast"),
      s"expected a broadcast probe in overlaps, got: $eo")
    val got = spark.range(1).select(
      Membership.overlaps(array(lit("tok7"), lit("zz")), big).as("a"),
      Membership.overlaps(array(lit("zz")), big).as("b")).head
    assert(got.getBoolean(0) && !got.getBoolean(1))
  }

  test("a duplicate-heavy list dispatches on its DISTINCT size AND " +
      "embeds only the distinct keys (r20 review: dispatching on " +
      "distinct while embedding the raw list would serialize the " +
      "duplicates into every task binary)") {
    spark
    import org.apache.spark.sql.GraftShims
    // 10x LiteralMaxKeys raw entries, 8 distinct — literal tier
    val dupHeavy = Seq.fill(Membership.LiteralMaxKeys * 10)(
      (0 until 8).map(i => s"k$i")).flatten
    val e = GraftShims.expression(
      Membership.contains(lit("k3"), dupHeavy))
    assert(e.collectFirst {
      case b: graft.plans.SetContainsBcast => b
    }.isEmpty, "duplicate-heavy literal-tier list took the broadcast " +
      "arm")
    // the embedded literal carries the DISTINCT keys, not the raw
    // list — counted in the rendered tree (robust to how the
    // pre-resolution Column API wraps the literal node): 8 distinct
    // keys + the probe's own k3, vs 640 raw entries
    val toks = "k\\d+".r.findAllIn(e.toString).size
    assert(toks <= 9, s"literal arm rendered $toks key tokens — the " +
      "raw duplicate-heavy list leaked into the plan")
    // and it still answers correctly
    val got = spark.range(1).select(
      Membership.contains(lit("k5"), dupHeavy).as("a"),
      Membership.contains(lit("zz"), dupHeavy).as("b")).head
    assert(got.getBoolean(0) && !got.getBoolean(1))
  }

  test("contains: broadcast arm equals the literal arm token-for-" +
      "token on the q186 vocabulary rewrite (forced below threshold)") {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        filter(split(lower(col("text")), " "), x => x =!= "")
          .as("words"))
    val vocab = docs.select(explode(col("words")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(25)
      .collect().map(_.getString(0)).toSeq
    val both = docs.select(col("doc_id"),
      transform(col("words"), x =>
        when(array_contains(typedLit(vocab), x), x)
          .otherwise(lit("<unk>"))).as("lit_rw"),
      transform(col("words"), x =>
        when(Membership.containsBcast(x, vocab), x)
          .otherwise(lit("<unk>"))).as("bc_rw"))
    assert(both.filter(to_json(col("lit_rw")) =!=
      to_json(col("bc_rw"))).count() == 0)
  }

  test("overlaps: broadcast arm equals the literal arm on the q179 " +
      "suffix-blocklist relation, including rows with a NULL element") {
    val domains = Fixtures.read(spark, Fixtures.domainBlocklistPath)
      .collect().map(_.getString(0)).toSeq
    val sufs = Fixtures.read(spark, Fixtures.urlCorpusPath)
      .withColumn("host",
        regexp_replace(regexp_replace(
          lower(split_part(regexp_replace(regexp_replace(col("url"),
            "#.*$", ""), "(?i)^https?://", ""), lit("/"), lit(1))),
          "^www\\.", ""), ":(80|443)$", ""))
      .withColumn("labels", split(col("host"), "\\."))
      .withColumn("sufs",
        transform(sequence(lit(1), size(col("labels"))), i =>
          array_join(slice(col("labels"), i,
            size(col("labels")) - i + 1), ".")))
      .select(col("doc_id"), col("sufs"))
      // a null element exercises the three-valued-logic agreement
      // (arrays_overlap's null-on-unmatched-null == exists's
      // null-propagating lambda)
      .unionByName(spark.range(1).select(
        lit(-1L).as("doc_id"),
        array(lit("no-match"), lit(null).cast("string")).as("sufs")))
    val both = sufs.select(col("doc_id"),
      arrays_overlap(col("sufs"), typedLit(domains)).as("lit_b"),
      Membership.overlapsBcast(col("sufs"), domains).as("bc_b"))
    assert(both.filter(coalesce(col("lit_b") =!= col("bc_b"),
      col("lit_b").isNull =!= col("bc_b").isNull)).count() == 0)
  }
}
