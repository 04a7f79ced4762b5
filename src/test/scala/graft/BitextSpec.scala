package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Margin-based bitext mining (q188): semantics against an independent
  * in-memory reimplementation, plus the operator's defining behavior —
  * hub vectors with dense backward neighborhoods lose to lower-cosine
  * partners with sparse neighborhoods (raw nearest-neighbor would pick
  * the hub; the margin must not).
  */
class BitextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def pool(vs: Seq[(Long, Array[Double])]): DataFrame = {
    graft.functions.VectorOps.register(spark)
    import spark.implicits._
    operators.Bitext.qrel(vs.toDF("id", "v")
      .withColumn("v", col("v").cast("array<double>"))
      .withColumn("nrm", graft.functions.VectorOps.l2norm(col("v"))))
  }

  /** Independent reimplementation of the whole miner in plain Scala,
    * mirroring the engine's arithmetic exactly (µ-quantize components,
    * exact integer dot/norm² folds, one µunit floor per pair, BIGINT
    * everything after).
    */
  private def mineRef(xs: Seq[(Long, Array[Double])],
      ys: Seq[(Long, Array[Double])],
      k: Int): Seq[(Long, Long, Long, Int)] = {
    def quant(a: Array[Double]): Array[Double] =
      a.map(x => math.floor(x * 1000000.0 + 0.5))
    def nrm(a: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      math.sqrt(s)
    }
    def ucos(a0: Array[Double], b0: Array[Double]): Long = {
      val a = quant(a0); val b = quant(b0)
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); i += 1 }
      math.floor(d / (nrm(a) * nrm(b)) * 1000000.0 + 0.5).toLong
    }
    val p = for ((sx, xv) <- xs; (ty, yv) <- ys)
      yield (sx, ty, ucos(xv, yv))
    def topkSum(rows: Seq[(Long, Long)]): Long =
      rows.sortBy { case (tie, u) => (-u, tie) }.take(k).map(_._2).sum
    val sfwd = p.groupBy(_._1).map { case (sx, rs) =>
      sx -> topkSum(rs.map(r => (r._2, r._3))) }
    val sbwd = p.groupBy(_._2).map { case (ty, rs) =>
      ty -> topkSum(rs.map(r => (r._1, r._3))) }
    val m = p.collect { case (sx, ty, u)
        if u > 0 && sfwd(sx) + sbwd(ty) > 0 =>
      (sx, ty, 2 * k * u * 1000000L / (sfwd(sx) + sbwd(ty)))
    }
    val fwd = m.groupBy(_._1).map { case (_, rs) =>
      rs.minBy { case (_, ty, mu) => (-mu, ty) } }
    val bwd = m.groupBy(_._2).map { case (_, rs) =>
      rs.minBy { case (sx, _, mu) => (-mu, sx) } }.map(r => (r._1, r._2)).toSet
    fwd.toSeq.sortBy(_._1).map { case (sx, ty, mu) =>
      (sx, ty, mu, if (bwd((sx, ty))) 1 else 0) }
  }

  private def mined(x: DataFrame, y: DataFrame): Seq[(Long, Long, Long, Int)] =
    operators.Bitext.mineMargin(x, y).orderBy("src_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq

  test("matches an independent reimplementation on a seeded random pool") {
    val rnd = new scala.util.Random(188)
    def vecs(n: Int, base: Long): Seq[(Long, Array[Double])] =
      (0 until n).map(i =>
        (base + i, Array.fill(16)(rnd.nextGaussian())))
    val xs = vecs(20, 0L)
    val ys = vecs(20, 100L)
    assert(mined(pool(xs), pool(ys)) ==
      mineRef(xs, ys, operators.Bitext.MarginK))
  }

  test("planted translation pair is mined as mutual best") {
    val rnd = new scala.util.Random(7)
    def noise() = Array.fill(8)(rnd.nextGaussian())
    val twin = noise()
    // x0 and y0 share a direction up to tiny noise; everything else
    // is independent noise, so (0, 100) must be the mutual-best pair.
    val xs = (0L, twin.map(_ + rnd.nextGaussian() * 0.01)) +:
      (1 to 5).map(i => (i.toLong, noise()))
    val ys = (100L, twin.map(_ + rnd.nextGaussian() * 0.01)) +:
      (1 to 5).map(i => (100L + i, noise()))
    val out = mined(pool(xs), pool(ys))
    val p0 = out.find(_._1 == 0L).get
    assert(p0._2 == 100L && p0._4 == 1,
      s"planted pair not mined mutual-best: $p0")
  }

  test("hub with dense backward neighborhood loses to the sparse partner") {
    // Target pool: a hub h every source is near, and a partner t only
    // x9 is near. cos(x9, h) > cos(x9, t), but h's backward top-k is
    // ~0.97 avg while t's is sparse, so the MARGIN prefers t — the
    // Artetxe & Schwenk correction that raw nearest-neighbor misses.
    val h = Array(1.0, 0.0, 0.0)
    val t = Array(0.0, 1.0, 0.0)
    // eight hub-hugging sources establish h's dense neighborhood
    val hug = (0 until 8).map { i =>
      val a = 0.1 + 0.01 * i
      (i.toLong * 2, Array(math.cos(a), 0.0, math.sin(a)))
    }
    // x9: cos to h = cos(20°) ≈ 0.94, cos to t = cos(30°) ≈ 0.87
    val x9 = (18L, Array(math.cos(math.toRadians(20)),
      math.cos(math.toRadians(70)), 0.0))
    val xs = hug :+ x9
    val ys = Seq((101L, h), (103L, t),
      // filler targets far from everything, so top-k sums are defined
      (105L, Array(0.0, 0.0, 1.0)), (107L, Array(-1.0, 0.1, 0.1)),
      (109L, Array(0.1, -1.0, 0.2)))
    val out = mined(pool(xs), pool(ys))
    val rawBest = 101L // by construction: cos(x9,h) > cos(x9,t)
    val x9row = out.find(_._1 == 18L).get
    assert(x9row._2 == 103L && x9row._2 != rawBest,
      s"margin did not penalize the hub: $x9row")
    assert(x9row._4 == 1, "partner pair should be mutual")
  }

  test("multiprobe large arm: planted twins recalled as mutual pairs, " +
      "no cartesian in the plan, dispatcher picks arms by pool size") {
    // 64-dim pools (the centroid fixture's dim) with planted twins:
    // near-identical cross-pool vectors share a rank-1 centroid, so
    // the candidate join recalls them structurally at any nprobe ≥ 1
    val rnd = new scala.util.Random(964)
    def noise() = Array.fill(64)(rnd.nextGaussian())
    val twins = (0 until 15).map(_ => noise())
    val xs = twins.zipWithIndex.map { case (t, i) =>
      (i.toLong * 2, t.map(_ + rnd.nextGaussian() * 0.01)) } ++
      (15 until 60).map(i => (i.toLong * 2, noise()))
    val ys = twins.zipWithIndex.map { case (t, i) =>
      (1000L + i, t.map(_ + rnd.nextGaussian() * 0.01)) } ++
      (15 until 60).map(i => (1000L + i, noise()))
    val (px, py) = (pool(xs), pool(ys))
    val probed = operators.Bitext.mineMarginProbed(spark, px, py)
    val rows = probed.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    (0 until 15).foreach { i =>
      val row = rows.find(_._1 == i.toLong * 2)
      assert(row.exists(r => r._2 == 1000L + i && r._3 == 1),
        s"twin $i not mined mutual by the probed arm: $row")
    }
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    // dispatcher: small n → exact arm output; large n → probed output
    assert(operators.Bitext.mine(spark, px, py, n = 60)
      .orderBy("src_id").collect().toSeq ==
      operators.Bitext.mineMargin(px, py)
        .orderBy("src_id").collect().toSeq)
    assert(operators.Bitext.mine(spark, px, py,
        n = operators.Similarity.SmallCorpusBound + 1)
      .orderBy("src_id").collect().toSeq ==
      probed.orderBy("src_id").collect().toSeq)
  }

  test("quantized spelling equals the float spelling on the committed " +
      "fixtures (r16 determinism-contract change is value-preserving)") {
    // The r15→r16 contract change replaced the raw double dot-product
    // fold with exact integer folds over µ-quantized components. This
    // pins that the change did not alter the MINED OUTPUT on the
    // committed fixture corpora: same (src, tgt, mutual) triples, and
    // margins within the quantization jitter (component error ≤ 0.5µ
    // → cosine error ~1e-6 → a few µunits of margin).
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val out = SparkEntry.queries("q188_bitext_margin")(spark, dir)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
      // float spelling, reimplemented: sequential raw-double folds,
      // exactly the r15 arithmetic
      val vecs = operators.Similarity.normed(spark, dir)
        .select("vec_id", "v").collect()
        .map(r => (r.getLong(0),
          r.getSeq[Double](1).toArray)).toSeq
      val xs = vecs.filter(_._1 % 2 == 0)
      val ys = vecs.filter(_._1 % 2 == 1)
      def nrm(a: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * a(i); i += 1 }
        math.sqrt(s)
      }
      def ucosF(a: Array[Double], b: Array[Double]): Long = {
        var d = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); i += 1 }
        math.floor(d / (nrm(a) * nrm(b)) * 1000000.0 + 0.5).toLong
      }
      val k = operators.Bitext.MarginK
      val p = for ((sx, xv) <- xs; (ty, yv) <- ys)
        yield (sx, ty, ucosF(xv, yv))
      def topkSum(rows: Seq[(Long, Long)]): Long =
        rows.sortBy { case (tie, u) => (-u, tie) }.take(k).map(_._2).sum
      val sfwd = p.groupBy(_._1).map { case (sx, rs) =>
        sx -> topkSum(rs.map(r => (r._2, r._3))) }
      val sbwd = p.groupBy(_._2).map { case (ty, rs) =>
        ty -> topkSum(rs.map(r => (r._1, r._3))) }
      val m = p.collect { case (sx, ty, u)
          if u > 0 && sfwd(sx) + sbwd(ty) > 0 =>
        (sx, ty, 2 * k * u * 1000000L / (sfwd(sx) + sbwd(ty)))
      }
      val fwd = m.groupBy(_._1).map { case (_, rs) =>
        rs.minBy { case (_, ty, mu) => (-mu, ty) } }
      val bwd = m.groupBy(_._2).map { case (_, rs) =>
        rs.minBy { case (sx, _, mu) => (-mu, sx) } }
        .map(r => (r._1, r._2)).toSet
      val ref = fwd.toSeq.sortBy(_._1).map { case (sx, ty, mu) =>
        (sx, ty, mu, if (bwd((sx, ty))) 1 else 0) }
      assert(out.map(r => (r._1, r._2, r._4)) ==
        ref.map(r => (r._1, r._2, r._4)),
        s"$dir: mined pair/mutual set changed under quantization")
      out.zip(ref).foreach { case (o, r) =>
        assert(math.abs(o._3 - r._3) <= 50,
          s"$dir: margin drift beyond quantization jitter: $o vs $r")
      }
    }
  }

  test("q188b catalog entry is the probed arm over the fixture pools") {
    // Recall is NOT gated on the fixture corpus: its pools are
    // independent noise, so mutual-best pairs are arbitrary low-cosine
    // pairs with no structural reason to share a rank-1 centroid — the
    // planted-twin test above is the recall gate (genuine translations
    // are near-identical vectors, which share centroids structurally).
    // Here we pin that the catalog entry is exactly the probed miner
    // over the canonical pool split, and that the candidate
    // restriction actually bites (fewer candidate pairs than all-pairs
    // → the oracle's relational candidate spelling is load-bearing).
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q188b_bitext_margin_probed")(
      spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length,
      "one row per source vector")
    val exactRows = SparkEntry.queries("q188_bitext_margin")(spark, dir)
      .count()
    // candidate restriction: some sources lose all candidates, or at
    // minimum the probed output can't exceed the exact arm's universe
    assert(rows.length <= exactRows)
  }

  test("non-mutual forward best is flagged mutual=0") {
    // y201 prefers x0 (closest), but x2's forward best is also y201
    // while y201's backward best stays x0 → x2's row must be mutual=0.
    val xs = Seq(
      (0L, Array(1.0, 0.0, 0.05, 0.0)),
      (2L, Array(0.9, 0.1, 0.0, 0.2)),
      (4L, Array(0.0, 1.0, 0.0, 0.0)),
      (6L, Array(0.0, 0.0, 1.0, 0.0)),
      (8L, Array(0.3, 0.3, 0.3, 0.9)))
    val ys = Seq(
      (201L, Array(1.0, 0.0, 0.0, 0.0)),
      (203L, Array(0.0, 1.0, 0.1, 0.0)),
      (205L, Array(0.0, 0.1, 1.0, 0.0)),
      (207L, Array(0.2, 0.2, 0.2, 1.0)),
      (209L, Array(-1.0, 0.0, 0.0, 0.1)))
    val out = mined(pool(xs), pool(ys))
    val ref = mineRef(xs, ys, operators.Bitext.MarginK)
    assert(out == ref)
    val x0 = out.find(_._1 == 0L).get
    val x2 = out.find(_._1 == 2L).get
    assert(x0._2 == 201L && x0._4 == 1)
    assert(x2._2 == 201L && x2._4 == 0,
      s"x2's forward-best is contested and must not be mutual: $x2")
  }
}
