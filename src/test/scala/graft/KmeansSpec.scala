package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-plan Lloyd training invariants (q221): partition-invariant
  * deterministic seeds and assignments, a complete single-assignment
  * partition of the corpus, genuine centroid movement across rounds,
  * and non-decreasing µcos mass (training improves the objective it
  * optimizes — on the integer-rounded fold the mean update can
  * in principle dither, so the pin is the measured fixture run).
  */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val K = operators.Kmeans.K

  test("seeds and final ledger are invariant under repartitioning") {
    val n = operators.Kmeans.qrel(spark, dir)
    val a = operators.Kmeans.initCents(n)
    val b = operators.Kmeans.initCents(n.repartition(11))
    assert(a.map(_.cid) == b.map(_.cid))
    assert(a.zip(b).forall { case (x, y) =>
      x.cv.sameElements(y.cv) && x.cn == y.cn })
    val led = operators.Kmeans.train(spark, dir).collect().toSeq
    val led2 = operators.Kmeans.train(spark, dir).collect().toSeq
    assert(led.map(_.toSeq) == led2.map(_.toSeq))
  }

  test("a training round's exchange is codebook-sized, not " +
      "corpus-sized: shuffle records bounded by tasks·K·dim") {
    val clock = new StageClock
    spark.sparkContext.addSparkListener(clock)
    try {
      val parts = 4
      val n = operators.Kmeans.qrel(spark, "/root/testdata/sf0.01")
        .repartition(parts).persist()
      n.count()
      val init = operators.Kmeans.initCents(n)
      clock.quiesce(); clock.reset()
      operators.Kmeans.updated(
        operators.Kmeans.withAssignment(n, init))
      clock.quiesce()
      val recs = clock.shuffleRecords
      n.unpersist()
      // partial agg emits ≤ K·Dim rows per task; 2x slack for the
      // final-merge side of the exchange
      val bound = 2L * parts * K * operators.Kmeans.Dim
      assert(recs > 0 && recs <= bound,
        s"round shuffled $recs records, bound $bound — partial " +
          "aggregation is not combining map-side")
    } finally {
      spark.sparkContext.removeSparkListener(clock)
    }
  }

  test("the final ledger partitions the corpus: every vector in " +
      "exactly one cluster, every cluster organically populated") {
    val n = operators.Kmeans.qrel(spark, dir)
    val total = n.count()
    val led = operators.Kmeans.train(spark, dir).collect().toSeq
    assert(led.map(_.getLong(1)).sum == total)
    assert(led.length == K)
    assert(led.forall(_.getLong(1) > 0))
    assert(led.map(_.getLong(0)).sorted == (0L until K.toLong))
  }

  test("the convergence arm reaches an exact integer fixed point: " +
      "one more update leaves every centroid component identical") {
    val n = operators.Kmeans.qrel(spark, dir).persist()
    n.count()
    val (cents, rounds) = operators.Kmeans.trainToConvergence(n)
    assert(rounds < 64, s"no fixed point within 64 rounds")
    val again = operators.Kmeans.updated(
      operators.Kmeans.withAssignment(n, cents))
    n.unpersist()
    assert(cents.length == again.length)
    assert(cents.zip(again).forall { case (a, b) =>
      a.cid == b.cid && a.cv.sameElements(b.cv) },
      s"state at round $rounds is not a fixed point")
  }

  test("q223 PQ: every (vector, subspace) assigned once, Lloyd " +
      "monotonically shrinks the integer L2 objective, codebook is " +
      "partition-invariant") {
    val sv = operators.Kmeans.subrel(spark, dir).persist()
    val rows = sv.count()
    val vecs = operators.Kmeans.qrel(spark, dir).count()
    assert(rows == vecs * operators.Kmeans.SubSpaces)
    val init = operators.Kmeans.initBook(sv)
    assert(init.length == operators.Kmeans.SubSpaces * operators.Kmeans.PqK)
    val init2 = operators.Kmeans.initBook(sv.repartition(9))
    assert(init.zip(init2).forall { case (a, b) =>
      a.sub == b.sub && a.cid == b.cid && a.cv.sameElements(b.cv) })
    def obj(book: Seq[operators.Kmeans.SubCent]): Long =
      operators.Kmeans.withPqAssignment(sv, book)
        .agg(sum(col("dist"))).collect()(0).getLong(0)
    val d0 = obj(init)
    val b1 = operators.Kmeans.updatedBook(
      operators.Kmeans.withPqAssignment(sv, init))
    val d1 = obj(b1)
    val b2 = operators.Kmeans.updatedBook(
      operators.Kmeans.withPqAssignment(sv, b1))
    val d2 = obj(b2)
    sv.unpersist()
    // exact-L2 Lloyd is monotone up to the floor rounding of the mean
    // (≤ SubDim per centroid) — require genuine improvement anyway
    assert(d1 < d0, s"round 1 did not improve: $d0 -> $d1")
    assert(d2 <= d1, s"round 2 degraded: $d1 -> $d2")
    val led = operators.Kmeans.trainPq(spark, dir).collect().toSeq
    assert(led.map(_.getLong(2)).sum == rows)
    assert(led.forall(_.getLong(3) >= 0))
  }

  test("packed-kernel assignment arm is bit-identical to the " +
      "literal-struct arm (µcos coarse + PQ L2), incl. a codebook " +
      "with dropped (non-contiguous) cids") {
    val n = operators.Kmeans.qrel(spark, dir).persist()
    n.count()
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cid"), col("ucos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    // seeds AND a post-update codebook (non-trivial centroids)
    val init = operators.Kmeans.initCents(n)
    val c1 = operators.Kmeans.updated(
      operators.Kmeans.withAssignmentLiteral(n, init))
    Seq(init, c1).foreach { cents =>
      assert(rowsOf(operators.Kmeans.withAssignmentKernel(n, cents)) ==
        rowsOf(operators.Kmeans.withAssignmentLiteral(n, cents)))
    }
    // empty-cluster drop: a sparse-cid codebook must assign identically
    val sparse = c1.filterNot(c => c.cid == 2 || c.cid == 5)
    assert(rowsOf(operators.Kmeans.withAssignmentKernel(n, sparse)) ==
      rowsOf(operators.Kmeans.withAssignmentLiteral(n, sparse)))
    n.unpersist()
    val sv = operators.Kmeans.subrel(spark, dir).persist()
    sv.count()
    def pqRowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("sub"), col("cid"), col("dist"))
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
    val book0 = operators.Kmeans.initBook(sv)
    val book1 = operators.Kmeans.updatedBook(
      operators.Kmeans.withPqAssignmentLiteral(sv, book0))
    Seq(book0, book1).foreach { book =>
      assert(pqRowsOf(operators.Kmeans.withPqAssignmentKernel(sv, book)) ==
        pqRowsOf(operators.Kmeans.withPqAssignmentLiteral(sv, book)))
    }
    val sparseBook = book1.filterNot(c => c.sub == 1 && c.cid == 2)
    assert(
      pqRowsOf(operators.Kmeans.withPqAssignmentKernel(sv, sparseBook)) ==
        pqRowsOf(operators.Kmeans.withPqAssignmentLiteral(sv, sparseBook)))
    sv.unpersist()
  }

  test("production K dispatches the packed kernel (the r17 " +
      "prose-not-code gap): K > LiteralArmMaxK plans carry the kernel " +
      "expression, train end-to-end, and partition the corpus") {
    val bigK = 48
    assert(bigK > operators.Kmeans.LiteralArmMaxK)
    val n = operators.Kmeans.qrel(spark, dir).persist()
    val total = n.count()
    val cents = operators.Kmeans.initCents(n, bigK)
    assert(cents.length == bigK)
    val asn = operators.Kmeans.withAssignment(n, cents)
    val plan = asn.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("centroidmuassign"),
      "big-K coarse assignment did not route through the packed kernel")
    assert(!plan.contains("array_max"),
      "big-K plan still builds the literal-struct argmax")
    // a Lloyd round through the public dispatch stays a valid partition
    val c1 = operators.Kmeans.updated(asn)
    val led = operators.Kmeans.withAssignment(n, c1)
      .groupBy(col("cid")).agg(count(lit(1)).as("m")).collect()
    assert(led.map(_.getLong(1)).sum == total)
    assert(led.forall(r => r.getLong(0) >= 0 && r.getLong(0) < bigK))
    n.unpersist()
    // PQ side: a 32-codeword book routes through SubL2Argmin
    val sv = operators.Kmeans.subrel(spark, dir).persist()
    val svRows = sv.count()
    val book = operators.Kmeans.initBook(sv, 32)
    val pqAsn = operators.Kmeans.withPqAssignment(sv, book)
    val pqPlan = pqAsn.queryExecution.executedPlan.toString.toLowerCase
    assert(pqPlan.contains("subl2argmin"),
      "big-K PQ assignment did not route through the packed kernel")
    assert(pqAsn.count() == svRows)
    sv.unpersist()
  }

  test("broadcast-handle kernel arm is bit-identical to the other " +
      "two arms, and its plan carries the broadcast expression (no " +
      "codebook in the task binary)") {
    val n = operators.Kmeans.qrel(spark, dir).persist()
    n.count()
    val init = operators.Kmeans.initCents(n)
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cid"), col("ucos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val bc = operators.Kmeans.withAssignmentBcast(n, init)
    assert(rowsOf(bc) == rowsOf(operators.Kmeans.withAssignmentLiteral(n, init)))
    assert(bc.queryExecution.executedPlan.toString.toLowerCase
      .contains("centroidmuassignbcast"))
    n.unpersist()
    val sv = operators.Kmeans.subrel(spark, dir).persist()
    sv.count()
    val book = operators.Kmeans.initBook(sv)
    def pqRowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("sub"), col("cid"), col("dist"))
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
    val pqBc = operators.Kmeans.withPqAssignmentBcast(sv, book)
    assert(pqRowsOf(pqBc) ==
      pqRowsOf(operators.Kmeans.withPqAssignmentLiteral(sv, book)))
    assert(pqBc.queryExecution.executedPlan.toString.toLowerCase
      .contains("subl2argminbcast"))
    sv.unpersist()
  }

  test("the three-arm dispatch rule: literal to K=16, packed plan " +
      "constant to 1 MiB, broadcast past it (production K=4096 " +
      "coarse / K=256 PQ land where they should)") {
    import operators.Kmeans._
    def bytes(k: Int, dim: Int): Long = k.toLong * (dim + 2) * 8
    assert(assignArm(8, bytes(8, 64)) == LiteralArm)
    assert(assignArm(16, bytes(16, 64)) == LiteralArm)
    assert(assignArm(17, bytes(17, 64)) == KernelLitArm)
    assert(assignArm(48, bytes(48, 64)) == KernelLitArm)
    // production PQ book: 256 codewords × 16 dims ≈ 37 KB → constant
    assert(assignArm(256, bytes(256 * SubSpaces, SubDim)) == KernelLitArm)
    // production coarse book: 4096 × 64 dims ≈ 2.2 MB → broadcast
    assert(assignArm(4096, bytes(4096, 64)) == KernelBcastArm)
    assert(bytes(4096, 64) > KernelLitMaxBytes)
  }

  test("training moves the centroids and does not degrade the µcos " +
      "objective on the fixture") {
    val n = operators.Kmeans.qrel(spark, dir).persist()
    n.count()
    val init = operators.Kmeans.initCents(n)
    def mass(cents: Seq[operators.Kmeans.Cent]): Long =
      operators.Kmeans.withAssignment(n, cents)
        .agg(sum(col("ucos"))).collect()(0).getLong(0)
    val m0 = mass(init)
    val c1 = operators.Kmeans.updated(
      operators.Kmeans.withAssignment(n, init))
    assert(init.zip(c1).exists { case (a, b) =>
      !a.cv.sameElements(b.cv) },
      "first Lloyd update left every centroid exactly in place")
    val c2 = operators.Kmeans.updated(
      operators.Kmeans.withAssignment(n, c1))
    val m2 = mass(c2)
    n.unpersist()
    assert(m2 > m0,
      s"µcos mass did not improve: init=$m0 after-2-updates=$m2")
  }
}
