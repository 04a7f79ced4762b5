package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native DotProduct/L2Norm: value parity with the lambda formulation
  * (bit-identical sequential accumulation), null propagation, codegen and
  * interpreted paths agreeing.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dot and norm match the higher-order-function formulation exactly") {
    VectorOps.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(-0.7, 0.11, 13.0))).toDF("a", "b")
    val rows = df.select(
      VectorOps.dot(col("a"), col("b")).as("d1"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).as("d2"),
      VectorOps.l2norm(col("a")).as("n1"),
      sqrt(aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x)).as("n2"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // bit-identical
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("null propagation") {
    VectorOps.register(spark)
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val r = df.select(VectorOps.dot(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("rolling hash: fold parity, codepoints, null, empty") {
    VectorOps.register(spark)
    def ref(s: String): Long = {
      var h = 0L
      s.codePoints().toArray.foreach(cp => h = (h * 31 + cp) % 1000000007L)
      h
    }
    val inputs = Seq("", "a", "hello world", "it's ~ §ümlaut",
      "astral 😀 pair") // 😀 = U+1F600
    val df = inputs.toDF("s")
    val got = df.select(VectorOps.rollingHash(col("s")).as("rh"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == inputs.map(ref))
    val n = Seq(Option.empty[String]).toDF("s")
      .select(VectorOps.rollingHash(col("s"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("shingle set: parity with the split+transform+array_distinct " +
      "formulation on seeded random texts and edge cases") {
    VectorOps.register(spark)
    // reference = the HOF pipeline ShingleSet replaced (len = 3)
    def ref(s: String): Seq[String] = {
      val w = s.split(" ", -1).toSeq
      if (w.length < 3) Seq.empty
      else (0 to w.length - 3)
        .map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").distinct
    }
    val rnd = new scala.util.Random(42)
    val words = Seq("the", "quick", "brown", "fox", "", "a", "über",
      "数据", "x'y", "z\"w")
    val randomTexts = (1 to 200).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ")
    }
    val edge = Seq("", " ", "  ", "a b c", "a  b  c", "a b c d e",
      "same same same same", " leading", "trailing ", "one two")
    val inputs = (randomTexts ++ edge).distinct
    val got = inputs.toDF("s")
      .select(col("s"), VectorOps.shingles(col("s"), 3).as("g"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    inputs.foreach { s =>
      assert(got(s).sorted == ref(s).sorted, s"text='$s'")
    }
    // len parameter: 5-gram count on a known text
    val five = Seq("a b c d e f g").toDF("s")
      .select(VectorOps.shingles(col("s"), 5)).collect()(0)
      .getSeq[String](0)
    assert(five == Seq("a b c d e", "b c d e f", "c d e f g"))
    val nul = Seq(Option.empty[String]).toDF("s")
      .select(VectorOps.shingles(col("s"), 3)).collect()(0)
    assert(nul.isNullAt(0))
  }

  test("sorted intersect count: parity with array_intersect on seeded " +
      "random duplicate-free sorted arrays; empty and disjoint edges") {
    VectorOps.register(spark)
    val rnd = new scala.util.Random(11)
    val vocab = (1 to 60).map(i => s"tok$i")
    val cases = (1 to 150).map { _ =>
      val a = rnd.shuffle(vocab).take(rnd.nextInt(20)).sorted
      val b = rnd.shuffle(vocab).take(rnd.nextInt(20)).sorted
      (a, b)
    } ++ Seq((Seq.empty[String], Seq("x")), (Seq("x"), Seq.empty[String]),
      (Seq("a", "b"), Seq("c", "d")), (Seq("a", "b"), Seq("a", "b")))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        VectorOps.sortedIntersectCount(col("a"), col("b")).as("c"),
        size(array_intersect(col("a"), col("b"))).as("expect"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(2) == r.getInt(3),
        s"a=${r.getSeq[String](0)} b=${r.getSeq[String](1)}")
    }
    val nul = Seq((Some(Seq("a")), Option.empty[Seq[String]]))
      .toDF("a", "b")
      .select(VectorOps.sortedIntersectCount(col("a"), col("b")))
      .collect()(0)
    assert(nul.isNullAt(0))
  }

  test("shingle hash set: per-element xxhash64 parity with the string " +
      "shingle set, sortedness, dedup, null/short-text edges") {
    VectorOps.register(spark)
    val rnd = new scala.util.Random(7)
    val words = Seq("the", "quick", "brown", "fox", "", "a", "über",
      "数据", "x'y", "z\"w")
    val randomTexts = (1 to 200).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ")
    }
    val edge = Seq("", " ", "  ", "a b c", "a  b  c", "a b c d e",
      "same same same same", " leading", "trailing ", "one two")
    val inputs = (randomTexts ++ edge).distinct
    // reference: xxhash64(seed 0) of every STRING shingle, sorted set —
    // Spark's xxhash64() function uses seed 42, so hash via the same
    // catalyst helper the expression uses
    def refHash(s: String): Long =
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType, 0L)
    val got = inputs.toDF("s")
      .select(col("s"),
        VectorOps.shingleHashes(col("s"), 3).as("h"),
        VectorOps.shingles(col("s"), 3).as("g"))
      .collect()
    got.foreach { r =>
      val h = r.getSeq[Long](1)
      val expect = r.getSeq[String](2).map(refHash).distinct.sorted
      assert(h == expect, s"text='${r.getString(0)}'")
      assert(h == h.distinct.sorted)
    }
    val nul = Seq(Option.empty[String]).toDF("s")
      .select(VectorOps.shingleHashes(col("s"), 3)).collect()(0)
    assert(nul.isNullAt(0))
  }

  test("sorted long intersect count: parity with array_intersect on " +
      "seeded random sorted long arrays; empty/disjoint/null edges") {
    VectorOps.register(spark)
    val rnd = new scala.util.Random(13)
    val vocab = (1 to 60).map(i => rnd.nextLong())
    val cases = (1 to 150).map { _ =>
      val a = rnd.shuffle(vocab).take(rnd.nextInt(20)).sorted
      val b = rnd.shuffle(vocab).take(rnd.nextInt(20)).sorted
      (a, b)
    } ++ Seq((Seq.empty[Long], Seq(1L)), (Seq(1L), Seq.empty[Long]),
      (Seq(Long.MinValue, 0L), Seq(Long.MaxValue)),
      (Seq(-5L, 3L), Seq(-5L, 3L)))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        VectorOps.sortedLongIntersectCount(col("a"), col("b")).as("c"),
        size(array_intersect(col("a"), col("b"))).as("expect"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(2) == r.getInt(3),
        s"a=${r.getSeq[Long](0)} b=${r.getSeq[Long](1)}")
    }
    val nul = Seq((Some(Seq(1L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(VectorOps.sortedLongIntersectCount(col("a"), col("b")))
      .collect()(0)
    assert(nul.isNullAt(0))
  }

  test("byte entropy: reference parity, closed forms, null, empty") {
    VectorOps.register(spark)
    def ref(s: String): Double = {
      val bs = s.getBytes("UTF-8")
      if (bs.isEmpty) 0d
      else bs.groupBy(identity).values.map(_.length.toDouble / bs.length)
        .map(p => -p * math.log(p) / math.log(2d)).sum
    }
    val rnd = new scala.util.Random(7)
    val inputs = (Seq("", "a", "aaaa", "ab", "abab", "abcd",
      "the quick brown fox", "über §ümlaut 数据") ++
      (1 to 100).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString))
      .distinct
    val got = inputs.toDF("s")
      .select(col("s"), VectorOps.byteEntropy(col("s")).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    inputs.foreach { s =>
      assert(math.abs(got(s) - ref(s)) < 1e-12, s"text='$s'")
    }
    // closed forms: single symbol = 0 bits; two equiprobable = 1 bit;
    // four equiprobable = 2 bits
    assert(got("aaaa") == 0d)
    assert(math.abs(got("abab") - 1d) < 1e-12)
    assert(math.abs(got("abcd") - 2d) < 1e-12)
    val nul = Seq(Option.empty[String]).toDF("s")
      .select(VectorOps.byteEntropy(col("s"))).collect()(0)
    assert(nul.isNullAt(0))
  }

  test("bigram counts: parity with the filter-split-transform " +
      "relational spelling on seeded random texts and edge cases") {
    VectorOps.register(spark)
    val rnd = new scala.util.Random(13)
    val words = Vector("a", "bb", "ccc", "dd", "e")
    val inputs = (Seq("", "a", "a b", "a  b", " a b ", "a a a",
      "x y x y x") ++
      (1 to 60).map(_ => (0 to rnd.nextInt(25))
        .map(_ => if (rnd.nextInt(6) == 0) "" else words(rnd.nextInt(5)))
        .mkString(" "))).distinct
    val df = inputs.toDF("s")
    val inRow = df.select(col("s"),
        explode(VectorOps.bigramCounts(col("s"))).as("e"))
      .select(col("s"), col("e.t"), col("e.tf"))
    val relational = df
      .withColumn("w", expr("filter(split(s, ' '), x -> x <> '')"))
      .filter(size(col("w")) >= 2)
      .select(col("s"), explode(expr(
        "transform(sequence(1, size(w) - 1)," +
          " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
        .as("t"))
      .groupBy("s", "t").agg(count(lit(1)).as("tf"))
    assert(inRow.exceptAll(relational).isEmpty &&
      relational.exceptAll(inRow).isEmpty,
      "in-row bigram counts diverge from the relational spelling")
    val nul = Seq(Option.empty[String]).toDF("s")
      .select(VectorOps.bigramCounts(col("s"))).collect()(0)
    assert(nul.isNullAt(0))
  }

  test("sign band codes: bit-parity with the relational dot-threshold " +
      "bit-sum over seeded random vectors and planes") {
    VectorOps.register(spark)
    val rnd = new scala.util.Random(11)
    val dim = 16
    val bBits = 5
    val lTables = 7
    // planes packed ((t*bBits)+b)*dim + d — the Fixtures layout
    val planes = Array.fill(lTables, bBits, dim)(rnd.nextGaussian())
    val packed = (for { t <- 0 until lTables; b <- 0 until bBits;
      d <- 0 until dim } yield planes(t)(b)(d)).toArray
    def ref(v: Seq[Double]): Seq[Long] =
      (0 until lTables).map { t =>
        (0 until bBits).map { b =>
          // same sequential accumulation as DotProduct
          var dot = 0.0
          var d = 0
          while (d < dim) { dot += v(d) * planes(t)(b)(d); d += 1 }
          if (dot > 0) 1L << b else 0L
        }.sum
      }
    val vecs = (1 to 50).map(_ => Seq.fill(dim)(rnd.nextGaussian()))
    val got = vecs.toDF("v")
      .select(col("v"), VectorOps.signBandCodes(col("v"),
        typedLit(packed.toSeq), bBits).as("codes"))
      .as[(Seq[Double], Seq[Long])].collect().toMap
    vecs.foreach { v =>
      assert(got(v) == ref(v), s"codes diverged for $v")
    }
    // and the exploded (tbl, code) relation matches the crossJoin +
    // groupBy spelling wideBandNeardup uses (the q135 oracle's shape)
    val planesDf = (for { t <- 0 until lTables; b <- 0 until bBits }
      yield (t, b, planes(t)(b).toSeq)).toDF("tbl", "bit", "plane")
    val e = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "v")
    val relational = e.crossJoin(broadcast(planesDf))
      .withColumn("proj", VectorOps.dot(col("v"), col("plane")))
      .groupBy(col("vec_id"), col("tbl"))
      .agg(sum(when(col("proj") > 0, expr("shiftleft(1, bit)"))
        .otherwise(0)).cast("long").as("code"))
    val inRow = e.select(col("vec_id"),
      posexplode(VectorOps.signBandCodes(col("v"),
        typedLit(packed.toSeq), bBits)).as(Seq("tbl", "code")))
    assert(inRow.exceptAll(relational).isEmpty &&
      relational.exceptAll(inRow).isEmpty,
      "in-row codes diverge from the relational spelling")
    val nul = Seq(Option.empty[Seq[Double]]).toDF("v")
      .select(VectorOps.signBandCodes(col("v"),
        typedLit(packed.toSeq), bBits)).collect()(0)
    assert(nul.isNullAt(0))
  }

  test("bloom contains: codegen path agrees with the kernel probe, " +
      "null propagates") {
    VectorOps.register(spark)
    val rnd = new scala.util.Random(23)
    val bits = new Array[Long]((1 << 12) >>> 6)
    val members = Array.fill(200)(rnd.nextLong())
    members.foreach(graft.plans.BloomContains.set(bits, 7, _))
    val keys = (members.toSeq ++ Seq.fill(800)(rnd.nextLong())).distinct
    val got = keys.toDF("k")
      .select(col("k"),
        VectorOps.bloomContains(col("k"), bits, 7).as("hit"))
      .as[(Long, Boolean)].collect().toMap
    keys.foreach { k =>
      assert(got(k) == graft.plans.BloomContains.probe(bits, 7, k),
        s"codegen/interpretted divergence for $k")
    }
    assert(members.forall(got(_)), "member keys must always probe true")
    val nul = Seq(Option.empty[java.lang.Long]).toDF("k")
      .select(VectorOps.bloomContains(col("k"), bits, 7)).collect()(0)
    assert(nul.isNullAt(0))
  }
}
