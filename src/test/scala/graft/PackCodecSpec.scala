package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The [[graft.plans.PackStr8]] codec contract (r21): exact round-trip
  * on its checked domain (≤ 8 UTF-8 bytes, no NUL), loud rejection off
  * it, and the REASON it exists — a `min_by` whose value and ordering
  * are both primitive keeps the aggregation on HashAggregate, while
  * the struct/string-buffer spelling it replaced demoted the pair to
  * SortAggregate (a full sort of every input row per side).
  */
class PackCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  import graft.plans.PackStr8
  import org.apache.spark.unsafe.types.UTF8String

  test("round-trip is exact on the domain (≤8 UTF-8 bytes, no NUL) — " +
      "including the empty string and multi-byte UTF-8") {
    val samples = Seq("", "e", "en", "eng", "en-GB98", "zh-Hant",
      "abcdefgh", "é", "日本", "ÿ", "a b c d", "EN", "pt-BR")
    samples.foreach { s =>
      assert(UTF8String.fromString(s).getBytes.length <= 8, s)
      assert(PackStr8.unpack(
        PackStr8.pack(UTF8String.fromString(s))).toString == s, s)
    }
    // exhaustive over all 1–2 char ASCII-printable strings
    val ascii = (0x21 to 0x7e).map(_.toChar)
    for (a <- ascii; b <- Seq("", "z")) {
      val s = a.toString + b
      assert(PackStr8.unpack(
        PackStr8.pack(UTF8String.fromString(s))).toString == s, s)
    }
  }

  test("off-domain inputs throw loudly instead of truncating") {
    intercept[IllegalArgumentException] {
      PackStr8.pack(UTF8String.fromString("ninebytes"))
    }
    intercept[IllegalArgumentException] {
      PackStr8.pack(UTF8String.fromString("日本語")) // 9 UTF-8 bytes
    }
    intercept[IllegalArgumentException] {
      PackStr8.pack(UTF8String.fromString("a\u0000b")) // embedded NUL
    }
  }

  test("distinct domain values pack to distinct longs (injectivity on " +
      "a BCP-47-shaped vocabulary)") {
    val langs = for {
      a <- ('a' to 'z').map(_.toString)
      b <- Seq("a", "bc", "def", "ghij", "-Hant")
    } yield a + b
    val packed = langs.map(s => PackStr8.pack(UTF8String.fromString(s)))
    assert(packed.distinct.size == langs.size)
  }

  test("a packed-payload min_by plans as HashAggregate — the codec's " +
      "whole purpose (string-valued min_by is SortAggregate)") {
    import spark.implicits._
    val df = Seq((1L, "en", 10L), (1L, "de", 3L), (2L, "fr", 7L))
      .toDF("k", "lang", "ord")
    val packedPlan = df.groupBy($"k")
      .agg(graft.functions.VectorOps.unpackStr8(
        min_by(graft.functions.VectorOps.packStr8($"lang"), $"ord"))
        .as("lang"))
    val p = packedPlan.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate") && !p.contains("SortAggregate"),
      p.take(600))
    // and the values survive the trip through the aggregate
    val got = packedPlan.collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "de", 2L -> "fr"))
    // null payloads ride through like the struct spelling's null field
    val withNull = Seq((1L, null.asInstanceOf[String], 1L),
      (1L, "en", 5L)).toDF("k", "lang", "ord")
      .groupBy($"k")
      .agg(graft.functions.VectorOps.unpackStr8(
        min_by(graft.functions.VectorOps.packStr8($"lang"), $"ord"))
        .as("lang"))
      .collect()
    assert(withNull.head.isNullAt(1))
    // control: the same aggregate with the RAW string payload is the
    // SortAggregate trap the codec avoids
    val raw = df.groupBy($"k").agg(min_by($"lang", $"ord").as("lang"))
      .queryExecution.executedPlan.toString
    assert(raw.contains("SortAggregate"),
      "planner stopped demoting string min_by — revisit whether the " +
        "codec is still needed: " + raw.take(600))
  }

  test("q20's packed decimal (ts, id) order is monotone-isomorphic to " +
      "the struct order (negative ts included, ids nonnegative)") {
    val pairs = Seq((-5L, 0L), (-5L, 7L), (-1L, Long.MaxValue), (0L, 0L),
      (0L, 1L), (3L, 2L), (3L, 9L), (Long.MaxValue, Long.MaxValue),
      (Long.MinValue, 0L))
    def pack(ems: Long, eid: Long): BigDecimal =
      BigDecimal(ems) * BigDecimal(2).pow(63) + BigDecimal(eid)
    val sortedStruct = pairs.sorted
    val sortedPacked = pairs.sortBy { case (a, b) => pack(a, b) }
    assert(sortedStruct == sortedPacked)
    // and the packed magnitude always fits Decimal(38,0)
    pairs.foreach { case (a, b) =>
      assert(pack(a, b).abs < BigDecimal(10).pow(38))
    }
  }
}
