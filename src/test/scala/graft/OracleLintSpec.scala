package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
import graft.tools.OracleTypeLint

/** Gate for the r16 defect class: an oracle whose final SELECT exposes
  * a SUM-derived integer column without `CAST(... AS BIGINT)` returns
  * HUGEINT → Arrow decimal128(38,0) from DuckDB while Spark emits
  * int64, and the driver's type-aware hash goes red even though every
  * value matches (five rows shipped that way in round 16). The lint
  * statically taints SUM-derived aliases through the CTE chain; a
  * defect is a final output column that is tainted in the SQL AND
  * integral in the Spark schema (SUM over DOUBLE is double in both
  * engines — Spark's schema is the ground truth for which sums are
  * the integer kind).
  */
class OracleLintSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("lint flags the un-CAST r16 spelling (canary)") {
    val bad =
      """WITH e AS (SELECT src, SUM(w) AS wsum FROM edges GROUP BY src),
        |r AS (SELECT node, 150 // nn + (85 * wsum) // 100 AS rank
        |      FROM e JOIN nodes ON src = node CROSS JOIN nn)
        |SELECT node // 2 AS s_suppkey, rank AS rank_ppb FROM r""".stripMargin
    assert(OracleTypeLint.taintedOutputs(bad) == Set("rank_ppb"))
  }

  test("scanner survives '--' inside a literal and an apostrophe " +
      "inside a comment (the r17 phase-ordering classes)") {
    // a comment apostrophe must not flip the literal state (it hid
    // margin_u's taint when literals were masked before comments)...
    val commentQuote =
      """WITH e AS (SELECT k, SUM(w) AS s FROM t GROUP BY k)
        |-- r16's five red rows came from exactly this
        |SELECT k, s AS total FROM e""".stripMargin
    assert(OracleTypeLint.taintedOutputs(commentQuote) == Set("total"))
    // ...and a '--' inside a literal must not truncate the line and
    // hide the SUM that follows it
    val literalDashes =
      """WITH e AS (SELECT k, concat(k, '--', k), SUM(w) AS s
        |           FROM t GROUP BY k)
        |SELECT k, s AS total FROM e""".stripMargin
    assert(OracleTypeLint.taintedOutputs(literalDashes) == Set("total"))
  }

  test("lint accepts the CAST fix (canary)") {
    val good =
      """WITH e AS (SELECT src, SUM(w) AS wsum FROM edges GROUP BY src),
        |r AS (SELECT node, 150 // nn + (85 * wsum) // 100 AS rank
        |      FROM e JOIN nodes ON src = node CROSS JOIN nn)
        |SELECT node // 2 AS s_suppkey,
        |  CAST(rank AS BIGINT) AS rank_ppb FROM r""".stripMargin
    assert(OracleTypeLint.taintedOutputs(good).isEmpty)
  }

  test("taint propagates through pass-through subqueries (canary)") {
    val bad =
      """WITH m AS (SELECT k, SUM(v) AS margin FROM t GROUP BY k),
        |f AS (SELECT k, margin FROM (
        |  SELECT k, margin, ROW_NUMBER() OVER (ORDER BY margin) AS r
        |  FROM m) t WHERE r = 1)
        |SELECT k, margin FROM f""".stripMargin
    assert(OracleTypeLint.taintedOutputs(bad) == Set("margin"))
  }

  test("lint flags all four REAL r16 oracles when their CAST is reverted") {
    // Durable revert-simulation: strip exactly the CASTs round 17
    // added; the lint must rediscover each of the five red driver
    // rows (q188b shares q188's tail).
    val q208 = operators.Graph.q208SupplierPagerank.oracle.get
      .replace("CAST(rank AS BIGINT) AS rank_ppb", "rank AS rank_ppb")
    assert(OracleTypeLint.taintedOutputs(q208).contains("rank_ppb"))
    val q212 = operators.Graph.q212TrustRank.oracle.get
      .replace("CAST(rank AS BIGINT) AS trust_ppb",
        "rank AS trust_ppb")
    assert(OracleTypeLint.taintedOutputs(q212).contains("trust_ppb"))
    val q209 = operators.Sampling.q209PpsSample.oracle.get
    val q209r = q209.replaceAll(
      "(?s)CAST\\((\\(cum \\+ nt\\) // stride - cum // stride) AS BIGINT\\)\\s+AS hits",
      "$1 AS hits")
    assert(q209r != q209, "revert substitution must hit")
    assert(OracleTypeLint.taintedOutputs(q209r).contains("hits"))
    val q188 = operators.Bitext.q188BitextMargin.oracle.get
    val q188r = q188.replaceAll(
      "(?s)CAST\\(\\((\\d+ \\* p\\.ucos \\* 1000000\\) // \\(kx\\.sfwd \\+ ky\\.sbwd\\))\\s+AS BIGINT\\) AS margin_u",
      "($1 AS margin_u")
    assert(q188r != q188, "revert substitution must hit")
    assert(OracleTypeLint.taintedOutputs(q188r).contains("margin_u"))
  }

  test("no catalog oracle exposes an un-CAST integer-SUM output") {
    val violations = SparkEntry.defs.flatMap { d =>
      d.oracle.toSeq.flatMap { sql =>
        val integral = d.build(spark, dir).schema.fields.collect {
          case f if Set[Any](LongType, IntegerType, ShortType, ByteType)
            .contains(f.dataType) => f.name.toLowerCase
        }.toSet
        (OracleTypeLint.taintedOutputs(sql) & integral)
          .map(c => s"${d.name}.$c")
      }
    }
    assert(violations.isEmpty,
      s"HUGEINT-tainted integer outputs (add CAST(... AS BIGINT) in " +
        s"the oracle's final SELECT): ${violations.mkString(", ")}")
  }
}
