package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Subquery / grouping-set shapes beyond the reference's surface —
  * cube, correlated-aggregate comparison (decorrelated to a join), and
  * the TPC-H Q4 existence-aggregation pattern.
  */
object Subqueries {

  // CUBE over (region, mktsegment): all 2^2 grouping combinations.
  val q38Cube: QueryDef = QueryDef(
    "q38_cube",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val n = broadcast(Tables.load(s, dir, "nation"))
      val r = broadcast(Tables.load(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .cube(col("r_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("rname"),
          coalesce(col("c_mktsegment"), lit("ALL")).as("seg"),
          col("n"))
        .orderBy("rname", "seg")
    },
    Some("""SELECT coalesce(r_name, 'ALL') AS rname,
           |       coalesce(c_mktsegment, 'ALL') AS seg,
           |       COUNT(*) AS n
           |FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY CUBE(r_name, c_mktsegment)
           |ORDER BY rname, seg""".stripMargin))

  // Correlated-aggregate comparison, decorrelated Spark-style: orders
  // priced strictly above their customer's average order value. The
  // average is exact (decimal sum / count → double), identical in both
  // engines regardless of partition order.
  val q39Correlated: QueryDef = QueryDef(
    "q39_above_avg",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val avg = o.groupBy(col("o_custkey").as("k"))
        .agg((sum(col("o_totalprice").cast(DecimalType(12, 2)))
          .cast(DoubleType) / count(lit(1))).as("avg_price"))
      o.join(avg, o("o_custkey") === avg("k"))
        .filter(col("o_totalprice") > col("avg_price"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("avg_price").as("cust_avg"))
        .orderBy("o_orderkey")
    },
    Some("""WITH a AS (
           |  SELECT o_custkey AS k,
           |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
           |      / COUNT(*) AS avg_price
           |  FROM orders GROUP BY o_custkey)
           |SELECT o_orderkey, o_custkey, o_totalprice,
           |       avg_price AS cust_avg
           |FROM orders JOIN a ON o_custkey = a.k
           |WHERE o_totalprice > avg_price
           |ORDER BY o_orderkey""".stripMargin))

  // TPC-H Q4 shape: order-priority counts for orders having at least
  // one late lineitem — existence via left_semi, then aggregate. The
  // existence side pre-distincts its key: the partial (map-side)
  // distinct shrinks what crosses the wire BEFORE the join strategy is
  // chosen — a smaller broadcast build here, a smaller shuffle when
  // the side outgrows broadcast at real scale. Semi-join semantics are
  // unchanged (existence only needs the key set).
  val q40ExistsAgg: QueryDef = QueryDef(
    "q40_exists_agg",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      // no .distinct() before the semi join: LEFT SEMI dedups by
      // construction, and dropping the aggregate removes a full
      // exchange of the filtered fact keys. shuffle_hash pins the join
      // off the broadcast path: the build side is a FILTERED FACT
      // column (~half of lineitem), so the planner's low post-filter
      // size estimate would otherwise collect hundreds of thousands of
      // keys to the driver and hash-build them serially — measured as
      // q40's dominant wall term locally, and the r7 broadcast-flip OOM
      // class at 100 TB. Co-partitioned hash build is parallel at every
      // scale.
      val late = li.filter(col("l_shipdate") >
        lit("1996-06-01 00:00:00").cast(TimestampType))
        .select(col("l_orderkey")).hint("shuffle_hash")
      o.join(late, o("o_orderkey") === late("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
           |FROM orders o
           |WHERE EXISTS (
           |  SELECT 1 FROM lineitem l
           |  WHERE l.l_orderkey = o.o_orderkey
           |    AND l.l_shipdate > TIMESTAMP '1996-06-01 00:00:00')
           |GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin),
    bench = true, lowLatency = true)

  // Per-group top-k via the bounded typed Aggregator — same result
  // contract (and oracle) as the window formulation in q16, but with an
  // O(k) per-group buffer through partial aggregation instead of a full
  // per-partition sort.
  val q42TopkAgg: QueryDef = QueryDef(
    "q42_topk_agg",
    (s, dir) => {
      import s.implicits._
      val topk = new graft.functions.TopKAggregator(3).toColumn
      Tables.load(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(v => (v._2, v._3))
        .agg(topk.name("top"))
        .toDF("c_mktsegment", "top")
        .select(col("c_mktsegment"),
          posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("c_mktsegment"), (col("pos") + 1).as("rnk"),
          col("e._2").as("c_custkey"), col("e._1").as("c_acctbal"))
        .orderBy("c_mktsegment", "rnk")
    },
    Some("""SELECT c_mktsegment, rnk, c_custkey, c_acctbal FROM (
           |  SELECT c_mktsegment, c_custkey, c_acctbal,
           |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
           |      ORDER BY c_acctbal DESC, c_custkey) AS rnk
           |  FROM customer) sub
           |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin))

  // Explicit GROUPING SETS (completes rollup/cube — the asymmetric
  // combination neither expresses): totals per region, per segment,
  // and grand total, but NOT per (region, segment). DataFrame API has
  // rollup/cube only, so this goes through Spark SQL — same Catalyst
  // Expand operator underneath.
  val q53GroupingSets: QueryDef = QueryDef(
    "q53_grouping_sets",
    (s, dir) => {
      Tables.load(s, dir, "customer").createOrReplaceTempView("gs_customer")
      broadcast(Tables.load(s, dir, "nation"))
        .createOrReplaceTempView("gs_nation")
      broadcast(Tables.load(s, dir, "region"))
        .createOrReplaceTempView("gs_region")
      s.sql("""SELECT coalesce(r_name, 'ALL') AS rname,
              |       coalesce(c_mktsegment, 'ALL') AS seg,
              |       COUNT(*) AS n
              |FROM gs_customer
              |JOIN gs_nation ON c_nationkey = n_nationkey
              |JOIN gs_region ON n_regionkey = r_regionkey
              |GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
              |ORDER BY rname, seg""".stripMargin)
    },
    Some("""SELECT coalesce(r_name, 'ALL') AS rname,
           |       coalesce(c_mktsegment, 'ALL') AS seg,
           |       COUNT(*) AS n
           |FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
           |ORDER BY rname, seg""".stripMargin))

  // Multiset set-ops (ALL variants keep duplicates — Spark exceptAll /
  // intersectAll, U2's bag semantics): order priorities as a bag, minus
  // one occurrence per urgent order, intersected with the
  // finished-orders bag. Aggregated to counts for a compact deterministic result.
  val q54SetOpsAll: QueryDef = QueryDef(
    "q54_setops_all",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val all = o.select(col("o_orderpriority").as("p"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderpriority").as("p"))
      val exceptBag = all.exceptAll(urgent)
      val interBag = all.intersectAll(
        o.filter(col("o_orderstatus") === "F")
          .select(col("o_orderpriority").as("p")))
      exceptBag.groupBy(col("p")).agg(count(lit(1)).as("n_except"))
        .join(interBag.groupBy(col("p"))
          .agg(count(lit(1)).as("n_intersect")), Seq("p"), "full_outer")
        .select(col("p"),
          coalesce(col("n_except"), lit(0L)).as("n_except"),
          coalesce(col("n_intersect"), lit(0L)).as("n_intersect"))
        .orderBy("p")
    },
    Some("""WITH ebag AS (
           |  SELECT o_orderpriority AS p FROM orders
           |  EXCEPT ALL
           |  SELECT o_orderpriority FROM orders
           |  WHERE o_orderpriority = '1-URGENT'),
           |ibag AS (
           |  SELECT o_orderpriority AS p FROM orders
           |  INTERSECT ALL
           |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'),
           |e AS (SELECT p, COUNT(*) AS n_except FROM ebag GROUP BY p),
           |i AS (SELECT p, COUNT(*) AS n_intersect FROM ibag GROUP BY p)
           |SELECT coalesce(e.p, i.p) AS p,
           |  coalesce(n_except, 0) AS n_except,
           |  coalesce(n_intersect, 0) AS n_intersect
           |FROM e FULL OUTER JOIN i ON e.p = i.p
           |ORDER BY p""".stripMargin))

  // TPC-H Q14 shape (promo revenue share): fact-to-part join with a
  // conditional aggregate. The part side is far wider than lineitem
  // needs — the plan must prune to (p_partkey, p_type) and broadcast it
  // once part exceeds the fact side's memory at scale Catalyst falls
  // back to SMJ on the same plan. Decimal partials → exact.
  val q55PromoShare: QueryDef = QueryDef(
    "q55_promo_share",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val p = broadcast(Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_type")))
      val rev = (col("l_extendedprice").cast(DecimalType(12, 2)) *
        (lit(1.0) - col("l_discount")).cast(DecimalType(8, 2)))
      li.join(p, li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_type"))
        .agg(sum(rev).as("revenue_d"), count(lit(1)).as("n"))
        .select(col("p_type"),
          col("revenue_d").cast(DoubleType).as("revenue"), col("n"))
        .orderBy("p_type")
    },
    Some("""SELECT p_type,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
           |           CAST(1.0 - l_discount AS DECIMAL(8,2))) AS DOUBLE)
           |    AS revenue,
           |  COUNT(*) AS n
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY p_type ORDER BY p_type""".stripMargin))

  val all: Seq[QueryDef] = Seq(q38Cube, q39Correlated, q40ExistsAgg,
    q42TopkAgg, q53GroupingSets, q54SetOpsAll, q55PromoShare)
}
