package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Relational operator surface (SURVEY.md §2.1–§2.8, §2.11 Q1–Q12).
  *
  * Re-expresses the reference's dataflow stages as declarative Spark plans:
  * range-predicate chunk scans (reference `chunk.go:73-94`), MIN/MAX chunk
  * planning (`chunk.go:152-185`), COUNT validation (`validate.go:34-98`),
  * catalog equi-joins (`source_mysql.go:351-362`), anti-join orphan
  * detection (`post.go:482-538`), group-by assembly
  * (`source_mysql.go:277-334`), UNION ALL batching
  * (`source_sqlite.go:296-312`), deterministic ordering
  * (`source_mysql.go:186,220`), plus the window/top-k/rollup surface the
  * Spark build exposes beyond the reference.
  *
  * Determinism conventions (shared with the DuckDB oracles):
  *  - double aggregation goes through exact DECIMAL casts and back to
  *    DOUBLE, so results are bit-identical regardless of partition order;
  *  - timestamps are emitted as formatted strings (events.ts is ns-precision
  *    parquet; Spark truncates to µs, DuckDB keeps ns);
  *  - every query ends in a total ORDER BY.
  */
object Relational {

  /** Exact decimal image of a ≤2-dp double (prices, discounts, values). */
  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Event-time as epoch millis — the finest granularity on which the
    * Spark (µs) and DuckDB (ns) readings of the ns parquet column agree.
    */
  private def eventMs(c: Column): Column = unix_millis(c)

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // P1/P2/O1: projection + range predicate, pushed to the parquet scan.
  val q01ScanFilter: QueryDef = QueryDef(
    "q01_scan_filter",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") >= 100 && col("l_orderkey") < 200)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
          "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
           |       l_extendedprice
           |FROM lineitem
           |WHERE l_orderkey >= 100 AND l_orderkey < 200
           |ORDER BY l_orderkey, l_linenumber""".stripMargin),
    bench = true, lowLatency = true)

  // A1: chunk-planning MIN/MAX aggregate (reference chunk.go:152-185).
  val q02ChunkMinmax: QueryDef = QueryDef(
    "q02_chunk_minmax",
    (s, dir) =>
      t(s, dir, "orders").agg(
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        count(lit(1)).as("cnt")),
    Some("SELECT MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key, " +
      "COUNT(*) AS cnt FROM orders"))

  // A2/U1: per-table COUNT(*) validation union (validate.go:87-98).
  val q03RowCounts: QueryDef = QueryDef(
    "q03_row_counts",
    (s, dir) =>
      Tables.names
        .map(n => t(s, dir, n).agg(count(lit(1)).as("cnt"))
          .select(lit(n).as("tbl"), col("cnt")))
        .reduce(_ union _)
        .orderBy("tbl"),
    Some(Tables.names
      .map(n => s"SELECT '$n' AS tbl, COUNT(*) AS cnt FROM $n")
      .mkString("", " UNION ALL ", " ORDER BY tbl")))

  // J1/J2: multi-way equi-join (catalog-join shape, source_mssql.go:209-234)
  // with broadcast dimension tables — nation/region stay tiny at any scale.
  val q04Join3: QueryDef = QueryDef(
    "q04_join3",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .select("c_custkey", "c_name", "n_name", "r_name")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, n_name, r_name
           |FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |ORDER BY c_custkey""".stripMargin),
    bench = true, lowLatency = true)

  // J3/P4: anti-join — the reference's orphan detection NOT EXISTS
  // (post.go:514-515) over a filtered parent set.
  val q05AntiJoin: QueryDef = QueryDef(
    "q05_anti_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >=
          lit("2000-01-01 00:00:00").cast(TimestampType))
      c.join(recent, c("c_custkey") === recent("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer c
           |WHERE NOT EXISTS (
           |  SELECT 1 FROM orders o
           |  WHERE o.o_custkey = c.c_custkey
           |    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
           |ORDER BY c_custkey""".stripMargin),
    bench = true, lowLatency = true)

  // J4: semi-join — retained-row side of orphan cleanup (post.go:482-538).
  val q06SemiJoin: QueryDef = QueryDef(
    "q06_semi_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer c
           |WHERE EXISTS (
           |  SELECT 1 FROM orders o
           |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
           |ORDER BY c_custkey""".stripMargin))

  // A4 + partial/final agg: TPC-H Q1 shape (SURVEY §2.11 #7). All money
  // math in exact decimals; averages derived from exact sums in double.
  val q07GroupAgg: QueryDef = QueryDef(
    "q07_group_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") <=
          lit("1998-09-02 00:00:00").cast(TimestampType))
      val discF = (lit(1.0) - col("l_discount")).cast(DecimalType(8, 2))
      val taxF = (lit(1.0) + col("l_tax")).cast(DecimalType(8, 2))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2(col("l_quantity"))).as("dq"),
          sum(dec2(col("l_extendedprice"))).as("db"),
          sum(dec2(col("l_extendedprice")) * discF).as("dd"),
          sum(dec2(col("l_extendedprice")) * discF * taxF).as("dc"),
          sum(dec2(col("l_discount"))).as("ddisc"),
          count(lit(1)).as("count_order"))
        .select(
          col("l_returnflag"), col("l_linestatus"),
          col("dq").cast(DoubleType).as("sum_qty"),
          col("db").cast(DoubleType).as("sum_base_price"),
          col("dd").cast(DoubleType).as("sum_disc_price"),
          col("dc").cast(DoubleType).as("sum_charge"),
          (col("dq").cast(DoubleType) / col("count_order")).as("avg_qty"),
          (col("db").cast(DoubleType) / col("count_order")).as("avg_price"),
          (col("ddisc").cast(DoubleType) / col("count_order")).as("avg_disc"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sum_disc_price,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(8,2)) * CAST(1.0 + l_tax AS DECIMAL(8,2))) AS DOUBLE) AS sum_charge,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           |  COUNT(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    bench = true, lowLatency = true)

  // A5: DISTINCT (ddl.go:117-128 value-set dedup analog).
  val q08Distinct: QueryDef = QueryDef(
    "q08_distinct",
    (s, dir) =>
      t(s, dir, "orders").select("o_orderpriority").distinct()
        .orderBy("o_orderpriority"),
    Some("SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority"))

  // U1: UNION ALL (source_sqlite.go:296-312 compound-select batching).
  val q09Union: QueryDef = QueryDef(
    "q09_union",
    (s, dir) =>
      t(s, dir, "customer").select(col("c_custkey").as("k"))
        .union(t(s, dir, "supplier").select(col("s_suppkey").as("k")))
        .orderBy("k"),
    Some("""SELECT c_custkey AS k FROM customer
           |UNION ALL SELECT s_suppkey AS k FROM supplier
           |ORDER BY k""".stripMargin))

  // U2: INTERSECT / EXCEPT (checkpoint_compat.go:302-332 key-set diff).
  val q09bIntersect: QueryDef = QueryDef(
    "q09b_intersect",
    (s, dir) =>
      t(s, dir, "nation").select(col("n_nationkey").as("k"))
        .intersect(t(s, dir, "region").select(col("r_regionkey").as("k")))
        .orderBy("k"),
    Some("""SELECT n_nationkey AS k FROM nation
           |INTERSECT SELECT r_regionkey AS k FROM region
           |ORDER BY k""".stripMargin))

  val q09cExcept: QueryDef = QueryDef(
    "q09c_except",
    (s, dir) =>
      t(s, dir, "nation").select(col("n_nationkey").as("k"))
        .except(t(s, dir, "region").select(col("r_regionkey").as("k")))
        .orderBy("k"),
    Some("""SELECT n_nationkey AS k FROM nation
           |EXCEPT SELECT r_regionkey AS k FROM region
           |ORDER BY k""".stripMargin))

  // F4/F5-family scalar transform pipeline (TransformValue analog,
  // migrate.go:459-466) — codegen'd column expressions, no UDFs.
  val q10Scalar: QueryDef = QueryDef(
    "q10_scalar",
    (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        upper(col("lang")).as("lang_u"),
        substring(lower(trim(col("text"))), 1, 24).as("head"),
        expr("replace(source, 'src', 's_')").as("src"),
        length(col("text")).as("n"),
        concat(col("lang"), lit("_"), col("source")).as("tag"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, upper(lang) AS lang_u,
           |  substring(lower(trim(text)), 1, 24) AS head,
           |  replace(source, 'src', 's_') AS src,
           |  length(text) AS n,
           |  concat(lang, '_', source) AS tag
           |FROM documents ORDER BY doc_id""".stripMargin))

  // §2.8: window top-k per key (latest-3 events per user).
  val q11WindowTopk: QueryDef = QueryDef(
    "q11_window_topk",
    (s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(eventMs(col("ts")).desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("user_id", "event_id", "rn")
        .orderBy("user_id", "rn")
    },
    Some("""SELECT user_id, event_id, rn FROM (
           |  SELECT user_id, event_id,
           |    ROW_NUMBER() OVER (PARTITION BY user_id
           |      ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)) DESC,
           |               event_id DESC) AS rn
           |  FROM events) sub
           |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin),
    bench = true, lowLatency = true)

  // O-family: global sort + limit (top-k via TakeOrderedAndProject).
  val q12SortLimit: QueryDef = QueryDef(
    "q12_sort_limit",
    (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
    bench = true, lowLatency = true)

  // §2.8: running aggregate window (exact decimal running sum).
  val q13WindowRunning: QueryDef = QueryDef(
    "q13_window_running",
    (s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(eventMs(col("ts")), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("running", sum(dec2(col("value"))).over(w)
          .cast(DoubleType))
        .select("user_id", "event_id", "running")
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id,
           |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
           |    PARTITION BY user_id
           |    ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_id
           |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running
           |FROM events ORDER BY user_id, event_id""".stripMargin))

  // §2.11 #16: tumbling-window aggregation, batch-checkable.
  val q14Tumbling: QueryDef = QueryDef(
    "q14_tumbling",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("hour_w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast(DoubleType).as("total"))
        .orderBy("hour_w", "event_type"),
    Some("""SELECT
           |  strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
           |           '%Y-%m-%d %H:%M:%S') AS hour_w,
           |  event_type, COUNT(*) AS n,
           |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
           |FROM events GROUP BY 1, 2 ORDER BY hour_w, event_type""".stripMargin),
    bench = true, lowLatency = true)

  // Rollup / grouping sets (free via Catalyst; not in reference §2.4).
  val q15Rollup: QueryDef = QueryDef(
    "q15_rollup",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("rname"),
          coalesce(col("n_name"), lit("ALL")).as("nname"),
          col("n"))
        .orderBy("rname", "nname")
    },
    Some("""SELECT coalesce(r_name, 'ALL') AS rname,
           |       coalesce(n_name, 'ALL') AS nname,
           |       COUNT(*) AS n
           |FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY ROLLUP(r_name, n_name)
           |ORDER BY rname, nname""".stripMargin))

  // Window rank per group over raw doubles (no arithmetic → exact).
  val q16TopkPerGroup: QueryDef = QueryDef(
    "q16_topk_per_group",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("c_mktsegment", "rnk", "c_custkey", "c_acctbal")
        .orderBy("c_mktsegment", "rnk")
    },
    Some("""SELECT c_mktsegment, rnk, c_custkey, c_acctbal FROM (
           |  SELECT c_mktsegment, c_custkey, c_acctbal,
           |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
           |      ORDER BY c_acctbal DESC, c_custkey) AS rnk
           |  FROM customer) sub
           |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin))

  // Fact-to-dim star join + aggregation (TPC-H Q5 shape). The fact table
  // is pre-aggregated to one row per order key BEFORE the join — Spark
  // doesn't push partial aggregates through joins, so doing it in the
  // plan shrinks the join input from |lineitem| to |orders| rows (the
  // decisive reduction at 100 TB, where neither side broadcasts).
  // Decimal partial sums re-aggregate exactly, so results are identical
  // to the join-then-aggregate formulation the oracle uses.
  val q17JoinAgg: QueryDef = QueryDef(
    "q17_join_agg",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val n = broadcast(t(s, dir, "nation"))
      // Money arithmetic in integer units (cents × discount-percent,
      // exact at 4 decimal places): a DECIMAL(12,2)×DECIMAL(8,2) sum
      // needs precision 22 — past Spark's compact-Long decimal range, so
      // every row would accumulate through heap BigDecimals. Longs keep
      // the 600k-row pre-aggregation inside codegen'd primitive ops and
      // stay order-insensitive (exact), which the oracle hash requires.
      val cents = floor(col("l_extendedprice") * 100 + 0.5).cast(LongType)
      val pct = floor((lit(1.0) - col("l_discount")) * 100 + 0.5)
        .cast(LongType)
      val perOrder = li.groupBy(col("l_orderkey"))
        .agg(sum(cents * pct).as("orev"), count(lit(1)).as("on"))
      // nation-level re-sum in DECIMAL(38,0): per-order longs are exact,
      // and the wide-decimal path only touches the 150k pre-aggregated
      // rows (25 output groups), not the raw fact table. A pure-long
      // grand total would overflow around 10^19 cents·pct at the 100 TB
      // scale target.
      // aggregate on the INT nation key and look the name up on the
      // 25-row aggregate afterwards: the wide pre-join rows carry a
      // 4-byte key instead of a string through the hot hash-aggregate,
      // and the name join touches |nation| × |groups| rows — free at
      // any scale (nationkey → n_name is nation's primary key, so the
      // regrouping is 1:1 with the n_name formulation the oracle uses)
      // orders joins the per-order partials co-partitioned
      // (shuffle_hash): both sides are order-cardinality FACT relations,
      // and the planner's size estimate would otherwise collect all of
      // orders to the driver for a broadcast build — serial driver wall
      // locally, the r7 broadcast-flip OOM class at 100 TB
      perOrder.join(o.hint("shuffle_hash"),
          col("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(c("c_nationkey"))
        .agg(sum(col("orev").cast(DecimalType(38, 0))).as("drev"),
          sum(col("on")).as("n"))
        .join(n, col("c_nationkey") === n("n_nationkey"))
        .select(col("n_name"),
          (col("drev").cast(DoubleType) / 10000.0).as("revenue"), col("n"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name,
           |  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
           |           CAST(floor((1.0 - l_discount) * 100 + 0.5) AS BIGINT))
           |       AS DOUBLE) / 10000.0 AS revenue,
           |  COUNT(*) AS n
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY n_name ORDER BY n_name""".stripMargin),
    bench = true, lowLatency = true)

  // F-json analog: extract typed value from the JSON props column via
  // regexp (identical semantics in both engines).
  val q18Json: QueryDef = QueryDef(
    "q18_json_extract",
    (s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
          .cast(IntegerType).as("k"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
           |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k
           |FROM events ORDER BY event_id""".stripMargin))

  // F7 analog: string → array ops (SET → text[] mapping shape,
  // source_mysql.go:718-733).
  val q19Array: QueryDef = QueryDef(
    "q19_array",
    (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        size(array_distinct(split(lower(col("text")), " "))).as("n_uniq"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
           |  len(string_split(text, ' ')) AS n_tokens,
           |  len(list_distinct(string_split(lower(text), ' '))) AS n_uniq
           |FROM documents ORDER BY doc_id""".stripMargin))

  // Conditional-aggregation pivot: per-user activity matrix over the
  // event-type domain (Spark `pivot` with explicit values ≡ the oracle's
  // SUM(CASE) columns — same plan shape Catalyst lowers pivot to).
  val q36Pivot: QueryDef = QueryDef(
    "q36_pivot",
    (s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .count()
      types.foldLeft(p)((df, ty) =>
        df.withColumn(ty, coalesce(col(ty), lit(0L))))
        .orderBy("user_id")
    },
    // COUNT(*) FILTER keeps the oracle columns BIGINT — DuckDB SUM(int)
    // yields HUGEINT → decimal128 via Arrow → hash mismatch vs int64.
    Some("""SELECT user_id,
           |  COUNT(*) FILTER (event_type = 'click') AS click,
           |  COUNT(*) FILTER (event_type = 'error') AS error,
           |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           |  COUNT(*) FILTER (event_type = 'signup') AS signup,
           |  COUNT(*) FILTER (event_type = 'view') AS view
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  // SURVEY §2.11 #5 verbatim: events whose user_id has no matching
  // customer, with the MATCH SIMPLE null guard (P3). The fixture has no
  // orphan users, so the correct answer is the empty set — the hash
  // compare still verifies schema + emptiness against the oracle.
  val q46OrphanEvents: QueryDef = QueryDef(
    "q46_orphan_events",
    (s, dir) => {
      val e = t(s, dir, "events").filter(col("user_id").isNotNull)
      val c = t(s, dir, "customer")
      e.join(c, e("user_id") === c("c_custkey"), "left_anti")
        .select("event_id")
        .orderBy("event_id")
    },
    Some("""SELECT e.event_id FROM events e
           |WHERE e.user_id IS NOT NULL
           |  AND NOT EXISTS (SELECT 1 FROM customer c
           |                  WHERE c.c_custkey = e.user_id)
           |ORDER BY e.event_id""".stripMargin))

  // q46's anti-join with a NON-EMPTY answer (VERDICT r10 item 6): the
  // driver fixture has no true orphans, so q46 proves the empty set;
  // here the customer side is deterministically thinned (c_custkey % 7
  // <> 3 — same predicate in both engines) so ~1/7 of referenced users
  // become orphans and the events-scale anti-join's non-empty path is
  // oracle-checked too. Plan shape identical to q46: broadcast-able
  // filtered build side, streamed fact side, no pre-distinct.
  val q46bOrphanEventsNonEmpty: QueryDef = QueryDef(
    "q46b_orphan_events_nonempty",
    (s, dir) => {
      val e = t(s, dir, "events").filter(col("user_id").isNotNull)
      val c = t(s, dir, "customer").filter(col("c_custkey") % 7 =!= 3)
      e.join(c, e("user_id") === c("c_custkey"), "left_anti")
        .select("event_id")
        .orderBy("event_id")
    },
    Some("""SELECT e.event_id FROM events e
           |WHERE e.user_id IS NOT NULL
           |  AND NOT EXISTS (SELECT 1 FROM customer c
           |                  WHERE c.c_custkey % 7 <> 3
           |                    AND c.c_custkey = e.user_id)
           |ORDER BY e.event_id""".stripMargin))

  // TPC-H Q3 shape: shipping-priority top-10 — segment-filtered
  // customer ⋈ date-filtered orders ⋈ late lineitem, revenue per order,
  // top 10 by revenue. Revenue in integer cents (see q17) so the
  // aggregate is exact and order-insensitive; the final top-10 is a
  // TakeOrderedAndProject (per-partition top-N + driver merge), never a
  // global sort. Customer broadcast; at 100 TB orders⋈lineitem is the
  // only keyed exchange pair.
  val q59ShipPriority: QueryDef = QueryDef(
    "q59_ship_priority",
    (s, dir) => {
      val cutoff = lit("1996-06-01 00:00:00").cast(TimestampType)
      val c = broadcast(t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey")))
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < cutoff)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > cutoff)
      val cents = floor(col("l_extendedprice") * 100 + 0.5).cast(LongType)
      val pct = floor((lit(1.0) - col("l_discount")) * 100 + 0.5)
        .cast(LongType)
      // join ORDER is part of the plan contract: the broadcast
      // customer filter applies to orders FIRST (a map-side semi — no
      // exchange), so the ~1/5 BUILDING fraction is gone before the
      // one wide exchange pair; joining li⋈o first (the naive TPC-H Q3
      // spelling) shuffles 5× more orders rows and aggregates 5× more
      // joined rows for identical output. The orders⋈lineitem pair
      // stays a co-partitioned exchange (shuffle_hash on the smaller,
      // date+segment-filtered orders side): both are facts, and the
      // planner's post-filter estimate would otherwise broadcast
      // orders via a serial driver collect — wrong at 100 TB (r7 OOM
      // class) and q59's dominant local wall term
      val oB = o.join(c, col("o_custkey") === col("c_custkey"))
      li.join(oB.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(cents * pct).as("rev_cp"))
        .select(col("o_orderkey"),
          (col("rev_cp").cast(DoubleType) / 10000.0).as("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some("""SELECT o_orderkey,
           |  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
           |           CAST(floor((1.0 - l_discount) * 100 + 0.5) AS BIGINT))
           |       AS DOUBLE) / 10000.0 AS revenue,
           |  strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS o_date
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |WHERE c_mktsegment = 'BUILDING'
           |  AND CAST(o_orderdate AS TIMESTAMP)
           |      < TIMESTAMP '1996-06-01 00:00:00'
           |  AND CAST(l_shipdate AS TIMESTAMP)
           |      > TIMESTAMP '1996-06-01 00:00:00'
           |GROUP BY o_orderkey, o_orderdate
           |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
    bench = true, lowLatency = true)

  // FULL OUTER reconciliation — the missing member of the join family
  // (inner/semi/anti/left are covered elsewhere): two independently
  // aggregated per-key relations compared side-by-side, rows classified
  // by which source knows the key. The aggregations reduce each side to
  // key cardinality BEFORE the join, so the full-outer exchange moves
  // one row per key, not one per fact — the reconciliation shape that
  // holds at any fact-table scale. Money sums go through DECIMAL(12,2)
  // (the q33-proven cast-parity idiom) and surface as doubles.
  val q81ReconOuter: QueryDef = QueryDef(
    "q81_recon_outer",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(12, 2)))
            .cast(DoubleType).as("orders_total"))
      val e = Tables.load(s, dir, "events")
        .groupBy(col("user_id").as("k2"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(12, 2)))
            .cast(DoubleType).as("events_total"))
      o.join(e, col("k") === col("k2"), "full_outer")
        .select(coalesce(col("k"), col("k2")).as("k"),
          when(col("k").isNull, "events_only")
            .when(col("k2").isNull, "orders_only")
            .otherwise("both").as("side"),
          col("n_orders"), col("orders_total"),
          col("n_events"), col("events_total"))
        .orderBy("k")
    },
    Some("""WITH o AS (
           |  SELECT o_custkey AS k, COUNT(*) AS n_orders,
           |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
           |      AS orders_total
           |  FROM orders GROUP BY 1),
           |e AS (
           |  SELECT user_id AS k, COUNT(*) AS n_events,
           |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
           |      AS events_total
           |  FROM events GROUP BY 1)
           |SELECT COALESCE(o.k, e.k) AS k,
           |  CASE WHEN o.k IS NULL THEN 'events_only'
           |       WHEN e.k IS NULL THEN 'orders_only'
           |       ELSE 'both' END AS side,
           |  o.n_orders, o.orders_total, e.n_events, e.events_total
           |FROM o FULL OUTER JOIN e ON o.k = e.k
           |ORDER BY k""".stripMargin))

  /** TPC-H Q13 shape: orders-per-customer distribution through a LEFT
    * OUTER join whose filter lives in the JOIN CONDITION (not WHERE —
    * moving it would silently drop the zero-order customers the query
    * exists to count). Two-level aggregate: per-customer count (keyed
    * exchange on custkey; the outer join itself co-partitions on the
    * same key so Catalyst reuses one exchange), then the tiny
    * distribution aggregate. The null-count semantics (COUNT(col)
    * skips the outer join's null-extended rows) are the whole
    * correctness story — a COUNT(*) here would be off by one for
    * every childless customer.
    */
  val q88CustOrderDist: QueryDef = QueryDef(
    "q88_cust_order_dist",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer").select("c_custkey")
      val o = Tables.load(s, dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderpriority")
      c.join(o, c("c_custkey") === o("o_custkey") &&
          o("o_orderpriority") =!= "1-URGENT", "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, COUNT(*) AS custdist FROM (
           |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
           |  FROM customer c LEFT OUTER JOIN orders o
           |    ON c.c_custkey = o.o_custkey
           |   AND o.o_orderpriority <> '1-URGENT'
           |  GROUP BY c.c_custkey)
           |GROUP BY c_count
           |ORDER BY custdist DESC, c_count DESC""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    q01ScanFilter, q02ChunkMinmax, q03RowCounts, q04Join3, q05AntiJoin,
    q06SemiJoin, q07GroupAgg, q08Distinct, q09Union, q09bIntersect,
    q09cExcept, q10Scalar, q11WindowTopk, q12SortLimit, q13WindowRunning,
    q14Tumbling, q15Rollup, q16TopkPerGroup, q17JoinAgg, q18Json, q19Array,
    q36Pivot, q46OrphanEvents, q46bOrphanEventsNonEmpty, q59ShipPriority,
    q81ReconOuter, q88CustOrderDist)
}
