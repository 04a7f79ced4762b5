package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distinct-cardinality sketching — the corpus-scale
  * "how many distinct n-grams does this slice have" question a
  * pretraining pipeline asks before sizing vocabularies, dedup
  * bands, or contamination indexes (the infini-gram accounting).
  *
  * The engine-internal HLL (q142) estimates well but its sketch bytes
  * are engine-private — only an error GATE can be oracle-checked.
  * KMV (k minimum values) is the complementary design point: the
  * sketch is the k smallest md5-derived 48-bit hash values, a pure
  * deterministic function of the data, so Spark and DuckDB compute
  * the IDENTICAL estimate and the driver hash-matches the estimate
  * itself. See [[graft.functions.KmvAggregator]] for the estimator
  * and the O(tasks·k)-per-group exchange argument.
  *
  * Reference anchor: the reference validates COUNT(*) parity per
  * table (validator.go's row-count checks); this is the same
  * validation posture extended to distinct cardinalities too large to
  * count exactly in one pass at 100 TB — the exact arm here is the
  * fixture-scale validation run (q142's discipline), the sketch arm
  * is the production path.
  */
object Sketches {

  /** Sketch size: k-th-min estimator with ~1/√(k−2) ≈ 6% std error. */
  val KmvK = 256

  /** Hash space: 48-bit prefixes of md5, so every arithmetic step
    * stays inside exact BIGINT range on both engines
    * ((k−1)·2⁴⁸ ≈ 7.2e16 < 2⁶³).
    */
  val HashBits = 48
  private val HashSpace = 1L << HashBits

  /** Word 3-shingles per (lang, doc) — the distinct-value domain.
    * Both engines spell the same windows: doc i covers words
    * (i, i+1, i+2) for i in [0, nt−3].
    */
  private[graft] def shingleRel(docs: DataFrame): DataFrame =
    docs.withColumn("w", split(lower(col("text")), " "))
      .filter(size(col("w")) >= 3)
      .select(col("lang"), explode(expr(
        "transform(sequence(1, size(w) - 2)," +
          " i -> concat_ws(' ', w[i-1], w[i], w[i+1]))")).as("sh"))

  private[graft] def shingles(s: SparkSession, dir: String): DataFrame =
    shingleRel(Tables.load(s, dir, "documents"))

  /** 48-bit hash: md5 hex prefix parsed as an integer — the
    * engine-portable hash convention (q166's md5-bucket features).
    */
  private def hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Per-lang KMV state from a (lang, sh) relation — the k smallest
    * distinct hashes as a `mins` array column. Works identically on a
    * batch or streaming input: the buffer is a pure set-minimum, so
    * ANY merge order (task topology, micro-batch arrival) yields the
    * same state.
    */
  private[graft] def kmvMins(g: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    val kmv = new graft.functions.KmvAggregator(KmvK)
    g.select(col("lang"), hash48(col("sh")).as("hv"))
      .as[(String, Long)](
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .groupByKey(_._1)(Encoders.STRING)
      .mapValues(_._2)(Encoders.scalaLong)
      .agg(kmv.toColumn)
      .toDF("lang", "mins")
  }

  /** Order-statistic estimate from a (lang, mins) state relation. */
  private[graft] def estimateFromMins(mins: DataFrame): DataFrame =
    mins.select(col("lang"),
      when(size(col("mins")) < KmvK,
        size(col("mins")).cast("long"))
        .otherwise(expr(s"${(KmvK - 1).toLong * HashSpace}L div " +
          s"greatest(element_at(mins, $KmvK), 1L)"))
        .as("kmv_est"))

  /** The production arm alone: per-lang KMV estimate from a
    * (lang, sh) relation — bounded O(k) aggregation state, no
    * value-keyed exchange. Factored out so the spec can measure its
    * wire volume against the exact arm's.
    */
  private[graft] def kmvEstimate(g: DataFrame): DataFrame =
    estimateFromMins(kmvMins(g))

  /** Exact-arm join + agreement gate shared by q219 (batch) and q224
    * (streaming state): one row per lang, deterministic order.
    */
  private[graft] def withExactArm(g: DataFrame,
      est: DataFrame): DataFrame =
    g.groupBy(col("lang"))
      .agg(countDistinct(col("sh")).as("exact_distinct"))
      .join(est, "lang")
      .select(col("lang"), col("exact_distinct"), col("kmv_est"),
        (abs(col("kmv_est") - col("exact_distinct")) * 5 <=
          col("exact_distinct")).as("sketch_ok"))
      .orderBy("lang")

  // One row per lang: exact distinct shingles (the validation arm —
  // a full distinct exchange, run at fixture scale only), the KMV
  // estimate (the production arm — bounded aggregation state, no
  // value-keyed exchange), and the ≤20% agreement gate. The estimate
  // column itself is deterministic and hash-matched.
  val q219KmvDistinct: QueryDef = QueryDef(
    "q219_kmv_distinct",
    (s, dir) => {
      val g = graft.Caches.persist(shingles(s, dir))
      withExactArm(g, kmvEstimate(g))
    },
    Some(s"""WITH d AS (
            |  SELECT lang, string_split(lower(text), ' ') AS w
            |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
            |g AS (
            |  SELECT lang, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
            |  FROM d CROSS JOIN unnest(range(1, len(w) - 1)) AS t(i)),
            |ex AS (SELECT lang, COUNT(DISTINCT sh) AS exact_distinct
            |       FROM g GROUP BY 1),
            |h AS (SELECT DISTINCT lang,
            |        CAST('0x' || substr(md5(sh), 1, 12) AS BIGINT) AS hv
            |      FROM g),
            |r AS (SELECT lang, hv, ROW_NUMBER() OVER (
            |        PARTITION BY lang ORDER BY hv) AS rk FROM h),
            |km AS (SELECT lang,
            |        CASE WHEN COUNT(*) < $KmvK THEN CAST(COUNT(*) AS BIGINT)
            |             ELSE ${(KmvK - 1).toLong * HashSpace} //
            |               GREATEST(MAX(CASE WHEN rk = $KmvK
            |                 THEN hv END), 1)
            |        END AS kmv_est
            |      FROM r WHERE rk <= $KmvK GROUP BY 1)
            |SELECT ex.lang, ex.exact_distinct, km.kmv_est,
            |  ABS(km.kmv_est - ex.exact_distinct) * 5 <=
            |    ex.exact_distinct AS sketch_ok
            |FROM ex JOIN km USING (lang)
            |ORDER BY lang""".stripMargin))

  // q219's sketch pass as REAL Structured Streaming state (the q133
  // pattern, but STRONGER): the corpus arrives as a document stream
  // and the per-lang KMV buffer lives in streaming aggregation state,
  // merged per micro-batch in complete mode — the continuous
  // distinct-cardinality monitor a crawl dashboard runs. Where q133's
  // Misra-Gries state varies its candidate set with merge order (and
  // needs the exact-recount pass to launder it), the KMV buffer is a
  // pure set-minimum: ANY arrival order, batch split, or restart
  // replays to the IDENTICAL k-smallest state, so the streamed
  // ESTIMATE — not just a gated recount — equals the batch estimate
  // bit-for-bit and q219's oracle applies verbatim.
  val q224StreamKmv: QueryDef = QueryDef(
    "q224_stream_kmv",
    (s, dir) => {
      val stream = shingleRel(
        graft.streaming.EventsStream.readDocuments(s, dir))
      val mins = graft.streaming.EventsStream
        .runToCompletion(s, kmvMins(stream))
      withExactArm(shingles(s, dir), estimateFromMins(mins))
    },
    q219KmvDistinct.oracle)

  // -----------------------------------------------------------------
  // q230: KMV SET ALGEBRA — pairwise slice overlap from the sketches
  // alone (Beyer et al. SIGMOD'07 §5): the "how much does slice A
  // share with slice B" question (cross-dump dedup planning, source
  // contamination triage — q187's exact source-overlap at a scale
  // where re-scanning pairs is off the table). The min-wise identity
  // makes sketch UNION exact: the k smallest of L_a ∪ L_b ARE the k
  // smallest of A ∪ B, so est|A∪B| follows from the merged sketch,
  // ρ = |union-sketch ∩ A ∩ B| / k estimates Jaccard, and
  // est|A∩B| = ρ·est|A∪B|. Membership of a union-sketch element in A
  // reduces to membership in L_a (x ≤ kth-min(A∪B) ≤ kth-min(A)), so
  // the WHOLE computation runs on the |langs|-row sketch relation —
  // the corpus is never rescanned per pair. Exact arms ride along at
  // fixture scale (the q219/q142 validation discipline); every
  // estimate is integer-deterministic and hash-matched itself.
  // -----------------------------------------------------------------

  /** Pairwise overlap estimates from a (lang, mins) sketch relation —
    * pure sketch algebra on the bounded relation, no corpus access.
    */
  private[graft] def overlapFromMins(mins: DataFrame): DataFrame = {
    val a = mins.select(col("lang").as("la"), col("mins").as("amins"))
    val b = mins.select(col("lang").as("lb"), col("mins").as("bmins"))
    a.crossJoin(b).filter(col("la") < col("lb"))
      .withColumn("us", expr(
        s"slice(array_sort(array_union(amins, bmins)), 1, $KmvK)"))
      .withColumn("inter_m", size(array_intersect(col("us"),
        array_intersect(col("amins"), col("bmins")))).cast("long"))
      .withColumn("union_est",
        when(size(col("us")) < KmvK, size(col("us")).cast("long"))
          .otherwise(expr(s"${(KmvK - 1).toLong * HashSpace}L div " +
            s"greatest(element_at(us, $KmvK), 1L)")))
      .withColumn("inter_est",
        expr(s"inter_m * union_est div ${KmvK}L"))
      .select(col("la"), col("lb"), col("union_est"), col("inter_m"),
        col("inter_est"))
  }

  val q230KmvOverlap: QueryDef = QueryDef(
    "q230_kmv_overlap",
    (s, dir) => {
      val g = graft.Caches.persist(shingles(s, dir))
      val est = overlapFromMins(kmvMins(g))
      // exact arms (fixture-scale validation): per-lang distinct
      // counts + pairwise exact intersections over the distinct
      // shingle relation
      val ds = graft.Caches.persist(
        g.select(col("lang"), col("sh")).distinct())
      val cnt = ds.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val xint = ds.select(col("lang").as("xla"), col("sh"))
        .join(ds.select(col("lang").as("xlb"), col("sh")), "sh")
        .filter(col("xla") < col("xlb"))
        .groupBy(col("xla"), col("xlb"))
        .agg(count(lit(1)).as("exact_inter"))
      est
        .join(cnt.select(col("lang").as("la"), col("n").as("na")), "la")
        .join(cnt.select(col("lang").as("lb"), col("n").as("nb")), "lb")
        .join(xint, col("la") === col("xla") && col("lb") === col("xlb"),
          "left")
        .withColumn("exact_inter",
          coalesce(col("exact_inter"), lit(0L)))
        .withColumn("exact_union",
          col("na") + col("nb") - col("exact_inter"))
        .withColumn("union_ok",
          abs(col("union_est") - col("exact_union")) * 5 <=
            col("exact_union"))
        .select(col("la"), col("lb"), col("union_est"), col("inter_m"),
          col("inter_est"), col("exact_union"), col("exact_inter"),
          col("union_ok"))
        .orderBy("la", "lb")
    },
    Some(s"""WITH d AS (
            |  SELECT lang, string_split(lower(text), ' ') AS w
            |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
            |g AS (
            |  SELECT lang, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
            |  FROM d CROSS JOIN unnest(range(1, len(w) - 1)) AS t(i)),
            |ds AS (SELECT DISTINCT lang, sh FROM g),
            |h AS (SELECT DISTINCT lang,
            |        CAST('0x' || substr(md5(sh), 1, 12) AS BIGINT) AS hv
            |      FROM g),
            |cnt AS (SELECT lang, COUNT(*) AS n FROM ds GROUP BY 1),
            |pairs AS (SELECT a.lang AS la, b.lang AS lb
            |          FROM cnt a JOIN cnt b ON a.lang < b.lang),
            |xint AS (SELECT a.lang AS la, b.lang AS lb,
            |           COUNT(*) AS exact_inter
            |         FROM ds a JOIN ds b
            |           ON a.sh = b.sh AND a.lang < b.lang
            |         GROUP BY 1, 2),
            |uh0 AS (SELECT DISTINCT p.la, p.lb, h.hv
            |        FROM pairs p JOIN h
            |          ON h.lang = p.la OR h.lang = p.lb),
            |uh AS (SELECT la, lb, hv, ROW_NUMBER() OVER (
            |         PARTITION BY la, lb ORDER BY hv) AS rk
            |       FROM uh0),
            |us AS (SELECT * FROM uh WHERE rk <= $KmvK),
            |usz AS (SELECT la, lb, COUNT(*) AS un,
            |          MAX(CASE WHEN rk = $KmvK THEN hv END) AS kth
            |        FROM us GROUP BY 1, 2),
            |mm AS (SELECT u.la, u.lb, COUNT(*) AS m
            |       FROM us u
            |       JOIN h ha ON ha.lang = u.la AND ha.hv = u.hv
            |       JOIN h hb ON hb.lang = u.lb AND hb.hv = u.hv
            |       GROUP BY 1, 2),
            |est AS (SELECT z.la, z.lb,
            |          CASE WHEN z.un < $KmvK THEN CAST(z.un AS BIGINT)
            |               ELSE ${(KmvK - 1).toLong * HashSpace} //
            |                 GREATEST(z.kth, 1)
            |          END AS union_est,
            |          COALESCE(m.m, 0) AS inter_m
            |        FROM usz z LEFT JOIN mm m
            |          ON m.la = z.la AND m.lb = z.lb)
            |SELECT p.la, p.lb, e.union_est,
            |  CAST(e.inter_m AS BIGINT) AS inter_m,
            |  CAST(e.inter_m * e.union_est // $KmvK AS BIGINT)
            |    AS inter_est,
            |  CAST(ca.n + cb.n - COALESCE(x.exact_inter, 0) AS BIGINT)
            |    AS exact_union,
            |  CAST(COALESCE(x.exact_inter, 0) AS BIGINT) AS exact_inter,
            |  ABS(e.union_est -
            |      (ca.n + cb.n - COALESCE(x.exact_inter, 0))) * 5 <=
            |    ca.n + cb.n - COALESCE(x.exact_inter, 0) AS union_ok
            |FROM pairs p
            |JOIN est e ON e.la = p.la AND e.lb = p.lb
            |JOIN cnt ca ON ca.lang = p.la
            |JOIN cnt cb ON cb.lang = p.lb
            |LEFT JOIN xint x ON x.la = p.la AND x.lb = p.lb
            |ORDER BY p.la, p.lb""".stripMargin))

  val all: Seq[QueryDef] = Seq(q219KmvDistinct, q224StreamKmv,
    q230KmvOverlap)
}
