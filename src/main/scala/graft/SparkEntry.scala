package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's [[QueryDef]] into the driver's
  * `queries` / `oracleSql` maps. Each operator area registers its defs in
  * its own object under [[graft.operators]].
  */
object SparkEntry {

  /** Full catalog: one QueryDef per implemented operator (SURVEY.md §2). */
  def defs: Seq[QueryDef] =
    operators.Relational.all ++ operators.Dedup.all ++
      operators.Similarity.all ++ operators.TextAnalysis.all ++
      operators.StreamingQueries.all ++ operators.Multimodal.all ++
      operators.AsofJoin.all ++ operators.Subqueries.all ++
      operators.Skew.all ++ operators.Formats.all ++
      operators.Intervals.all ++ operators.EventAnalytics.all ++
      operators.FrequentItems.all ++ operators.Retrieval.all ++
      operators.Classifier.all ++ operators.Urls.all ++
      operators.Bitext.all ++ operators.Chat.all ++
      operators.Graph.all ++ operators.Sampling.all ++
      operators.KnnGraph.all ++ operators.Sketches.all ++
      operators.Kmeans.all ++ operators.IvfPqPipeline.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q07GroupAgg.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Headline queries timed by [[Bench]]. */
  def benchDefs: Seq[QueryDef] = defs.filter(_.bench)
}
