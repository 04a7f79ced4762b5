package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioned-parquet lakehouse layout (the Spark-native analog of the
  * reference's index metadata → "partitioning/Z-order hints" mapping,
  * SURVEY.md §1.1 Index row).
  *
  * Directory partitioning gives O(1) partition pruning on the partition
  * key (the scan never lists non-matching directories); within each
  * partition, `sortWithinPartitions` clusters rows so min/max footer
  * stats prune row groups on the cluster keys. At 100 TB this layout —
  * not an index — is what bounds a selective scan.
  */
object LakehouseSink {

  /** Write `df` partitioned by `partitionCols` and clustered (sorted)
    * within files by `clusterCols`.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      clusterCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val clustered =
      if (clusterCols.isEmpty) df
      else df
        .repartition(partitionCols.map(col): _*)
        .sortWithinPartitions((partitionCols ++ clusterCols).map(col): _*)
    clustered.write
      .mode(mode)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
