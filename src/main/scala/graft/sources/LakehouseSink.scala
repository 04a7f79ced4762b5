package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.io.File

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

  final case class CompactionReport(
      partitionsCompacted: Int, filesBefore: Int, filesAfter: Int)

  /** Compact the small-files debris a long-running partitioned writer
    * accumulates (every micro-batch / load job appends its own files):
    * each directory partition whose parquet files could fit in fewer
    * `targetFileBytes`-sized files is rewritten to that count,
    * re-applying the cluster sort so footer min/max stats stay tight.
    * The Spark-native analog of a table format's OPTIMIZE / rewrite-
    * data-files maintenance pass — at 100 TB, unbounded file counts
    * (not data size) are what kill scan planning.
    *
    * Rewrite is per-partition-directory: read → repartition(n) → write
    * to a temp dir → swap files in place. The swap is not atomic
    * (maintenance op: run it when no concurrent reader is mid-listing,
    * same operational contract as OPTIMIZE on a path-based table).
    */
  def compact(spark: SparkSession, path: String,
      clusterCols: Seq[String] = Nil,
      targetFileBytes: Long = 128L * 1024 * 1024): CompactionReport = {
    def leafDirs(dir: File): Seq[File] = {
      val kids = Option(dir.listFiles()).getOrElse(Array.empty)
      val subdirs = kids.filter(_.isDirectory)
      if (subdirs.isEmpty) Seq(dir) else subdirs.toSeq.flatMap(leafDirs)
    }
    def parquetFiles(dir: File): Seq[File] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    var (nPart, before, after) = (0, 0, 0)
    leafDirs(new File(path)).foreach { dir =>
      val files = parquetFiles(dir)
      val bytes = files.map(_.length()).sum
      val nOut = math.max(1L, (bytes + targetFileBytes - 1)
        / targetFileBytes).toInt
      before += files.size
      if (files.size > nOut) {
        nPart += 1
        val df = spark.read.parquet(dir.getPath)
        val sorted =
          if (clusterCols.isEmpty) df.repartition(nOut)
          else df.repartition(nOut).sortWithinPartitions(
            clusterCols.map(col): _*)
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-compact").toFile
        sorted.write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
        val newFiles = parquetFiles(tmp)
        files.foreach(_.delete())
        newFiles.foreach(f => java.nio.file.Files.move(f.toPath,
          new File(dir, f.getName).toPath))
        after += newFiles.size
      } else after += files.size
    }
    CompactionReport(nPart, before, after)
  }
}
