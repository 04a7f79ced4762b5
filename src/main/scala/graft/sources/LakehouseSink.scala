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
    * `targetFileBytes`-sized files is rewritten to that count. Multiple
    * output files range-partition on the cluster keys so files stay
    * key-DISJOINT (file-level min/max skipping survives compaction, not
    * just row-group stats). The Spark-native analog of a table format's
    * OPTIMIZE / rewrite-data-files maintenance pass — at 100 TB,
    * unbounded file counts (not data size) are what kill scan planning.
    *
    * Swap order is crash-safe-by-duplication: the rewritten files move
    * IN first and the old files delete LAST, so an interruption leaves
    * transiently duplicated rows (rerun compact to converge), never a
    * lost partition. Hidden/metadata entries (`_temporary`, `.crc`,
    * `_SUCCESS`) are skipped per the Hadoop convention. Not atomic —
    * maintenance-op contract, same as OPTIMIZE on a path-based table.
    */
  def compact(spark: SparkSession, path: String,
      clusterCols: Seq[String] = Nil,
      targetFileBytes: Long = 128L * 1024 * 1024): CompactionReport = {
    def hidden(f: File): Boolean =
      f.getName.startsWith("_") || f.getName.startsWith(".")
    def leafDirs(dir: File): Seq[File] = {
      val kids = Option(dir.listFiles()).getOrElse(Array.empty)
      val subdirs = kids.filter(d => d.isDirectory && !hidden(d))
      if (subdirs.isEmpty) Seq(dir) else subdirs.toSeq.flatMap(leafDirs)
    }
    def parquetFiles(dir: File): Seq[File] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq
        .filter(f => f.isFile && !hidden(f) &&
          f.getName.endsWith(".parquet"))
    def deleteRecursively(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty)
        .foreach(deleteRecursively)
      java.nio.file.Files.deleteIfExists(f.toPath); ()
    }
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
        val shaped =
          if (clusterCols.isEmpty) df.repartition(nOut)
          else df
            .repartitionByRange(nOut, clusterCols.map(col): _*)
            .sortWithinPartitions(clusterCols.map(col): _*)
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-compact").toFile
        try {
          shaped.write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
          val newFiles = parquetFiles(tmp)
          // move in first, delete old last: see swap-order doc above.
          // Files.delete throws on failure, so a half-swapped state is
          // loudly surfaced instead of silently duplicating forever.
          newFiles.foreach(f => java.nio.file.Files.move(f.toPath,
            new File(dir, f.getName).toPath))
          files.foreach(f => java.nio.file.Files.delete(f.toPath))
          after += newFiles.size
        } finally deleteRecursively(tmp)
      } else after += files.size
    }
    CompactionReport(nPart, before, after)
  }
}
