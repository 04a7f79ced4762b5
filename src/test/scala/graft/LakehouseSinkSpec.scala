package graft

import graft.sources.LakehouseSink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning on the lakehouse layout: a filter on the partition
  * column must reach the scan as a PartitionFilter and cut the selected
  * partitions — the file-layout analog of the reference's index
  * metadata.
  */
class LakehouseSinkSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = SparkTestSession.spark

  test("partitioned write prunes partitions and preserves data") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_lake").toString + "/events"
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    LakehouseSink.writePartitioned(events, out,
      partitionCols = Seq("event_type"),
      clusterCols = Seq("user_id"))

    val back = spark.read.parquet(out)
    assert(back.count() == events.count())

    val q = back.filter(col("event_type") === "click")
      .select("event_id", "user_id")
    val expected = events.filter(col("event_type") === "click").count()
    assert(q.count() == expected)

    val scans = collectWithSubqueries(q.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    // the partition filter reached the scan...
    assert(scan.partitionFilters.exists(
      _.toString.contains("event_type")), scan.partitionFilters.toString)
    // ...and only the matching directory is read
    assert(scan.relation.location.inputFiles
      .forall(_.contains("event_type=click")) ||
      scan.metadata.get("PartitionFilters").exists(_.nonEmpty))
    val selected = scan.selectedPartitions.partitionCount
    assert(selected == 1, s"expected 1 pruned partition, got $selected")
  }

  test("compaction shrinks small-file partitions, preserves data and " +
      "pruning") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_lake_c").toString + "/events"
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    // simulate micro-batch debris: 25 files per directory partition
    events.repartition(25)
      .write.partitionBy("event_type").parquet(out)
    def fileCount: Int = {
      def walk(f: java.io.File): Int =
        Option(f.listFiles()).getOrElse(Array.empty).map { c =>
          if (c.isDirectory) walk(c)
          else if (c.getName.endsWith(".parquet")) 1 else 0
        }.sum
      walk(new java.io.File(out))
    }
    val before = fileCount
    assert(before > 50, s"expected small-file debris, got $before files")
    // exact long checksum — a double sum would drift with partition order
    val sumBefore = spark.read.parquet(out)
      .agg(sum("event_id")).collect()(0).getLong(0)

    val report = LakehouseSink.compact(spark, out,
      clusterCols = Seq("user_id")) // 128 MB target → 1 file/partition
    assert(report.filesBefore == before)
    assert(report.partitionsCompacted > 0)
    assert(report.filesAfter < before / 10,
      s"compaction left ${report.filesAfter} of $before files")
    assert(fileCount == report.filesAfter)

    // identical data, partition layout still prunes
    val back = spark.read.parquet(out)
    assert(back.count() == events.count())
    assert(back.agg(sum("event_id")).collect()(0).getLong(0) == sumBefore)
    val q = back.filter(col("event_type") === "click")
    val scans = collectWithSubqueries(q.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.head.selectedPartitions.partitionCount == 1)
  }
}
