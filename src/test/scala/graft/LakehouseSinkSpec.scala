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

  test("the maintenance pool preserves input order and rethrows the " +
      "ORIGINAL exception (the loud-failure contract — an " +
      "ExecutionException wrapper would change the surface callers " +
      "and specs pin)") {
    assert(LakehouseSink.inParallel(1 to 100)(_ * 2) == (2 to 200 by 2))
    val boom = intercept[java.io.IOException] {
      LakehouseSink.inParallel(1 to 20) { i =>
        if (i == 13) throw new java.io.IOException("rename x failed")
        i
      }
    }
    assert(boom.getMessage.contains("rename x failed"))
    // degenerate shapes stay on the serial path
    assert(LakehouseSink.inParallel(Seq(7))(_ + 1) == Seq(8))
    assert(LakehouseSink.inParallel(Seq.empty[Int])(_ + 1).isEmpty)
  }

  test("a crashed prior pass's staging dir inside the layout is swept " +
      "by the next maintenance pass and never leaks into reads (r20 " +
      "review: fresh-UUID staging would otherwise accumulate hidden " +
      "duplicate data forever)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_lake_s").toString + "/events"
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.repartition(25)
      .write.partitionBy("event_type").parquet(out)
    val total = events.count()
    // plant a crash leftover: a staged copy of one partition's data
    // inside that partition dir (exactly what a death between write
    // and move-in leaves)
    val pdir = new java.io.File(out).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("event_type="))
      .head
    val stale = new java.io.File(pdir, ".graft-swap-deadbeef0000")
    spark.read.parquet(pdir.getPath).limit(5)
      .write.parquet(stale.getPath)
    assert(stale.isDirectory)
    // hidden dirs never leak into reads even before the sweep
    assert(spark.read.parquet(out).count() == total)
    // the next maintenance pass sweeps it and the layout is intact —
    // and compact's own refreshByPath suffices for this re-read (r20
    // review: it was the one maintenance op not invalidating the
    // session's file-status cache)
    LakehouseSink.compact(spark, out, clusterCols = Seq("user_id"))
    assert(!stale.exists,
      "stale staging dir survived the maintenance pass")
    assert(spark.read.parquet(out).count() == total)
  }

  test("a swap crash AFTER the commit marker is completed FORWARD by " +
      "the next maintenance pass — no duplication, no loss — in both " +
      "crash windows (nothing moved in yet; mid-move with live " +
      "duplication). Without the marker, compact had no row identity " +
      "to converge with and the duplication was permanent") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_lake_c").toString + "/events"
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.repartition(3).write.partitionBy("event_type").parquet(out)
    val total = events.count()
    val pdirs = new java.io.File(out).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("event_type="))
      .sortBy(_.getName)
    assert(pdirs.length >= 2, "fixture needs two partition dirs")
    def parquets(d: java.io.File) = d.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    def plant(pdir: java.io.File, id: String,
        moveIn: Boolean): Seq[java.io.File] = {
      val olds = parquets(pdir).toSeq
      assert(olds.nonEmpty)
      val staging = new java.io.File(pdir, s".graft-swap-$id")
      spark.read.parquet(pdir.getPath).coalesce(1)
        .write.parquet(staging.getPath)
      if (moveIn) {
        val staged = parquets(staging).head
        java.nio.file.Files.move(staged.toPath,
          new java.io.File(pdir, staged.getName).toPath)
      }
      java.nio.file.Files.write(
        new java.io.File(pdir, s".graft-commit-$id").toPath,
        olds.map(_.getName).mkString("\n").getBytes("UTF-8"))
      olds
    }
    // populate the session's file-status cache with the PRE-crash
    // listing: recovery deletes visible files, and the pass must
    // refresh before its own reads and before handing back to the
    // session (r20 review — a stale cached listing throws
    // FILE_NOT_EXIST)
    assert(spark.read.parquet(out).count() == total)
    // window 1: committed, nothing moved in yet (olds complete)
    val olds1 = plant(pdirs(0), "cafef00d0000", moveIn = false)
    // window 2: committed, staged file ALREADY moved in — the
    // duplication is live on disk right now
    val olds2 = plant(pdirs(1), "beefbeef0000", moveIn = true)
    assert(parquets(pdirs(1)).length == olds2.length + 1)
    // window 3: UNCOMMITTED — a partially-written marker temp (the
    // crash hit before the atomic rename): recovery must DISCARD it
    // and leave the olds untouched, never treat it as a commit
    val stage3 = new java.io.File(pdirs(0), ".graft-swap-feedfeed0000")
    spark.read.parquet(pdirs(0).getPath).limit(1)
      .write.parquet(stage3.getPath)
    java.nio.file.Files.write(
      new java.io.File(pdirs(0), ".graft-mktmp-feedfeed0000").toPath,
      "partial-".getBytes("UTF-8"))
    // ONE maintenance pass converges all three windows
    LakehouseSink.compact(spark, out, clusterCols = Seq("user_id"))
    assert(spark.read.parquet(out).count() == total,
      "recovery duplicated or lost rows")
    (olds1 ++ olds2).foreach(f => assert(!f.exists,
      s"marker-listed old file ${f.getName} survived recovery"))
    pdirs.take(2).foreach { d =>
      assert(d.listFiles().forall(f =>
        !f.getName.startsWith(".graft-")),
        s"staging/marker leftovers in $d")
    }
  }

  test("HRW reshard 8 -> 9 rewrites ONLY files containing moved docs " +
      "(untouched files byte-stable), moves ~1/9 of docs, and the " +
      "layout stays placement-correct") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_hrw").toString + "/docs"
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"))
    val total = docs.count()
    // several files per shard so per-file rewrite granularity is real
    LakehouseSink.writeHrwSharded(docs.repartition(4, col("doc_id")),
      out, "doc_id", 8)

    def files(): Map[String, (Long, Long)] = {
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { c =>
          if (c.isDirectory) walk(c)
          else if (c.getName.endsWith(".parquet")) Seq(c) else Nil
        }
      walk(new java.io.File(out))
        .map(f => f.getPath -> (f.lastModified(), f.length())).toMap
    }
    val before = files()
    // independently compute which docs move (q227's own definition)
    // and which files hold them
    val withFile = spark.read.parquet(out)
      .withColumn("_f", input_file_name())
      .withColumn("ns", LakehouseSink.hrwShardCol(col("doc_id"), 9))
    val movedDocs = withFile.filter(col("ns") =!= col("shard"))
    val wantMoved = movedDocs.count()
    // the moved-file set must be captured BEFORE the reshard mutates
    // the layout (the plan's file listing references the originals)
    val movedFilePaths = movedDocs.select("_f").distinct().collect()
      .map(r => java.net.URI.create(r.getString(0)).getPath).toSet
    val wantRewritten = movedFilePaths.size.toLong
    assert(wantMoved > 0 && wantMoved < total / 5,
      s"HRW 8->9 moved $wantMoved of $total docs — expected ~1/9")

    val report = LakehouseSink.reshardHrw(spark, out, "doc_id", 8, 9)
    assert(report.docsMoved == wantMoved)
    assert(report.filesRewritten == wantRewritten,
      s"rewrote ${report.filesRewritten} files; only $wantRewritten " +
        "contain moved docs")
    // every file with no moved doc is bitwise untouched (same path,
    // mtime, size)
    val after = files()
    val untouched = before.filter { case (p, _) =>
      !movedFilePaths.contains(p)
    }
    untouched.foreach { case (p, stamp) =>
      assert(after.get(p).contains(stamp), s"untouched file changed: $p")
    }
    assert(report.filesUntouched == untouched.size)
    // layout correctness: same corpus, every row in its 9-shard home,
    // and every moved doc landed on the NEW shard (the HRW theorem)
    val back = spark.read.parquet(out)
    assert(back.count() == total)
    assert(back.filter(LakehouseSink.hrwShardCol(col("doc_id"), 9) =!=
      col("shard")).count() == 0)
    assert(back.filter(col("shard") === 8).count() == wantMoved)
  }

  test("HRW reshard crash windows are rerun-convergent: both " +
      "interrupted states (movers appended / keepers duplicated) " +
      "converge to the exact target layout with no duplicates") {
    import org.apache.spark.sql.SaveMode
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"))
    val total = docs.count()
    def freshLayout(): String = {
      val out = java.nio.file.Files
        .createTempDirectory("graft_hrw_crash").toString + "/docs"
      LakehouseSink.writeHrwSharded(docs.repartition(4, col("doc_id")),
        out, "doc_id", 8)
      out
    }
    def assertConverged(out: String): Unit = {
      spark.catalog.refreshByPath(out)
      val back = spark.read.parquet(out)
      assert(back.count() == total, "row count diverged — " +
        "duplication or loss survived the rerun")
      assert(back.select(col("doc_id")).distinct().count() == total)
      assert(back.filter(LakehouseSink.hrwShardCol(col("doc_id"), 9)
        =!= col("shard")).count() == 0)
    }
    // window 1: crash AFTER the mover append committed, BEFORE any
    // file rewrite — simulated by appending the movers manually and
    // then running the real reshard (which must not re-append them)
    val out1 = freshLayout()
    val pre = spark.read.parquet(out1)
    pre.filter(LakehouseSink.hrwShardCol(col("doc_id"), 9) =!=
        col("shard"))
      .withColumn("shard", LakehouseSink.hrwShardCol(col("doc_id"), 9))
      .write.mode(SaveMode.Append).partitionBy("shard").parquet(out1)
    spark.catalog.refreshByPath(out1)
    assert(spark.read.parquet(out1).count() > total,
      "window-1 setup produced no transient duplication — vacuous")
    LakehouseSink.reshardHrw(spark, out1, "doc_id", 8, 9)
    assertConverged(out1)
    // window 2: crash AFTER one file's keepers moved in, BEFORE the
    // old file deleted — simulated by copying an affected file's
    // keeper rows in as an extra sibling file, then rerunning
    val out2 = freshLayout()
    val withFile = spark.read.parquet(out2)
      .withColumn("_f", input_file_name())
    val someAffected = withFile
      .filter(LakehouseSink.hrwShardCol(col("doc_id"), 9) =!=
        col("shard"))
      .select(col("_f")).distinct().collect().map(_.getString(0)).min
    val f = new java.io.File(java.net.URI.create(someAffected).getPath)
    val dirShard = "shard=(\\d+)".r.findFirstMatchIn(f.getParent)
      .get.group(1).toLong
    val keepers = spark.read.parquet(f.getPath)
      .filter(LakehouseSink.hrwShardCol(col("doc_id"), 9) === dirShard)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_crash2").toFile
    keepers.write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
    tmp.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(n => java.nio.file.Files.move(n.toPath,
        new java.io.File(f.getParentFile,
          "dup-" + n.getName).toPath))
    spark.catalog.refreshByPath(out2)
    assert(spark.read.parquet(out2).count() > total,
      "window-2 setup produced no transient duplication — vacuous")
    LakehouseSink.reshardHrw(spark, out2, "doc_id", 8, 9)
    assertConverged(out2)
  }

  test("reshard fails loudly on a duplicate-key layout instead of " +
      "silently collapsing rows (keyCol-uniqueness contract)") {
    import org.apache.spark.sql.SaveMode
    val out = java.nio.file.Files
      .createTempDirectory("graft_hrw_dup").toString + "/docs"
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"))
    LakehouseSink.writeHrwSharded(docs, out, "doc_id", 8)
    // a contract violation: a duplicate LOGICAL row (same key, any
    // payload) misplaced so it participates in the mover path — the
    // destructive pass must refuse, not converge to a smaller corpus
    val misplaced = spark.read.parquet(out)
      .withColumn("ns", LakehouseSink.hrwShardCol(col("doc_id"), 9))
      .filter(col("ns") =!= col("shard"))
      .limit(1).select(col("doc_id"), col("lang"), col("shard"))
    misplaced.unionByName(misplaced) // two copies, both misplaced
      .write.mode(SaveMode.Append).partitionBy("shard").parquet(out)
    spark.catalog.refreshByPath(out)
    val e = intercept[IllegalArgumentException] {
      LakehouseSink.reshardHrw(spark, out, "doc_id", 8, 9)
    }
    assert(e.getMessage.contains("unique"), e.getMessage)
  }

  test("reshard parses the LEAF shard directory, not a shard=<n> " +
      "spelling in the layout's root path") {
    // a root path that itself matches the partition-dir pattern must
    // not confuse the per-file shard parse (reshardHrw filters keepers
    // against it before DELETING files)
    val root = java.nio.file.Files
      .createTempDirectory("graft_hrw_root").toString + "/shard=3/docs"
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"))
    val total = docs.count()
    LakehouseSink.writeHrwSharded(docs, root, "doc_id", 8)
    val report = LakehouseSink.reshardHrw(spark, root, "doc_id", 8, 9)
    assert(report.docsMoved > 0)
    val back = spark.read.parquet(root)
    assert(back.count() == total)
    assert(back.filter(LakehouseSink.hrwShardCol(col("doc_id"), 9) =!=
      col("shard")).count() == 0)
  }
}
