package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The staleness contract of [[Tables]]' schema/relation caches
  * (VERDICT r10 item 5 / ADVICE r10): a fixture regenerated
  * MID-PROCESS — the driver has rewritten events.parquet's ts encoding
  * across rounds — must invalidate the cached schema and resolved
  * relation, including the pathological rewrite that lands at
  * identical byte length within the same millisecond, which a
  * (size, mtime) key alone serves stale.
  */
class TablesCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeSingle(df: org.apache.spark.sql.DataFrame,
      dest: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Files.createTempDirectory("graft-tc").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles().map(_.getPath)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
    Files.move(Paths.get(part), dest, StandardCopyOption.REPLACE_EXISTING)
  }

  test("regenerating events.parquet with a different ts encoding " +
      "invalidates the cached schema + relation (no stale read)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tc_ev")
    val dest = dir.resolve("events.parquet")
    val usEpoch = 1700000000000000L // µs

    // encoding 1: raw ns longs (the legacy driver fixture shape) —
    // Tables.load's LongType branch must truncate ns → µs
    writeSingle(Seq((1L, usEpoch * 1000L, "click"))
      .toDF("event_id", "ts", "kind"), dest)
    val first = Tables.load(spark, dir.toString, "events")
    assert(first.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val v1 = first.select(unix_micros(col("ts"))).as[Long].head()
    assert(v1 == usEpoch, s"ns branch read $v1, expected $usEpoch")

    // encoding 2, same path: native timestamp[us] — a stale LongType
    // schema would fail the read or misinterpret the values
    writeSingle(Seq((2L, new java.sql.Timestamp(usEpoch / 1000), "view"))
      .toDF("event_id", "ts", "kind"), dest)
    val second = Tables.load(spark, dir.toString, "events")
    val rows = second.select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect()
    assert(rows.toSeq == Seq((2L, usEpoch)),
      s"stale cache: read $rows after regeneration")
  }

  test("fileStamp distinguishes same-size same-mtime files with " +
      "different contents (the footer-tail hash is load-bearing)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_tc_fp")
    val a = dir.resolve("a.bin")
    val b = dir.resolve("b.bin")
    Files.write(a, Array.fill[Byte](8192)(1))
    Files.write(b, Array.fill[Byte](8192)(2))
    val t = java.nio.file.attribute.FileTime.fromMillis(1700000000000L)
    Files.setLastModifiedTime(a, t)
    Files.setLastModifiedTime(b, t)
    val sa = Tables.fileStamp(a)
    val sb = Tables.fileStamp(b)
    assert(sa._1 == sb._1 && sa._2 == sb._2,
      "setup broken: sizes/mtimes should match")
    assert(sa._3 != sb._3,
      "footer-tail hash failed to distinguish different contents")
    // and a rewrite of the SAME path at same size/mtime changes the key
    Files.write(a, Array.fill[Byte](8192)(3))
    Files.setLastModifiedTime(a, t)
    assert(Tables.fileStamp(a)._3 != sa._3,
      "same-size same-ms rewrite produced an identical stamp")
  }
}
