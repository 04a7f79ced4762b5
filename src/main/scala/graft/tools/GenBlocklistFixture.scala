package graft.tools

import graft.{Fixtures, Sessions}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Writes `fixtures/domain_blocklist.parquet` (domain): the blocklist
  * the q179 suffix filter consumes. Entries are chosen against
  * [[GenUrlFixture]]'s fixed host pool to exercise every match class:
  *
  *  - exact registrable domains (`news-site.org`, `archive-mirror.org`);
  *  - a TLD-level suffix (`dev` — blocks `openweb.dev` though the
  *    exact host never appears in the list);
  *  - a parent suffix that OVERLAPS an exact entry (`org` — every
  *    .org URL matches both `org` and its exact entry, so per-domain
  *    counts must tolerate multi-match);
  *  - a no-match decoy (`tracker.invalid` — must report 0, which is
  *    why the report LEFT-joins from the blocklist side).
  *
  * Static list, committed once; the spec recomputes every count from
  * [[GenUrlFixture]]'s emission rules.
  */
object GenBlocklistFixture {
  val Domains: Seq[String] = Seq(
    "news-site.org", "archive-mirror.org", "dev", "org",
    "tracker.invalid")

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-gen-blocklist",
      coresOverride = Some("2"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Domains.toDF("domain")
    val tmp = Files.createTempDirectory("graft-fix").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .map(_.getPath)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      .head
    Files.createDirectories(Paths.get(Fixtures.domainBlocklistPath)
      .getParent)
    Files.move(Paths.get(part), Paths.get(Fixtures.domainBlocklistPath),
      StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${Fixtures.domainBlocklistPath} " +
      s"(${Domains.size} domains)")
    spark.stop()
  }
}
