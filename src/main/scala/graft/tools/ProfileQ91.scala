package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch profiler for the q91 stage breakdown — not part of the
  * driver contract; run by hand while tuning the PPJoin pipeline.
  */
object ProfileQ91 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.build("graft-profile",
      coresOverride = Some("32"))
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorOps.register(spark)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); f
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"$label%-28s cold $cold%8.3f s  warm $warm%8.3f s")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val sets = docs
      .select(col("doc_id"),
        graft.functions.VectorOps.shingleHashes(lower(col("text")), 3).as("gs"))
      .filter(size(col("gs")) > 0)
      .withColumn("n", size(col("gs")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("persist sets")(sets.count())
    println(s"docs=${sets.count()}")

    val sh0 = sets.select(col("doc_id"), col("n"),
      explode(col("gs")).as("g"))
    time("explode count")(println("sh0=" + sh0.count()))
    val dfRel = sh0.groupBy(col("g")).agg(count(lit(1)).as("df"))
    time("df agg")(println("dfRel=" + dfRel.count()))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
    val pref = sh0.join(broadcast(dfRel), Seq("g"))
      .withColumn("r", row_number().over(wDoc))
      .filter(col("r") <= col("n") - expr("(4 * n + 4) div 5") + 1)
      .select(col("doc_id"), col("g"), col("r"), col("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("prefix rows")(println("pref=" + pref.count()))

    val pr = pref.repartition(col("g"))
    val raw = pr.select(col("doc_id").as("d1"), col("g"),
        col("r").as("p1"), col("n").as("na"))
      .join(pr.select(col("doc_id").as("d2"), col("g"),
        col("r").as("p2"), col("n").as("nb")), Seq("g"))
      .filter(col("d1") < col("d2"))
    time("raw candidates")(println("raw=" + raw.count()))
    val filtered = raw
      .filter(lit(5) * least(col("na"), col("nb")) >=
        lit(4) * greatest(col("na"), col("nb")))
      .filter(least(col("p1"), col("p2")) +
        least(col("na") - col("p1"), col("nb") - col("p2")) >=
        expr("(4 * (na + nb) + 8) div 9"))
      .select(col("d1"), col("d2"))
    time("filtered candidates")(println("filt=" + filtered.count()))

    val a = sets.select(col("doc_id").as("d1"),
      col("gs").as("gs1"), col("n").as("n1"))
    val b = sets.select(col("doc_id").as("d2"),
      col("gs").as("gs2"), col("n").as("n2"))
    val ver = filtered.join(a, "d1").join(b, "d2")
      .withColumn("c", graft.functions.VectorOps
        .sortedLongIntersectCount(col("gs1"), col("gs2")))
      .filter(col("c").cast("double") / (col("n1") + col("n2") - col("c")) >= 0.8)
    time("verify")(println("pairs=" + ver.count()))

    // record-carrying variant: gs rides through the candidate join
    val pref2 = sh0.join(broadcast(dfRel), Seq("g"))
      .withColumn("r", row_number().over(wDoc))
      .filter(col("r") <= col("n") - expr("(4 * n + 4) div 5") + 1)
      .join(sets.select(col("doc_id"), col("gs")), Seq("doc_id"))
      .select(col("doc_id"), col("g"), col("r"), col("n"), col("gs"))
    val pr2 = pref2.repartition(col("g"))
    val ver2 = pr2.select(col("doc_id").as("d1"), col("g"),
        col("r").as("p1"), col("n").as("na"), col("gs").as("gs1"))
      .join(pr2.select(col("doc_id").as("d2"), col("g"),
        col("r").as("p2"), col("n").as("nb"), col("gs").as("gs2")), Seq("g"))
      .filter(col("d1") < col("d2"))
      .filter(lit(5) * least(col("na"), col("nb")) >=
        lit(4) * greatest(col("na"), col("nb")))
      .filter(least(col("p1"), col("p2")) +
        least(col("na") - col("p1"), col("nb") - col("p2")) >=
        expr("(4 * (na + nb) + 8) div 9"))
      .withColumn("c", graft.functions.VectorOps
        .sortedLongIntersectCount(col("gs1"), col("gs2")))
      .filter(col("c").cast("double") / (col("na") + col("nb") - col("c")) >= 0.8)
      .select(col("d1"), col("d2"))
    time("record-carrying e2e")(println("pairs2=" + ver2.distinct().count()))
    println("===== verify executed plan =====")
    println(ver.queryExecution.executedPlan.toString.take(6000))
    println("===== filtered executed plan =====")
    println(filtered.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
