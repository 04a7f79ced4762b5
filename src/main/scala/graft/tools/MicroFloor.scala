package graft.tools

import graft.Sessions
import org.apache.spark.scheduler._

/** Micro-benchmark of the bare job floor in local mode: how wall time
  * scales with task count and stage count, and WHERE inside a job the
  * time goes (submit → task launch → task finish → job end). Hand-run
  * while tuning Bench-session knobs; not a driver contract.
  */
object MicroFloor {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-micro", coresOverride = Some("32"))
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext

    @volatile var jobStart = 0L
    @volatile var firstLaunch = 0L
    @volatile var lastFinish = 0L
    @volatile var jobEnd = 0L
    sc.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart = System.nanoTime()
      override def onTaskStart(e: SparkListenerTaskStart): Unit =
        if (firstLaunch == 0) firstLaunch = System.nanoTime()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        lastFinish = System.nanoTime()
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobEnd = System.nanoTime()
    })

    def bestOf(n: Int)(f: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.min

    def profile(label: String, reps: Int)(f: => Unit): Unit = {
      f // warm
      val walls = (1 to reps).map { _ =>
        jobStart = 0; firstLaunch = 0; lastFinish = 0; jobEnd = 0
        val t0 = System.nanoTime()
        f
        val wall = (System.nanoTime() - t0) / 1e6
        Thread.sleep(50) // let listener drain
        (wall, (jobStart - t0) / 1e6, (firstLaunch - t0) / 1e6,
          (lastFinish - t0) / 1e6, (jobEnd - t0) / 1e6)
      }
      val m = walls.minBy(_._1)
      println(f"$label%-28s wall ${m._1}%7.1f  submit->jobStart ${m._2}%6.1f" +
        f"  firstTask ${m._3}%6.1f  lastTaskEnd ${m._4}%6.1f  jobEnd ${m._5}%6.1f")
    }

    for (tasks <- Seq(1, 32)) {
      val rdd = sc.parallelize(1 to math.max(tasks, 1), tasks)
      profile(s"rdd count $tasks tasks", 5)(rdd.count())
    }
    val df1 = spark.range(1, 2, 1, 1)
    profile("sql reused df (1 task)", 5)(df1.count())
    profile("sql fresh df (1 task)", 5)(spark.range(1, 2, 1, 1).count())
    println(f"pure wall reused rdd:  ${bestOf(10)(sc.parallelize(1 to 1, 1).count())}%7.1f ms")
    spark.stop()
  }
}
