package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's tuned session defaults (UTC for oracle
  * parity, AQE on, shuffle partitions sized to local cores instead of
  * the 200 default — SURVEY §6 / PLANS.md "Session knobs"). Registers
  * the graft_* native functions so SQL users get them immediately.
  */
object Sessions {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    Runtime.getRuntime.availableProcessors().toString)

  def build(appName: String, coresOverride: Option[String] = None)
      : SparkSession = {
    val n = coresOverride.getOrElse(cpus)
    // AQE on by default (runtime re-plan, skew splitting, post-shuffle
    // coalesce — the 100 TB posture). SPARK_GRAFT_AQE=off exists for
    // measuring AQE's per-query stage-materialization overhead at tiny
    // local scale; production leaves it on.
    val aqe =
      !sys.env.get("SPARK_GRAFT_AQE").exists(_.equalsIgnoreCase("off"))
    val spark = SparkSession.builder()
      .master(s"local[$n]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          math.min(n.toInt, 16).toString))
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        aqe.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    functions.VectorOps.register(spark)
    spark
  }
}
