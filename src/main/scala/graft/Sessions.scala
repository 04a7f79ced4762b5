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

  /** Streaming state-store provider, profile-selected. The in-memory
    * HDFSBackedStateStoreProvider (Spark's default) keeps every key
    * resident in executor heap — right for the fixture-scale tests
    * and the complete-mode O(groups) counters, wrong for the
    * production frontiers whose state is ∝ unique pages (q182's
    * seen-set, q127's pair ledger): those want RocksDB's
    * off-heap/on-disk store (the provider Spark ships for exactly
    * this; state size then bounds by disk, not heap).
    * `SPARK_GRAFT_STATE_STORE=rocksdb` selects it engine-wide;
    * StreamRestartSpec drives the frontier + near-dup restarts under
    * BOTH providers so the checkpoint contract is provider-portable
    * (RocksDB state survives restarts through the same
    * checkpointLocation mechanics).
    */
  def stateStoreProvider: String =
    if (sys.env.get("SPARK_GRAFT_STATE_STORE")
        .exists(_.equalsIgnoreCase("rocksdb")))
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider"
    else
      "org.apache.spark.sql.execution.streaming.state." +
        "HDFSBackedStateStoreProvider"

  def build(appName: String, coresOverride: Option[String] = None)
      : SparkSession = {
    val n = coresOverride.getOrElse(cpus)
    // AQE on by default (runtime re-plan, skew splitting, post-shuffle
    // coalesce — the 100 TB posture). SPARK_GRAFT_AQE=off exists for
    // measuring AQE's per-query stage-materialization overhead at tiny
    // local scale; production leaves it on.
    val aqe =
      !sys.env.get("SPARK_GRAFT_AQE").exists(_.equalsIgnoreCase("off"))
    val builder = SparkSession.builder()
      .master(s"local[$n]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          math.min(n.toInt, 16).toString))
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        aqe.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // scan-partition packing: the 4 MB default models HDFS-era file
      // open costs; local/object-store parquet with ~1 MB row groups
      // packs several files per task instead of paying per-task reader
      // init 16× for a 16-file table (the MRG bench fixture, small
      // dims). Large files still split by maxPartitionBytes as before.
      .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
      .config("spark.sql.streaming.stateStore.providerClass",
        stateStoreProvider)
      .config("spark.ui.enabled", "false")
    // Ad-hoc knob passthrough for measurement runs, e.g.
    // SPARK_GRAFT_EXTRA_CONF="spark.sql.adaptive.coalescePartitions.parallelismFirst=false;k2=v2".
    // Tuned DEFAULTS belong above, not in this env var.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { kvs =>
      kvs.split(";").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      }
    }
    val spark = builder.getOrCreate()
    functions.VectorOps.register(spark)
    spark
  }
}
