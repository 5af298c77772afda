package graft

import org.apache.spark.sql.SparkSession

/**
 * Recommended session configuration for this engine — the knobs that matter
 * at 100 TB, applied consistently by the CLI entry points (StreamRunner,
 * DailyBatch). The driver-owned mains (Verify/Bench) keep their own minimal
 * builders per the driver contract.
 *
 * Rationale per knob:
 *  - shuffle partitions sized to cores (local) — on a cluster, set to
 *    2–3× total executor cores; AQE coalesces the excess.
 *  - AQE + skew-join on: runtime re-planning is the first line of defense
 *    against skew and stale stats (reference enables the same flags,
 *    spark/app.py:20–22).
 *  - RocksDB state store: streaming state (dedup keys, open windows,
 *    sessions, join buffers) spills off-heap to local disk instead of
 *    living on the JVM heap — mandatory once state outgrows memory.
 *  - UTC session timezone: every timestamp computation is
 *    zone-independent (and oracle-comparable).
 *  - maxPartitionBytes 128 MB: scan-task granularity that keeps 1000
 *    executors busy without tiny-file task storms.
 */
object SparkSessions {

  def recommended(appName: String,
                  master: String = sys.env.getOrElse("SPARK_MASTER", "local[4]"),
                  streaming: Boolean = false): SparkSession = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
    val withState =
      if (streaming)
        b.config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      else b
    val spark = withState.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
