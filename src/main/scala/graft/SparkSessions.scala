package graft

import org.apache.spark.sql.SparkSession

/**
 * Recommended session configuration for this engine — the knobs that matter
 * at 100 TB, applied consistently by the CLI entry points (StreamRunner,
 * DailyBatch). The driver-owned mains (Verify/Bench) keep their own minimal
 * builders per the driver contract.
 *
 * Rationale per knob:
 *  - master: spark-submit's `--master` wins (code-set master would override
 *    it); `SPARK_MASTER` env overrides for ad-hoc runs; `local[4]` only as
 *    the last-resort default for bare `sbt runMain`.
 *  - shuffle partitions: `SPARK_GRAFT_CPUS` if set, else the local master's
 *    thread count — on a cluster, set it to 2–3× total executor cores and
 *    let AQE coalesce the excess.
 *  - AQE + coalesce + skew-join + 128 MB scan partitions: Spark 4 defaults,
 *    pinned here so a deployment-side conf file can't silently regress them
 *    (the reference pins the same AQE flags, spark/app.py:20–22).
 *  - RocksDB state store (streaming): dedup keys, open windows, sessions
 *    and join buffers spill off-heap to local disk instead of living on the
 *    JVM heap. NOTE: the provider is recorded in the checkpoint and cannot
 *    change across restarts — it only takes effect for NEW checkpoints.
 *  - UTC session timezone: zone-independent, oracle-comparable timestamps.
 *  - runtime bloom-filter injection OFF: the rule sizes the application
 *    side from plan statistics, and this engine's shared snapshot
 *    artifacts (checkpointed LogicalRDDs — SnapshotCache) carry NO stats,
 *    so every snapshot-probing join looks like a multi-TB scan and gets a
 *    fixed 8M-bit bloom that rides every downstream task binary (~1 MiB
 *    per stage, the r11 "large task binary" bench warnings) while pruning
 *    nothing (the probes are FK-complete by construction — measured on
 *    knn_label_eval, the only injection across all 200+ registered
 *    queries). Where a semi-join reduction IS profitable this engine
 *    writes it explicitly (left_semi dims, posting-list prefilters,
 *    broadcast hints), so the automatic rule only ever fires on the
 *    misinformed cases. Re-enable per-deployment if a workload relies on
 *    inferred reductions over well-statted scans.
 */
object SparkSessions {

  private val LocalMaster = "local\\[(\\d+)(?:,\\d+)?\\]".r
  private val LocalStar = "local(?:\\[\\*(?:,\\d+)?\\])?".r

  def recommended(appName: String, streaming: Boolean = false): SparkSession = {
    val master = sys.env.get("SPARK_MASTER")
      .orElse(sys.props.get("spark.master"))
      .getOrElse("local[4]")
    val defaultParts = master match {
      case LocalMaster(n) => n
      case LocalStar()    => Runtime.getRuntime.availableProcessors().toString
      case _              => "200"   // cluster: expect SPARK_GRAFT_CPUS or AQE
    }
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultParts)
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // corpus events.parquet is TIMESTAMP_NS; set at build time (never as
      // a loader side effect — see Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      // FAIR job scheduling for concurrent-job phases (SnapshotBuild);
      // single-query execution is unaffected (FAIR ≡ FIFO for one job)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
    // only set the master when spark-submit didn't already provide one
    val withMaster =
      if (sys.props.contains("spark.master") && sys.env.get("SPARK_MASTER").isEmpty) b
      else b.master(master)
    val withState =
      if (streaming)
        withMaster.config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      else withMaster
    val spark = withState.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
