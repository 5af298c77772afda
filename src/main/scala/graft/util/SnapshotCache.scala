package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Suite-scoped materialization cache for shared intermediate frames — the
 * in-process analog of the snapshot artifact a production deployment
 * persists once per corpus version and shares across consumers (SCALING.md
 * "snapshot scale"). Factored out of the dedup pair snapshots (round 11)
 * so other families — first the distinct-basket frame shared by
 * q_basket_pairs / q_basket_rules — can ride the same discipline instead
 * of each inventing a cache.
 *
 * Keyed by (session, dir, shuffle-partition setting, tag) so a fresh
 * session or a repartitioned re-run REBUILDS instead of reusing; entries
 * for stopped sessions are evicted on access. At 100 TB the key is a
 * snapshot path and the checkpoint is a parquet write — consumers are
 * unchanged.
 *
 * ASSUMPTION: data under `dir` is immutable for the session's lifetime
 * (true for the driver's generated fixtures and for content-addressed
 * production snapshot paths). If a dir is regenerated in-session, call
 * [[clearAll]] first or consumers read the stale materialization.
 */
object SnapshotCache {

  private val snapshots =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String, String), DataFrame]()

  /** UN-materialized builder frames, captured at build time keyed like the
    * snapshots. This is the plan-sweep surface (VERDICT r13 #2): round 13
    * moved every declared all-pairs cartesian into snapshot builders, whose
    * plans no registered-query sweep could see — the discipline specs
    * (CrossJoinDisciplineSpec / WindowDisciplineSpec / PlanDigestSpec) read
    * these frames to police builder plans exactly like query plans.
    * Entries survive [[clearAll]] (the plan is metadata, not blocks) and
    * are overwritten on rebuild. */
  private val builtPlans =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String, String), DataFrame]()

  /** Every captured builder frame for (spark, dir) under the session's
    * CURRENT conf key (so a DeterminismSpec-style shuffle-partition rerun
    * cannot leak its variants into the sweep): tag → the frame as the
    * builder composed it, BEFORE checkpointing — its logical plan is the
    * artifact's build pipeline (dependency snapshots appear as their
    * materialized LogicalRDD leaves). Callers re-plan via `select("*")`
    * when they need planning under a different conf (the executed plan of
    * the returned frame is fixed under build-time conf). */
  def builderPlans(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val tier = spark.conf.getOption(ReliableConf).exists(_.toBoolean).toString
    val confKey = spark.conf.get("spark.sql.shuffle.partitions") + "|" + tier
    val out = Map.newBuilder[String, DataFrame]
    builtPlans.forEach { (k, df) =>
      if ((k._1 eq spark) && k._2 == dir && k._3 == confKey) out += (k._4 -> df)
    }
    out.result()
  }

  /** Release the storage behind one checkpointed snapshot frame (the
    * localCheckpoint materializes as a persisted LogicalRDD — `unpersist`
    * on the Dataset would be a no-op since it was never `cache`d). */
  def release(df: DataFrame): Unit =
    scala.util.Try {
      df.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
        case _ => ()
      }
    }

  /** Intermediate BUILD checkpoints (frames a builder materializes for
    * its own internal reuse, not cache entries themselves) — registered
    * so [[clearAll]] frees their blocks alongside the snapshots'. Without
    * this a builder's internal localCheckpoint (the dsir feature stream)
    * would pin its blocks forever: clearAll only walks snapshot frames,
    * and the builder plan kept in [[builtPlans]] holds the leaf RDD. */
  private val scratch =
    new java.util.concurrent.ConcurrentLinkedQueue[(SparkSession, DataFrame)]()

  /** Checkpoint an intermediate frame inside a snapshot BUILD, with its
    * blocks released at the next [[clearAll]] — the same lifecycle as the
    * snapshot the build feeds. Tier follows [[ReliableConf]] like the
    * snapshots themselves. */
  def scratchCheckpoint(spark: SparkSession, df: DataFrame): DataFrame = {
    val c = materialize(spark, df)
    scratch.add((spark, c))
    c
  }

  /** Drop every cached snapshot and unpersist its blocks (scratch build
    * checkpoints included). For bench harnesses (put the build back under
    * the clock) and for the regenerated-`dir` escape hatch documented
    * above. */
  def clearAll(): Unit = {
    val it = snapshots.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (!e.getKey._1.sparkContext.isStopped) release(e.getValue)
      it.remove()
    }
    var s = scratch.poll()
    while (s != null) {
      if (!s._1.sparkContext.isStopped) release(s._2)
      s = scratch.poll()
    }
  }

  /** Session conf choosing the materialization tier:
    * `false` (default) → `localCheckpoint` — executor-local blocks, the
    * right call on local[n] and for artifacts cheap to rebuild;
    * `true` → reliable `checkpoint` — survives executor loss, the
    * SCALING.md deploy swap for a real cluster where a lost executor
    * would otherwise fail every consumer of the artifact (localCheckpoint
    * lineage is truncated and CANNOT recompute). One flag, consumers
    * unchanged; SnapshotCacheSpec pins result equality across tiers. */
  val ReliableConf = "spark.graft.snapshot.reliable"
  /** Optional reliable-checkpoint directory (HDFS/S3 path on a cluster);
    * defaults to a session-scoped temp dir when unset. */
  val CheckpointDirConf = "spark.graft.snapshot.checkpointDir"

  private def materialize(spark: SparkSession, df: DataFrame): DataFrame =
    if (spark.conf.getOption(ReliableConf).exists(_.toBoolean)) {
      if (spark.sparkContext.getCheckpointDir.isEmpty)
        spark.sparkContext.setCheckpointDir(
          spark.conf.getOption(CheckpointDirConf).getOrElse(
            java.nio.file.Files.createTempDirectory("graft_chk").toString))
      df.checkpoint()
    } else df.localCheckpoint()

  /** Return the cached materialization of `build` for (spark, dir, tag),
    * building + checkpointing on first use ([[ReliableConf]] picks the
    * tier; the tier is part of the cache key so an in-session toggle
    * rebuilds instead of silently reusing the other tier's blocks). */
  def snapshot(tag: String, spark: SparkSession, dir: String)
              (build: => DataFrame): DataFrame = {
    // evict entries for stopped sessions (their blocks died with the
    // executors — nothing left to unpersist)
    snapshots.keySet.removeIf(k => k._1.sparkContext.isStopped)
    builtPlans.keySet.removeIf(k => k._1.sparkContext.isStopped)
    val tier = spark.conf.getOption(ReliableConf).exists(_.toBoolean).toString
    val key = (spark, dir,
      spark.conf.get("spark.sql.shuffle.partitions") + "|" + tier, tag)
    val cached = snapshots.get(key)
    if (cached ne null) cached
    else {
      // build OUTSIDE the map's bin lock: computeIfAbsent would hold it
      // for the length of a full Spark job, blocking unrelated builds
      // that hash to the same bin; on a race the loser's blocks are freed
      val frame = build
      builtPlans.put(key, frame)
      val built = materialize(spark, frame)
      val winner = snapshots.putIfAbsent(key, built)
      if (winner ne null) { release(built); winner } else built
    }
  }
}
