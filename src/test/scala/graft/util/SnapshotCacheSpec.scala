package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The snapshot-tier knob: reliable `checkpoint` vs the default
  * `localCheckpoint` must be a pure durability swap — identical results,
  * consumers untouched (the SCALING.md deploy caveat, round 11). */
class SnapshotCacheSpec extends SparkSpec {

  test("reliable tier: identical results, real checkpoint files, distinct cache entry") {
    def build = Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"), sum(col("n_chars")).as("c"))
    val local = SnapshotCache.snapshot("sc-spec", spark, sf)(build)
    val localRows = local.collect().map(_.toString).sorted.toSeq
    spark.conf.set(SnapshotCache.ReliableConf, "true")
    try {
      val reliable = SnapshotCache.snapshot("sc-spec", spark, sf)(build)
      // the tier is part of the cache key: this must be a REBUILD, not the
      // local-tier entry handed back
      assert(reliable ne local, "reliable tier must not reuse the local-tier entry")
      assert(reliable.collect().map(_.toString).sorted.toSeq == localRows,
        "tier swap changed results")
      // the reliable build went through a real checkpoint dir with files
      val chkDir = spark.sparkContext.getCheckpointDir
      assert(chkDir.nonEmpty, "reliable tier must establish a checkpoint dir")
      val root = new java.io.File(new java.net.URI(chkDir.get))
      def anyPart(f: java.io.File): Boolean =
        if (f.isDirectory) f.listFiles().exists(anyPart)
        else f.getName.startsWith("part-")
      assert(anyPart(root), s"no checkpoint part files under $chkDir")
      // cached: second call under the same tier returns the same frame
      assert(SnapshotCache.snapshot("sc-spec", spark, sf)(build) eq reliable)
    } finally spark.conf.set(SnapshotCache.ReliableConf, "false")
    // back on the default tier, the original entry is still cached
    assert(SnapshotCache.snapshot("sc-spec", spark, sf)(build) eq local)
  }
}
