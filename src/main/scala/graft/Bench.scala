package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")   // same workload shape as Verify on any host
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state methodology: one untimed warm pass over every query
    // (JIT + whole-stage-codegen compilation + parquet footers), then the
    // timed pass in fixed name order. Wide plans cost seconds of one-time
    // codegen compilation that would otherwise be misattributed to whichever
    // query ran first.
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // The warm pass built the suite-scoped pair snapshots; reset them and
    // time the rebuild as ONE attributable pseudo-entry so the shared
    // scan→shingle→posting pipeline cost is under the clock instead of
    // landing on whichever consumer happens to run first. Consumers then
    // measure post-snapshot work — the production shape, where the pair
    // snapshot is a persisted artifact built once per corpus version.
    graft.ext.dedup.DedupQueries.clearSnapshots()
    val snapT0 = System.nanoTime()
    val snapSecs =
      try { graft.ext.dedup.DedupQueries.buildSnapshots(spark, sfDir)
            (System.nanoTime() - snapT0) / 1e9 }
      catch { case _: Throwable => -1.0 }
    val results = ("snapshot_build" -> snapSecs) +: ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query reports -1.0, not its (meaningless) elapsed time —
      // otherwise a plan-time exception would masquerade as a fast success
      val secs =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      name -> secs
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total sums ONLY successful queries — a -1.0 failure marker must not
    // shrink the total and let a breaking regression read as a speedup.
    // Failures are listed explicitly so a cross-round total compare is
    // apples-to-apples (same query set) or visibly not.
    val total = results.collect { case (_, s) if s >= 0 => s }.sum
    val failed = results.collect { case (k, s) if s < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // Streaming-throughput record (reference flagship plan, fixed load):
    // its OWN field, not a queries entry — rows/s is not seconds, and the
    // batch total must stay apples-to-apples across rounds. A small warm
    // probe first: the batch warm pass compiles none of the streaming plan.
    val stream =
      try { graft.stream.StreamBench.probe(spark, 60000L, 3)
            graft.stream.StreamBench.probe(spark).json }
      catch { case _: Throwable => "null" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"stream":$stream,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
