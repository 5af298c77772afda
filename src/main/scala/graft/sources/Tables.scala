package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loaders for the driver test corpus (TESTDATA.md): one parquet file per
 * table under `/root/testdata/sf{0.001,0.01,0.1}/`.
 *
 * Deliberately thin: `spark.read.parquet` hands Catalyst a relation it can
 * prune and push into — every query that only touches 2 of lineitem's 11
 * columns must show exactly those 2 in `ReadSchema` of the physical plan.
 * At 100 TB the same call reads a partitioned/bucketed table; nothing in the
 * query layer changes.
 */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Decouple compute parallelism from input-split parallelism for
    * CPU-dense narrow pipelines (tokenize/regex/md5 per row): when the
    * source delivers fewer splits than half the cores — a single-row-group
    * parquet file, a gzip json, a handful of small files — everything up to
    * the first exchange runs on that few threads no matter how wide the
    * cluster is. A round-robin repartition to default parallelism costs one
    * cheap shuffle of the raw rows and buys full-width execution of the
    * expensive projection above it.
    *
    * Deliberately adaptive: at 100 TB the scan has thousands of splits and
    * this is an exact no-op — no shuffle is ever added to a well-split
    * input. (The corpus files here are all one row group, which parquet
    * cannot split further — `files.maxPartitionBytes` can't help.)
    *
    * Known limit: the guard counts byte-range SPLITS, which is what the
    * planner can see without running a job. A multi-GB single-row-group
    * file lists as many splits of which only one yields rows, and the
    * guard won't fire — detecting that requires reading footers
    * (row-group count), worth wiring into the ingest layer at scale
    * rather than per-query here. */
  def rebalanced(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }

  /** events.parquet's `ts` physical type has varied across corpus
    * generations — TIMESTAMP(NANOS) in early drops, TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ) in current ones — so normalize from whatever
    * the footer declares to a session-UTC `timestamp`, the one downstream
    * type every window/watermark/unix_timestamp consumer assumes:
    *
    *  - NANOS: readable only under `spark.sql.legacy.parquet.nanosAsLong=
    *    true` (every builder in this repo sets it — SparkSessions
    *    .recommended, Verify, Bench, the test session); the raw nanos read
    *    as long and we floor-divide to micros, the same truncation DuckDB
    *    applies downcasting TIMESTAMP_NS, so both engines see identical
    *    values. Without the flag the load itself fails fast with
    *    PARQUET_TYPE_ILLEGAL naming the column.
    *  - MICROS / TIMESTAMP_NTZ: a plain cast — with the session timezone
    *    pinned to UTC (all builders) the NTZ wall-clock reinterprets as
    *    the identical instant, matching DuckDB's timezone-free micro
    *    TIMESTAMP read of the same file.
    *
    * Deliberately NOT setting conf here: a loader mutating session-wide
    * conf as a side effect races physical planning in concurrent use and
    * changes what other readers of the same file see. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        // the NTZ wall-clock → instant reinterpretation is identity ONLY
        // under a UTC session zone; enforce rather than document (ADVICE
        // r8) — any other zone would silently shift every event instant,
        // unlike the NANOS branch which fails fast without its flag.
        val tz = spark.conf.get("spark.sql.session.timeZone")
        // any fixed zero-offset zone is identity for the reinterpretation
        // ('UTC', 'Etc/UTC', 'GMT', 'Z', '+00:00' all qualify); a literal
        // string match would reject spellings the cast handles correctly
        val zoneIsUtc =
          try {
            val rules = java.time.ZoneId.of(tz).getRules
            rules.isFixedOffset && rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
          } catch { case _: java.time.DateTimeException => false }
        require(zoneIsUtc,
          s"events(): TIMESTAMP_NTZ/MICROS normalization requires a UTC session zone (got '$tz') — " +
            "the NTZ cast reinterprets wall-clock in the session zone and would shift instants")
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
