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

  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright. Read the raw nanos as long (legacy conf) and
    * floor-divide to micros — the same truncation DuckDB applies when it
    * downcasts TIMESTAMP_NS to its micro TIMESTAMP, so both engines see
    * identical values.
    *
    * The conf set here is session-wide and intentionally left on: it only
    * changes how TIMESTAMP(NANOS) columns read (as raw longs), the corpus
    * has exactly one such column, and flipping it back after load() would
    * be unsafe because parquet scans may consult the conf again at
    * physical-planning time. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
