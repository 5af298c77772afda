package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Physical-layout I/O helpers — the 100 TB techniques that don't show up
 * in query text:
 *
 *  - [[writeBucketed]]: hash-bucketed + sorted tables. Two tables bucketed
 *    on the same key with the same bucket count join WITHOUT a shuffle —
 *    the exchange that dominates large fact⋈fact joins disappears from the
 *    plan (asserted in IoSpec). This is the batch analogue of
 *    co-partitioned state.
 *  - [[writePartitioned]]: hive-style directory partitioning for partition
 *    pruning + dynamic partition pruning on the read side.
 *
 * Bucketing requires the table catalog (`saveAsTable`); plain
 * `parquet(path)` cannot record bucket metadata.
 */
object Io {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Replace ONLY the partitions present in `df`, leaving every other
    * partition of the table untouched — the daily-refresh write a
    * partitioned 100 TB table actually needs (re-land one day without
    * rewriting the year; static overwrite mode would clobber the whole
    * root). Spark's `partitionOverwriteMode=dynamic` scoped to this one
    * write; the session value is restored after, like the stream
    * probe's conf discipline. Idempotent per partition, which is what
    * makes a failed daily job safely re-runnable. */
  def overwritePartitionsDynamic(df: DataFrame, path: String,
                                 partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Compaction PLAN for a small-files directory: one row per data file
    * with its row count and the output group next-fit-decreasing packing
    * assigns it — the audit a table-maintenance job publishes before an
    * OPTIMIZE rewrite, and the direct analog of pack_shards' running-
    * total rule applied to files instead of documents. Row counts come
    * from one `input_file_name()` aggregate (a scan of the dir's
    * metadata-and-pages, not a driver listing); the packing window runs
    * over the |files|-row frame. */
  def compactionPlan(df: DataFrame, targetRows: Long): DataFrame = {
    val perFile = df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"))
    perFile
      .withColumn("grp",
        expr(s"(sum(rows) OVER (ORDER BY rows DESC, file" +
          s" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - rows)" +
          s" DIV $targetRows"))
      .select(col("file"), col("rows"), col("grp"))
  }

  /** Execute the compaction: rewrite the directory's data as
    * ⌈total/target⌉ similar-sized files — Spark's round-robin
    * `repartition(n)` is the rewrite an OPTIMIZE job runs (row-group
    * sized outputs, no key clustering implied; use writeBucketed /
    * writePartitioned when the layout should also cluster). Reads and
    * writes stream through executors; nothing driver-sized. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetRows: Long): Long = {
    val df = spark.read.parquet(inPath)
    val total = df.count()
    val n = math.max(1L, (total + targetRows - 1) / targetRows).toInt
    df.repartition(n).write.mode(SaveMode.Overwrite).parquet(outPath)
    total
  }

  def readCsv(spark: SparkSession, path: String,
              schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** ORC round-trip — the second columnar format Spark ships natively.
    * Same pushdown/pruning contract as parquet (predicate → ORC
    * search-argument, column pruning via ReadSchema), asserted in IoSpec;
    * useful when the surrounding lake is ORC-standardized (Hive
    * heritage). Avro is NOT offered: the spark-avro connector jar isn't
    * on this classpath, and pretending otherwise would fail at runtime. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
