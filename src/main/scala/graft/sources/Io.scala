package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
