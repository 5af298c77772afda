package graft.ext.pipeline

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * CLI entry point for the curation layer (the ops-facing sibling of
 * [[graft.batch.DailyBatch]] and [[graft.stream.StreamRunner]]): run the
 * cluster-correct curation over a documents table and MATERIALIZE the
 * result as a hive-partitioned parquet corpus.
 *
 *   runMain graft.ext.pipeline.CurateRunner <sfDir> <outDir>
 *
 * Output layout: `split=…/lang=…/part-*.parquet` — the split is the
 * content-independent hash assignment of [[CurateQueries.qSampleSplit]]
 * (re-derived from the SAME bucket expression, so the written corpus and
 * the audit queries can never disagree), and partitioning by (split, lang)
 * means a training reader scans exactly its split's directories, a
 * per-language mixer prunes to its language, and the contamination audit
 * reads test/ alone. Payload text is re-attached by doc_id join AFTER
 * curation so the dedup/quality plan never carries document bodies
 * through its shuffles.
 *
 * Train rows additionally carry `decontam_removed` — the span-level
 * test-leakage token count from [[CurateQueries.qDecontamScrub]] (0 when
 * clean, null for val/test rows). The ORIGINAL text ships unchanged: the
 * scrub's `text_clean` is a normalized-token reconstruction (lowercased,
 * punctuation collapsed), and silently mixing that representation with
 * raw text in one corpus would be worse than flagging — downstream
 * consumers drop or re-scrub flagged docs against the original bytes.
 */
object CurateRunner {

  def run(spark: SparkSession, dir: String, out: String): Long = {
    val survivors = CurateQueries.qCurateClustered(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    val bucket = pmod(graft.functions.Exact.md5Long(
      concat(lit("split|"), col("doc_id"))), lit(100))
    val leakage = CurateQueries.qDecontamScrub(spark, dir)
      .select(col("doc_id"), col("n_removed"))
    val curated = Tables.documents(spark, dir)
      .join(survivors, "doc_id")
      .withColumn("split",
        when(bucket < CurateQueries.TrainPct, "train")
          .when(bucket < CurateQueries.ValPct, "val")
          .otherwise("test"))
      .join(leakage, Seq("doc_id"), "left")
      .withColumn("decontam_removed",
        when(col("split") === "train", coalesce(col("n_removed"), lit(0L))))
      .drop("n_removed")
    curated
      .repartition(col("split"), col("lang")) // file layout aligned with partitioning
      .write.mode(SaveMode.Overwrite)
      .partitionBy("split", "lang")
      .parquet(out)
    spark.read.parquet(out).count()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/tmp/graft_curated")
    val spark = graft.SparkSessions.recommended("graft-curate")
    val n = run(spark, dir, out)
    println(s"curated corpus written to $out rows=$n")
    spark.stop()
  }
}
