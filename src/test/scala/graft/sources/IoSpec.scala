package graft.sources

import graft.SparkSpec

/** Physical-layout behaviors: bucketed co-located joins, partitioned
  * layout, csv/json readers. */
class IoSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("joining two same-bucketed tables needs NO shuffle exchange") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
    Io.writeBucketed(li, "li_bucketed", "l_orderkey", 4, sortCol = Some("l_orderkey"))
    Io.writeBucketed(ord, "ord_bucketed", "o_orderkey", 4, sortCol = Some("o_orderkey"))

    // disable auto-broadcast: the point is the co-located SortMergeJoin
    // path (at real scale neither fact side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() > 0)

      // contrast: the same join over plain parquet shuffles BOTH sides
      val unbucketed = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("partitioned write produces prunable hive layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toString + "/by_flag"
    Io.writePartitioned(
      Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_returnflag")),
      dir, Seq("l_returnflag"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("l_returnflag=")))
    val pruned = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("l_returnflag"), plan)
  }

  test("csv and json round-trips preserve data") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_io2").toString
    val df = Tables.region(spark, sf)
    df.write.option("header", "true").csv(s"$tmp/csv")
    df.write.json(s"$tmp/json")
    assert(Io.readCsv(spark, s"$tmp/csv").count() == df.count())
    assert(Io.readJsonLines(spark, s"$tmp/json").count() == df.count())
  }

  test("orc round-trip preserves data and pushes filters into the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_io3").toString
    val df = Tables.lineitem(spark, sf).select("l_orderkey", "l_returnflag", "l_quantity")
    Io.writeOrc(df, s"$tmp/orc")
    val back = Io.readOrc(spark, s"$tmp/orc")
    assert(back.count() == df.count())
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
      "ORC round-trip must preserve content, not just cardinality")
    val filtered = back.filter(col("l_returnflag") === "R").select("l_orderkey")
    val plan = filtered.queryExecution.executedPlan.toString
    // the filter must appear INSIDE the PushedFilters bracket — the key
    // itself prints even when nothing is pushed ("PushedFilters: []"),
    // and the Filter node above the scan always mentions the column
    assert("PushedFilters: \\[[^\\]]*l_returnflag".r.findFirstIn(plan).isDefined,
      s"ORC predicate not pushed:\n$plan")
    // column pruning: a 1-column projection must not read all 3
    assert(plan.contains("ReadSchema") && !plan.contains("l_quantity"),
      s"ORC columns not pruned:\n$plan")
  }

  test("parquet schema evolution: mergeSchema unions generations; old files null-fill new columns") {
    // the lake reality at 100 TB: ingest generations add columns, and a
    // reader must see one union schema with old rows null-filled — not
    // fail, not silently drop the new column because file one lacks it
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_io4").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$tmp/evo/gen=1")
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "score")
      .write.parquet(s"$tmp/evo/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$tmp/evo")
    assert(merged.columns.toSet == Set("id", "v", "score", "gen"))
    val rows = merged.select("id", "score").as[(Long, Option[Long])].collect().toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty, "old generation must null-fill")
    assert(rows(3L).contains(30L) && rows(4L).contains(40L))
    // and the non-merged default keeps working on the widest footer alone
    assert(spark.read.parquet(s"$tmp/evo").count() == 4)
  }

  test("dynamic partition overwrite replaces only the landed partitions") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_io3").toString + "/days"
    val base = Seq((1L, "d1", 10L), (2L, "d1", 11L), (3L, "d2", 20L), (4L, "d3", 30L))
      .toDF("id", "day", "v")
    Io.writePartitioned(base, root, Seq("day"))
    // re-land ONLY day d2 (the failed-job rerun / late-data refresh shape)
    val redo = Seq((9L, "d2", 99L)).toDF("id", "day", "v")
    Io.overwritePartitionsDynamic(redo, root, Seq("day"))
    val got = spark.read.parquet(root).select("id", "day", "v")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "d1", 10L), (2L, "d1", 11L), (9L, "d2", 99L), (4L, "d3", 30L)),
      s"untouched partitions must survive, d2 must be replaced: $got")
    // session conf untouched after the scoped write
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode").isEmpty ||
      spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic")
    // contrast: a STATIC overwrite of the same one-day frame clobbers the
    // other partitions — the failure mode the dynamic write exists to avoid
    Io.writePartitioned(redo, root, Seq("day"))
    assert(spark.read.parquet(root).count() == 1)
  }

  test("compaction: plan groups small files toward the target; rewrite hits the file count") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_io4").toString
    // the small-files pathology: 1000 rows sprayed across 20 files
    spark.range(1000).select(col("id"), (col("id") % 7).as("v"))
      .repartition(20).write.parquet(s"$tmp/small")
    val plan = Io.compactionPlan(spark.read.parquet(s"$tmp/small"), 300L)
      .as[(String, Long, Long)].collect()
    assert(plan.length == 20 && plan.map(_._2).sum == 1000L)
    // the next-fit bound: every non-final group lands within one file of
    // the target (group sum >= T - max_file_rows)
    val byGrp = plan.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val maxGrp = byGrp.keys.max
    val maxFile = plan.map(_._2).max
    byGrp.foreach { case (g, rows) =>
      if (g < maxGrp) assert(rows >= 300L - maxFile, s"group $g under bound: $rows") }
    // execute: 1000 rows at target 300 → 4 similar-sized files, data intact
    assert(Io.compact(spark, s"$tmp/small", s"$tmp/compacted", 300L) == 1000L)
    val outFiles = new java.io.File(s"$tmp/compacted").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(outFiles == 4, s"expected 4 output files, got $outFiles")
    val a = spark.read.parquet(s"$tmp/small").as[(Long, Long)].collect().toSet
    val b = spark.read.parquet(s"$tmp/compacted").as[(Long, Long)].collect().toSet
    assert(a == b)
  }
}
