package graft.batch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Data-skipping effectiveness of the z-order layout and correctness /
  * selectivity of the bloom semi-join prefilter. */
class LayoutSpec extends SparkSpec {

  test("q_zorder: buckets partition the table and prune BOTH dimensions") {
    val out = LayoutQueries.qZorder(spark, sf).cache()
    val total = Tables.lineitem(spark, sf).count()
    assert(out.agg(sum("n_rows")).head().getLong(0) == total)

    val nBuckets = out.count()
    assert(nBuckets > 8, "enough buckets for pruning to be meaningful")

    // fraction of buckets a 10%-of-range predicate has to touch, from the
    // per-bucket (min, max) envelopes — the parquet footer skipping model
    def touched(lo: Long, hi: Long, minC: String, maxC: String): Double =
      out.filter(col(maxC) >= lo && col(minC) <= hi).count().toDouble / nBuckets

    // 10%-of-range predicates, derived from the data so the test is
    // scale-factor agnostic
    val Array(pmax, smax) = Tables.lineitem(spark, sf)
      .agg(max("l_partkey"), max("l_suppkey")).head()
      .toSeq.map(v => v.toString.toLong).toArray
    val partFrac = touched(pmax / 5, pmax / 5 + pmax / 10, "part_min", "part_max")
    val suppFrac = touched(smax / 5, smax / 5 + smax / 10, "supp_min", "supp_max")

    // a suppkey-sorted layout: tight on suppkey, useless on partkey (its
    // partkey envelope is everything)
    val linear = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey").as("bucket"))
      .groupBy("bucket")
      .agg(min("l_partkey").as("part_min"), max("l_partkey").as("part_max"))
    val nLinear = linear.count()
    val linearPartFrac = linear
      .filter(col("part_max") >= pmax / 5 && col("part_min") <= pmax / 5 + pmax / 10)
      .count().toDouble / nLinear

    assert(partFrac < 0.5, s"z-layout must prune partkey ranges, touched $partFrac")
    assert(suppFrac < 0.5, s"z-layout must prune suppkey ranges, touched $suppFrac")
    assert(linearPartFrac > 0.9,
      s"single-column layout should NOT prune the other dimension ($linearPartFrac)")
    assert(partFrac < linearPartFrac / 2,
      s"z-order must beat the linear layout on the non-sort dimension: $partFrac vs $linearPartFrac")
    out.unpersist()
  }

  test("q_bloom_semijoin: result ≡ plain semi-join; prefilter actually screens") {
    val out = LayoutQueries.qBloomSemijoin(spark, sf)
    val build = Tables.orders(spark, sf)
      .filter(expr(LayoutQueries.BloomBuildPredicate)).select("o_orderkey")
    val plain = Tables.lineitem(spark, sf)
      .join(build, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        (sum(graft.functions.Exact.cents(col("l_extendedprice"))) / lit(100.0)).as("revenue"))
    assert(out.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)

    // prefilter selectivity: ~build fraction + fpp, far below 1.0
    val bf = build.stat.bloomFilter("o_orderkey", math.max(build.count(), 1L),
      LayoutQueries.BloomFpp)
    val mc = udf((k: Long) => bf.mightContain(k))
    val li = Tables.lineitem(spark, sf).select("l_orderkey")
    val frac = li.filter(mc(col("l_orderkey"))).count().toDouble / li.count()
    assert(frac < 0.4, s"bloom should screen most non-matching rows, passed $frac")
    // no false negatives: every true match passes the bloom
    val missed = li.join(build, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .filter(!mc(col("l_orderkey"))).count()
    assert(missed == 0)

    // observability contract: the accumulators registered by the call saw
    // every probe-side row, and the pass count brackets the true matches
    // (passed = matches + false positives; probed ≥ passed always). The
    // action that populated them is the collect() above.
    val (probedAcc, passedAcc) = LayoutQueries.lastBloomAccs
      .getOrElse(fail("qBloomSemijoin must register its accumulators"))
    val liTotal = li.count()
    val trueMatches = li
      .join(build, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(probedAcc.value >= liTotal,
      s"probed ${probedAcc.value} must cover all $liTotal probe rows")
    assert(passedAcc.value <= probedAcc.value)
    assert(passedAcc.value >= trueMatches,
      s"passed ${passedAcc.value} must include all $trueMatches true matches")
  }

  test("q_salted_agg: ≡ direct aggregation, exactly two exchanges (partial on salt)") {
    val salted = LayoutQueries.qSaltedAgg(spark, sf)
    val direct = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum(graft.functions.Exact.cents(col("l_extendedprice"))).as("revenue_cents"),
        count(lit(1)).as("n_lines"))
    assert(salted.collect().map(_.toString).sorted.toSeq ==
      direct.collect().map(_.toString).sorted.toSeq)
    // plan shape: phase 1 shuffles on (key, salt), phase 2 on key — two
    // exchanges total, the hot key spread over Salts reducers in phase 1
    salted.count()
    // the AQE string renders final + initial plans — count the final only
    val plan = salted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, plan had $exchanges:\n$plan")
    assert(plan.contains("__salt"), "partial aggregate must group on the salt")
  }

  test("q_salted_join: ≡ plain join; exchanges key on (join key, salt)") {
    val salted = LayoutQueries.qSaltedJoin(spark, sf)
    val plain = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_mktsegment"), col("value"))
    assert(salted.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq,
      "replica routing must lose and duplicate nothing")
    // every probe row meets exactly one build replica — no fan-out
    assert(salted.select("event_id").distinct().count() == salted.count())
    // the join's exchanges carry the salt: the hot key spreads JoinSalts ways
    salted.count()
    val plan = salted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin"), s"merge hint must pin SMJ:\n$plan")
    val saltedExchanges = "Exchange hashpartitioning\\([^)]*__salt".r
      .findAllIn(plan).length
    assert(saltedExchanges >= 2,
      s"both join inputs must partition on (key, __salt):\n$plan")
  }

  test("text_chunk: zero exchanges — the chunk explosion is narrow") {
    val q = graft.ext.text.TextQueries.qChunk(spark, sf)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("bucketed tables co-locate the join: zero Exchange in the physical plan") {
    // the C-family scale claim made physical: two tables bucketed on the
    // join key produce a SortMergeJoin with NO shuffle on either side —
    // at 100 TB this is the layout that lets a fact re-join its
    // co-bucketed dimensions (or itself) every day for free. Broadcast
    // is disabled for the assertion so the no-exchange proof is about
    // BUCKETING, not about a small table slipping under the threshold.
    import graft.sources.Tables
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"))
    ev.write.mode("overwrite").format("parquet")
      .bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("ev_bucketed")
    ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("user_stats_bucketed")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ev_bucketed")
        .join(spark.table("user_stats_bucketed"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the same join UNBUCKETED shuffles both sides — the cost bucketing
      // removes, asserted so the comparison is in the suite, not folklore
      val unbucketed = ev.join(
        ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_events")), "user_id")
      val uplan = unbucketed.queryExecution.executedPlan.toString
      assert(uplan.contains("Exchange"), "control: unbucketed join must shuffle")
      // correctness: identical result sets
      assert(joined.select("event_id", "n_events")
        .except(unbucketed.select("event_id", "n_events")).isEmpty)
      assert(joined.count() == ev.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS user_stats_bucketed")
    }
  }

  test("writeZOrdered: real file envelopes prune the non-sort dimension; linear layout cannot") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_z").toString
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey").cast("long").as("l_suppkey"))
    LayoutQueries.writeZOrdered(li, "l_partkey", "l_suppkey", s"$tmp/z", 8)
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey").write.parquet(s"$tmp/lin")
    // data preserved through the rewrite
    assert(spark.read.parquet(s"$tmp/z").as[(Long, Long)].collect().sorted.toSeq
      == li.as[(Long, Long)].collect().sorted.toSeq)
    def envs(p: String, c: String): Seq[(Long, Long)] =
      spark.read.parquet(p).groupBy(input_file_name())
        .agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
        .select("mn", "mx").as[(Long, Long)].collect().toSeq
    def touched(es: Seq[(Long, Long)], lo: Long, hi: Long): Double =
      es.count { case (a, b) => b >= lo && a <= hi }.toDouble / es.size
    // a central ~10% band on the suppkey dimension (the one the linear
    // layout does NOT sort by)
    val (smin, smax) = li.agg(min("l_suppkey"), max("l_suppkey"))
      .as[(Long, Long)].collect().head
    val mid = (smin + smax) / 2; val w = math.max((smax - smin) / 20, 1L)
    val (zf, lf) = (touched(envs(s"$tmp/z", "l_suppkey"), mid - w, mid + w),
      touched(envs(s"$tmp/lin", "l_suppkey"), mid - w, mid + w))
    assert(lf > 0.9, s"linear-on-partkey files should all straddle suppkey: $lf")
    assert(zf < lf, s"z-ordered files must prune the suppkey band: z=$zf lin=$lf")
    assert(zf <= 0.75, s"z-ordered files should skip a real fraction: $zf")
  }
}
