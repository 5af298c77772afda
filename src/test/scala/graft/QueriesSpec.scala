package graft

import org.apache.spark.sql.functions._

/** Smoke + semantic checks over the oracled queries at sf0.001 (the DuckDB
  * hash-compare itself is the driver's t2 gate; here we assert the
  * engine-side invariants the oracle can't see). */
class QueriesSpec extends SparkSpec {

  test("every registered query runs and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_window_agg: every event lands in exactly 2 sliding windows") {
    val events = graft.sources.Tables.events(spark, sf).count()
    val windowed = graft.etl.EventsQueries.qWindowAgg(spark, sf)
      .agg(sum("unique_events")).head().getLong(0)
    assert(windowed == 2 * events)
  }

  test("q_dedup keeps exactly one row per event_id") {
    val d = graft.etl.EventsQueries.qDedup(spark, sf)
    assert(d.groupBy("event_id").count().filter(col("count") > 1).isEmpty)
  }

  test("approx_count_distinct within 5% of exact (A3 tolerance, SURVEY §5.2)") {
    val approx = graft.etl.EventsQueries.qApproxDistinct(spark, sf)
    val exact = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("exact_users"))
    val joined = approx.join(exact, "event_type").collect()
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_users").toDouble
      val e = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")
    }
  }

  test("q1 pricing plan broadcasts nothing and pushes the shipdate filter") {
    val plan = graft.batch.AnalyticsQueries.q1Pricing(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$plan")
  }

  test("q5 plan broadcast-joins every dimension (no shuffle for dims)") {
    val plan = graft.batch.AnalyticsQueries.q5NationRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("knn_pq plan: both join inputs are materialized (giant-literal guard)") {
    // the round-3 30× regression class: the codes/LUT projections (128
    // codebook-literal arrays each) must NOT ride plan fusion into the
    // join→top-k stage — both BNLJ inputs have to be checkpoint scans
    val plan = graft.ext.sim.PqQueries.qKnnPq(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    val rddScans = "Scan ExistingRDD".r.findAllIn(plan).size
    assert(rddScans >= 2,
      s"expected both PQ join inputs checkpointed, found $rddScans RDD scans")
    assert(!plan.contains("arraydotlong"),
      "codebook distance expressions leaked past the materialization boundary")
  }

  test("text_tfidf plan: corpus N stays in-plan (broadcast totals cross-join)") {
    // the qBm25 discipline: the 1-row n_docs aggregate must reach the
    // scored rows as a broadcast cross-join, not a driver count() pre-pass
    // baked in as a literal (wrong N if tfidf is chained after a filter)
    val plan = graft.ext.text.TextQueries.qTfidf(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("dedup_embedding_lsh plan: candidate mass never shuffles, survivors-only distinct") {
    // the round-5 shape: signature groupBy + bucket posting lists + the
    // final survivors-only distinct are the ONLY exchanges; pair explode →
    // cosine → threshold must stay pipelined (no exchange between the
    // posting-list aggregate and the distinct), the vector attach must
    // broadcast, and no pre-threshold distinct may reappear upstream of
    // the cosine filter (that formulation shuffled ~0.5·n² candidate rows)
    val plan = graft.ext.dedup.DedupQueries.qEmbeddingDupsLsh(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "(?m)^.*Exchange hashpartitioning".r.findAllIn(plan).size
    // the four: plane-array construction (constant-sized, inside the
    // broadcast subtree), per-vector signature groupBy, bucket posting
    // lists, survivor distinct — nothing candidate-sized
    assert(exchanges <= 4,
      s"expected <= 4 exchanges (planes, signature, buckets, survivor distinct):\n${plan.take(3000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"vector attach must broadcast, not shuffle:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffle join anywhere in the bucketed path:\n${plan.take(2000)}")
  }

  test("q_asof_order plan: exactly two exchanges, no join operator at all") {
    // the as-of shape: one exchange collapses the build side per (key,
    // time), one partitions the union for the window — there is no join
    // node, so there is nothing that can blow up with version count
    val plan = graft.batch.SqlSurfaceQueries.qAsofOrder(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "(?m)^.*Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, plan:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }
}
