package graft.batch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Engine-side invariants for the TPC-H breadth family (the DuckDB
  * hash-compare is the driver's gate; these pin the semantics the oracle
  * can't see — rewrite equivalences and plan shapes). Runs at sf0.001. */
class TpchBreadthSpec extends SparkSpec {

  test("q2: every surviving row carries its part's minimum cost (window rewrite)") {
    val rows = TpchBreadthQueries.q2MinCostSupp(spark, sf)
    val perPartMins = rows.groupBy("p_partkey")
      .agg(countDistinct("unit_cost").as("n_costs"))
      .filter(col("n_costs") > 1)
    assert(perPartMins.isEmpty, "a part surfaced more than one 'minimum' cost")
    assert(rows.count() > 0)
  }

  test("q4: semi-join equals distinct-late-orders count (EXISTS rewrite)") {
    val viaSemi = TpchBreadthQueries.q4PriorityExists(spark, sf)
      .agg(sum("order_count")).head().getLong(0)
    val ord = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
    val naive = ord.join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .select("o_orderkey").distinct().count()
    assert(viaSemi == naive, s"semi=$viaSemi naive=$naive")
  }

  test("q13: distribution covers every customer exactly once") {
    val total = TpchBreadthQueries.q13CustDist(spark, sf)
      .agg(sum("custdist")).head().getLong(0)
    assert(total == Tables.customer(spark, sf).count())
  }

  test("q15: returned revenue is the suite-wide maximum (ties all surface)") {
    val top = TpchBreadthQueries.q15TopSupplier(spark, sf).collect()
    assert(top.nonEmpty)
    val revs = top.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, "tied winners must share one revenue value")
  }

  test("q18: every order in the result clears the quantity threshold") {
    val bad = TpchBreadthQueries.q18BigOrders(spark, sf)
      .filter(col("total_qty") <= 140.0)
    assert(bad.isEmpty)
  }

  test("q21: one-pass aggregate formulation equals the EXISTS/NOT-EXISTS self-joins") {
    // sf0.01, not sf0.001: the tiny scale has NO sole-late suppliers, and
    // empty == empty proves nothing about the rewrite
    val sf = "/root/testdata/sf0.01"
    val agg = TpchBreadthQueries.q21SoleLate(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(agg.nonEmpty, "equivalence check is vacuous on an empty result")
    // the textbook form: late l1 joined against other-supplier existence and
    // other-late-supplier absence via distinct self-join projections
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    val ord = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
    val supp = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf).filter(col("n_name") === "NATION_2"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    val l1 = li.filter(late).join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey").as("k1"), col("l_suppkey").as("sk1"),
        col("s_name"))
    val others = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("sk2")).distinct()
    val lateOthers = li.filter(late)
      .select(col("l_orderkey").as("k3"), col("l_suppkey").as("sk3")).distinct()
    val naive = l1
      .join(others, col("k1") === col("k2") && col("sk1") =!= col("sk2"), "left_semi")
      .join(lateOthers, col("k1") === col("k3") && col("sk1") =!= col("sk3"), "left_anti")
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(agg == naive, s"agg=$agg naive=$naive")
  }

  test("q17: window-rewrite equals the groupBy-join formulation") {
    val viaWindow = TpchBreadthQueries.q17SmallQtyLoss(spark, sf)
      .head().getDouble(0)
    val parts = Tables.part(spark, sf)
      .filter(col("p_brand") === "Brand#3").select(col("p_partkey"))
    val li = Tables.lineitem(spark, sf)
      .join(parts, col("l_partkey") === col("p_partkey"), "left_semi")
    val avgs = li.groupBy(col("l_partkey").as("k"))
      .agg((sum(graft.functions.Exact.cents(col("l_quantity"))).cast("double")
        / count(lit(1)) / lit(100.0)).as("avg_qty"))
    val viaJoin = li.join(avgs, col("l_partkey") === col("k"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((sum(graft.functions.Exact.cents(col("l_extendedprice"))).cast("double")
        / lit(100.0) / lit(7.0)).as("avg_yearly"))
      .head().getDouble(0)
    assert(viaWindow == viaJoin)
  }

  test("plans: dims broadcast in q10/q19; orders date filter pushed in q4") {
    val p10 = TpchBreadthQueries.q10Returned(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p10.contains("BroadcastHashJoin"), p10)
    val p19 = TpchBreadthQueries.q19Disjunctive(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p19.contains("BroadcastHashJoin"), p19)
    val p4 = TpchBreadthQueries.q4PriorityExists(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p4.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"orders date filter not pushed:\n$p4")
    assert(p4.contains("LeftSemi"), p4)
  }

  test("plans: no partition-less WindowExec in the global-scalar queries (q11/q15/q22)") {
    // the r11 verdict's three scale-killers: a global scalar computed as
    // X.over(Window.partitionBy()) funnels a data-scaling frame through ONE
    // task. All three now ride 1-row broadcast aggregates — assert the
    // plans carry NO window at all, so the anti-pattern cannot regress.
    Seq("q11_part_value" -> TpchBreadthQueries.q11PartValue _,
        "q15_top_supplier" -> TpchBreadthQueries.q15TopSupplier _,
        "q22_idle_custs" -> TpchBreadthQueries.q22IdleCusts _).foreach {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        assert(!plan.contains("Window"),
          s"$name regained a window operator:\n$plan")
        assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
          s"$name lost its broadcast scalar:\n$plan")
    }
  }

  test("non-vacuous at sf0.001: row-returning breadth queries return rows") {
    // q21/q22 select rare events (sole-late supplier, lapsed rich customer)
    // and only yield rows from sf0.01 up — the scale the driver's oracle
    // gate runs at; here just exercise their plans. Global aggregates
    // (q17/q19) always emit exactly one row, so "has rows" is vacuous for
    // them — assert the aggregate VALUE is non-null instead (a null means
    // the filters matched nothing). The rest must be non-empty even here.
    val rareAtTinyScale = Set("q21_sole_late", "q22_idle_custs")
    val globalAggs = Set("q17_small_qty_loss", "q19_disjunctive")
    (TpchBreadthQueries.queries.keySet -- rareAtTinyScale -- globalAggs).foreach { name =>
      val n = TpchBreadthQueries.queries(name)(spark, sf).count()
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
    globalAggs.foreach { name =>
      val row = TpchBreadthQueries.queries(name)(spark, sf).head()
      assert(!row.isNullAt(0), s"$name aggregate is null at sf0.001 (empty match)")
    }
    rareAtTinyScale.foreach { name =>
      assert(TpchBreadthQueries.queries(name)(spark, sf).count() >= 0)
    }
  }
}
