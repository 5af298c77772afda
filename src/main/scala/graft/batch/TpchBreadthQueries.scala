package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/**
 * The rest of the TPC-H query family, adapted to this corpus's schema
 * (TESTDATA.md: no partsupp table, no commit/receipt dates — `lineitem`
 * doubles as the part↔supplier relation, and "late" means shipped >N days
 * after the order date). Together with [[AnalyticsQueries]] this covers
 * every TPC-H query shape: correlated scalar subqueries, EXISTS /
 * NOT-EXISTS, IN over grouped HAVING, disjunctive predicate pushdown,
 * outer-join distributions, and global-scalar HAVING cuts.
 *
 * Scale notes repeated from [[AnalyticsQueries]]: dimension tables are
 * broadcast (a lineitem-side shuffle against kilobytes is never
 * acceptable); every money aggregate goes through exact integer cents
 * ([[Exact]]) so sums, ranks and top-k cuts are engine- and
 * partitioning-deterministic; filters sit directly on scans for parquet
 * pushdown. Where TPC-H writes a correlated subquery, the scalable plan is
 * an aggregate + self-join or a window over the already-reduced aggregate —
 * each query documents which rewrite it uses and why it survives 100 TB.
 */
object TpchBreadthQueries {

  private def revenueCents = Exact.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  /** Q2-shaped min-cost supplier: for each STANDARD large part, the
    * supplier(s) in EUROPE with the cheapest observed unit price.
    * TPC-H's correlated MIN subquery becomes a window MIN over the
    * (part, supplier) aggregate — the aggregate shrinks lineitem to
    * dimension cardinality first, so the window sees bounded input and the
    * plan needs no second scan (one shuffle for the agg, one for the
    * window, both on part-sized data). */
  def q2MinCostSupp(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD" && col("p_size") >= 40)
      .select(col("p_partkey"), col("p_name"), col("p_size"))
    val euroSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    // unit cost in exact cents: IEEE division of two identical doubles is
    // bit-identical across engines, then one rounding to integer
    val supply = Tables.lineitem(spark, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(euroSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("p_size"),
        col("s_suppkey"), col("s_name"), col("n_name"))
      .agg(min(Exact.cents(col("l_extendedprice") / col("l_quantity"))).as("cost_cents"))
    val w = Window.partitionBy(col("p_partkey"))
    supply
      .withColumn("min_cost", min(col("cost_cents")).over(w))
      .filter(col("cost_cents") === col("min_cost"))
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        col("s_suppkey"), col("s_name"), col("n_name"),
        (col("cost_cents") / lit(100.0)).as("unit_cost"))
  }

  /** Q4-shaped priority check: orders from 1997Q1 with at least one line
    * shipped >30 days after the order date, counted per priority. EXISTS
    * compiles to a LEFT SEMI join on orderkey with the lateness predicate
    * inside the join condition — one shuffle, no duplicate-orders blowup. */
  def q4PriorityExists(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** Q7-shaped bilateral trade volume: revenue shipped between two nations
    * (either direction) per year. Both dims are pre-filtered to the two
    * target nations BEFORE any fact-side join — the OR pair predicate
    * spans two relations so Catalyst can't push it below the joins itself,
    * but its single-relation implications (supp ∈ {A,B}, cust ∈ {A,B})
    * can be applied manually, and the inner supplier join then drops
    * ~23/25ths of lineitem before the one orderkey shuffle. The residual
    * pair filter removes the two same-nation combinations. */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val natA = "NATION_3"; val natB = "NATION_7"
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name").isin(natA, natB))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name").isin(natA, natB))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter((col("supp_nation") === natA && col("cust_nation") === natB) ||
              (col("supp_nation") === natB && col("cust_nation") === natA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg((sum(revenueCents) / lit(100.0)).as("volume"))
  }

  /** Q8-shaped market share: of all ECONOMY-part revenue sold into ASIA,
    * the fraction supplied by NATION_8, per order year. The share is a
    * conditional aggregate over one join tree — numerator and denominator
    * come from the SAME aggregation, not two query arms (TPC-H's nested
    * all_nations subquery), so the fact side is scanned once. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val target = "NATION_8"
    val asiaCust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNat = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val econParts = Tables.part(spark, dir).filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(econParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === target, revenueCents).otherwise(0L)).cast("double")
          / sum(revenueCents)).as("mkt_share"),
        (sum(revenueCents) / lit(100.0)).as("total_volume"))
  }

  /** Q10-shaped returned-item report: top 20 customers by revenue lost to
    * returns in 1997Q3. Aggregate on custkey BEFORE widening with the
    * (broadcast) customer/nation dims; deterministic top-k via exact cents
    * + custkey tiebreak. */
  def q10Returned(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val lost = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(revenueCents).as("rev_cents"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
    lost.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"),
        col("rev_cents"))
      .orderBy(col("rev_cents").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"),
        (col("rev_cents") / lit(100.0)).as("revenue"))
  }

  /** Q11-shaped important parts: parts whose shipped value from NATION_3
    * suppliers exceeds 0.1% of that nation's total. The global scalar is a
    * 1-ROW aggregate of the per-part frame, attached by a broadcast cross
    * join — never `sum().over(Window.partitionBy())`, which would funnel
    * the part-grain frame (scales with SF: ~200 M rows at 1000×) through
    * ONE WindowExec task. The per-part aggregate appears twice in the
    * plan but its shuffle is identical on both sides, so ReuseExchange
    * (and AQE stage reuse) scans and aggregates the fact once. */
  def q11PartValue(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = Tables.lineitem(spark, dir)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(Exact.cents(col("l_extendedprice"))).as("value_cents"))
    val total = value.agg(sum(col("value_cents")).as("total_cents"))
    value
      .crossJoin(broadcast(total))
      .filter(col("value_cents").cast("double") > col("total_cents").cast("double") * lit(0.001))
      .select(col("l_partkey"), (col("value_cents") / lit(100.0)).as("part_value"))
  }

  /** Q13-shaped customer order distribution: how many customers placed k
    * orders (URGENT orders excluded, mirroring Q13's comment filter). The
    * LEFT OUTER join keeps zero-order customers; two bounded shuffles
    * (custkey, then the tiny count-of-counts). */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** Q15-shaped top supplier: supplier(s) with the maximum revenue in
    * 1997H2. TPC-H's MAX-over-view scalar subquery is a 1-row MAX
    * aggregate of the per-supplier frame broadcast back over it — ties
    * all surface, exactly as the spec requires, and no data-scaling
    * frame ever rides a partition-less window (supplier cardinality
    * grows with SF). ReuseExchange collapses the twice-referenced
    * per-supplier aggregate to one fact scan + one shuffle. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-07-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revenueCents).as("rev_cents"))
    val supp = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))
    val maxRev = rev.agg(max(col("rev_cents")).as("max_rev"))
    rev
      .crossJoin(broadcast(maxRev))
      .filter(col("rev_cents") === col("max_rev"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_cents") / lit(100.0)).as("total_revenue"))
  }

  /** Q16-shaped supplier census: distinct suppliers per (brand, type, size)
    * for non-PROMO, non-Brand#5 parts in selected sizes, excluding
    * negative-balance suppliers (Q16's complaints filter). The part↔supplier
    * relation is the DISTINCT (partkey, suppkey) projection of lineitem —
    * aggregated before the dim joins so the count-distinct shuffle carries
    * two longs per row. */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 5, 10, 15, 20, 25, 30, 35)
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val badSupp = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    // no pre-distinct (r16, guide §2.4): countDistinct is insensitive to
    // (partkey, suppkey) multiplicity, and the former
    // `.select(pk, sk).distinct()` paid a FULL lineitem-grain exchange
    // before the selective broadcast joins could prune anything. The
    // distinct-aggregate below dedups map-side on the (brand, type,
    // size, suppkey) grain — strictly fewer shuffled bytes at any scale.
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Q17-shaped small-quantity revenue: average yearly revenue that would
    * be lost by refusing orders below 20% of a part's mean quantity
    * (Brand#3). The correlated per-part AVG becomes a window over the
    * brand-filtered join — one scan, one shuffle on partkey; the mean uses
    * exact integer quantity-cents so the 0.2·avg threshold is
    * engine-identical. */
  def q17SmallQtyLoss(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#3").select(col("p_partkey"))
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
      .withColumn("avg_qty",
        sum(Exact.cents(col("l_quantity"))).over(w).cast("double")
          / count(lit(1)).over(w) / lit(100.0))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((sum(Exact.cents(col("l_extendedprice"))).cast("double") / lit(100.0) / lit(7.0))
        .as("avg_yearly"))
  }

  /** Q18-shaped large-volume orders: orders whose total quantity exceeds
    * 140 units, with their customers — IN over a grouped HAVING. The
    * quantity aggregate runs first (one shuffle on orderkey) and joins
    * orders on the same key — NO broadcast hint: the threshold sits near
    * the order-size mean, so survivors are a constant fraction of all
    * orders (~24% here), not a dimension; AQE picks the strategy from the
    * aggregate's real size. Customer resolves by broadcast. Top-100 by
    * totalprice with orderkey tiebreak. */
  def q18BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(Exact.cents(col("l_quantity"))).as("qty_cents"))
      .filter(col("qty_cents") > 140L * 100L)
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    Tables.orders(spark, dir)
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        (col("qty_cents") / lit(100.0)).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q19-shaped disjunctive revenue: three (brand, size, quantity)
    * conjunct groups OR-ed together. The disjunction lives in the JOIN
    * condition against the broadcast part dim, so each lineitem row tests
    * the whole OR once — no union of three scans. */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val cond =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    Tables.lineitem(spark, dir)
      .join(broadcast(pt), col("l_partkey") === col("p_partkey") && cond)
      .agg((sum(revenueCents) / lit(100.0)).as("revenue"))
  }

  /** Q20-shaped qualified suppliers: NATION_13 suppliers that shipped more
    * than 100 units of some red part — a chain of semi-joins ending in the
    * (tiny) supplier dim. The quantity qualification aggregates
    * (suppkey, partkey) first; everything after operates on dimension-sized
    * data. */
  def q20QtySuppliers(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(spark, dir)
      .filter(col("p_name").like("red %")).select(col("p_partkey"))
    val qualified = Tables.lineitem(spark, dir)
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(Exact.cents(col("l_quantity"))).as("qty_cents"))
      .filter(col("qty_cents") > 100L * 100L)
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_13")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(qualified), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
  }

  /** Q21-shaped sole-late supplier: NATION_2 suppliers that were the ONLY
    * late shipper (>60 days after order date) on a completed multi-supplier
    * order. TPC-H's EXISTS + NOT EXISTS pair over lineitem self-joins is
    * folded into a TWO-LEVEL aggregate: level 1 groups the fact rows by
    * (orderkey, suppkey) — per-supplier late-line counts and the (constant)
    * target-nation name; level 2 groups that by orderkey — supplier count,
    * late-supplier count, and the sole late supplier's name + late lines.
    * The fact table is scanned ONCE, and neither level is a DISTINCT
    * aggregate, so there is NO Expand: the orderkey-level
    * double-countDistinct form this replaces shuffled ~3 rows per lineitem
    * (one per distinct group + one for the plain agg), the dominant
    * constant in the 10× scale probe (SCALING.md); the two-level form
    * shuffles each row once per level with level 2 already collapsed to
    * (order, supplier) grain. After the n_late_supp == 1 cut, late_name
    * and n_late_lines are exactly the sole late supplier's — null name
    * (supplier outside NATION_2) drops the order, matching the oracle's
    * join on the target nation. Semantics identical to the self-join form
    * (spec-pinned; the oracle spells the EXISTS form). */
  def q21SoleLate(spark: SparkSession, dir: String): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_2")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left")
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(
        sum(when(late, 1L).otherwise(0L)).as("late_lines"),
        max(col("s_name")).as("s_name"))
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        sum(when(col("late_lines") > 0, 1L).otherwise(0L)).as("n_late_supp"),
        max(when(col("late_lines") > 0, col("s_name"))).as("late_name"),
        sum(when(col("late_lines") > 0, col("late_lines")).otherwise(0L))
          .as("n_late_lines"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1 &&
        col("late_name").isNotNull)
      .groupBy(col("late_name").as("s_name"))
      .agg(sum(col("n_late_lines")).as("numwait"))
  }

  /** Q22-shaped idle customers: rich customers (balance above the
    * positive-balance average) from five nations with no orders since
    * 2000 (this corpus is dense enough that "no orders ever" is vacuous).
    * The global AVG is a 1-row aggregate of the filtered customer dim
    * broadcast back over it (customers scale with SF, so a partition-less
    * window here would funnel every customer row through one task); the
    * lapsed test is a LEFT ANTI join on the DISTINCT custkeys of
    * recent orders (aggregated before the join so the anti-join probe is
    * dimension-sized, and the date filter pushes to the orders scan). */
  def q22IdleCusts(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_nationkey").isin(3, 8, 13, 18, 23))
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    val active = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    // identical arithmetic shape to the oracle: exact-cents sum cast to
    // double, count division, one /100.0 — the same IEEE doubles as the
    // former window form, just computed in a 1-row aggregate
    val avgBal = cust.agg(
      (sum(when(col("c_acctbal") > 0.0, Exact.cents(col("c_acctbal")))).cast("double")
        / sum(when(col("c_acctbal") > 0.0, 1L).otherwise(0L)) / lit(100.0)).as("avg_bal"))
    cust
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        (sum(Exact.cents(col("c_acctbal"))) / lit(100.0)).as("totacctbal"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supp"  -> (q2MinCostSupp _),
    "q4_priority_exists" -> (q4PriorityExists _),
    "q7_nation_volume"  -> (q7NationVolume _),
    "q8_market_share"   -> (q8MarketShare _),
    "q10_returned"      -> (q10Returned _),
    "q11_part_value"    -> (q11PartValue _),
    "q13_custdist"      -> (q13CustDist _),
    "q15_top_supplier"  -> (q15TopSupplier _),
    "q16_supplier_cnt"  -> (q16SupplierCnt _),
    "q17_small_qty_loss" -> (q17SmallQtyLoss _),
    "q18_big_orders"    -> (q18BigOrders _),
    "q19_disjunctive"   -> (q19Disjunctive _),
    "q20_qty_suppliers" -> (q20QtySuppliers _),
    "q21_sole_late"     -> (q21SoleLate _),
    "q22_idle_custs"    -> (q22IdleCusts _))

  private val revCentsSql = Exact.centsSql("l_extendedprice * (1.0 - l_discount)")

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supp" ->
      s"""WITH supply AS (
         |  SELECT p.p_partkey, p.p_name, p.p_size,
         |    s.s_suppkey, s.s_name, n.n_name,
         |    min(${Exact.centsSql("l_extendedprice / l_quantity")}) AS cost_cents
         |  FROM lineitem l
         |  JOIN part p ON l.l_partkey = p.p_partkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  JOIN nation n ON s.s_nationkey = n.n_nationkey
         |  JOIN region r ON n.n_regionkey = r.r_regionkey
         |  WHERE p.p_type = 'STANDARD' AND p.p_size >= 40 AND r.r_name = 'EUROPE'
         |  GROUP BY 1, 2, 3, 4, 5, 6)
         |SELECT p_partkey, p_name, p_size, s_suppkey, s_name, n_name,
         |  (CAST(cost_cents AS DOUBLE) / 100.0) AS unit_cost
         |FROM supply
         |WHERE cost_cents = (SELECT min(cost_cents) FROM supply s2
         |                    WHERE s2.p_partkey = supply.p_partkey)""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1""".stripMargin,
    "q7_nation_volume" ->
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         |  CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
         |  (CAST(sum($revCentsSql) AS DOUBLE) / 100.0) AS volume
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         |WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
         |   OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3')
         |GROUP BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      s"""SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         |  CAST(CAST(sum(CASE WHEN sn.n_name = 'NATION_8' THEN $revCentsSql ELSE 0 END) AS BIGINT) AS DOUBLE)
         |    / CAST(sum($revCentsSql) AS BIGINT) AS mkt_share,
         |  (CAST(sum($revCentsSql) AS DOUBLE) / 100.0) AS total_volume
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN part p ON l.l_partkey = p.p_partkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         |WHERE p.p_type = 'ECONOMY'
         |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND o.o_custkey IN (
         |    SELECT c.c_custkey FROM customer c
         |    JOIN nation n ON c.c_nationkey = n.n_nationkey
         |    JOIN region r ON n.n_regionkey = r.r_regionkey
         |    WHERE r.r_name = 'ASIA')
         |GROUP BY 1""".stripMargin,
    "q10_returned" ->
      s"""SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
         |  (CAST(sum($revCentsSql) AS DOUBLE) / 100.0) AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE l.l_returnflag = 'R'
         |  AND o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
         |  AND o.o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY sum($revCentsSql) DESC, c.c_custkey
         |LIMIT 20""".stripMargin,
    "q11_part_value" ->
      s"""WITH value AS (
         |  SELECT l_partkey, CAST(sum(${Exact.centsSql("l_extendedprice")}) AS BIGINT) AS value_cents
         |  FROM lineitem
         |  WHERE l_suppkey IN (
         |    SELECT s_suppkey FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
         |    WHERE n.n_name = 'NATION_3')
         |  GROUP BY 1)
         |SELECT l_partkey, (CAST(value_cents AS DOUBLE) / 100.0) AS part_value
         |FROM value
         |WHERE CAST(value_cents AS DOUBLE) >
         |  (SELECT CAST(sum(value_cents) AS DOUBLE) FROM value) * CAST(0.001 AS DOUBLE)""".stripMargin,
    "q13_custdist" ->
      """WITH counts AS (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT OUTER JOIN orders o
        |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM counts GROUP BY 1""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, CAST(sum($revCentsSql) AS BIGINT) AS rev_cents
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-07-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  GROUP BY 1)
         |SELECT s.s_suppkey, s.s_name,
         |  (CAST(rev_cents AS DOUBLE) / 100.0) AS total_revenue
         |FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
         |WHERE rev_cents = (SELECT max(rev_cents) FROM rev)""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  count(DISTINCT ps.l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part p ON ps.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#5'
        |  AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q17_small_qty_loss" ->
      s"""WITH li AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice,
         |    CAST(sum(${Exact.centsSql("l_quantity")}) OVER (PARTITION BY l_partkey) AS DOUBLE)
         |      / count(*) OVER (PARTITION BY l_partkey) / 100.0 AS avg_qty
         |  FROM lineitem
         |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3'))
         |SELECT (CAST(CAST(sum(${Exact.centsSql("l_extendedprice")}) AS BIGINT) AS DOUBLE) / 100.0 / 7.0)
         |  AS avg_yearly
         |FROM li WHERE l_quantity < CAST(0.2 AS DOUBLE) * avg_qty""".stripMargin,
    "q18_big_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, CAST(sum(${Exact.centsSql("l_quantity")}) AS BIGINT) AS qty_cents
         |  FROM lineitem GROUP BY 1
         |  HAVING CAST(sum(${Exact.centsSql("l_quantity")}) AS BIGINT) > 14000)
         |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
         |  (CAST(qty_cents AS DOUBLE) / 100.0) AS total_qty
         |FROM orders o
         |JOIN big ON o.o_orderkey = big.l_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |ORDER BY o.o_totalprice DESC, o.o_orderkey
         |LIMIT 100""".stripMargin,
    "q19_disjunctive" ->
      s"""SELECT (CAST(sum($revCentsSql) AS DOUBLE) / 100.0) AS revenue
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
         |       AND l.l_quantity BETWEEN 1 AND 11)
         |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
         |       AND l.l_quantity BETWEEN 10 AND 20)
         |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
         |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20_qty_suppliers" ->
      s"""SELECT s.s_suppkey, s.s_name, s.s_acctbal
         |FROM supplier s
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |WHERE n.n_name = 'NATION_13'
         |  AND s.s_suppkey IN (
         |    SELECT l_suppkey FROM lineitem
         |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
         |    GROUP BY l_suppkey, l_partkey
         |    HAVING CAST(sum(${Exact.centsSql("l_quantity")}) AS BIGINT) > 10000)""".stripMargin,
    "q21_sole_late" ->
      """SELECT s.s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders o ON l1.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE o.o_orderstatus = 'F'
        |  AND n.n_name = 'NATION_2'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin,
    "q22_idle_custs" ->
      s"""WITH pool AS (
         |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
         |  WHERE c_nationkey IN (3, 8, 13, 18, 23)),
         |avg_bal AS (
         |  SELECT CAST(sum(CASE WHEN c_acctbal > 0.0 THEN ${Exact.centsSql("c_acctbal")} END) AS DOUBLE)
         |    / sum(CASE WHEN c_acctbal > 0.0 THEN 1 ELSE 0 END) / 100.0 AS v
         |  FROM pool)
         |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
         |  (CAST(sum(${Exact.centsSql("c_acctbal")}) AS DOUBLE) / 100.0) AS totacctbal
         |FROM pool
         |WHERE c_acctbal > (SELECT v FROM avg_bal)
         |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = pool.c_custkey
         |                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         |GROUP BY 1""".stripMargin)
}
