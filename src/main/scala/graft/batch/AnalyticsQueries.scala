package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/**
 * Batch analytics over the TPC-H-ish corpus — the bench headliners.
 *
 * These are the queries whose 100 TB shape matters most:
 *  - filters sit directly on scans (⇒ parquet predicate pushdown + column
 *    pruning; check `PushedFilters`/`ReadSchema` in the formatted plan);
 *  - dimensions (region/nation/supplier/customer/part) are broadcast —
 *    the lineitem side must never shuffle for a join against kilobytes;
 *  - aggregates are partial+final hash aggs on group keys whose cardinality
 *    (returnflag×linestatus, nation, custkey) stays bounded as data grows;
 *  - money sums use exact integer cents ([[graft.functions.Exact]]) so
 *    results, ranks and top-k cuts are deterministic at any parallelism.
 */
object AnalyticsQueries {

  private def revenueCents = Exact.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  /** TPC-H Q1-shaped pricing summary: one scan, one hash agg, 4-row output.
    * At 100 TB this is scan-bound; everything else is free. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(Exact.cents(col("l_quantity"))) / lit(100.0)).as("sum_qty"),
        (sum(Exact.cents(col("l_extendedprice"))) / lit(100.0)).as("sum_base_price"),
        (sum(revenueCents) / lit(100.0)).as("sum_disc_price"),
        (sum(Exact.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")))) / lit(100.0)).as("sum_charge"),
        (sum(Exact.cents(col("l_quantity"))).cast("double") / count(lit(1)) / lit(100.0)).as("avg_qty"),
        (sum(Exact.cents(col("l_discount"))).cast("double") / count(lit(1)) / lit(100.0)).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-shaped top-10 unshipped-revenue orders: broadcast the filtered
    * customer dim into orders⋈lineitem; deterministic top-k via total order
    * (revenue desc, orderkey). */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(revenueCents).as("revenue_cents"))
      .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        (col("revenue_cents") / lit(100.0)).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped regional revenue: the full 6-table star join with every
    * dimension broadcast; only lineitem⋈orders shuffles (on orderkey). */
  def q5NationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val reg  = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nat  = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(supp),
        li("l_suppkey") === supp("s_suppkey") && cust("c_nationkey") === supp("s_nationkey"))
      .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenueCents).as("revenue_cents"))
      .select(col("n_name"), (col("revenue_cents") / lit(100.0)).as("revenue"))
  }

  /** W1 generalized (reference kafka_spark_etl.py:72–78): top-3 customers by
    * order revenue within each nation — aggregate first (shrinks 100 TB of
    * orders to one row per customer), broadcast-join dims after, window last
    * over the already-small result. */
  def qTopCustomersPerNation(spark: SparkSession, dir: String): DataFrame = {
    val custRev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(Exact.cents(col("o_totalprice"))).as("rev_cents"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val nat  = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val w = Window.partitionBy("n_name").orderBy(col("rev_cents").desc, col("o_custkey"))
    custRev
      .join(broadcast(cust), custRev("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .withColumn("rank_in_nation", row_number().over(w).cast("long"))
      .filter(col("rank_in_nation") <= 3)
      .select(col("n_name"), col("o_custkey").as("custkey"),
        (col("rev_cents") / lit(100.0)).as("customer_revenue"), col("rank_in_nation"))
  }

  /** TPC-H Q6-shaped forecast-revenue delta: pure scan+filter+agg, the
    * canonical pushdown benchmark — every predicate must reach the parquet
    * reader. */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.04, 0.08) &&
        col("l_quantity") < 24)
      .agg((sum(Exact.cents(col("l_extendedprice") * col("l_discount"))) / lit(100.0))
        .as("revenue_delta"))

  /** TPC-H Q12-shaped late-shipment census: lines shipped >60 days after
    * order date, counted per order priority — integer date arithmetic,
    * one shuffle join on orderkey, tiny group key. */
  def q12LateLines(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L)
          .otherwise(0L)).as("late_lines"),
        count(lit(1)).as("total_lines"))
      .withColumn("late_share",
        col("late_lines").cast("double") / col("total_lines"))

  }

  /** TPC-H Q14-shaped promo revenue share: broadcast part dim; the share is
    * a single division of two exact cent sums ⇒ engine-identical double. */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO", revenueCents).otherwise(0L)).cast("double")
          / sum(revenueCents)).as("promo_share"),
        (sum(revenueCents) / lit(100.0)).as("total_revenue"))
  }

  /** Pivot: revenue by returnflag × linestatus as a wide table — Spark's
    * `pivot` with explicit values compiles to the same conditional
    * aggregation the oracle spells out, one hash agg either way. */
  def qPivotPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O", "P"))
      .agg(sum(revenueCents))
      .select(col("l_returnflag"),
        (coalesce(col("F"), lit(0L)) / lit(100.0)).as("F"),
        (coalesce(col("O"), lit(0L)) / lit(100.0)).as("O"),
        (coalesce(col("P"), lit(0L)) / lit(100.0)).as("P"))

  /** TPC-H Q9-shaped profit: the widest join graph in the suite
    * (lineitem ⋈ orders ⋈ part ⋈ supplier ⋈ nation), grouped by nation ×
    * order year. Dims broadcast; lineitem⋈orders is the one shuffle. */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_extendedprice"), col("l_discount"), col("l_quantity"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"))
    val pt = Tables.part(spark, dir).filter(col("p_type") === "PROMO")
      .select(col("p_partkey"), col("p_retailprice"))
    val sup = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg((sum(Exact.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        - col("p_retailprice") * col("l_quantity") * lit(0.4))) / lit(100.0)).as("profit"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q9_profit"         -> (q9Profit _),
    "q_pivot_pricing"   -> (qPivotPricing _),
    "q1_pricing"        -> (q1Pricing _),
    "q3_top_orders"     -> (q3TopOrders _),
    "q5_nation_revenue" -> (q5NationRevenue _),
    "q6_forecast"       -> (q6Forecast _),
    "q12_late_lines"    -> (q12LateLines _),
    "q14_promo_share"   -> (q14PromoShare _),
    "q_topk_per_nation" -> (qTopCustomersPerNation _))

  private val revCentsSql = Exact.centsSql("l_extendedprice * (1.0 - l_discount)")

  val oracles: Map[String, String] = Map(
    "q_pivot_pricing" ->
      s"""SELECT l_returnflag,
         |  (CAST(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN $revCentsSql END), 0) AS DOUBLE) / 100.0) AS F,
         |  (CAST(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN $revCentsSql END), 0) AS DOUBLE) / 100.0) AS O,
         |  (CAST(coalesce(sum(CASE WHEN l_linestatus = 'P' THEN $revCentsSql END), 0) AS DOUBLE) / 100.0) AS P
         |FROM lineitem GROUP BY 1""".stripMargin,
    "q9_profit" ->
      s"""SELECT n.n_name, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         |  (CAST(sum(${Exact.centsSql(
             "l_extendedprice * (1.0 - l_discount) - p_retailprice * l_quantity * 0.4")}) AS DOUBLE) / 100.0) AS profit
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN part p ON l.l_partkey = p.p_partkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |WHERE p.p_type = 'PROMO'
         |GROUP BY 1, 2""".stripMargin,
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  (CAST(sum(${Exact.centsSql("l_quantity")}) AS DOUBLE) / 100.0) AS sum_qty,
         |  (CAST(sum(${Exact.centsSql("l_extendedprice")}) AS DOUBLE) / 100.0) AS sum_base_price,
         |  (CAST(sum($revCentsSql) AS DOUBLE) / 100.0) AS sum_disc_price,
         |  (CAST(sum(${Exact.centsSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")}) AS DOUBLE) / 100.0) AS sum_charge,
         |  (CAST(sum(${Exact.centsSql("l_quantity")}) AS DOUBLE) / count(*) / 100.0) AS avg_qty,
         |  (CAST(sum(${Exact.centsSql("l_discount")}) AS DOUBLE) / count(*) / 100.0) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
         |GROUP BY 1, 2""".stripMargin,
    "q3_top_orders" ->
      s"""SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         |  (CAST(sum($revCentsSql) AS DOUBLE) / 100.0) AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
         |  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l.l_orderkey
         |LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      s"""SELECT n.n_name,
         |  (CAST(sum($revCentsSql) AS DOUBLE) / 100.0) AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |WHERE r.r_name = 'ASIA'
         |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1""".stripMargin,
    "q6_forecast" ->
      s"""SELECT (CAST(sum(${Exact.centsSql("l_extendedprice * l_discount")}) AS DOUBLE) / 100.0) AS revenue_delta
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.04 AND 0.08
         |  AND l_quantity < 24""".stripMargin,
    "q12_late_lines" ->
      """SELECT o.o_orderpriority,
        |  CAST(sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |                THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
        |  count(*) AS total_lines,
        |  CAST(CAST(sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |                THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / count(*) AS late_share
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,
    "q14_promo_share" ->
      s"""SELECT
         |  CAST(CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN $revCentsSql ELSE 0 END) AS BIGINT) AS DOUBLE)
         |    / CAST(sum($revCentsSql) AS BIGINT) AS promo_share,
         |  (CAST(sum($revCentsSql) AS DOUBLE) / 100.0) AS total_revenue
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin,
    "q_topk_per_nation" ->
      s"""WITH cust_rev AS (
         |  SELECT o_custkey, CAST(sum(${Exact.centsSql("o_totalprice")}) AS BIGINT) AS rev_cents
         |  FROM orders GROUP BY 1)
         |SELECT n.n_name, cr.o_custkey AS custkey,
         |  (CAST(cr.rev_cents AS DOUBLE) / 100.0) AS customer_revenue,
         |  row_number() OVER (
         |    PARTITION BY n.n_name
         |    ORDER BY cr.rev_cents DESC, cr.o_custkey) AS rank_in_nation
         |FROM cust_rev cr
         |JOIN customer c ON cr.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |QUALIFY rank_in_nation <= 3""".stripMargin)
}
