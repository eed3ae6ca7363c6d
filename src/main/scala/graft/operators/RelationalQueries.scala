package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, OracleParity => OP}

/** Core relational operators over the star schema: scans (S4),
  * projections/filters (P7), joins (J4–J10), aggregations (A2–A8),
  * sorts/limits (O1–O3). SURVEY.md §2.1–2.6.
  *
  * Every query takes the sf directory as a parameter and is deterministic
  * (stable ORDER BY, exact decimal sums) for the DuckDB oracle.
  * Scale posture: dimension joins broadcast the small side; aggregations
  * are hash-agg with map-side partial combine; filters/projections push
  * into the parquet scan.
  */
object RelationalQueries {

  /** A2: pricing-summary rollup (TPC-H Q1 shape) over lineitem.
    * Single scan → partial+final hash agg; no shuffle besides the agg.
    * Reference behavior source: status rollups, /root/reference/README.md:82,156.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        OP.moneySum(col("l_quantity")).as("sum_qty"),
        OP.moneySum(col("l_extendedprice")).as("sum_base_price"),
        OP.revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        OP.moneyAvg(col("l_quantity")).as("avg_qty"),
        OP.moneyAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** J4: star-schema dimension join chain
    * lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region → revenue per nation.
    * customer/nation/region are broadcast (dims ≪ fact); only the
    * lineitem⋈orders join shuffles — and AQE converts it to broadcast at
    * small SF. At 100 TB: orders/lineitem co-bucketed by orderkey.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        OP.revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** O2: global top-k — top 10 customers by order revenue.
    * Plans as TakeOrderedAndProject (per-partition heap, no global sort).
    */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    o.groupBy(col("o_custkey"))
      .agg(OP.moneySum(col("o_totalprice")).as("total_spent"),
        count(lit(1)).as("n_orders"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spent"), col("n_orders"))
      .orderBy(col("total_spent").desc, col("c_custkey"))
      .limit(10)
  }

  /** J5: left outer join — every customer with their order count/revenue,
    * customers without orders kept at zero. Aggregate-then-join keeps the
    * shuffle on the smaller pre-aggregated side.
    */
  def customerOrderCounts(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val perCust = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_cnt"), OP.moneySum(col("o_totalprice")).as("revenue"))
    c.join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"), col("c_mktsegment"),
        coalesce(col("order_cnt"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy(col("c_custkey"))
  }

  /** J6: left semi join — customers having at least one URGENT order. */
  def urgentCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val urgent = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** J7: left anti join — customers with no URGENT order (set-difference
    * by key; every customer has ≥1 order in testdata so the unfiltered
    * variant would be vacuously empty). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val urgent = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  val queries: Map[String, graft.Q] = Map(
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_revenue_by_nation" -> (revenueByNation _),
    "q03_top_customers" -> (topCustomers _),
    "q04_customer_order_counts" -> (customerOrderCounts _),
    "q05_urgent_customers" -> (urgentCustomers _),
    "q06_customers_without_orders" -> (customersWithoutOrders _))

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_disc_price,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity), 6) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice), 6) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q03_top_customers" ->
      """SELECT c_custkey, c_name, total_spent, n_orders FROM (
        |  SELECT o_custkey,
        |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_spent,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY o_custkey
        |) JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_spent DESC, c_custkey
        |LIMIT 10""".stripMargin,
    "q04_customer_order_counts" ->
      """SELECT c_custkey, c_mktsegment,
        |  coalesce(order_cnt, 0) AS n_orders,
        |  coalesce(revenue, CAST(0.0 AS DOUBLE)) AS revenue
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS order_cnt,
        |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
        |  FROM orders GROUP BY o_custkey
        |) ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q05_urgent_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q06_customers_without_orders" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
}
