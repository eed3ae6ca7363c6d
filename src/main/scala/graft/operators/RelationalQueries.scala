package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Tables, OracleParity => OP}
import scala.collection.immutable.ListMap

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
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
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

  /** J8: theta/range join — parts bucketed into literal price bands
    * (non-equi BETWEEN predicate). The band table is tiny and broadcast, so
    * this plans as BroadcastNestedLoopJoin over 3 rows — the only sane
    * physical shape for a range join against a small interval table; at
    * 100 TB the fact side streams through unchanged.
    */
  def priceBandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("budget", 0.0, 1000.0),
      ("mid", 1000.0, 5000.0),
      ("premium", 5000.0, 1e18)).toDF("band", "lo", "hi")
    Tables(spark, dir, "part")
      .join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_parts"),
        OP.moneyAvg(col("p_retailprice")).as("avg_price"))
      .orderBy(col("band"))
  }

  /** J9: as-of join — for each purchase event, the latest view event by the
    * same user at-or-before the purchase. Spark has no ASOF JOIN; the
    * scalable rendering is an equi-join on the key + range predicate, then
    * row_number()=1 per purchase (the join shuffles once on user_id; the
    * window re-uses that partitioning). Left join keeps purchases with no
    * prior view. Oracle: DuckDB native ASOF LEFT JOIN.
    */
  def asofViewBeforePurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
    val joined = purchases.join(views,
      col("p_user") === col("v_user") && col("v_ts") <= col("p_ts"), "left")
    val w = Window.partitionBy(col("p_id"))
      .orderBy(col("v_ts").desc, col("v_id").desc)
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_id"), col("p_user"), col("v_id"),
        round(col("p_ts").cast("double") - col("v_ts").cast("double"), 6)
          .as("gap_sec"))
      .orderBy(col("p_id"))
  }

  /** J10: guarded cross join — all (region, nation) pairs with a computed
    * flag. Cross joins are only ever sane when one side is broadcast-tiny;
    * here both are dimensions (5 × 25 rows).
    */
  def regionNationPairs(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables(spark, dir, "region")
    val n = Tables(spark, dir, "nation")
    r.crossJoin(broadcast(n))
      .select(col("r_name"), col("n_name"),
        (col("r_regionkey") === col("n_regionkey")).as("is_home"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** J5 (full outer): daily order counts ⟗ daily event counts on calendar
    * day. The two date ranges are disjoint in testdata, so both null sides
    * of the full outer join are genuinely exercised.
    */
  def dailyActivityFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val od = Tables(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val ed = Tables(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    od.join(ed, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("day"))
  }

  /** J5 (right outer): supplier counts per nation, keeping nations with no
    * suppliers. The aggregated (small) side is on the left so the right
    * outer join preserves the full dimension.
    */
  def suppliersPerNation(spark: SparkSession, dir: String): DataFrame = {
    val perNation = Tables(spark, dir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("cnt"), OP.moneySum(col("s_acctbal")).as("total_bal"))
    perNation.join(Tables(spark, dir, "nation"),
        col("s_nationkey") === col("n_nationkey"), "right_outer")
      .select(col("n_name"),
        coalesce(col("cnt"), lit(0L)).as("n_suppliers"),
        coalesce(col("total_bal"), lit(0.0)).as("total_bal"))
      .orderBy(col("n_name"))
  }

  val queries: ListMap[String, graft.Q] = ListMap(
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_revenue_by_nation" -> (revenueByNation _),
    "q03_top_customers" -> (topCustomers _),
    "q04_customer_order_counts" -> (customerOrderCounts _),
    "q05_urgent_customers" -> (urgentCustomers _),
    "q06_customers_without_orders" -> (customersWithoutOrders _),
    "q07_price_band_join" -> (priceBandJoin _),
    "q08_asof_view_before_purchase" -> (asofViewBeforePurchase _),
    "q09_region_nation_pairs" -> (regionNationPairs _),
    "q16_daily_activity_full_outer" -> (dailyActivityFullOuter _),
    "q17_suppliers_per_nation" -> (suppliersPerNation _))

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_disc_price,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity), 6) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice), 6) AS avg_price,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price,
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
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q07_price_band_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('budget', 0.0, 1000.0), ('mid', 1000.0, 5000.0), ('premium', 5000.0, 1e18))
        |SELECT band, count(*) AS n_parts,
        |  round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(p_retailprice), 6) AS avg_price
        |FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q08_asof_view_before_purchase" ->
      """SELECT p.event_id AS p_id, p.user_id AS p_user, v.event_id AS v_id,
        |  round(epoch(p.ts) - epoch(v.ts), 6) AS gap_sec
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND v.ts <= p.ts
        |ORDER BY p_id""".stripMargin,
    "q09_region_nation_pairs" ->
      """SELECT r_name, n_name, r_regionkey = n_regionkey AS is_home
        |FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q16_daily_activity_full_outer" ->
      """SELECT coalesce(od.day, ed.day) AS day,
        |  coalesce(n_orders, 0) AS n_orders,
        |  coalesce(n_events, 0) AS n_events
        |FROM (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
        |      FROM orders GROUP BY 1) od
        |FULL OUTER JOIN
        |     (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
        |      FROM events GROUP BY 1) ed
        |ON od.day = ed.day
        |ORDER BY day""".stripMargin,
    "q17_suppliers_per_nation" ->
      """SELECT n_name,
        |  coalesce(cnt, 0) AS n_suppliers,
        |  coalesce(total_bal, CAST(0.0 AS DOUBLE)) AS total_bal
        |FROM (SELECT s_nationkey, count(*) AS cnt,
        |        round(CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_bal
        |      FROM supplier GROUP BY s_nationkey) s
        |RIGHT JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_name""".stripMargin)
}
