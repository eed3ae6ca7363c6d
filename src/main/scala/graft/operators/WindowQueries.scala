package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Tables, OracleParity => OP}
import scala.collection.immutable.ListMap

/** Window-function operators W1–W5 + per-group top-k O3 (SURVEY.md §2.5,
  * §2.6). W1 is also the idiomatic Spark rendering of the reference's
  * "latest status wins" polling update (/root/reference/README.md:85).
  *
  * Scale posture: every window partitions by a high-cardinality key
  * (user_id / custkey / p_id), so the sort is per-partition after one hash
  * shuffle — no global single-reducer window anywhere except the ntile
  * demo, which is documented as such.
  */
object WindowQueries {

  /** W1: dedup-to-latest — the newest event per user (row_number = 1 over a
    * ts-descending window, event_id as total-order tie-break).
    */
  def latestEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 6).as("value"))
      .orderBy(col("user_id"))
  }

  /** W1 (rank flavors): rank and dense_rank over per-customer order
    * totals — ties on o_totalprice make the two diverge, which is the
    * behavior worth oracle-checking (row_number alone was exercised by
    * q20). Limited to 3 ranks per customer to keep the frame small.
    */
  def orderRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rnk"), col("drnk"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** W2: lag/lead — per-user event-to-event time deltas and the next event
    * type. Rows with no predecessor keep a null gap.
    */
  def eventDeltas(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .select(col("user_id"), col("event_id"),
        round(col("ts").cast("double") - col("prev_ts").cast("double"), 6)
          .as("gap_sec"),
        col("next_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** W3: running/frame aggregates — cumulative spend per customer over
    * order date (exact decimal running sum) + 3-row moving average.
    */
  def runningRevenue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val last3 = w.rowsBetween(-2, Window.currentRow)
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("cum_spend",
        round(sum(OP.dec(col("o_totalprice"))).over(cum).cast("double"), 2))
      .withColumn("avg3",
        round(sum(OP.dec(col("o_totalprice"))).over(last3).cast("double")
          / count(lit(1)).over(last3), 6))
      .select(col("o_custkey"), col("o_orderkey"),
        col("cum_spend"), col("avg3"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** W4: ntile + percent_rank over customer account balance.
    * NOTE: an unpartitioned window is a deliberate single-reducer demo —
    * at 100 TB the same semantics come from percent_rank via global sort or
    * approx quantile bucketing; documented here, not hidden.
    */
  def acctbalQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .orderBy(col("c_custkey"))
  }

  /** W5: first/last over an unbounded frame — each customer's first and
    * most recent order, reduced to one row per customer via row_number.
    */
  def firstLastOrder(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(spark, dir, "orders")
      .withColumn("first_order", first(col("o_orderkey")).over(full))
      .withColumn("last_order", last(col("o_orderkey")).over(full))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("first_order"), col("last_order"))
      .orderBy(col("o_custkey"))
  }

  /** O3: per-group top-k — each customer's 3 most expensive orders. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  val queries: ListMap[String, graft.Q] = ListMap(
    "q20_latest_event_per_user" -> (latestEventPerUser _),
    "q26_order_ranks" -> (orderRanks _),
    "q21_event_deltas" -> (eventDeltas _),
    "q22_running_revenue" -> (runningRevenue _),
    "q23_acctbal_quartiles" -> (acctbalQuartiles _),
    "q24_first_last_order" -> (firstLastOrder _),
    "q25_top_orders_per_customer" -> (topOrdersPerCustomer _))

  val oracle: Map[String, String] = Map(
    "q26_order_ranks" ->
      """SELECT o_custkey, o_orderkey,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |QUALIFY row_number() OVER w <= 3
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q20_latest_event_per_user" ->
      """SELECT user_id, event_id, event_type, round(value, 6) AS value
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q21_event_deltas" ->
      """SELECT user_id, event_id,
        |  round(epoch(ts) - epoch(lag(ts, 1) OVER w), 6) AS gap_sec,
        |  lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q22_running_revenue" ->
      """SELECT o_custkey, o_orderkey,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER cum AS DOUBLE), 2) AS cum_spend,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER last3 AS DOUBLE)
        |        / count(*) OVER last3, 6) AS avg3
        |FROM orders
        |WINDOW
        |  cum AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  last3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q23_acctbal_quartiles" ->
      """SELECT c_custkey, c_acctbal,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q24_first_last_order" ->
      """SELECT o_custkey, first_order, last_order FROM (
        |  SELECT o_custkey,
        |    first_value(o_orderkey) OVER wf AS first_order,
        |    last_value(o_orderkey) OVER wf AS last_order,
        |    row_number() OVER w AS rn
        |  FROM orders
        |  WINDOW
        |    w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |    wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q25_top_orders_per_customer" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin)
}
