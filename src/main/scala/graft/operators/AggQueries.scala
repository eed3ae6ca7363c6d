package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, OracleParity => OP}
import scala.collection.immutable.ListMap

/** Aggregation breadth A3–A8 (SURVEY.md §2.4): distinct / approx-distinct,
  * rollup, collect_list, conditional aggregation, percentiles.
  *
  * Scale posture: all are partial+final hash aggregates (map-side combine
  * free from Spark); approx_count_distinct is the explicit 100 TB
  * substitute for exact distinct; collect_list is bounded per group and
  * order-stabilized with sort_array for the oracle.
  */
object AggQueries {

  /** A3: exact distinct counts per event type. */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** A4: approx distinct (HLL++) — the output asserts the approximation is
    * within 5% of the exact count, so the oracle-checkable row proves the
    * operator ran correctly without depending on Spark's HLL internals.
    */
  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
      .select(col("event_type"), col("n_users_exact"),
        (abs(col("n_approx") - col("n_users_exact"))
          <= col("n_users_exact") * 0.05).as("approx_ok"))
      .orderBy(col("event_type"))

  /** A5: rollup over status × priority with grouping() disambiguation. */
  def statusRollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        OP.moneySum(col("o_totalprice")).as("total"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("g_status"), col("g_priority"),
        col("n"), col("total"))
      .orderBy(col("g_status"), col("g_priority"), col("status"), col("priority"))

  /** A6: collect_list/collect_set assembled deterministically (sort_array)
    * — the reference's error-`details` array shape
    * (/root/reference/README.md:43-52). The driver-facing frame projects
    * the array to a CSV scalar: the driver's comparator sorts rows through
    * pandas, which cannot hash list cells (ADVICE r2).
    */
  def priorityStatusLists(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(sort_array(collect_set(col("o_orderstatus"))).as("statuses"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"),
        array_join(col("statuses"), ",").as("statuses"),
        col("n"))
      .orderBy(col("o_orderpriority"))

  /** A7: filtered/conditional aggregation — completed vs failed split per
    * priority, the reference's per-job outcome rollup
    * (/root/reference/README.md:100-102).
    */
  def conditionalOutcomes(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_done"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
        OP.moneySum(when(col("o_totalprice") > 200000, col("o_totalprice"))
          .otherwise(lit(0.0))).as("big_total"))
      .orderBy(col("o_orderpriority"))

  /** A8: exact percentiles (linear interpolation) of event value per type.
    * Spark `percentile` and DuckDB `quantile_cont` share the (n-1)*p
    * interpolation rule; rounding to 6 dp absorbs last-ulp drift.
    */
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        expr("round(percentile(value, 0.25), 6)").as("p25"),
        expr("round(percentile(value, 0.5), 6)").as("p50"),
        expr("round(percentile(value, 0.9), 6)").as("p90"))
      .orderBy(col("event_type"))

  /** A8 scale variant: approximate percentiles (Spark's GK sketch via
    * percentile_approx) with the q31 band pattern — the row carries the
    * exact percentile plus a flag asserting the sketch landed within a
    * 5%-relative band, so the oracle checks the operator ran correctly
    * without depending on sketch internals. At 100 TB the sketch is the
    * only affordable option: exact percentile buffers every value per
    * group, percentile_approx merges bounded-size summaries map-side.
    */
  def approxValuePercentiles(spark: SparkSession, dir: String): DataFrame = {
    def band(approx: Column, exact: Column): Column =
      abs(approx - exact) <= greatest(abs(exact) * 0.05, lit(0.01))
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("e50"),
        expr("percentile_approx(value, 0.5, 1000)").as("a50"),
        expr("percentile(value, 0.95)").as("e95"),
        expr("percentile_approx(value, 0.95, 1000)").as("a95"))
      .select(col("event_type"),
        round(col("e50"), 6).as("p50"),
        round(col("e95"), 6).as("p95"),
        band(col("a50"), col("e50")).as("p50_ok"),
        band(col("a95"), col("e95")).as("p95_ok"))
      .orderBy(col("event_type"))
  }

  /** A5 (cube): full cube over status × priority — every grouping-set
    * combination, disambiguated by grouping() flags like the rollup.
    */
  def statusCube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("g_status"), col("g_priority"), col("n"))
      .orderBy(col("g_status"), col("g_priority"), col("status"),
        col("priority"))

  /** A5 (explicit grouping sets): a non-rollup set list —
    * ((status, priority), (priority), ()) — the shape neither rollup nor
    * cube produces, via Spark 4's Dataset.groupingSets API.
    */
  def statusGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("g_status"), col("g_priority"), col("n"))
      .orderBy(col("g_status"), col("g_priority"), col("status"),
        col("priority"))

  /** §4.3 skew path promoted to an oracle query (the VERDICT-r4 argument
    * for promoting the incremental family applies here too: the operator
    * a 100 TB corpus actually needs must face the correctness gate).
    * `event_type` is the canonical hot aggregation key — a handful of
    * values over the whole stream, so a plain groupBy funnels each type
    * through ONE reducer. Phase 1 spreads every type over 16 salt lanes
    * keyed by hash(event_id) (deterministic per row); phase 2 combines
    * 16×|types| partial rows. Decimal partials make the two-phase sum
    * EXACTLY equal the direct one (a double sum would drift with the
    * grouping), which is why the oracle can simply BE the direct
    * aggregation — result-invariance is the property under test.
    */
  def saltedHotAgg(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedCountSum(Tables(spark, dir, "events"),
        col("event_type"), col("value"), col("event_id"), salts = 16)
      .orderBy(col("key"))

  val queries: ListMap[String, graft.Q] = ListMap(
    "q30_distinct_users" -> (distinctUsers _),
    "q38_salted_agg" -> (saltedHotAgg _),
    "q36_status_cube" -> (statusCube _),
    "q31_approx_distinct_users" -> (approxDistinctUsers _),
    "q32_status_rollup" -> (statusRollup _),
    "q33_priority_status_lists" -> (priorityStatusLists _),
    "q37_grouping_sets" -> (statusGroupingSets _),
    "q34_conditional_outcomes" -> (conditionalOutcomes _),
    "q35_value_percentiles" -> (valuePercentiles _),
    "q86_approx_percentiles" -> (approxValuePercentiles _))

  val oracle: Map[String, String] = Map(
    // q38: the oracle is the DIRECT aggregation — the salted two-phase
    // plan must reproduce it bit-for-bit (decimal partials).
    "q38_salted_agg" ->
      """SELECT event_type AS key, count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        |FROM events GROUP BY event_type ORDER BY key""".stripMargin,
    "q36_status_cube" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        |  count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_priority, status, priority""".stripMargin,
    "q30_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q31_approx_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users_exact, true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q86_approx_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95,
        |  TRUE AS p50_ok, TRUE AS p95_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q32_status_rollup" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_priority, status, priority""".stripMargin,
    "q33_priority_status_lists" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q37_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderpriority), ())
        |ORDER BY g_status, g_priority, status, priority""".stripMargin,
    "q34_conditional_outcomes" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (o_orderstatus = 'F') AS n_done,
        |  count(*) FILTER (o_orderstatus = 'O') AS n_open,
        |  round(CAST(sum(CAST(CASE WHEN o_totalprice > 200000 THEN o_totalprice ELSE 0.0 END
        |        AS DECIMAL(18,2))) AS DOUBLE), 2) AS big_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q35_value_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 6) AS p25,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
