package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import scala.collection.immutable.ListMap

/** Streaming-shaped batch operators T1–T4 over `events` (SURVEY.md §2.10).
  * The reference's only stream is its polling loop
  * (/root/reference/README.md:80-110); these render tumbling/sliding/
  * session windows and the high-watermark late-data policy batch-first so
  * the same DAG can be lifted onto Structured Streaming (readStream +
  * withWatermark) unchanged.
  */
object EventQueries {

  /** Exact, order-independent sum of a full-precision double: round to 4 dp
    * per row, carry through DECIMAL (exact addition), emit double.
    * Matches DuckDB `sum(CAST(round(value,4) AS DECIMAL(18,4)))`.
    */
  private def valueSum(c: org.apache.spark.sql.Column) =
    round(sum(round(c, 4).cast("decimal(18,4)")).cast("double"), 4)

  /** T1: tumbling 1-hour windows per event type. Uses Spark's window()
    * grouping; start emitted as epoch seconds for engine-neutral compare.
    */
  def hourlyEvents(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), valueSum(col("value")).as("total_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** T2: sliding windows (1 hour wide, 15-minute slide) — each event lands
    * in exactly 4 overlapping windows.
    */
  def slidingEventCounts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("n"), col("n_users"))
      .orderBy(col("window_start"))

  /** T3: session windows via gaps-and-islands — a new session starts after
    * a >30-minute silence per user (lag + running sum of gap flags).
    */
  def userSessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "events")
      .withColumn("gap",
        when(col("ts").cast("double") - lag(col("ts"), 1).over(byUser)
          .cast("double") > 1800d, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("gap")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("sess_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("sess_events")).as("max_session_events"))
      .orderBy(col("user_id"))
  }

  /** T4: high-watermark / late-data policy (batch rendering): rows older
    * than the watermark are dropped, on-time rows aggregate per day. The
    * literal watermark stands in for the persisted ledger watermark
    * (SURVEY.md §2.10 T4); verify-mode queries must be deterministic so it
    * is a constant, not max(ts).
    */
  def watermarkedDaily(spark: SparkSession, dir: String): DataFrame = {
    val wm = lit("2024-01-20 00:00:00").cast("timestamp")
    Tables(spark, dir, "events")
      .filter(col("ts") >= wm)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("day"))
  }

  val queries: ListMap[String, graft.Q] = ListMap(
    "q80_hourly_events" -> (hourlyEvents _),
    "q81_sliding_event_counts" -> (slidingEventCounts _),
    "q82_user_sessions" -> (userSessions _),
    "q83_watermarked_daily" -> (watermarkedDaily _))

  val oracle: Map[String, String] = Map(
    "q80_hourly_events" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  event_type, count(*) AS n,
        |  round(CAST(sum(CAST(round(value, 4) AS DECIMAL(18,4))) AS DOUBLE), 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q81_sliding_event_counts" ->
      """SELECT CAST(floor(epoch(ts)/900)*900 - i*900 AS BIGINT) AS window_start,
        |  count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events CROSS JOIN (SELECT unnest(generate_series(0,3)) AS i)
        |GROUP BY 1 ORDER BY window_start""".stripMargin,
    "q82_user_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch(ts) - epoch(lag(ts,1) OVER w) > 1800 THEN 1 ELSE 0 END AS gap
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id,
        |    sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |per_sess AS (
        |  SELECT user_id, session_id, count(*) AS sess_events
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT user_id, count(*) AS n_sessions, max(sess_events) AS max_session_events
        |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q83_watermarked_daily" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users
        |FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY 1 ORDER BY day""".stripMargin)
}
