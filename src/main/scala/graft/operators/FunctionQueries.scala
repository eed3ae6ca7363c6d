package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, OracleParity => OP}
import scala.collection.immutable.ListMap

/** Scalar-function operator families F1–F10 (SURVEY.md §2.8) exercised as
  * oracle-checked queries: JSON path extraction + map access over
  * `events.props`, array/struct assembly (the reference's
  * `event_response` array shape, /root/reference/README.md:130-137),
  * timestamp truncation, and string functions.
  */
object FunctionQueries {

  /** F1 + F10: JSON extraction two ways — get_json_object (string path) and
    * from_json to a map + element_at — asserted equal in one pass, then
    * aggregated per extracted key.
    */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("k_json",
        get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k_map",
        element_at(from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,long>")),
          "k"))
      .groupBy(col("k_json"))
      .agg(count(lit(1)).as("n"),
        count(when(col("k_json") === col("k_map"), 1)).as("n_paths_agree"))
      .orderBy(col("k_json"))

  /** F2 + F3 (+A6): build the reference's `event_response`-style array of
    * structs per user — sorted for determinism — then index into it. The
    * array itself leaves the frame as a CSV scalar: the driver's
    * comparator sorts rows through pandas, which cannot hash list cells
    * (ADVICE r2).
    */
  def eventResponseArrays(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        sort_array(collect_list(col("event_id"))).as("event_ids"),
        sort_array(collect_list(
          struct(col("event_id"), round(col("value"), 4).as("val"))))
          .as("responses"))
      .select(col("user_id"),
        size(col("event_ids")).cast("long").as("n"),
        array_join(col("event_ids").cast("array<string>"), ",")
          .as("event_ids_csv"),
        element_at(col("responses"), 1).getField("event_id").as("first_event"),
        element_at(col("responses"), 1).getField("val").as("first_val"))
      .orderBy(col("user_id"))

  /** F4: timestamp functions — month truncation, extraction, datediff. */
  def monthlyOrders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(
        to_date(date_trunc("month", col("o_orderdate"))).as("month"),
        year(col("o_orderdate")).as("yr"),
        col("o_totalprice"))
      .groupBy(col("month"), col("yr"))
      .agg(count(lit(1)).as("n_orders"),
        OP.moneySum(col("o_totalprice")).as("total"))
      .orderBy(col("month"))

  /** F5: string functions — regexp extraction, case, length, substring,
    * concat, LIKE.
    */
  def customerStrings(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .select(
        col("c_custkey"),
        lower(col("c_name")).as("name_lower"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long").as("name_num"),
        length(col("c_name")).as("name_len"),
        concat_ws("-", substring(col("c_mktsegment"), 1, 3),
          trim(lower(col("c_name")))).as("tag"),
        col("c_name").like("%9%").as("has_nine"),
        levenshtein(lower(col("c_mktsegment")), lit("building"))
          .as("seg_dist"))
      .orderBy(col("c_custkey"))

  /** F7 + F8: math function family (abs/sqrt/pow/log/floor/ceil/sign) and
    * portable hash fingerprints (md5/sha2 prefixes as bigints are checked;
    * xxhash64/hash exist but are Spark-specific so stay out of the oracle
    * surface).
    */
  def mathAndHash(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber").cast("int").as("ln"),
        round(abs(col("l_discount") - 0.05), 6).as("abs_d"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
        round(pow(col("l_tax") + 1.0, 2), 6).as("tax_sq"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        floor(col("l_quantity") / 7).cast("long").as("bucket"),
        signum(col("l_discount") - 0.05).cast("int").as("sgn"),
        substring(md5(concat(col("l_orderkey"), lit(":"),
          col("l_linenumber"))), 1, 8).as("h8"))
      .orderBy(col("l_orderkey"), col("ln"))

  val queries: ListMap[String, graft.Q] = ListMap(
    "q50_json_props" -> (jsonProps _),
    "q54_math_and_hash" -> (mathAndHash _),
    "q51_event_response_arrays" -> (eventResponseArrays _),
    "q52_monthly_orders" -> (monthlyOrders _),
    "q53_customer_strings" -> (customerStrings _))

  val oracle: Map[String, String] = Map(
    "q54_math_and_hash" ->
      """SELECT l_orderkey, CAST(l_linenumber AS INT) AS ln,
        |  round(abs(l_discount - 0.05), 6) AS abs_d,
        |  round(sqrt(l_quantity), 6) AS sqrt_q,
        |  round(pow(l_tax + 1.0, 2), 6) AS tax_sq,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  CAST(floor(l_quantity / 7) AS BIGINT) AS bucket,
        |  CAST(sign(l_discount - 0.05) AS INT) AS sgn,
        |  substr(md5(l_orderkey || ':' || l_linenumber), 1, 8) AS h8
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, ln""".stripMargin,
    "q50_json_props" ->
      """SELECT CAST(props->>'k' AS BIGINT) AS k_json, count(*) AS n,
        |  count(*) AS n_paths_agree
        |FROM events GROUP BY 1 ORDER BY k_json""".stripMargin,
    "q51_event_response_arrays" ->
      """SELECT user_id, count(*) AS n,
        |  array_to_string(list_sort(list(event_id)), ',') AS event_ids_csv,
        |  min(event_id) AS first_event,
        |  round(min_by(value, event_id), 4) AS first_val
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q52_monthly_orders" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n_orders,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY month""".stripMargin,
    "q53_customer_strings" ->
      """SELECT c_custkey, lower(c_name) AS name_lower,
        |  CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  concat_ws('-', substring(c_mktsegment, 1, 3), trim(lower(c_name))) AS tag,
        |  c_name LIKE '%9%' AS has_nine,
        |  CAST(levenshtein(lower(c_mktsegment), 'building') AS INT) AS seg_dist
        |FROM customer ORDER BY c_custkey""".stripMargin)
}
