package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import scala.collection.immutable.ListMap

/** Set operations E1–E3 (SURVEY.md §2.7) over two customer cohorts:
  * high-balance customers vs the BUILDING market segment.
  */
object SetOpQueries {

  private def rich(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .filter(col("c_acctbal") > 8000).select(col("c_custkey"))

  private def building(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))

  /** E1: union all + group — n_sources=2 marks the overlap (so the query
    * exercises bag-union semantics, not just distinct-union).
    */
  def unionCohorts(spark: SparkSession, dir: String): DataFrame =
    rich(spark, dir).union(building(spark, dir))
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_sources"))
      .orderBy(col("c_custkey"))

  /** E2: intersect — customers in both cohorts. */
  def intersectCohorts(spark: SparkSession, dir: String): DataFrame =
    rich(spark, dir).intersect(building(spark, dir))
      .orderBy(col("c_custkey"))

  /** E3: except — high-balance customers outside BUILDING. */
  def exceptCohorts(spark: SparkSession, dir: String): DataFrame =
    rich(spark, dir).except(building(spark, dir))
      .orderBy(col("c_custkey"))

  /** E2/E3 bag semantics: intersectAll keeps min(multiplicity), exceptAll
    * subtracts multiplicities — exercised over order-level cohorts where
    * a customer appears once per qualifying order, then grouped so the
    * multiset result is a deterministic, sortable frame.
    */
  def bagSetOps(spark: SparkSession, dir: String): DataFrame = {
    def urgent = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    def done = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val inter = urgent.intersectAll(done)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_inter"))
    val excess = urgent.exceptAll(done)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_excess"))
    inter.join(excess, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        coalesce(col("n_excess"), lit(0L)).as("n_excess"))
      .orderBy(col("o_custkey"))
  }

  val queries: ListMap[String, graft.Q] = ListMap(
    "q40_union_cohorts" -> (unionCohorts _),
    "q41_intersect_cohorts" -> (intersectCohorts _),
    "q42_except_cohorts" -> (exceptCohorts _),
    "q43_bag_set_ops" -> (bagSetOps _))

  private val richSql = "SELECT c_custkey FROM customer WHERE c_acctbal > 8000"
  private val bldSql =
    "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"

  val oracle: Map[String, String] = Map(
    "q40_union_cohorts" ->
      s"""SELECT c_custkey, count(*) AS n_sources
         |FROM ($richSql UNION ALL $bldSql)
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q41_intersect_cohorts" ->
      s"$richSql INTERSECT $bldSql ORDER BY c_custkey",
    "q42_except_cohorts" ->
      s"$richSql EXCEPT $bldSql ORDER BY c_custkey",
    "q43_bag_set_ops" ->
      """WITH u AS (SELECT o_custkey FROM orders
        |           WHERE o_orderpriority = '1-URGENT'),
        |d AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |i AS (SELECT o_custkey, count(*) AS n_inter
        |      FROM (SELECT * FROM u INTERSECT ALL SELECT * FROM d)
        |      GROUP BY o_custkey),
        |x AS (SELECT o_custkey, count(*) AS n_excess
        |      FROM (SELECT * FROM u EXCEPT ALL SELECT * FROM d)
        |      GROUP BY o_custkey)
        |SELECT coalesce(i.o_custkey, x.o_custkey) AS o_custkey,
        |  coalesce(n_inter, 0) AS n_inter,
        |  coalesce(n_excess, 0) AS n_excess
        |FROM i FULL OUTER JOIN x ON i.o_custkey = x.o_custkey
        |ORDER BY o_custkey""".stripMargin)
}
