package graft.sinks

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan

/** The co-bucketed join must read both sides shuffle-free — the plan shape
  * that removes the lineitem⋈orders exchange at 100 TB (SURVEY.md §4.3).
  */
class BucketingSpec extends SparkSpec {

  private def shuffles(plan: SparkPlan): Int = {
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    resolved.collect { case _: ShuffleExchangeExec => 1 }.sum
  }

  test("co-bucketed equi-join plans zero shuffle exchanges") {
    val orders = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderpriority")
    val lineitem = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4)
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val joined = Bucketing.bucketJoin(spark, "b_lineitem", "b_orders",
        "o_orderkey")
      val expected = lineitem.join(orders, Seq("o_orderkey")).count()
      assert(joined.count() == expected)
      assert(shuffles(joined.queryExecution.executedPlan) == 0,
        "bucketed join must not shuffle either side:\n" +
          joined.queryExecution.executedPlan)

      // control: the same join over plain parquet shuffles
      val plain = lineitem.join(orders, Seq("o_orderkey"))
      plain.count()
      assert(shuffles(plain.queryExecution.executedPlan) > 0,
        "control join should shuffle without bucketing")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
