package graft.operators

import graft.SparkSpec

/** Window-operator semantics on the real tables — invariants that hold at
  * any scale factor (the oracle already pins exact values; these pin the
  * SHAPE: cardinalities, monotonicity, per-group bounds).
  */
class WindowQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("dedup-to-latest returns exactly one row per user") {
    val users = graft.Tables(spark, sfDir, "events")
      .select("user_id").distinct().count()
    val latest = WindowQueries.latestEventPerUser(spark, sfDir)
    assert(latest.count() == users)
    assert(latest.select("user_id").distinct().count() == users)
  }

  test("running revenue tops out at each customer's exact total") {
    // (the frame orders by o_orderdate, not o_orderkey, so monotonicity
    // is asserted against the final value, which must equal the exact
    // decimal sum of the customer's orders)
    val rows = WindowQueries.runningRevenue(spark, sfDir)
      .as[(Long, Long, Double, Double)].collect()
    val totals = graft.Tables(spark, sfDir, "orders")
      .groupBy($"o_custkey")
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum(
          $"o_totalprice".cast("decimal(18,2)")).cast("double"), 2))
      .as[(Long, Double)].collect().toMap
    rows.groupBy(_._1).foreach { case (cust, orders) =>
      assert(orders.map(_._3).max == totals(cust))
      assert(orders.map(_._3).min > 0.0)
    }
  }

  test("quartiles split customers into four near-equal buckets") {
    val counts = WindowQueries.acctbalQuartiles(spark, sfDir)
      .groupBy("quartile").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet == Set(1L, 2L, 3L, 4L))
    assert(counts.values.max - counts.values.min <= 1) // ntile balance
  }

  test("per-group top-k emits at most k rows per customer, ranked 1..k") {
    val rows = WindowQueries.topOrdersPerCustomer(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    rows.groupBy(_._1).values.foreach { grp =>
      assert(grp.length <= 3)
      assert(grp.map(_._2).sorted.toSeq == (1L to grp.length).toSeq)
      // descending price in rank order
      val byRank = grp.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("first/last orders bound every customer's order-date range") {
    val fl = WindowQueries.firstLastOrder(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    val orderCnt = graft.Tables(spark, sfDir, "orders")
      .groupBy("o_custkey").count().as[(Long, Long)].collect().toMap
    assert(fl.length == orderCnt.size)
    fl.foreach { case (cust, first, last) =>
      if (orderCnt(cust) == 1L) assert(first == last)
    }
  }
}
