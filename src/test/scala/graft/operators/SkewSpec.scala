package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salting must be result-invariant: the two-phase aggregate equals the
  * direct one exactly (decimal partials), including on a synthetic 90%
  * hot key.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation on real data") {
    val ev = graft.Tables(spark, sfDir, "events")
    val direct = ev.groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
          .as("total"))
    val salted = Skew.saltedCountSum(ev, col("user_id"), col("value"),
      col("event_id"), salts = 8)
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }

  test("AQE splits the skewed side of a sort-merge join at runtime") {
    // joins are the case we do NOT hand-salt: AQE's OptimizeSkewedJoin
    // re-plans a skewed shuffle partition into subpartitions at runtime.
    // Prove it actually fires on a 95%-hot-key join — the final adaptive
    // plan must carry the skew=true marker on the sort-merge join.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "128KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val pad = "x" * 100
      val left = (0 until 120000).map { i =>
        (if (i % 20 == 0) (i % 50).toLong else 1L, s"$pad$i")
      }.toDF("k", "payload")
      val right = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // count()/write would each spawn their OWN QueryExecution and
      // leave joined's adaptive plan unexecuted (isFinalPlan=false);
      // collect() drives THIS Dataset's QueryExecution to the final plan
      assert(joined.collect().length == 120000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("salted aggregation handles a 90% hot key") {
    val rows = (0 until 10000).map { i =>
      val key = if (i % 10 == 0) i.toLong % 100 else 7L // 90% on key 7
      (i.toLong, key, 1.5)
    }
    val df = rows.toDF("id", "k", "v")
    val out = Skew.saltedCountSum(df, col("k"), col("v"), col("id"), 16)
      .filter(col("key") === 7L)
      .as[(Long, Long, Double)].collect().head
    assert(out._2 == 9000L && out._3 == 13500.0)
  }
}
