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
