package graft

import org.apache.spark.sql.types.TimestampType

class TablesSpec extends SparkSpec {

  private val key = "spark.sql.legacy.parquet.nanosAsLong"

  test("events read converts nanos to a timestamp column") {
    val df = Tables(spark, sfDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }

  test("events read restores the nanos session conf") {
    // the conf is a registered Spark conf, so getOption reports its
    // default ("false") rather than None — "restored" means the read does
    // not leave the session pinned to "true"
    spark.conf.unset(key)
    Tables(spark, sfDir, "events").limit(1).count()
    assert(spark.conf.get(key) == "false",
      "nanosAsLong leaked into the shared session")

    spark.conf.set(key, "false")
    try {
      Tables(spark, sfDir, "events").limit(1).count()
      assert(spark.conf.get(key) == "false",
        "pre-existing conf value was not restored")
    } finally spark.conf.unset(key)
  }
}
