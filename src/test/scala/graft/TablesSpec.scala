package graft

import org.apache.spark.sql.types.TimestampType

class TablesSpec extends SparkSpec {

  private val key = "spark.sql.legacy.parquet.nanosAsLong"

  test("events read yields a session-zoned timestamp column for any on-disk shape") {
    // the driver has shipped events.ts as both TIMESTAMP(NANOS) and
    // TIMESTAMP(MICROS); whichever shape is on disk, the loader must
    // normalize to TimestampType (VERDICT r7 — data-contract drift)
    val df = Tables(spark, sfDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }

  test("events micros file round-trips wall-clock instants unchanged") {
    // with session TZ pinned to UTC, the normalized TimestampType column
    // must show the identical wall-clock instant the NTZ/micros file stores
    import org.apache.spark.sql.functions._
    val df = Tables(spark, sfDir, "events")
    val row = df.orderBy("event_id")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"))
      .limit(1).collect()(0)
    assert(row.getString(0).nonEmpty)
    // and the value is stable across two independent reads (no conf leakage)
    val row2 = Tables(spark, sfDir, "events").orderBy("event_id")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"))
      .limit(1).collect()(0)
    assert(row.getString(0) == row2.getString(0))
  }

  test("events nanos-shaped file converts to floored micros") {
    // the driver's testdata currently ships micros, so exercise the
    // LongType branch with a synthetic events.parquet whose ts is raw
    // int64 nanos (exactly what a TIMESTAMP(NANOS) file reads as under
    // the nanosAsLong conf) — including a pre-epoch value, where floor
    // and truncate-toward-zero division differ
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val tmp = java.nio.file.Files.createTempDirectory("graft_events").toFile
    Seq((1L, -1999999999L), (2L, 1500L), (3L, 0L))
      .toDF("event_id", "ts")
      .write.mode("overwrite")
      .parquet(new java.io.File(tmp, "events.parquet").getPath)
    val df = Tables(spark, tmp.getPath, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val out = df.orderBy("event_id")
      .select(unix_micros(col("ts"))).as[Long].collect()
    assert(out.toSeq == Seq(-2000000L, 1L, 0L),
      "nanos must floor-divide to micros (DuckDB-compatible)")
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
