package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (hash-clustered) table layout — the 100 TB answer to the
  * engine's biggest repeated shuffle, lineitem ⋈ orders on orderkey
  * (SURVEY.md §4.3, PLANS.md "Joins").
  *
  * Writing both fact tables `bucketBy(n, key)` + `sortBy(key)` fixes each
  * row's bucket by hash(key) % n at WRITE time. A later equi-join on the
  * key then satisfies both sides' `ClusteredDistribution` straight off the
  * scan: no Exchange on either side — the one-off write cost replaces a
  * per-query shuffle of the two largest tables. BucketingSpec proves the
  * plan shape (zero shuffle exchanges, sort-merge join reading bucketed
  * scans).
  *
  * Spark's bucketing rides the session catalog (`saveAsTable`) because the
  * bucket spec lives in table metadata, not the parquet files — the
  * parquet-path reader has nowhere to learn the hash layout from.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their bucket key. With matching
    * bucket counts the planner elides both shuffle exchanges (and, with
    * the per-bucket sortBy, most of the sort).
    */
  def bucketJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
