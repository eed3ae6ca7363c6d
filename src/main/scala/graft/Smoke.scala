package graft

import org.apache.spark.sql.SparkSession

/** Driver t1 smoke stand-in: runs SparkEntry.entry and prints the row
  * count (driver requires rows > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // see Verify.scala: Spark 4.1 union-partitioning claim crashes SMJ zips
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"entry rows=$n")
    spark.stop()
  }
}
