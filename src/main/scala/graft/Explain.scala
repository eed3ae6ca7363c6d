package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan and timed count of
  * one or more queries. Usage:
  *   tools/run.sh graft.Explain <sfDir> <queryName> [queryName ...]
  * Keep plans honest: look for PushedFilters on scans, broadcast joins on
  * dimensions, and WholeStageCodegen spans covering the hot path.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      // time construction + count, like Bench: iterative operators (q77)
      // do their work eagerly inside the query function
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
