package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan plus wall AND
  * executor-CPU time of one or more queries. Usage:
  *   tools/run.sh graft.Explain <sfDir> <queryName> [queryName ...]
  * Keep plans honest: look for PushedFilters on scans, broadcast joins on
  * dimensions, and WholeStageCodegen spans covering the hot path.
  *
  * Each query runs twice via [[Timing.timedPasses]] — read pass 2 (the
  * first absorbs codegen/JIT), and read the CPU column on a noisy host.
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
      // see Verify.scala: Spark 4.1 union-partitioning claim crashes SMJ zips
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNs = Timing.cpuCounter(spark)
    names.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      // construction + count per pass, like Bench: iterative operators
      // (q77/q85/q91) do their work eagerly inside the query function
      Timing.timedPasses(spark, cpuNs, name)(
        SparkEntry.queries(name)(spark, sfDir).count())
    }
    spark.stop()
  }
}
