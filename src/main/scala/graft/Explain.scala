package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan plus wall AND
  * executor-CPU time of one or more queries. Usage:
  *   tools/run.sh graft.Explain <sfDir> <queryName> [queryName ...]
  * Keep plans honest: look for PushedFilters on scans, broadcast joins on
  * dimensions, and WholeStageCodegen spans covering the hot path.
  *
  * Each query runs twice — the second pass is the number to read (the
  * first absorbs codegen/JIT). Executor CPU is the noise-immune signal on
  * a shared host: co-tenant load bursts inflate wall time 2-10× but
  * barely move task CPU (PLANS.md round-3/4 findings).
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
    val cpuNs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
    })
    names.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      // two timed passes: construction + count, like Bench (iterative
      // operators such as q77 do their work eagerly inside the query
      // function). Pass 2 is warm; read that one.
      (1 to 2).foreach { pass =>
        System.gc()
        val c0 = cpuNs.get()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50) // listener drain, keeps CPU attribution honest
        val cpu = (cpuNs.get() - c0) / 1e9
        println(f"pass=$pass rows=$n wall=$wall%.2fs cpu=$cpu%.2fs")
      }
    }
    spark.stop()
  }
}
