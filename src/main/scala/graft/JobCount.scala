package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Diagnostic main (round 16): per-query job/stage/task counts plus
  * wall/CPU over two passes — attributes wall time between per-job
  * driver latency (AQE materializes every exchange as its own job) and
  * real compute. The measurement behind OPTIMIZATION_r16.md's "where
  * the remaining wall lives" table.
  * Usage: tools/run.sh graft.JobCount <sfDir> <query> [query...]
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val cpuNs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskMetrics != null) cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
      }
    })
    names.foreach { name =>
      (1 to 2).foreach { pass =>
        System.gc()
        org.apache.spark.GraftSparkShim.drainListenerBus(spark.sparkContext)
        val (j0, s0, t0, c0) = (jobs.get, stages.get, tasks.get, cpuNs.get)
        val w0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - w0) / 1e9
        org.apache.spark.GraftSparkShim.drainListenerBus(spark.sparkContext)
        println(f"$name pass=$pass rows=$n wall=$wall%.2fs " +
          f"cpu=${(cpuNs.get - c0) / 1e9}%.2fs jobs=${jobs.get - j0} " +
          f"stages=${stages.get - s0} tasks=${tasks.get - t0}")
      }
    }
    spark.stop()
  }
}
