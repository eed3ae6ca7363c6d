package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.GraftSparkShim
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shared wall + executor-CPU measurement harness for the diagnostic
  * mains (Explain, Soak). Executor CPU is the noise-immune signal on a
  * shared host: co-tenant load bursts inflate wall time 2-10× but barely
  * move task CPU (PLANS.md round-3/4 findings). Attribution is kept
  * honest by DRAINING the async listener bus between passes instead of
  * sleeping — under load, task-end events can outlive any fixed sleep
  * and leak one pass's CPU into the next.
  */
object Timing {
  /** Register a cumulative executor-CPU counter on the session. */
  def cpuCounter(spark: SparkSession): AtomicLong = {
    val cpuNs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
    })
    cpuNs
  }

  /** Run `passes` gc-separated measurements of `action` and report each
    * as "label pass=N rows=… wall=…s cpu=…s". Read the LAST pass (the
    * first absorbs codegen/JIT warmup). */
  def timedPasses(spark: SparkSession, cpuNs: AtomicLong, label: String,
      passes: Int = 2)(action: => Long): Unit =
    (1 to passes).foreach { pass =>
      System.gc()
      GraftSparkShim.drainListenerBus(spark.sparkContext)
      val c0 = cpuNs.get()
      val t0 = System.nanoTime()
      val n = action
      val wall = (System.nanoTime() - t0) / 1e9
      GraftSparkShim.drainListenerBus(spark.sparkContext)
      val cpu = (cpuNs.get() - c0) / 1e9
      println(f"$label pass=$pass rows=$n wall=$wall%.2fs cpu=$cpu%.2fs")
    }
}
