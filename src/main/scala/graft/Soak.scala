package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling soak: replicate `documents`/`embeddings` N× with adversarial
  * duplication, then time selected queries on the blown-up corpus.
  * Usage:
  *   tools/run.sh graft.Soak <sfDir> <outDir> <factor> <query> [query...]
  *
  * Replication is deliberately worst-case for dedup operators:
  *  - documents: each replica r > 0 appends a ` rep<r>` marker, so every
  *    doc gains an N-member NEAR-dup family (one perturbed shingle —
  *    exact dedup can't collapse it first) and candidate-pair volume
  *    grows quadratically in N;
  *  - embeddings: replicas keep IDENTICAL vectors, so every sign-LSH
  *    bucket and cosine family inflates N×.
  *
  * The generated directory only holds the two corpus tables; soak only
  * queries that read them. Results print as wall + executor CPU over two
  * passes (read pass 2 — CPU is the noise-immune signal on shared
  * hosts; see PLANS.md).
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val factor = args(2).toInt
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val idOffset = 1000000L
    if (!new java.io.File(s"$outDir/documents.parquet").exists()) {
      val reps = explode(sequence(lit(0), lit(factor - 1))).as("r")
      Tables(spark, sfDir, "documents")
        .select(col("*"), reps)
        .select((col("doc_id") + col("r") * idOffset).as("doc_id"),
          when(col("r") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" rep"), col("r")))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
        .repartition(cpus.toInt)
        .write.parquet(s"$outDir/documents.parquet")
      Tables(spark, sfDir, "embeddings")
        .select(col("*"), reps)
        .select((col("vec_id") + col("r") * idOffset).as("vec_id"),
          col("embedding"), col("label"))
        .repartition(cpus.toInt)
        .write.parquet(s"$outDir/embeddings.parquet")
      println(s"[soak] generated ${factor}x corpus at $outDir")
    }

    val cpuNs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    names.foreach { name =>
      (1 to 2).foreach { pass =>
        System.gc()
        val c0 = cpuNs.get()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, outDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50)
        val cpu = (cpuNs.get() - c0) / 1e9
        println(f"[soak] $name pass=$pass rows=$n wall=$wall%.2fs cpu=$cpu%.2fs")
      }
    }
    spark.stop()
  }
}
