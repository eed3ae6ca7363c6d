package graft

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
  /** Diagnostic-main session settings shared by Soak/IndexSoak. */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // see Verify.scala: Spark 4.1 union-partitioning claim crashes SMJ zips
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val factor = args(2).toInt
    val names = args.drop(3)
    val spark = session()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    ensureCorpus(spark, sfDir, outDir, factor, cpus.toInt)

    val cpuNs = Timing.cpuCounter(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    names.foreach { name =>
      Timing.timedPasses(spark, cpuNs, s"[soak] $name")(
        SparkEntry.queries(name)(spark, outDir).count())
    }
    spark.stop()
  }

  /** Generate (or trust) the N×-replicated corpus at `outDir`. */
  def ensureCorpus(spark: SparkSession, sfDir: String, outDir: String,
      factor: Int, parts: Int): Unit = {
    // Regenerate unless a COMPLETED generation of this exact factor is
    // present. Directory existence alone is not completion (a crash mid-
    // write leaves a dir holding only _temporary/), so trust requires
    // every table's _SUCCESS marker AND a meta file recording the factor
    // (written last) — reusing a 10× dir for a 20× request would
    // silently mislabel the soak otherwise.
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete()
    }
    val metaFile = new java.io.File(s"$outDir/soak_meta")
    val complete =
      Seq("documents", "embeddings").forall(t =>
        new java.io.File(s"$outDir/$t.parquet/_SUCCESS").exists()) &&
        metaFile.exists() &&
        scala.util.Using(scala.io.Source.fromFile(metaFile))(_.mkString)
          .toOption.exists(_.trim == factor.toString)
    if (!complete) {
      val root = new java.io.File(outDir)
      if (root.exists()) {
        // outDir is user-supplied and about to be recursively deleted:
        // refuse anything that doesn't look like a (possibly partial)
        // soak dir — a mistyped data/home path must abort, not vanish
        val expected = Set("documents.parquet", "embeddings.parquet",
          "soak_meta")
        val foreign = Option(root.listFiles()).getOrElse(Array.empty)
          .map(_.getName).filterNot(expected)
        require(foreign.isEmpty,
          s"refusing to delete $outDir: contains non-soak entries " +
            foreign.mkString(", "))
        rmTree(root)
      }
      root.mkdirs()
      val reps = explode(sequence(lit(0), lit(factor - 1))).as("r")
      // replica id stride derived from the data — a constant would
      // silently collide ids once the base corpus outgrows it
      val docs = Tables(spark, sfDir, "documents")
      val embs = Tables(spark, sfDir, "embeddings")
      val idOffset = math.max(
        docs.agg(max(col("doc_id"))).head.getLong(0),
        embs.agg(max(col("vec_id"))).head.getLong(0)) + 1L
      docs
        .select(col("*"), reps)
        .select((col("doc_id") + col("r") * idOffset).as("doc_id"),
          when(col("r") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" rep"), col("r")))
            .as("text"),
          col("lang"), col("source"))
        // n_chars recomputed AFTER the replica suffix, or every replica
        // row would carry the base text's stale length
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(parts)
        .write.parquet(s"$outDir/documents.parquet")
      embs
        .select(col("*"), reps)
        .select((col("vec_id") + col("r") * idOffset).as("vec_id"),
          col("embedding"), col("label"))
        .repartition(parts)
        .write.parquet(s"$outDir/embeddings.parquet")
      val w = new java.io.PrintWriter(metaFile)
      try w.print(factor.toString) finally w.close()
      println(s"[soak] generated ${factor}x corpus at $outDir (id stride $idOffset)")
    }
  }
}
