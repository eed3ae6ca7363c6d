package graft

import org.apache.spark.sql.functions.col

/** Measured end-to-end cost of the COMPOSED lifecycle at N× scale —
  * the product flow a training-data team actually runs (VERDICT r10
  * "Next round" #5): a cold-start 7-day delta-ingest chain (the
  * GenSoak shape: one O(batch) generation per day off one root), then
  * [[operators.ReleaseBuild]] over the chain's ingested corpus
  * (kept_docs of all days ∪ the benchmark holdout, which gates the
  * release funnel's decontamination stages but never ships).
  *
  * ReleaseBuildSpec pins the correctness half at sf0.001 (chain-fed
  * release byte-identical to per-day from-scratch ingests); this main
  * prices it: per-day ingest cost, the one-time union scan, and the
  * release bill, each as wall + executor-CPU lines.
  *
  * Usage: tools/run.sh graft.LifecycleSoak <sfDir> <workDir> <factor>
  * Corpus replica reused if present (IngestSoak's contract); the chain
  * root is wiped per run — the chain IS the measurement.
  */
object LifecycleSoak {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir, factorS) = args
    val factor = factorS.toInt
    val spark = Soak.session()
    val parts = spark.sessionState.conf.numShufflePartitions

    val dataDir = s"$workDir/data"
    Soak.ensureCorpus(spark, sfDir, dataDir, factor, parts)

    def wipe(dir: String): Unit = {
      def rec(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rec)
        f.delete(); ()
      }
      val f = new java.io.File(dir)
      if (f.exists()) rec(f)
    }
    val root = s"$workDir/lc_root"
    wipe(root)

    val cpuNs = Timing.cpuCounter(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT warm
    val nDays = operators.CurationQueries.DeconBatchMod
    val allDays = (0 until nDays).toSet
    Timing.timedPasses(spark, cpuNs, "[lifecycle-soak] seed", passes = 1) {
      operators.DailyIngest.writeIndexesDelta(spark, dataDir, root,
        pendingDays = allDays)
      0L
    }
    // Round-12 extension (VERDICT r11 "Next round" #6): the chain no
    // longer exercises only the text gates. Every IndexStore family
    // builds once against the replica corpus, and each family's DAILY
    // leg then runs INSIDE every chain day — one shared session, so the
    // soak prices all families' daily legs under each other's shuffle
    // pressure, broadcast memory and GC instead of each family measured
    // alone (IndexSoak's per-family view stays the clean-room number).
    // The family batch is the fixed mod-10 split each day — the text
    // chain supplies the day-varying component; the family lines are
    // the STEADY-STATE daily bill, attributed per family per day.
    val famIndex = s"$workDir/lc_index"
    wipe(famIndex)
    Timing.timedPasses(spark, cpuNs, "[lifecycle-soak] families-build",
      passes = 1) {
      operators.IndexStore.families.foreach { case (_, _, write, _) =>
        write(spark, dataDir, famIndex)
      }
      0L
    }
    // SPARK_GRAFT_LC_FAMEVERY=N runs the family legs every Nth day
    // (default every day): the family batch is the same mod-10 split
    // each day, so at large factors one family day per chain prices the
    // steady state without 7× redundant re-measurement.
    val famEvery = sys.env.getOrElse("SPARK_GRAFT_LC_FAMEVERY", "1").toInt
    for (d <- 0 until nDays) {
      Timing.timedPasses(spark, cpuNs, s"[lifecycle-soak] day$d",
        passes = 1)(
        operators.DailyIngest.runDelta(spark, root, dataDir,
          s"$workDir/lc_out$d", day = d).count())
      if (d % famEvery == 0) {
        operators.IndexStore.families.foreach { case (name, _, _, daily) =>
          Timing.timedPasses(spark, cpuNs,
            s"[lifecycle-soak] day$d fam=$name", passes = 1)(
            daily(spark, famIndex, dataDir).count())
        }
        // Round-14 (VERDICT r13 "Next round" #2): the composed ASSET
        // and VECTOR days — disposition + kept_* artifacts + ledger +
        // next-snapshot compaction, the whole runAssets/runVectors
        // orchestration — run inside the chain off the same family
        // indexes, so their steady-state daily bill is measured under
        // the chain's shuffle/broadcast/GC load like every other
        // orchestration claim in this repo.
        Timing.timedPasses(spark, cpuNs,
          s"[lifecycle-soak] day$d assets", passes = 1)(
          operators.DailyIngest.runAssets(spark, famIndex, dataDir,
            s"$workDir/lc_assets$d").count())
        Timing.timedPasses(spark, cpuNs,
          s"[lifecycle-soak] day$d vectors", passes = 1)(
          operators.DailyIngest.runVectors(spark, famIndex, dataDir,
            s"$workDir/lc_vec$d").count())
      }
    }
    // Round-15 (VERDICT r14 "Next round" #2): the scheduled sem_*/
    // quantizer REBUILD the q160 drift report exists to trigger. The
    // trigger reads the persisted quantizer stats (≤|cells| rows, no
    // corpus scan); the rebuild then recomputes the rebuild-class
    // tables over corpus ∪ kept vectors — the amortized O(corpus) job
    // the O(batch) daily avoids, priced here as the build-vs-carry
    // line — and the election churn (which shipped vectors the refresh
    // dethrones) is counted off the same keep-list definition.
    val driftCells = operators.IndexStore
      .dailyQuantizerDrift(spark, famIndex, dataDir)
      .filter(col("drift_micro").isNotNull)
      .filter(org.apache.spark.sql.functions.abs(col("drift_micro")) > 0)
      .count()
    println(s"[lifecycle-soak] drift trigger: $driftCells drifting " +
      "cells -> scheduling rebuild")
    val embAll = Tables(spark, dataDir, "embeddings")
    val corpusEmb = embAll
      .filter(col("vec_id") % operators.VectorQueries.VecBatchMod =!= 0)
    val keptIds = spark.read
      .parquet(s"$workDir/lc_vec0/kept_vectors.parquet")
      .select(col("vec_id"))
    val universeVecs = corpusEmb.unionByName(
      embAll.join(keptIds, Seq("vec_id"), "left_semi"))
    Timing.timedPasses(spark, cpuNs, "[lifecycle-soak] vec-rebuild",
      passes = 1)(
      operators.DailyIngest.rebuildSemantic(spark, famIndex,
        universeVecs, s"$workDir/lc_vecrebuild").count())
    Timing.timedPasses(spark, cpuNs,
      "[lifecycle-soak] vec-rebuild-churn", passes = 1)(
      operators.VectorQueries.keptChurnOf(
        operators.VectorQueries.keptVectorsOf(corpusEmb),
        operators.VectorQueries.keptVectorsOf(universeVecs),
        corpusEmb.select(col("vec_id"))).count())

    // the release universe: every day's survivors ∪ the eval holdout
    val ingested = (0 until nDays)
      .map(d => spark.read.parquet(s"$workDir/lc_out$d/kept_docs.parquet"))
      .reduce(_.unionByName(_))
    val universe = ingested.unionByName(
      Tables(spark, dataDir, "documents").filter(col("doc_id") % 10 === 0))
    Timing.timedPasses(spark, cpuNs, "[lifecycle-soak] release",
      passes = 1)(
      operators.ReleaseBuild.runOn(spark, universe,
        s"$workDir/lc_release",
        // the release now also ships kept_vectors + paired_curation —
        // priced inside the same release line
        vecsUniverse = Some(Tables(spark, dataDir, "embeddings"))).count())
    spark.stop()
  }
}
