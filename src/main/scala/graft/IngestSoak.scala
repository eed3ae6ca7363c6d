package graft

/** Measured end-to-end lifecycle of the [[operators.DailyIngest]]
  * product flow at N× scale — the composition-level counterpart of
  * [[IndexSoak]]'s per-family split: `build` = writing EVERY corpus
  * index the pipeline reads (the amortized per-snapshot cost), `daily`
  * = one full `DailyIngest.run` off those on-disk indexes — all five
  * gates, the kept/disposition artifacts, both reports, ledger + logs,
  * and the index_next compaction. The recurring number a scheduler
  * would see per day, measured rather than argued.
  *
  * Usage: tools/run.sh graft.IngestSoak <sfDir> <workDir> <factor>
  *
  * `workDir` holds `data/` (Soak-replicated corpus, reused if a
  * completed generation of the same factor exists), `index/` (always
  * rewritten — the build IS part of the measurement) and `out/` (the
  * daily run's artifacts, overwritten per pass). Read daily pass 2;
  * executor CPU is the noise-immune signal on this shared host.
  */
object IngestSoak {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir, factorS) = args
    val factor = factorS.toInt
    val spark = Soak.session()
    val parts = spark.sessionState.conf.numShufflePartitions

    val dataDir = s"$workDir/data"
    Soak.ensureCorpus(spark, sfDir, dataDir, factor, parts)

    val cpuNs = Timing.cpuCounter(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT warm
    Timing.timedPasses(spark, cpuNs, "[ingest-soak] build", passes = 1) {
      operators.DailyIngest.writeIndexes(spark, dataDir,
        s"$workDir/index")
      0L
    }
    Timing.timedPasses(spark, cpuNs, "[ingest-soak] daily")(
      operators.DailyIngest.run(spark, s"$workDir/index", dataDir,
        s"$workDir/out").count())
    spark.stop()
  }
}
