package graft

/** Measured end-to-end cost of one [[operators.ReleaseBuild]] run at N×
  * scale — the release-cadence counterpart of IngestSoak's daily
  * number: the full 7-stage funnel pass plus all five artifact writes
  * and the bookkeeping, priced as the one bill a team pays per
  * training-data release (weekly/monthly — amortized, unlike the daily
  * ingest cost, which is why a funnel-shaped full pass is acceptable
  * here and deliberately avoided in DailyIngest).
  *
  * Usage: tools/run.sh graft.ReleaseSoak <sfDir> <workDir> <factor>
  * Corpus replica reused if present (IngestSoak's contract); the out
  * dir is overwritten per pass — the rerun IS the overwrite test.
  */
object ReleaseSoak {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir, factorS) = args
    val factor = factorS.toInt
    val spark = Soak.session()
    val parts = spark.sessionState.conf.numShufflePartitions

    val dataDir = s"$workDir/data"
    Soak.ensureCorpus(spark, sfDir, dataDir, factor, parts)

    val cpuNs = Timing.cpuCounter(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT warm
    Timing.timedPasses(spark, cpuNs, "[release-soak] build")(
      operators.ReleaseBuild.run(spark, dataDir,
        s"$workDir/release_out").count())
    spark.stop()
  }
}
