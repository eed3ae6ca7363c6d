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
    // attribution legs: the daily number above decomposes into the
    // GATES (dispositionOf off the disk index) and the COMPACTION
    // (index_next snapshot write); the difference is reports + the
    // kept/ledger/log writes. Measured separately so a regression in
    // one leg is visible instead of smeared across the total.
    val batch = operators.DailyIngest.split(spark, dataDir)._2
      .transform(graft.Materialize.shared)
    def idx(name: String) =
      spark.read.parquet(s"$workDir/index/$name.parquet")
    // the once-per-day batch signature compute the pipeline shares
    // between the near-dup gate and index persistence
    val (rawBands, rawSets) =
      operators.LLMQueries.signatureTables(batch)
    val bBands = rawBands.transform(graft.Materialize.shared)
    val bSets = rawSets.transform(graft.Materialize.shared)
    val bWins = operators.CurationQueries.docWindows(batch)
      .transform(graft.Materialize.shared)
    Timing.timedPasses(spark, cpuNs, "[ingest-soak] batch-sigs",
      passes = 1)(bBands.count() + bSets.count())
    Timing.timedPasses(spark, cpuNs, "[ingest-soak] batch-wins",
      passes = 1)(bWins.count())
    Timing.timedPasses(spark, cpuNs, "[ingest-soak] gates")(
      operators.DailyIngest.dispositionOf(batch, idx("text_hash"),
        idx("norm_hash"), idx("text_bands"), idx("text_sets"),
        idx("eval_grams"), idx("eval_bands"), idx("eval_sets"),
        bBands, bSets).count())
    Timing.timedPasses(spark, cpuNs, "[ingest-soak] compact",
      passes = 1) {
      operators.DailyIngest.compactIndexes(idx, batch, bBands, bSets,
        bWins, (df, name) => df.write.mode("overwrite")
          .parquet(s"$workDir/attr_next/$name.parquet"))
      0L
    }
    // phase-by-phase mirror of writeDay, one timed leg per action, so
    // the daily total attributes exactly instead of by subtraction
    import org.apache.spark.sql.functions.col
    val disposition = operators.DailyIngest.dispositionOf(batch,
      idx("text_hash"), idx("norm_hash"), idx("text_bands"),
      idx("text_sets"), idx("eval_grams"), idx("eval_bands"),
      idx("eval_sets"))
      .transform(graft.Materialize.shared)
    Timing.timedPasses(spark, cpuNs, "[ingest-soak] disposition",
      passes = 1)(disposition.count())
    Timing.timedPasses(spark, cpuNs, "[ingest-soak] kept-write",
      passes = 1) {
      batch.join(disposition.filter(col("disposition") === "kept")
          .select(col("doc_id")), Seq("doc_id"), "left_semi")
        .write.mode("overwrite").parquet(s"$workDir/attr_kept.parquet")
      0L
    }
    Timing.timedPasses(spark, cpuNs, "[ingest-soak] disp-write",
      passes = 1) {
      disposition.orderBy(col("doc_id")).write.mode("overwrite")
        .parquet(s"$workDir/attr_disp.parquet")
      0L
    }
    Timing.timedPasses(spark, cpuNs, "[ingest-soak] reports")(
      operators.CurationQueries.noveltyReportFrom(idx("substr_windows"),
        batch, bWins).count() +
      operators.CurationQueries.incrementalSubstringReportFrom(
        idx("substr_windows"), batch, bWins).count())
    // the DELTA layout's full daily run — same gates and artifacts,
    // but index persistence is an O(batch) generation write instead of
    // the O(corpus) snapshot compact measured above. Repeated passes
    // are safe: day 0 reads gen ≤ 0 and overwrites its own gen=1.
    Timing.timedPasses(spark, cpuNs, "[ingest-soak] delta-seed",
      passes = 1) {
      operators.DailyIngest.writeIndexesDelta(spark, dataDir,
        s"$workDir/delta")
      0L
    }
    Timing.timedPasses(spark, cpuNs, "[ingest-soak] delta-daily")(
      operators.DailyIngest.runDelta(spark, s"$workDir/delta", dataDir,
        s"$workDir/delta_out").count())
    // the write-only comparison against `compact`: same families, but
    // batch-sized generation partitions instead of a corpus rewrite
    Timing.timedPasses(spark, cpuNs, "[ingest-soak] delta-write",
      passes = 1) {
      def w(df: org.apache.spark.sql.DataFrame, name: String): Unit =
        df.write.mode("overwrite")
          .parquet(s"$workDir/attr_delta/$name.parquet/gen=1")
      w(operators.LLMQueries.hashIndex(batch), "text_hash")
      w(operators.LLMQueries.normHashIndex(batch), "norm_hash")
      w(bBands, "text_bands")
      w(bSets, "text_sets")
      w(operators.CurationQueries.substrWindowIndexFrom(bWins),
        "substr_windows")
      0L
    }
    spark.stop()
  }
}
