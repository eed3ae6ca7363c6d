package graft

/** Seven-generation delta-ingest soak — the generation-GC economics of
  * the [[operators.DailyIngest]] delta layout, measured instead of
  * argued from the two-day spec case (VERDICT r9 "Next round" #7).
  *
  * The chain is a COLD START over all [[operators.CurationQueries
  * .DeconBatchMod]] residues: the gen-0 seed indexes an empty corpus,
  * then days 0..6 each ingest one residue of the train side via
  * `runDelta` (each write is one O(batch) generation partition), with
  * a `foldDelta` VACUUM after day 3 (gens 0..4 → one gen-0 snapshot —
  * the throughGen=4 bound models vacuuming beside an in-flight day 4).
  * Days 4..6 resume off the folded root, so the run shows both halves
  * of the GC trade: daily cost as generations pile up (days 0..3: 1→5
  * partitions per family) and daily cost after compaction (days 4..6:
  * 1→3 partitions), plus the vacuum's own bounded price.
  *
  * What flat output means at 100 TB: the per-day legs growing only
  * with the INDEX read (slim hash tables, never documents) while each
  * day's write stays batch-sized is exactly the claim "the delta
  * layout makes daily ingest O(batch)"; the vacuum leg is the
  * amortized compaction a table format would schedule weekly.
  *
  * Usage: tools/run.sh graft.GenSoak <sfDir> <workDir> <factor>
  * The corpus replica at <workDir>/data is reused if present (same
  * contract as IngestSoak); roots are wiped per run — the chain IS the
  * measurement. DailyIngestSpec pins the equivalence (chain+vacuum ==
  * from-scratch rebuild) at sf0.001; this main prices it at N×.
  */
object GenSoak {
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
    val root = s"$workDir/gen_root"
    val folded = s"$workDir/gen_folded"
    Seq(root, folded).foreach(wipe)

    val cpuNs = Timing.cpuCounter(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT warm
    val allDays = (0 until operators.CurationQueries.DeconBatchMod).toSet
    Timing.timedPasses(spark, cpuNs, "[gen-soak] seed", passes = 1) {
      operators.DailyIngest.writeIndexesDelta(spark, dataDir, root,
        pendingDays = allDays)
      0L
    }
    def day(d: Int, r: String): Unit =
      Timing.timedPasses(spark, cpuNs, s"[gen-soak] day$d", passes = 1)(
        operators.DailyIngest.runDelta(spark, r, dataDir,
          s"$workDir/gen_out$d", day = d).count())
    (0 to 3).foreach(day(_, root))
    // vacuum beside an in-flight day 4: fold COMMITTED gens only
    Timing.timedPasses(spark, cpuNs, "[gen-soak] vacuum", passes = 1) {
      operators.DailyIngest.foldDelta(spark, root, folded, throughGen = 4)
      0L
    }
    (4 to 6).foreach(day(_, folded))
    spark.stop()
  }
}
