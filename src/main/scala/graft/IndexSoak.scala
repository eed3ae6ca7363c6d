package graft

/** Measured write→read lifecycle of the incremental-dedup indexes
  * (VERDICT r8 "Next round" #1): generate an N×-replicated corpus,
  * WRITE every corpus-side index to parquet once (the amortized
  * snapshot cost a real pipeline pays per corpus rebuild), then time
  * each family's DAILY leg reading the on-disk index — the recurring
  * cost. The split converts the "daily cost is O(batch)" claim from
  * invariant-tested to measured.
  *
  * Usage:
  *   tools/run.sh graft.IndexSoak <sfDir> <workDir> <factor> [family...]
  *
  * `workDir` holds `data/` (the Soak-replicated corpus; reused if a
  * completed generation of the same factor exists) and `index/` (always
  * rewritten — the write IS the thing being measured). Families default
  * to all of [[graft.operators.IndexStore.families]].
  *
  * Output: one "[index-soak]" line per (family, phase) with wall +
  * executor CPU — `build` = index construction + parquet write,
  * `daily pass=1/2` = batch leg off the disk index (read pass 2; CPU is
  * the noise-immune signal on this shared host, see PLANS.md).
  */
object IndexSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val workDir = args(1)
    val factor = args(2).toInt
    val only = args.drop(3).toSet
    val spark = Soak.session()
    val parts = spark.sessionState.conf.numShufflePartitions

    val dataDir = s"$workDir/data"
    val indexDir = s"$workDir/index"
    Soak.ensureCorpus(spark, sfDir, dataDir, factor, parts)

    val families = operators.IndexStore.families
      .filter(f => only.isEmpty || only(f._1))
    require(families.nonEmpty,
      s"no such family; known: ${operators.IndexStore.families.map(_._1)}")

    val cpuNs = Timing.cpuCounter(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT warm
    families.foreach { case (name, twin, build, daily) =>
      Timing.timedPasses(spark, cpuNs, s"[index-soak] $name build",
        passes = 1) {
        build(spark, dataDir, indexDir); 0L
      }
      Timing.timedPasses(spark, cpuNs, s"[index-soak] $name daily")(
        daily(spark, indexDir, dataDir).count())
      // opt-in: time the CAPPED daily leg beside the exact one (the
      // q187/q188/q191 admission rule applied) — the capped-vs-exact
      // policy measurement on the same corpus + same disk index
      // a malformed value degrades to the capless run instead of
      // killing the whole soak (ADVICE r13)
      sys.env.get("SPARK_GRAFT_BAND_CAP").flatMap { v =>
        val parsed = scala.util.Try(v.toInt).toOption
        if (parsed.isEmpty) println(
          s"[index-soak] WARN malformed SPARK_GRAFT_BAND_CAP='$v' ignored")
        parsed
      }.foreach { c =>
        operators.IndexStore.cappedDailies.get(name).foreach { capped =>
          Timing.timedPasses(spark, cpuNs,
            s"[index-soak] $name daily cap=$c")(
            capped(spark, indexDir, dataDir, c).count())
        }
      }
      // the third lifecycle leg: nightly compaction (batch → next
      // snapshot's index) — must beat the O(corpus) rebuild `build`
      // just measured, or the compactor has regressed to corpus work
      operators.IndexStore.compactions.find(_._1 == name).foreach {
        case (_, _, compact, _) =>
          Timing.timedPasses(spark, cpuNs, s"[index-soak] $name compact",
            passes = 1) {
            compact(spark, indexDir, dataDir, s"$workDir/index_next"); 0L
          }
      }
      println(s"[index-soak] $name twin=$twin done")
    }
    spark.stop()
  }
}
