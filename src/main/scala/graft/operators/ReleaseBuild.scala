package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables, sinks}
import sinks.Sinks

/** The RELEASE-side product flow — the write-path mirror of
  * [[DailyIngest]]: where the ingest pipeline decides what ENTERS the
  * corpus day by day, this composes what SHIPS out of it — the
  * artifact set a training-data team hands to a trainer per release,
  * every stage the already-proven operator (this object adds
  * sequencing, artifact layout, and bookkeeping — no new predicates):
  *
  *   1. survivors: the full 7-stage curation funnel's `kept` docs
  *      (q157's disposition — exact dedup → repetition → fluency →
  *      exact decon → quality → toxicity, first-failure attributed);
  *      the disposition table itself ships as the release's provenance
  *      record
  *   2. packing: q76's shard-local sequence layout over the survivors
  *      (offsets a trainer's loader seeks by)
  *   3. manifest: q131's per-shard accounting over the survivors
  *   4. mixture: q141's temperature-reweighted sampling recipe over
  *      the surviving source distribution
  *   5. report card: q138's per-source sign-off table over the
  *      survivors
  *
  * plus S5 job-ledger rows and S8 structured logs around the whole
  * run (the reference's bookkeeping machinery, release flavor).
  *
  * Artifacts under `outDir`: `kept_docs.parquet`,
  * `disposition.parquet`, `packing.parquet`, `manifest.parquet`,
  * `mixture.parquet`, `mixed_manifest.parquet` (the recipe APPLIED —
  * what a training run loads), `report_card.parquet`, `kept_assets` /
  * `paired_curation`, `kept_vectors` / `paired_vector_curation` (with
  * an embeddings universe), `curation_rollup` (the tri-modal
  * sign-off), `ledger/`, `logs/`.
  *
  * Scale shape: ONE funnel pass decides the kept set (each stage the
  * proven operator's plan); every downstream artifact is one
  * already-audited query over the kept frame (q76/q131's two-level
  * sharded ranks, q141/q138's per-source rollups). The kept id set
  * rides a lazy checkpoint so the funnel executes once, not once per
  * artifact. Deterministic under reruns: every stage is salted-hash /
  * integer arithmetic, `ts` is caller-supplied (the S8 rule), and
  * rerunning overwrites byte-identical artifacts (spec-pinned).
  */
object ReleaseBuild {

  def run(spark: SparkSession, dataDir: String, outDir: String,
      ts: String = "1970-01-01T00:00:00Z"): DataFrame =
    runOn(spark, Tables(spark, dataDir, "documents"), outDir, ts,
      Some(Tables(spark, dataDir, "embeddings")))

  /** The same flow over an EXPLICIT document universe — the composed
    * lifecycle's entry point (VERDICT r10 "Next round" #5): the caller
    * passes (ingested train docs ∪ the benchmark holdout), so the
    * funnel's decontamination stages gate against the SAME eval suite
    * the ingest chain used, and the release ships what survived N
    * ingest days AND the release funnel. ReleaseBuildSpec pins the
    * chain-fed release byte-identical to one fed by per-day
    * from-scratch ingests. */
  def runOn(spark: SparkSession, docsUniverse: DataFrame, outDir: String,
      ts: String = "1970-01-01T00:00:00Z",
      vecsUniverse: Option[DataFrame] = None): DataFrame = {
    // eval docs (doc_id % 10 == 0) are the BENCHMARK holdout — they
    // gate the funnel's decontamination stages but must never ship in
    // a training release (the q151 rule); the release universe is the
    // train side only
    val universe = docsUniverse
      .transform(graft.Materialize.shared) // feeds six funnel stages + kept
    val d = universe.filter(col("doc_id") % 10 =!= 0)
    val disposition = CurationQueries.funnelDispositionOf(universe)
      .filter(col("doc_id") % 10 =!= 0)
      .transform(graft.Materialize.shared) // feeds provenance write + kept
    val keptDocs = d.join(
      disposition.filter(col("disposition") === "kept")
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
      .transform(graft.Materialize.shared) // feeds all five artifacts

    def w(df: DataFrame, name: String): Long = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      spark.read.parquet(s"$outDir/$name.parquet").count()
    }
    // the asset keep-list (VERDICT r12 "Next round" #4): q130's
    // election over the release universe's assets — unclustered
    // assets ship, each perceptual-hash cluster ships exactly its
    // elected member (max caption quality, min-id tie-break)
    val keptAssetsDf = graft.multimodal.Multimodal.keptAssetsOf(spark,
        graft.multimodal.Multimodal.assetDocsOf(d))
      .transform(graft.Materialize.shared) // artifact + paired report
    // the caption↔asset consistency record (VERDICT r13 "Next round"
    // #4): ships beside the two keep-lists so a pair inconsistency
    // (text dropped, asset kept, or vice versa) is visible in the
    // release itself — ONE classification definition with q195
    val pairedAssets = graft.multimodal.Multimodal
      .pairedCurationOf(disposition, keptAssetsDf)
      .transform(graft.Materialize.shared) // artifact + rollup
    // the vector keep-list (VERDICT r13 "Next round" #1): the q91
    // election over the release's embeddings universe — unclustered
    // vectors ship, each semantic cluster ships exactly its elected
    // survivor; no shipped pair within NearDupThreshold
    // (ReleaseBuildSpec asserts the kept_assets pin, vector flavor).
    // None = a text-only release universe (the chain-equality specs).
    val keptVectorsDf = vecsUniverse.map(e =>
      VectorQueries.keptVectorsOf(e)
        .transform(graft.Materialize.shared)) // artifact + paired + rollup
    // the doc↔vector consistency record (VERDICT r14 "Next round" #1):
    // the q196 classifier over the release's own funnel frames — a kept
    // doc whose vector lost the election (unservable in ANN/retrieval)
    // and a shipped vector for a dropped doc (poisons q135/q140 mining)
    // both become visible rows in the release itself
    val pairedVectors = keptVectorsDf.map(kv => VectorQueries
      .pairedVectorCurationOf(disposition, kv)
      .transform(graft.Materialize.shared)) // artifact + rollup
    val counts = Seq(
      "disposition" -> w(disposition.orderBy(col("doc_id")), "disposition"),
      "kept_docs" -> w(keptDocs, "kept_docs"),
      "kept_assets" -> w(keptAssetsDf, "kept_assets"),
      "paired_curation" -> w(pairedAssets, "paired_curation"),
      "packing" -> w(CurationQueries.packSequencesDocs(keptDocs),
        "packing")) ++ keptVectorsDf.map(kv =>
      "kept_vectors" -> w(kv, "kept_vectors")) ++ pairedVectors.map(pv =>
      "paired_vector_curation" -> w(pv, "paired_vector_curation")) ++ Seq(
      // the TRI-MODAL sign-off rollup (VERDICT r14 "Next round" #1):
      // the release decision table — per pairing (text↔asset,
      // text↔vector), pair-status counts off the SAME shipped paired
      // tables, so sign-off reads one table and reconciles by
      // construction (spec-pinned against the two artifacts)
      "curation_rollup" -> w(
        (Seq(pairedAssets.select(lit("text_asset").as("pairing"),
            col("pair_status"))) ++
          pairedVectors.map(_.select(lit("text_vector").as("pairing"),
            col("pair_status"))))
          .reduce(_.unionByName(_))
          .groupBy(col("pairing"), col("pair_status"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("pairing"), col("pair_status")), "curation_rollup"),
      "manifest" -> w(CurationQueries.shardManifestDocs(keptDocs),
        "manifest"),
      "mixture" -> w(CurationQueries.mixtureRecipeDocs(keptDocs),
        "mixture"),
      // the EPOCH-READY manifest (VERDICT r14 "Next round" #3): the
      // mixture recipe APPLIED — each kept doc repeated to its source's
      // temperature target (whole epochs + a seeded fractional prefix,
      // Σ tokens per source within one doc of the recipe — spec-pinned)
      // and shard-assigned per copy; what a training run actually loads
      "mixed_manifest" -> w(CurationQueries.mixedManifestDocs(keptDocs),
        "mixed_manifest"),
      "report_card" -> w(CurationQueries.sourceReportDocs(keptDocs),
        "report_card"))

    // bookkeeping: one ledger row + one log line per artifact
    import spark.implicits._
    val summary = counts.toDF("step", "n_rows")
      .orderBy(col("step"))
      .transform(graft.Materialize.shared) // feeds ledger, logs AND return
    // job_id is a pure function of (ts, step): monotonically_increasing_id
    // restarts at 0 every run, which duplicated job_ids across appended
    // reruns — hashing the caller-supplied ts keeps provenance rows
    // uniquely keyed per release build (ADVICE r10)
    Sinks.appendLedger(summary
      .select(xxhash64(lit(ts), col("step")).as("job_id"), col("step"),
        col("n_rows").as("n_docs"), lit(ts).as("ts"),
        lit("completed").as("status")),
      s"$outDir/ledger")
    Sinks.writeLogs(summary
      .select(lit(ts).as("ts"), lit("INFO").as("level"),
        lit("release_build_step").as("event"),
        concat_ws(" ", col("step"), col("n_rows")).as("message")),
      s"$outDir/logs")
    summary
  }
}
