package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Asset-granularity ingest composition (L93): the per-batch-asset
  * first-failing-gate disposition (q193) composing the three modality
  * verdicts, the release kept-assets keep-list, and the media
  * convention's corpus/batch split.
  *
  * Split out of Multimodal by family (round 13, pure moves).
  */
private[multimodal] trait MediaIngest {
  this: Multimodal.type =>

  /** Per-batch-ASSET ingest disposition given the three modality pair
    * verdicts — ONE definition for the pipeline (disk-read index frames
    * through [[graft.operators.DailyIngest.runAssets]]) and the q193
    * oracle rendering, the q159 `dispositionOf` convention at ASSET
    * granularity (VERDICT r12 "Next round" #4: media assets deduped
    * through their families but produced no first-failing-gate
    * provenance row). Gate order (first failing, the q157 rule):
    *   1. exact dup — an identical-phash asset with a smaller id
    *      exists (the hamming-0 rows of the q111 verdict; the q60
    *      keep-min election, asset flavor);
    *   2. perceptual near-dup — a verified Hamming ≤ [[MediaHammingMax]]
    *      pair against a smaller id (hamming ≥ 1 — kind-blind, as q109
    *      itself is);
    *   3. frame containment (video assets) — a q183 pair against a
    *      smaller id;
    *   4. audio-fingerprint containment (audio assets) — a q128 pair
    *      against a smaller id;
    *   5. kept.
    * Every verdict frame is the proven incremental operator's output —
    * this composes, it never re-decides. Losing requires a SMALLER id
    * (pairs are (doc_a < doc_b); only doc_b drops), so originals win
    * over late re-encodes, the q88 rule. */
  def assetDispositionOf(batchAssets: DataFrame, mediaPairs: DataFrame,
      framePairs: DataFrame, audioPairs: DataFrame): DataFrame = {
    def losers(pairs: DataFrame, flag: String): DataFrame =
      pairs.select(col("doc_b").as("doc_id")).distinct()
        .withColumn(flag, lit(true))
    batchAssets.select(col("doc_id"), col("kind"))
      .join(losers(mediaPairs.filter(col("hamming") === 0), "f_exact"),
        Seq("doc_id"), "left")
      .join(losers(mediaPairs.filter(col("hamming") >= 1), "f_near"),
        Seq("doc_id"), "left")
      .join(losers(framePairs, "f_frame"), Seq("doc_id"), "left")
      .join(losers(audioPairs, "f_audio"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("kind"),
        when(col("f_exact").isNotNull, "dropped_exact_dup")
          .when(col("f_near").isNotNull, "dropped_near_dup")
          .when(col("kind") === "video" && col("f_frame").isNotNull,
            "dropped_frame_dup")
          .when(col("kind") === "audio" && col("f_audio").isNotNull,
            "dropped_audio_dup")
          .otherwise("kept").as("disposition"))
  }

  /** L93/q193: the per-asset ingest disposition as an ORACLE query —
    * index frames built in-query (the q159 convention; the pipeline
    * reads the same frames from parquet, parity spec-pinned in
    * DailyIngestSpec). The batch is the media convention's daily slice
    * (asset id ≡ 0 mod 10, variants arriving with their originals). */
  def assetIngestDisposition(spark: SparkSession, dir: String): DataFrame = {
    val (corpusH, batchH0) = mediaSplit(spark, dir)
    val batchH = batchH0.transform(graft.Materialize.shared) // 2 gates + frame
    val (famsC, membersC, bandsC) = mediaNearDupIndexTables(corpusH)
    val (corpusFh, batchFh) = frameFpSplit(spark, dir)
    val (corpusAf, batchAf) = audioFpSplit(spark, dir)
    assetDispositionOf(batchH.select(col("doc_id"), col("kind")),
      incrementalMediaNearDupsCanonical(famsC, membersC, bandsC, batchH),
      incrementalFrameNearDups(corpusFh, batchFh),
      incrementalAudioNearDups(corpusAf, batchAf))
      .orderBy(col("doc_id"))
  }

  /** Release-side KEPT-ASSETS keep-list — q130's election applied over
    * an explicit asset-document universe: every unclustered asset
    * survives, every perceptual-hash cluster keeps exactly its elected
    * member (max caption quality, min-id tie-break). The artifact
    * ReleaseBuild ships beside kept_docs (VERDICT r12 "Next round" #4:
    * the q157/q159 convention stopped at text). */
  def keptAssetsOf(spark: SparkSession, assetDocsDf: DataFrame): DataFrame = {
    val docsDf = assetDocsDf.transform(graft.Materialize.shared) // hash + score
    val h = perceptualHashes(mediaTableOf(spark, docsDf)).toDF()
      .transform(graft.Materialize.shared) // pair join + both output legs
    val (clusters, _) = graft.operators.CurationQueries
      .connectedComponentsStar(
        pairFrameOf(h).select(col("doc_a"), col("doc_b")))
    val clusters1 = clusters.transform(graft.Materialize.shared) // elect+anti
    val survivors = graft.operators.CurationQueries
      .electSurvivors(clusters1,
        docsDf.select(col("doc_id"),
          graft.operators.LLMQueries.qualityExpr.as("quality")))
      .select(col("kept_id").as("doc_id"))
    val unclustered = h.select(col("doc_id"))
      .join(clusters1.select(col("doc_id")), Seq("doc_id"), "left_anti")
    h.select(col("doc_id"), col("kind"), col("phash"))
      .join(unclustered.unionByName(survivors), Seq("doc_id"), "left_semi")
      .orderBy(col("doc_id"))
  }

  /** L96/q195: the cross-modal PAIRED-CURATION classification — the
    * caption↔asset consistency view a multimodal release needs before
    * shipping `kept_docs` and `kept_assets` side by side (VERDICT r13
    * "Next round" #4: the two dispositions never joined, so a caption
    * dropped by the text funnel whose image ships — or vice versa —
    * was invisible). ONE definition for the q195 oracle rendering and
    * the ReleaseBuild `paired_curation` artifact: per document, its
    * text funnel disposition (q157's first-failing gate), its asset's
    * keep status under the q130 election, and the 4-way pair status
    * (kept_kept / asset_dropped_text_kept / text_dropped_asset_kept /
    * both_dropped). Variant asset ids (+1e9) never join the doc side —
    * the pair space is the original caption↔asset ids. */
  def pairedCurationOf(textDisp: DataFrame,
      keptAssets: DataFrame): DataFrame =
    textDisp.select(col("doc_id"),
        kindExpr(col("doc_id")).as("kind"),
        col("disposition").as("text_disposition"))
      .join(keptAssets.select(col("doc_id"), lit(true).as("ak")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("kind"), col("text_disposition"),
        when(col("ak").isNotNull, "kept").otherwise("dropped")
          .as("asset_status"),
        when(col("text_disposition") === "kept" && col("ak").isNotNull,
          "kept_kept")
          .when(col("text_disposition") === "kept",
            "asset_dropped_text_kept")
          .when(col("ak").isNotNull, "text_dropped_asset_kept")
          .otherwise("both_dropped").as("pair_status"))
      .orderBy(col("doc_id"))

  /** q195 as an ORACLE query: the q157 disposition over every document
    * joined to the full-universe asset keep-list (the pipeline runs the
    * same [[pairedCurationOf]] over the release funnel's frames —
    * ReleaseBuildSpec pins the reconciliation). */
  def crossModalDisposition(spark: SparkSession, dir: String): DataFrame =
    pairedCurationOf(
      graft.operators.CurationQueries.funnelDisposition(spark, dir),
      keptAssetsOf(spark, assetDocs(spark, dir)))

  /** The asset universe split for the daily flow: batch = assets whose
    * id ≡ 0 (mod 10) — a VARIANT inherits its original's residue
    * ([[VariantIdOffset]] is a multiple of 10), so re-encodes arrive in
    * the same batch as their original, the realistic ingest shape. */
  def mediaSplit(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // split BEFORE decode — the frameFpSplit rationale: the batch side
    // must decode only batch payloads, never the corpus
    val assets = graft.Scale.byKey(assetTable(spark, dir), col("doc_id"))
    (perceptualHashes(assets.filter(col("doc_id") % 10 =!= 0)).toDF(),
      perceptualHashes(assets.filter(col("doc_id") % 10 === 0)).toDF())
  }

  /** q111: the daily-ingest media near-dup flow as an ORACLE query. */
  def incrementalMediaNearDupsDaily(spark: SparkSession,
      dir: String): DataFrame = {
    val (corpus, batch) = mediaSplit(spark, dir)
    incrementalMediaNearDups(phashBands(corpus), batch)
  }
}
