package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import scala.collection.immutable.ListMap
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is a ListMap so iteration order is stable (insertion order):
  * Verify dumps and Bench timings stay comparable round over round
  * (VERDICT r1 "What's wrong" #2).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The spec's identity dataflow (result-file parse → extract → validate
    * → merge, q10) rather than a plain relational query. */
  def entry(spark: SparkSession): DataFrame =
    SpecPipeline.flagshipResults(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: ListMap[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      SpecPipeline.queries ++
      StateMachine.queries ++
      WindowQueries.queries ++
      AggQueries.queries ++
      SetOpQueries.queries ++
      FunctionQueries.queries ++
      LLMQueries.queries ++
      CurationQueries.queries ++
      VectorQueries.queries ++
      EventQueries.queries ++
      ListMap[String, graft.Q](
        "q72_media_feature_summary" ->
          ((s, dir) => graft.multimodal.Multimodal.featureSummary(s, dir)),
        "q109_media_phash_dups" ->
          ((s, dir) => graft.multimodal.Multimodal.mediaNearDups(s, dir)),
        "q111_incremental_media_phash" ->
          ((s, dir) =>
            graft.multimodal.Multimodal.incrementalMediaNearDupsDaily(s, dir)),
        "q118_frame_near_dups" ->
          ((s, dir) => graft.multimodal.Multimodal.frameNearDups(s, dir)),
        "q126_audio_fp_dups" ->
          ((s, dir) => graft.multimodal.Multimodal.audioNearDups(s, dir)),
        "q128_incremental_audio_fp" ->
          ((s, dir) =>
            graft.multimodal.Multimodal.incrementalAudioNearDupsDaily(s, dir)),
        "q130_media_cluster_survivors" ->
          ((s, dir) =>
            graft.multimodal.Multimodal.mediaClusterSurvivors(s, dir)),
        "q180_incremental_media_clusters" ->
          ((s, dir) =>
            graft.multimodal.Multimodal
              .incrementalMediaClustersDaily(s, dir)),
        "q183_incremental_frame_dups" ->
          ((s, dir) =>
            graft.multimodal.Multimodal
              .incrementalFrameNearDupsDaily(s, dir)),
        "q184_media_band_occupancy" ->
          ((s, dir) =>
            graft.multimodal.Multimodal.mediaBandOccupancy(s, dir)),
        "q187_media_band_cap_curve" ->
          ((s, dir) =>
            graft.multimodal.Multimodal.mediaBandCapCurve(s, dir)),
        "q190_canonical_media_pairs" ->
          ((s, dir) =>
            graft.multimodal.Multimodal.canonicalMediaPairsDaily(s, dir)),
        "q193_asset_ingest_disposition" ->
          ((s, dir) =>
            graft.multimodal.Multimodal.assetIngestDisposition(s, dir)),
        "q195_cross_modal_disposition" ->
          ((s, dir) =>
            graft.multimodal.Multimodal.crossModalDisposition(s, dir)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++
      SpecPipeline.oracle ++
      StateMachine.oracle ++
      WindowQueries.oracle ++
      AggQueries.oracle ++
      SetOpQueries.oracle ++
      FunctionQueries.oracle ++
      LLMQueries.oracle ++
      CurationQueries.oracle ++
      VectorQueries.oracle ++
      EventQueries.oracle ++
      graft.multimodal.Multimodal.oracle
}
