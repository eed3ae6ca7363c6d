package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// ---- compaction (merge today's batch into the NEXT snapshot) ---------
//
// The third leg of the index lifecycle: build (once) → daily reads
// (recurring) → nightly COMPACTION, which merges the day's batch into
// the persisted index so tomorrow's snapshot never re-tokenizes /
// re-hashes / re-decodes the corpus — exactly the O(corpus) cost the
// incremental family exists to avoid, now removed from the snapshot
// roll too. `outDir` must differ from `indexDir` (parquet cannot
// overwrite its own input); a real pipeline writes snapshot N+1's
// directory and flips a pointer.
//
// Every compactable index is a per-document row set or a distinct key
// set — both union pointwise, so compaction provably equals a full
// rebuild over (corpus ∪ batch); IndexStoreSpec pins the equality
// table-for-table. The rebuild-class artifacts (sem_*, ivf_centroids,
// bpe_vocab, dsir_model) are deliberately absent: they freeze a
// quantizer / model per snapshot (the q105/q113/q116 serving trade)
// and refresh by scheduled rebuild, not merge.
//
// Split out of IndexStore (round 14, pure moves) — the object mixes
// this trait back in, so call sites are unchanged; the parquet
// write/read helpers stay on the object, reachable via the self-type.
private[operators] trait IndexStoreCompaction {
  this: IndexStore.type =>

  /** `media` (canonical) compaction: the shift-aware merge — equals a
    * rebuild over (corpus ∪ batch), spec-pinned. */
  def compactMediaNearDup(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit =
    compactMediaNearDupFrom(spark, indexDir,
      graft.multimodal.Multimodal.mediaSplit(spark, dataDir)._2, outDir)

  /** [[compactMediaNearDup]] with the batch HASH frame supplied — the
    * daily orchestration decodes the batch once and threads the
    * checkpointed frame into every consumer instead of re-decoding per
    * compactor (ADVICE r13; the dispositionOf-overload rationale). */
  def compactMediaNearDupFrom(spark: SparkSession, indexDir: String,
      batchHashes: DataFrame, outDir: String): Unit = {
    val (fams, members, bandsC) =
      graft.multimodal.Multimodal.compactMediaNearDupTables(
        read(spark, indexDir, "media_fams"),
        read(spark, indexDir, "media_members"),
        read(spark, indexDir, "media_bands_c"),
        batchHashes)
    write(fams, outDir, "media_fams")
    write(members, outDir, "media_members")
    write(bandsC, outDir, "media_bands_c")
  }

  def compactKnBigrams(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit =
    write(CurationQueries.mergeBigrams(
      read(spark, indexDir, "kn_bigrams"),
      CurationQueries.knBigramTable(docSplit(spark, dataDir)._2)),
      outDir, "kn_bigrams")

  def compactPpsPriorities(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit =
    write(read(spark, indexDir, "pps_prio")
      .unionByName(CurationQueries.ppsPriorityTable(
        docSplit(spark, dataDir)._2))
      .orderBy(col("prio").desc, col("doc_id"))
      .limit(CurationQueries.PpsK + 1),
      outDir, "pps_prio")

  /** `text_near_dup_pairs` compaction: signature tables append (the
    * text_near_dup compactor) and the pair table gains exactly the
    * increment — no corpus pair is ever re-verified. */
  def compactTextPairs(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit = {
    compactTextNearDup(spark, indexDir, dataDir, outDir)
    write(read(spark, indexDir, "text_pairs")
      .unionByName(textPairIncrement(spark, indexDir, dataDir)),
      outDir, "text_pairs")
  }

  /** `text_cc` compaction: touched clusters relabel and gain members
    * through the SAME contracted merge as the daily leg; untouched
    * labels carry through — equals a from-scratch re-cluster over
    * (corpus ∪ batch), spec-pinned. */
  def compactTextCc(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit = {
    val ccC = read(spark, indexDir, "text_cc")
    val updated = CurationQueries.incrementalClusterMembersFromPairs(
      textPairIncrement(spark, indexDir, dataDir), ccC)
      .transform(graft.Materialize.shared) // feeds the anti leg + the union
    write(ccC
      .join(updated.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(updated), outDir, "text_cc")
  }

  /** `media_cc` compaction: touched clusters relabel and gain members
    * through the SAME contracted merge as the daily leg; untouched
    * labels carry through; batch assets in no touched cluster append as
    * their own singletons (the table partitions corpus ∪ batch) —
    * equals a from-scratch re-cluster, spec-pinned. */
  def compactMediaCc(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit = {
    val m = graft.multimodal.Multimodal
    val ccC = read(spark, indexDir, "media_cc")
    val batchScored = m.scoredAssets(spark, dataDir)
      .filter(col("doc_id") % 10 === 0)
      .transform(graft.Materialize.shared) // feeds members + singleton legs
    val updated = m.incrementalMediaClusterMembers(ccC,
        read(spark, indexDir, "media_fams"),
        read(spark, indexDir, "media_bands_c"),
        m.mediaSplit(spark, dataDir)._2, batchScored)
      .transform(graft.Materialize.shared) // feeds the anti legs + the union
    val untouched = ccC
      .join(updated.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val batchSingles = batchScored
      .join(updated.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"),
        col("quality"))
    write(untouched.unionByName(updated).unionByName(batchSingles),
      outDir, "media_cc")
  }

  def compactTextNearDup(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit = {
    val (bands, sets) =
      LLMQueries.signatureTables(docSplit(spark, dataDir)._2)
    write(read(spark, indexDir, "text_bands").unionByName(bands),
      outDir, "text_bands")
    write(read(spark, indexDir, "text_sets").unionByName(sets),
      outDir, "text_sets")
  }

  def compactTextExact(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit =
    write(read(spark, indexDir, "text_hash")
      .unionByName(LLMQueries.hashIndex(docSplit(spark, dataDir)._2))
      .distinct(), outDir, "text_hash")

  def compactSegments(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit =
    write(read(spark, indexDir, "segments")
      .unionByName(
        CurationQueries.segmentIndex(docSplit(spark, dataDir)._2))
      .distinct(), outDir, "segments")

  def compactVecExact(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit =
    compactVecExactFrom(spark, indexDir, vecSplit(spark, dataDir)._2,
      outDir)

  /** [[compactVecExact]] fed an already-materialized batch frame —
    * the `*From` convention (ADVICE r13): [[DailyIngest.runVectorsFrom]]
    * checkpoints the batch once and reuses it for gates AND compaction,
    * so the lake is never re-scanned by the compactors. */
  def compactVecExactFrom(spark: SparkSession, indexDir: String,
      batch: DataFrame, outDir: String): Unit =
    write(read(spark, indexDir, "vec_hash")
      .unionByName(VectorQueries.vectorHashIndex(batch))
      .distinct(), outDir, "vec_hash")

  /** vec_near_dup compaction: the canonical-shift merge
    * ([[VectorQueries.compactVecNearDupTables]]) — equals a rebuild of
    * the trio over (corpus ∪ batch), spec-pinned. */
  def compactVecNearDup(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit =
    compactVecNearDupFrom(spark, indexDir, vecSplit(spark, dataDir)._2,
      outDir)

  def compactVecNearDupFrom(spark: SparkSession, indexDir: String,
      batch: DataFrame, outDir: String): Unit = {
    val (fams, members, bandsC, canonVecs) =
      VectorQueries.compactVecNearDupTables(
        read(spark, indexDir, "vec_fams"),
        read(spark, indexDir, "vec_members"),
        read(spark, indexDir, "vec_bands_c"),
        read(spark, indexDir, "vec_canon"),
        batch)
    write(fams, outDir, "vec_fams")
    write(members, outDir, "vec_members")
    write(bandsC, outDir, "vec_bands_c")
    write(canonVecs, outDir, "vec_canon")
  }

  def compactAudioFps(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit =
    compactAudioFpsFrom(spark, indexDir,
      graft.multimodal.Multimodal.audioFpSplit(spark, dataDir)._2, outDir)

  /** [[compactAudioFps]] with the batch fingerprints supplied — see
    * [[compactMediaNearDupFrom]] (one batch decode per daily run). */
  def compactAudioFpsFrom(spark: SparkSession, indexDir: String,
      batchFps: DataFrame, outDir: String): Unit =
    write(read(spark, indexDir, "audio_fps").unionByName(batchFps),
      outDir, "audio_fps")

  def compactFrameFps(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit =
    compactFrameFpsFrom(spark, indexDir,
      graft.multimodal.Multimodal.frameFpSplit(spark, dataDir)._2, outDir)

  /** [[compactFrameFps]] with the batch frame hashes supplied — see
    * [[compactMediaNearDupFrom]] (one batch decode per daily run). */
  def compactFrameFpsFrom(spark: SparkSession, indexDir: String,
      batchFhs: DataFrame, outDir: String): Unit =
    write(read(spark, indexDir, "frame_fps").unionByName(batchFhs),
      outDir, "frame_fps")

  def compactNormHash(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit =
    write(read(spark, indexDir, "norm_hash")
      .unionByName(
        LLMQueries.normHashIndex(LLMQueries.normSplit(spark, dataDir)._2))
      .distinct(), outDir, "norm_hash")

  def compactSubstrWindows(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit =
    write(read(spark, indexDir, "substr_windows")
      .unionByName(
        CurationQueries.substrWindowIndex(docSplit(spark, dataDir)._2))
      // corpus and batch ids are disjoint, so distinct-doc counts ADD
      .groupBy(col("wh")).agg(sum(col("nd")).as("nd")),
      outDir, "substr_windows")

  def compactBm25(spark: SparkSession, indexDir: String,
      dataDir: String, outDir: String): Unit = {
    val (btf0, bdl0) = LLMQueries.bm25Index(docSplit(spark, dataDir)._2)
    val btf = btf0.transform(graft.Materialize.shared) // union write + df leg
    val bdl = bdl0.transform(graft.Materialize.shared) // union write + stats
    val (bdf, bstats) = LLMQueries.bm25StatsTables(btf, bdl)
    write(read(spark, indexDir, "bm25_tf").unionByName(btf),
      outDir, "bm25_tf")
    write(read(spark, indexDir, "bm25_dl").unionByName(bdl),
      outDir, "bm25_dl")
    // df/stats are additive over disjoint doc sets — the compactor
    // merges the slim tables, never re-counting the postings union
    write(read(spark, indexDir, "bm25_df").unionByName(bdf)
      .groupBy(col("t")).agg(sum(col("df")).as("df")),
      outDir, "bm25_df")
    write(read(spark, indexDir, "bm25_stats").unionByName(bstats)
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_dl")).as("sum_dl")),
      outDir, "bm25_stats")
  }

  /** (family, table names, compact, rebuild-over-union) — the table
    * IndexStoreSpec iterates to pin compaction == full rebuild. The
    * rebuild closure writes the same family FROM the whole (corpus ∪
    * batch) universe, the ground truth compaction must reproduce. */
  val compactions: Seq[(String, Seq[String],
      (SparkSession, String, String, String) => Unit,
      (SparkSession, String, String) => Unit)] = Seq(
    ("text_near_dup", Seq("text_bands", "text_sets"),
      compactTextNearDup _,
      (s, dataDir, dir) => {
        val (c, b) = docSplit(s, dataDir)
        writeTextNearDup(c.unionByName(b), dir)
      }),
    ("text_near_dup_pairs", Seq("text_bands", "text_sets", "text_pairs"),
      compactTextPairs _,
      (s, dataDir, dir) => {
        val (c, b) = docSplit(s, dataDir)
        writeTextPairs(c.unionByName(b), dir)
      }),
    ("text_exact", Seq("text_hash"),
      compactTextExact _,
      (s, dataDir, dir) => {
        val (c, b) = docSplit(s, dataDir)
        writeTextExact(c.unionByName(b), dir)
      }),
    ("segments", Seq("segments"),
      compactSegments _,
      (s, dataDir, dir) => {
        val (c, b) = docSplit(s, dataDir)
        writeSegments(c.unionByName(b), dir)
      }),
    ("vec_exact", Seq("vec_hash"),
      compactVecExact _,
      (s, dataDir, dir) => {
        val (c, b) = vecSplit(s, dataDir)
        writeVecExact(c.unionByName(b), dir)
      }),
    ("vec_near_dup",
      Seq("vec_fams", "vec_members", "vec_bands_c", "vec_canon"),
      compactVecNearDup _,
      (s, dataDir, dir) => {
        val (c, b) = vecSplit(s, dataDir)
        writeVecNearDup(c.unionByName(b), dir)
      }),
    ("text_cc", Seq("text_cc"),
      compactTextCc _,
      (s, dataDir, dir) => {
        val (c, b) = docSplit(s, dataDir)
        write(CurationQueries.connectedComponentsStar(
            LLMQueries.minhashPairsOf(c.unionByName(b))
              .filter(col("jaccard") >= CurationQueries.ClusterThreshold)
              .select(col("doc_a"), col("doc_b")))._1
          .select(col("doc_id"), col("cluster_id")), dir, "text_cc")
      }),
    ("media", Seq("media_fams", "media_members", "media_bands_c"),
      compactMediaNearDup _,
      (s, dataDir, dir) => {
        val m = graft.multimodal.Multimodal
        val (c, b) = m.mediaSplit(s, dataDir)
        val (fams, members, bandsC) =
          m.mediaNearDupIndexTables(c.unionByName(b))
        write(fams, dir, "media_fams")
        write(members, dir, "media_members")
        write(bandsC, dir, "media_bands_c")
      }),
    // the canonical trio's compaction is pinned under "media"; here
    // the compactor carries it into outDir (self-contained family) and
    // the pin covers the label table
    ("media_cc", Seq("media_cc"),
      (s: SparkSession, indexDir: String, dataDir: String,
          outDir: String) => {
        compactMediaNearDup(s, indexDir, dataDir, outDir)
        compactMediaCc(s, indexDir, dataDir, outDir)
      },
      (s, dataDir, dir) => {
        val m = graft.multimodal.Multimodal
        val (c, b) = m.mediaSplit(s, dataDir)
        write(m.mediaCcOf(c.unionByName(b), m.scoredAssets(s, dataDir)),
          dir, "media_cc")
      }),
    ("audio_fps", Seq("audio_fps"),
      compactAudioFps _,
      (s, dataDir, dir) => {
        val (c, b) = graft.multimodal.Multimodal.audioFpSplit(s, dataDir)
        write(c.unionByName(b), dir, "audio_fps")
      }),
    ("frame_fps", Seq("frame_fps"),
      compactFrameFps _,
      (s, dataDir, dir) => {
        val (c, b) = graft.multimodal.Multimodal.frameFpSplit(s, dataDir)
        write(c.unionByName(b), dir, "frame_fps")
      }),
    ("norm_hash", Seq("norm_hash"),
      compactNormHash _,
      (s, dataDir, dir) => {
        val (c, b) = LLMQueries.normSplit(s, dataDir)
        write(LLMQueries.normHashIndex(c.unionByName(b)), dir, "norm_hash")
      }),
    ("bm25", Seq("bm25_tf", "bm25_dl", "bm25_df", "bm25_stats"),
      compactBm25 _,
      (s, dataDir, dir) => {
        val (c, b) = docSplit(s, dataDir)
        val (tf0, dl0) = LLMQueries.bm25Index(c.unionByName(b))
        val tf = tf0.transform(graft.Materialize.shared)
        val dl = dl0.transform(graft.Materialize.shared)
        val (df, stats) = LLMQueries.bm25StatsTables(tf, dl)
        write(tf, dir, "bm25_tf")
        write(dl, dir, "bm25_dl")
        write(df, dir, "bm25_df")
        write(stats, dir, "bm25_stats")
      }),
    ("substr_windows", Seq("substr_windows"),
      compactSubstrWindows _,
      (s, dataDir, dir) => {
        val (c, b) = docSplit(s, dataDir)
        write(CurationQueries.substrWindowIndex(c.unionByName(b)),
          dir, "substr_windows")
      }),
    ("kn_bigram", Seq("kn_bigrams"),
      compactKnBigrams _,
      (s, dataDir, dir) => {
        val (c, b) = docSplit(s, dataDir)
        write(CurationQueries.knBigramTable(c.unionByName(b)),
          dir, "kn_bigrams")
      }),
    ("pps_sample", Seq("pps_prio"),
      compactPpsPriorities _,
      (s, dataDir, dir) => {
        val (c, b) = docSplit(s, dataDir)
        write(CurationQueries.ppsPriorityTable(c.unionByName(b)),
          dir, "pps_prio")
      }))
}
