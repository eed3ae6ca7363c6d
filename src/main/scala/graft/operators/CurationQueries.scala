package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import scala.collection.immutable.ListMap

/** Training-data curation operators the reference's corpus would need at
  * 100 TB, beyond the SURVEY.md §2 inventory: benchmark decontamination
  * (n-gram overlap against an eval set), deterministic hash-stratified
  * sampling with a train/val/test split, and sequence packing
  * (concat-then-chunk into fixed token windows).
  *
  * All three are hash/window formulations — no RNG, no driver state — so
  * results are reproducible at any partition count and oracle-checkable
  * in DuckDB with the same md5/window arithmetic.
  */
object CurationQueries extends CurationDecon
    with CurationClusters
    with CurationSampling
    with CurationScoring
    with CurationLm
    with CurationReports {
  /** Chunk capacity for sequence packing, in whitespace tokens. */
  val PackTokens = 256

  /** Width of a packing shard in doc_id space (L10). The window key is
    * (lang, shard) so its cardinality scales with the corpus; small here
    * so sf0.001 already crosses shard boundaries — production would size
    * a shard to one writer task's output. */
  val PackShardDocs = 128L

  /** Width of a source-caps shard in doc_id space (L26/q107). Its own
    * knob — equal to [[PackShardDocs]] today, but deliberately NOT the
    * same val: retuning packing shards for writer-task sizing must not
    * silently change q107's plan shape or the PlanAuditSpec fan-out
    * assumption (ADVICE r8 #4). Correctness is shard-size independent. */
  val SourceCapShardDocs = 128L

  // one-file sf parquet → spread rows before per-row gram/hash CPU
  // (same lesson as LLMQueries.docs)
  private[operators] def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("doc_id"))

  /** Distinct 5-word shingle array per document (docs under 5 words fall
    * back to the whole text) — same gram definition as q70's winnowing
    * fingerprint, via the same lambda-bind idiom (the regex split binds
    * once; see the PERF note on LLMQueries.shingledDocs).
    */
  private[graft] val gramsExpr: Column = expr(
    "array_distinct(transform(array(split(text, '\\\\s+'))," +
      " w -> if(size(w) >= 5," +
      " transform(sequence(0, size(w)-5)," +
      " i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))," +
      " array(text)))[0])")

  /** Max eval-gram rows the decontamination broadcast accepts — the
    * fail-loudly rendering of the "benchmarks are bounded" precondition
    * (VERDICT r9 "What's wrong" #3): the whole q74/q150 scale argument
    * rests on the eval side being benchmark-sized (thousands of docs →
    * ≤ ~10⁷ distinct grams, a few hundred MB broadcast). If a caller
    * ever points the eval side at a corpus-sized frame, the old code
    * would broadcast 10 TB and OOM an executor with an opaque error;
    * the guard turns that into an immediate, named failure instead.
    * 10M grams ≈ 400 MB — the sane ceiling for an executor broadcast. */
  private[operators] val EvalGramBroadcastCap = 10000000L

  /** Batch residue on the train side for the q150 daily flow (coprime
    * with the eval residue so the batch is a proper train slice). */
  private[graft] val DeconBatchMod = 7

  /** Per-language sampling rates as 8-hex-digit md5-prefix thresholds
    * (rate ≈ threshold / 2^32): a doc is kept iff the first 8 hex chars
    * of md5("graft-sample:" <doc_id>) sort below its language's
    * threshold. Fixed-width lowercase hex compares exactly like the
    * 32-bit number it encodes, in Spark and DuckDB alike.
    */
  private[operators] val SampleRates: Seq[(String, String)] = Seq(
    "en" -> "e6666666", // ≈0.90
    "de" -> "80000000", // ≈0.50
    "es" -> "80000000",
    "fr" -> "80000000",
    "zh" -> "40000000") // ≈0.25
  private[operators] val DefaultRate = "80000000"

  /** Docs kept per language by the q145 eval sampler. */
  val EvalSampleK = 20

  /** q145's own shard-width knob (the q107/SourceCapShardDocs rule:
    * every two-level rank owns its width). */
  val EvalSampleShardDocs = 128L

  /** PII patterns: simple-ASCII email and NNN-NNN-NNNN phone. Kept to
    * syntax Java regex and RE2 (DuckDB) interpret identically — char
    * classes and bounded repetition only, no backrefs or lookaround. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Weight-table salts: each model FAMILY is the same hashed linear
    * scorer under a different salt — in production, a different trained
    * weight table shipped per model (quality, toxicity, ...); here the
    * salt is what makes the two models' weights independent. */
  private[graft] val QualitySalt = "graft-w:"
  private[graft] val ToxSalt = "graft-tox:"

  /** q84's operating point: the corpus MEDIAN of the hashed weight
    * table's mean_weight (≈ −0.15 at every test SF). A raw weight
    * table has no reason to center on zero — the round-9 constant
    * `>= 0` silently kept only ~2% of docs, which degenerated every
    * downstream funnel/ingest demo to a near-empty kept set. A trained
    * classifier's threshold is likewise CALIBRATED on held-out data,
    * never assumed; "keep the top half" is the documented contract. */
  val QualityThreshold = -0.15

  /** Toxicity decision threshold on the mean hashed weight: unlike
    * quality (which drops the BOTTOM half at its calibrated median),
    * a safety filter flags the HIGH tail — 0.28 sits between the
    * corpus p85 and p95 under the [[ToxSalt]] weights at both test
    * SFs, the ~10% drop rate a production toxicity stage runs at. */
  val ToxicityThreshold = 0.28

  /** q174's threshold grid in micro units: −0.40 … 0.50 step 0.05 —
    * spans both shipped operating points with margin on each side. */
  private[operators] val SweepThresholds: Seq[Long] =
    (-8 to 10).map(_ * 50000L)

  /** Per-source calibration percentile for q122: the bottom
    * [[CalibPct]] of each source's docs fall below its cutoff. */
  val CalibPct = 0.30

  /** Jaccard threshold above which a near-dup pair becomes a cluster
    * edge. */
  val ClusterThreshold = 0.5

  /** Words per segment for sub-document (line-level) dedup. */
  val SegWords = 10

  /** Sub-document segment dedup (the C4/RefinedWeb line-dedup mechanism,
    * adapted to the corpus's flat word streams): each document is cut
    * into consecutive [[SegWords]]-word segments; a segment occurrence
    * survives iff it is the corpus-wide FIRST occurrence of that exact
    * segment (min (doc_id, pos)); every later copy — boilerplate headers,
    * near-dup overlap, within-doc repetition — is stripped, and the
    * document is re-assembled from its surviving segments in order.
    *
    * Scale shape: the keeper per segment comes from a partial-aggregating
    * `groupBy(seg).agg(min(struct(doc_id, pos)))` — NOT a window over
    * seg: a window would funnel every occurrence of a hot boilerplate
    * segment through ONE reducer, where the aggregate map-side-combines
    * it. The join back on seg is AQE-skew-splittable, and reassembly is
    * one doc_id-keyed aggregation. Documents whose every segment is a
    * repeat survive with empty cleaned text (conditional aggregation, not
    * a post-filter join).
    */
  private[operators] val segArrExpr = expr(
    "transform(array(split(text, '\\\\s+'))," +
      s" w -> transform(sequence(0, cast(ceil(size(w) / ${SegWords}.0d)" +
      s" as int) - 1), i -> concat_ws(' ', slice(w, i * $SegWords + 1," +
      s" $SegWords))))[0]")

  /** A segment is boilerplate within its source iff it occurs in at
    * least this many distinct documents of that source (L32/q120). */
  val BoilerplateMinDocs = 2

  /** Window width (words) for cross-document substring duplication. */
  val DupWinWords = 8

  /** Array of [[DupWinWords]]-word windows of `text` (empty when the
    * doc is shorter) — ONE definition for q114/q119/q156/q158 and the
    * streaming novelty twin, so batch and stream can never window
    * differently. */
  private[graft] val winsExpr: org.apache.spark.sql.Column = expr(
    "transform(array(split(text, '\\\\s+'))," +
      s" w -> if(size(w) >= $DupWinWords," +
      s" transform(sequence(0, size(w) - $DupWinWords)," +
      s" i -> concat_ws(' ', slice(w, i + 1, $DupWinWords)))," +
      " cast(array() as array<string>)))[0]")

  /** Source mixture weights, derived from the source id so the query is
    * self-contained: src<n> gets weight 0.5 + (n mod 3) — i.e. 0.5
    * (downsample), 1.5, or 2.5 (upsample). The fractional part is always
    * .5, whose 32-bit hex threshold is exact in both engines. */
  private[operators] val MixSalt = "graft-mix:"

  /** Token budget the q141 recipe allocates across sources — a constant
    * so the oracle can repeat the arithmetic. */
  val RecipeTokenBudget = 1000000L

  /** Max documents kept per source (L26) — the over-representation guard
    * every curated corpus applies to its dominant domains. */
  val SourceCap = 25

  /** Fluency threshold in NLL micro-nats: docs whose average bigram
    * negative-log-likelihood exceeds this are flagged disfluent. */
  val FluencyNllMicro = 3600000L

  /** Top-bigram report size for [[knBigramLm]]. */
  private[operators] val KnTopBigrams = 30

  /** Absolute discount D — Kneser–Ney's standard 0.75. */
  private[operators] val KnDiscount = 0.75

  /** The interpolated-KN estimate in integer micro-units over columns
    * (cb, cu, n1f, n1b, bt) — identical text (modulo double-literal
    * suffix) to the oracle's, so both engines evaluate the same double
    * expression:  max(c−D,0)/c(w1) + D·N1+(w1,·)/c(w1) · N1+(·,w2)/B. */
  private[operators] val KnScoreSql: String =
    // `d` suffixes: an unsuffixed 0.75 parses as DECIMAL in Spark SQL
    // and the all-integer second term would then round in decimal
    // arithmetic mid-chain; DuckDB promotes every division to DOUBLE
    s"cast(round((greatest(cb - ${KnDiscount}d, 0.0d) / cu" +
      s" + ${KnDiscount}d * n1f / cu * n1b / bt) * 1e6) as bigint)"

  /** Fluency cut for [[knFluency]] — same scale as [[FluencyNllMicro]]
    * (micro-nats per bigram) but KN's discounting sits lower than
    * add-one on in-domain text, so the gate tightens accordingly. */
  val KnFluencyNllMicro = 3200000L

  /** Hashed-feature bucket count for DSIR importance weights (2¹² —
    * three md5 hex digits, the q84 idiom). */
  val DsirBuckets = 4096

  private[operators] val DsirSalt = "graft-dsir:"

  /** Training shards in the epoch manifest (L39/q131): 8, so a shard is
    * two leading hex digits' worth of key space (16 / 8). Production
    * sets this to its writer parallelism; correctness is shard-count
    * independent (the oracle recomputes the same ranges). */
  val EpochShards = 8L

  /** Hex digits of the shuffle key naming a position BLOCK — blocks
    * subdivide a shard's hash range so local ranks are computable per
    * block and the rank window's key cardinality is 16^w, never
    * |shards|. Production sizes w so one block ≈ one task's rows
    * (w = 6 → 16.7M blocks); 2 keeps blocks multi-document at sf0.001
    * so the offset arithmetic is genuinely exercised. */
  val EpochBlockHexDigits = 2

  /** Quality-block width in micro-units for q146's distributed prefix
    * sum — parallelism is |sources| × (1e6 / width) local windows, a
    * KNOB-bounded fan-out (the standard range-partitioned prefix-sum
    * trade): narrower blocks buy more reducers at the cost of a larger
    * (still bounded) offset table. */
  val BudgetQualityBlockMicros = 10000L

  /** Sample size for q161's priority sample — small enough that the
    * smallest sf (500 docs) keeps a meaningful threshold item;
    * production sizes K by the target standard error (the estimator's
    * relative stdev is ≈ 1/sqrt(K−1)). */
  private[operators] val PpsK = 40

  /** hex→int of the first 8 md5 hex digits of a column named `h` —
    * instr-on-hex-digit is the portable idiom (the q84 rule: Spark
    * `conv()` has no DuckDB twin); the SAME fragment text parses in
    * both engines, so the two sides cannot drift. */
  private[operators] val ppsHex32 = (1 to 8)
    .map(i => s"(instr('0123456789abcdef', substring(h, $i, 1)) - 1)")
    .zipWithIndex
    .map { case (d, i) => // the fold must run in 64-bit: 8 digits > 2^31
      if (i == 0) s"cast($d as bigint)" else d }
    .reduceLeft((a, b) => s"($a * 16 + $b)")

  /** Survivors kept per near-dup cluster by q148. */
  val ClusterCap = 3

  /** q148's own shard-width knob (the q107 rule: every two-level rank
    * owns its width). */
  val ClusterCapShardDocs = 128L

  val queries: ListMap[String, graft.Q] = ListMap(
    "q74_decontaminate" -> (decontaminate _),
    "q75_hash_split" -> (hashSplit _),
    "q76_pack_sequences" -> (packSequences _),
    "q77_dedup_clusters" -> (dedupClusters _),
    "q78_repetition_stats" -> (repetitionStats _),
    "q79_pii_scrub" -> (piiScrub _),
    "q84_quality_classifier" -> (qualityClassifier _),
    "q85_dedup_clusters_star" -> (dedupClustersStar _),
    "q88_cluster_survivors" -> (clusterSurvivors _),
    "q89_segment_dedup" -> (segmentDedup _),
    "q114_substring_dup_stats" -> (substringDupStats _),
    "q98_incremental_segment_dedup" -> (incrementalSegmentDedupDaily _),
    "q90_source_mixture" -> (sourceMixture _),
    "q107_source_caps" -> (sourceCaps _),
    "q92_lm_fluency" -> (lmFluency _),
    "q165_kn_bigram" -> (knBigramLm _),
    "q167_incremental_kn" -> (incrementalKnDaily _),
    "q169_kn_fluency" -> (knFluency _),
    "q115_curation_funnel" -> (curationFunnel _),
    "q116_dsir_importance" -> (dsirImportance _),
    "q119_substring_dup_remove" -> (substringDupRemove _),
    "q120_boilerplate_remove" -> (boilerplateRemove _),
    "q122_quality_calibration" -> (qualityCalibration _),
    "q171_toxicity_classifier" -> (toxicityClassifier _),
    "q174_threshold_sweep" -> (thresholdSweep _),
    "q175_incremental_dedup_clusters" -> (incrementalDedupClustersDaily _),
    "q176_decon_rung_report" -> (deconRungReport _),
    "q129_cluster_split" -> (clusterSplit _),
    "q131_shard_manifest" -> (shardManifest _),
    "q132_snapshot_diff" -> (snapshotDiff _),
    "q133_nll_buckets" -> (nllBuckets _),
    "q137_contamination_report" -> (contaminationReport _),
    "q138_source_report" -> (sourceReport _),
    "q141_mixture_recipe" -> (mixtureRecipe _),
    "q142_snapshot_drift" -> (snapshotDrift _),
    "q143_dup_size_histogram" -> (dupSizeHistogram _),
    "q168_soft_dedup_weights" -> (softDedupWeights _),
    "q145_eval_sample" -> (evalSample _),
    "q146_budget_select" -> (budgetSelect _),
    "q161_pps_sample" -> (ppsSample _),
    "q147_source_overlap" -> (sourceOverlap _),
    "q148_cluster_caps" -> (clusterCaps _),
    "q150_incremental_decontaminate" -> (incrementalDecontaminateDaily _),
    "q172_fuzzy_decontaminate" -> (fuzzyDecontaminate _),
    "q173_incremental_fuzzy_decontaminate" ->
      (incrementalFuzzyDecontaminateDaily _),
    "q151_release_funnel" -> (releaseFunnel _),
    "q153_packing_efficiency" -> (packingEfficiency _),
    "q154_snapshot_dedup_trend" -> (snapshotDedupTrend _),
    "q155_eval_sample_churn" -> (evalSampleChurn _),
    "q156_incremental_substring_report" ->
      (incrementalSubstringReportDaily _),
    "q157_funnel_disposition" -> (funnelDisposition _),
    "q158_novelty_report" -> (noveltyReportDaily _),
    "q159_daily_ingest_disposition" ->
      ((s: SparkSession, d: String) => DailyIngest.ingestDisposition(s, d)))

  // ---- oracle SQL -----------------------------------------------------

  /** Shared CTE prefix for q77/q85/q88: the recursive-CTE transitive
    * closure over the q64 pair graph, ending in `comp(doc_id,
    * cluster_id)`. */
  private[operators] val clustersCtes: String =
    s"WITH RECURSIVE ${LLMQueries.minhashPairsCtes}," +
      s"""pairs AS (
         |  SELECT doc_a, doc_b FROM pairs_all
         |  WHERE jaccard >= $ClusterThreshold),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |comp AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src)""".stripMargin

  /** Shared by q77 and q85: both cluster formations must agree with the
    * same recursive-CTE transitive closure over the q64 pair graph. */
  private[operators] val clustersOracle: String =
    s"""$clustersCtes
       |SELECT doc_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM comp ORDER BY doc_id""".stripMargin

  /** q129 oracle: the q77/q85 recursive closure for the cluster map,
    * singletons defaulting to their own id, q75's threshold rule keyed
    * by the cluster id. */
  private[operators] val clusterSplitOracle: String =
    s"""$clustersCtes,
       |wc AS (
       |  SELECT d.doc_id, coalesce(comp.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id)
       |SELECT doc_id, cluster_id,
       |  CASE WHEN substr(md5('graft-csplit:' || cluster_id), 1, 8)
       |         < 'cccccccc' THEN 'train'
       |       WHEN substr(md5('graft-csplit:' || cluster_id), 1, 8)
       |         < 'e6666666' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM wc ORDER BY doc_id""".stripMargin

  private[operators] val gramsCte =
    """garr AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 5
      |    THEN list_transform(range(1, len(w)-3),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
      |           w[i+3] || ' ' || w[i+4])
      |    ELSE [text] END) AS gs
      |  FROM (SELECT doc_id, text, string_split_regex(text, '\s+') AS w
      |        FROM documents)),
      |grams AS (SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS g
      |          FROM garr)
      |""".stripMargin

  /** Shared by q165 (full pass) and q167 (incremental merge): bigram
    * counts are additive over disjoint doc sets, so both must produce
    * exactly this answer. Formula text matches [[KnScoreSql]]. */
  private[operators] val knOracle: String =
    s"""WITH wordsarr AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS w
       |  FROM documents),
       |bi AS (
       |  SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS cb
       |  FROM wordsarr, LATERAL unnest(range(1, len(w))) AS t(i)
       |  GROUP BY 1, 2),
       |ctx AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu, count(*) AS n1f
       |        FROM bi GROUP BY w1),
       |fanin AS (SELECT w2, count(*) AS n1b FROM bi GROUP BY w2),
       |types AS (SELECT count(*) AS bt FROM bi)
       |SELECT w1, w2, cb, cu, n1f, n1b,
       |  CAST(round((greatest(cb - $KnDiscount, 0.0) / cu
       |    + $KnDiscount * n1f / cu * n1b / bt) * 1e6) AS BIGINT)
       |    AS pkn_micro
       |FROM bi JOIN ctx USING (w1) JOIN fanin USING (w2) CROSS JOIN types
       |ORDER BY cb DESC, w1, w2 LIMIT $KnTopBigrams""".stripMargin

  private[operators] val oracleMain: Map[String, String] = Map(
    "q114_substring_dup_stats" ->
      s"""WITH wins AS (
         |  SELECT doc_id, unnest(CASE WHEN len(wa) >= $DupWinWords
         |    THEN list_transform(range(0, len(wa) - $DupWinWords + 1),
         |      i -> array_to_string(
         |        list_slice(wa, i + 1, i + $DupWinWords), ' '))
         |    ELSE []::VARCHAR[] END) AS w
         |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS wa
         |        FROM documents)),
         |dup AS (
         |  SELECT w FROM (
         |    SELECT w, count(DISTINCT doc_id) AS nd FROM wins GROUP BY w)
         |  WHERE nd >= 2),
         |per AS (
         |  SELECT wins.doc_id, count(*) AS n_win,
         |    sum(CASE WHEN d.w IS NULL THEN 0 ELSE 1 END) AS n_dup
         |  FROM wins LEFT JOIN dup d ON wins.w = d.w
         |  GROUP BY wins.doc_id)
         |SELECT doc_id, CAST(coalesce(n_win, 0) AS BIGINT) AS n_win,
         |  CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup,
         |  CAST(CASE WHEN coalesce(n_win, 0) = 0 THEN 0
         |    ELSE coalesce(n_dup, 0) * 1000000 // n_win END AS BIGINT)
         |    AS dup_micro
         |FROM documents LEFT JOIN per USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q74_decontaminate" -> (s"WITH $gramsCte," +
      """ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0)
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        |  count(*) AS n_contaminated,
        |  round(CAST(count(*) AS DOUBLE) / n_grams, 6)
        |    AS contamination_ratio
        |FROM grams JOIN ev USING (g)
        |WHERE doc_id % 10 <> 0
        |GROUP BY doc_id, n_grams
        |ORDER BY doc_id""".stripMargin),
    // q150: q74's oracle restricted to today's train batch — the
    // per-doc check is independent, so restriction == the daily flow
    "q150_incremental_decontaminate" -> (s"WITH $gramsCte," +
      s"""ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0)
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         |  count(*) AS n_contaminated,
         |  round(CAST(count(*) AS DOUBLE) / n_grams, 6)
         |    AS contamination_ratio
         |FROM grams JOIN ev USING (g)
         |WHERE doc_id % 10 <> 0 AND doc_id % $DeconBatchMod = 0
         |GROUP BY doc_id, n_grams
         |ORDER BY doc_id""".stripMargin),
    // q172: the near-dup verdict across the train/eval boundary — the
    // shared pairs_all CTEs over ALL docs, cross pairs verified at the
    // same ClusterThreshold, rolled up per train endpoint
    "q172_fuzzy_decontaminate" ->
      (s"WITH ${LLMQueries.minhashPairsCtesOf("")}," +
      s"""cross_pairs AS (
         |  SELECT CASE WHEN doc_a % 10 <> 0 THEN doc_a ELSE doc_b END
         |      AS tid,
         |    CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END
         |      AS eval_id,
         |    jaccard
         |  FROM pairs_all
         |  WHERE ((doc_a % 10 = 0) <> (doc_b % 10 = 0))
         |    AND jaccard >= $ClusterThreshold)
         |SELECT tid AS doc_id,
         |  CAST(count(*) AS BIGINT) AS n_eval_matches,
         |  CAST(min(eval_id) AS BIGINT) AS top_eval_id,
         |  max(jaccard) AS max_jaccard
         |FROM cross_pairs GROUP BY tid ORDER BY doc_id""".stripMargin),
    // q173: the q172 rule on the (eval ∪ batch) universe — per-pair
    // functions make the restriction equal the full pass on the batch
    "q173_incremental_fuzzy_decontaminate" ->
      (s"WITH ${LLMQueries.minhashPairsCtesOf(
          s"WHERE doc_id % 10 = 0 OR doc_id % $DeconBatchMod = 0")}," +
      s"""cross_pairs AS (
         |  SELECT CASE WHEN doc_a % 10 <> 0 THEN doc_a ELSE doc_b END
         |      AS tid,
         |    CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END
         |      AS eval_id,
         |    jaccard
         |  FROM pairs_all
         |  WHERE ((doc_a % 10 = 0) <> (doc_b % 10 = 0))
         |    AND jaccard >= $ClusterThreshold)
         |SELECT tid AS doc_id,
         |  CAST(count(*) AS BIGINT) AS n_eval_matches,
         |  CAST(min(eval_id) AS BIGINT) AS top_eval_id,
         |  max(jaccard) AS max_jaccard
         |FROM cross_pairs GROUP BY tid ORDER BY doc_id""".stripMargin),
    // q153: q76's exact shard/chunk constants — the report covers the
    // REAL packing layout; ceil in exact integers ((n + k-1) // k)
    "q153_packing_efficiency" ->
      s"""WITH pershard AS (
         |  SELECT lang, doc_id // $PackShardDocs AS shard,
         |    CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT)
         |      AS stok
         |  FROM documents GROUP BY lang, shard),
         |ch AS (SELECT lang, stok,
         |         (stok + ${PackTokens - 1}) // $PackTokens AS chunks
         |       FROM pershard)
         |SELECT lang, count(*) AS n_shards,
         |  CAST(sum(stok) AS BIGINT) AS n_tokens,
         |  CAST(sum(chunks) AS BIGINT) AS n_chunks,
         |  CAST(sum(chunks) * $PackTokens - sum(stok) AS BIGINT)
         |    AS pad_tokens,
         |  CAST(sum(stok) * 1000000 // (sum(chunks) * $PackTokens)
         |    AS BIGINT) AS fill_micro
         |FROM ch GROUP BY lang ORDER BY lang""".stripMargin,
    // q151 NESTS the q60 keep-min and q74 flag fragments (the q115
    // composition rule): funnel and stages cannot drift apart
    "q151_release_funnel" -> (s"WITH $gramsCte," +
      """tr AS (
        |  SELECT doc_id, source, sha256(text) AS hh,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents WHERE doc_id % 10 <> 0),
        |keep AS (SELECT min(doc_id) AS doc_id FROM tr GROUP BY hh),
        |evg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0),
        |flagged AS (
        |  SELECT DISTINCT grams.doc_id FROM grams JOIN evg USING (g)
        |  WHERE grams.doc_id % 10 <> 0),
        |stages AS (
        |  SELECT source, n_tokens, 0 AS st FROM tr
        |  UNION ALL
        |  SELECT source, n_tokens, 1 FROM tr
        |  WHERE doc_id IN (SELECT doc_id FROM keep)
        |  UNION ALL
        |  SELECT source, n_tokens, 2 FROM tr
        |  WHERE doc_id IN (SELECT doc_id FROM keep)
        |    AND doc_id NOT IN (SELECT doc_id FROM flagged))
        |SELECT source,
        |  count(*) FILTER (st = 0) AS n_docs,
        |  count(*) FILTER (st = 1) AS n_after_dedup,
        |  count(*) FILTER (st = 2) AS n_final,
        |  CAST(coalesce(sum(n_tokens) FILTER (st = 2), 0) AS BIGINT)
        |    AS tokens_final
        |FROM stages GROUP BY source ORDER BY source""".stripMargin),
    "q137_contamination_report" -> (s"WITH $gramsCte," +
      """ev AS (SELECT doc_id AS eval_id, n_grams AS n_eval_grams, g
        |       FROM grams WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id, g FROM grams WHERE doc_id % 10 <> 0),
        |hits AS (
        |  SELECT eval_id,
        |    CAST(count(DISTINCT tr.doc_id) AS BIGINT) AS n_train_docs,
        |    CAST(count(DISTINCT ev.g) AS BIGINT) AS n_hit_grams
        |  FROM ev JOIN tr USING (g) GROUP BY eval_id),
        |evdocs AS (
        |  SELECT doc_id AS eval_id, CAST(len(gs) AS BIGINT)
        |    AS n_eval_grams
        |  FROM garr WHERE doc_id % 10 = 0)
        |SELECT eval_id, n_eval_grams,
        |  coalesce(n_train_docs, 0) AS n_train_docs,
        |  coalesce(n_hit_grams, 0) AS n_hit_grams,
        |  round(CAST(coalesce(n_hit_grams, 0) AS DOUBLE) / n_eval_grams,
        |    6) AS hit_ratio
        |FROM evdocs LEFT JOIN hits USING (eval_id)
        |ORDER BY eval_id""".stripMargin),
    "q75_hash_split" -> {
      val rateCase = SampleRates.map { case (lang, hex) =>
        s"WHEN lang = '$lang' THEN '$hex'"
      }.mkString("CASE ", " ", s" ELSE '$DefaultRate' END")
      s"""WITH kept AS (
         |  SELECT lang,
         |    CASE WHEN substr(md5('graft-split:' || CAST(doc_id AS VARCHAR)), 1, 8)
         |           < 'cccccccc' THEN 'train'
         |         WHEN substr(md5('graft-split:' || CAST(doc_id AS VARCHAR)), 1, 8)
         |           < 'e6666666' THEN 'val'
         |         ELSE 'test' END AS split,
         |    len(string_split_regex(text, '\\s+')) AS n_tokens
         |  FROM documents
         |  WHERE substr(md5('graft-sample:' || CAST(doc_id AS VARCHAR)), 1, 8)
         |        < $rateCase)
         |SELECT lang, split, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM kept GROUP BY lang, split ORDER BY lang, split""".stripMargin
    },
    "q89_segment_dedup" ->
      s"""WITH segarr AS (
         |  SELECT doc_id, list_transform(
         |    range(0, CAST(ceil(len(w) / ${SegWords}.0) AS INT)),
         |    i -> {'pos': i, 'seg': array_to_string(
         |      list_slice(w, i*$SegWords + 1, i*$SegWords + $SegWords), ' ')}) AS sl
         |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS w
         |        FROM documents)),
         |segs AS (SELECT doc_id, len(sl) AS n_segs,
         |         unnest(sl, recursive := true) FROM segarr),
         |ranked AS (
         |  SELECT doc_id, n_segs, pos, seg,
         |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
         |  FROM segs)
         |SELECT doc_id, CAST(any_value(n_segs) AS BIGINT) AS n_segs,
         |  CAST(count(*) FILTER (rn = 1) AS BIGINT) AS n_kept,
         |  coalesce(string_agg(seg, ' ' ORDER BY pos) FILTER (rn = 1), '')
         |    AS cleaned_text
         |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // incremental semantics direct: batch-first occurrence AND segment
    // unseen in the corpus index (left join, null = unseen)
    "q98_incremental_segment_dedup" ->
      s"""WITH segarr AS (
         |  SELECT doc_id, list_transform(
         |    range(0, CAST(ceil(len(w) / ${SegWords}.0) AS INT)),
         |    i -> {'pos': i, 'seg': array_to_string(
         |      list_slice(w, i*$SegWords + 1, i*$SegWords + $SegWords), ' ')}) AS sl
         |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS w
         |        FROM documents)),
         |segs AS (SELECT doc_id, len(sl) AS n_segs,
         |         unnest(sl, recursive := true) FROM segarr),
         |corpus AS (SELECT DISTINCT seg FROM segs WHERE doc_id % 10 <> 0),
         |ranked AS (
         |  SELECT doc_id, n_segs, pos, seg,
         |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
         |  FROM segs WHERE doc_id % 10 = 0),
         |marked AS (
         |  SELECT r.doc_id, r.n_segs, r.pos, r.seg,
         |    (r.rn = 1 AND c.seg IS NULL) AS kept
         |  FROM ranked r LEFT JOIN corpus c ON r.seg = c.seg)
         |SELECT doc_id, CAST(any_value(n_segs) AS BIGINT) AS n_segs,
         |  CAST(count(*) FILTER (kept) AS BIGINT) AS n_kept,
         |  coalesce(string_agg(seg, ' ' ORDER BY pos) FILTER (kept), '')
         |    AS cleaned_text
         |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q107: the oracle IS the direct one-window rank — the engine's
    // two-level (source, shard) formulation must be indistinguishable.
    "q107_source_caps" ->
      s"""WITH q AS (
         |  SELECT doc_id, source,
         |    round(least(1.0, CAST(len(w) AS DOUBLE) / 120.0) *
         |          (CAST(len(list_distinct(w)) AS DOUBLE) / len(w)), 6)
         |      AS quality
         |  FROM (SELECT doc_id, source,
         |          string_split_regex(text, '\\s+') AS w FROM documents))
         |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, quality FROM (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY quality DESC, doc_id) AS rk
         |  FROM q)
         |WHERE rk <= $SourceCap ORDER BY source, rk""".stripMargin,
    "q90_source_mixture" ->
      s"""WITH rep AS (
         |  SELECT doc_id, source,
         |    CAST(floor(0.5 + ((CASE WHEN regexp_extract(source, '(\\d+)', 1) = ''
         |        THEN 0 ELSE CAST(regexp_extract(source, '(\\d+)', 1) AS INT)
         |        END) % 3))
         |      AS INT) +
         |    CASE WHEN substr(md5('$MixSalt' || CAST(doc_id AS VARCHAR)), 1, 8)
         |           < '80000000' THEN 1 ELSE 0 END AS n_rep
         |  FROM documents)
         |SELECT doc_id, source, CAST(unnest(range(1, n_rep + 1)) AS BIGINT)
         |  AS copy_id
         |FROM rep ORDER BY doc_id, copy_id""".stripMargin,
    "q165_kn_bigram" -> knOracle,
    // q167: the (corpus ∪ batch) bigram-count merge covers the whole
    // documents table and counts are additive, so the incremental
    // answer IS the full q165 answer — one shared oracle, zero drift
    "q167_incremental_kn" -> knOracle,
    // q169: the q92 oracle shape with the KN model CTEs; the prob
    // formula text is knProbSql modulo the double-literal suffix
    "q169_kn_fluency" ->
      s"""WITH wordsarr AS (
         |  SELECT doc_id, string_split_regex(text, '\\s+') AS w
         |  FROM documents),
         |refbi AS (
         |  SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS cb
         |  FROM wordsarr, LATERAL unnest(range(1, len(w))) AS t(i)
         |  WHERE doc_id % 10 = 0 GROUP BY 1, 2),
         |ctx AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu, count(*) AS n1f
         |        FROM refbi GROUP BY w1),
         |fanin AS (SELECT w2, count(*) AS n1b FROM refbi GROUP BY w2),
         |scalars AS (
         |  SELECT (SELECT count(*) FROM refbi) AS bt,
         |         (SELECT count(*) FROM (
         |            SELECT DISTINCT unnest(w) FROM wordsarr
         |            WHERE doc_id % 10 = 0)) AS v),
         |docbi AS (
         |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
         |  FROM wordsarr, LATERAL unnest(range(1, len(w))) AS t(i)
         |  WHERE doc_id % 10 <> 0),
         |scored AS (
         |  SELECT doc_id,
         |    CAST(round(-ln(${knProbSql("")}) * 1e6) AS BIGINT) AS nll
         |  FROM docbi
         |  LEFT JOIN refbi USING (w1, w2)
         |  LEFT JOIN ctx USING (w1)
         |  LEFT JOIN fanin USING (w2)
         |  CROSS JOIN scalars)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  CAST(sum(nll) // count(*) AS BIGINT) AS avg_nll_micro,
         |  (CAST(sum(nll) // count(*) AS BIGINT)) <= $KnFluencyNllMicro
         |    AS is_fluent
         |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q92_lm_fluency" ->
      s"""WITH wordsarr AS (
         |  SELECT doc_id, string_split_regex(text, '\\s+') AS w
         |  FROM documents),
         |refbi AS (
         |  SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS cb
         |  FROM wordsarr, LATERAL unnest(range(1, len(w))) AS t(i)
         |  WHERE doc_id % 10 = 0 GROUP BY 1, 2),
         |refuni AS (
         |  SELECT w1, CAST(sum(cb) AS BIGINT) AS cu FROM refbi GROUP BY w1),
         |vocab AS (
         |  SELECT count(*) AS v FROM (
         |    SELECT DISTINCT unnest(w) FROM wordsarr WHERE doc_id % 10 = 0)),
         |docbi AS (
         |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
         |  FROM wordsarr, LATERAL unnest(range(1, len(w))) AS t(i)
         |  WHERE doc_id % 10 <> 0),
         |scored AS (
         |  SELECT doc_id,
         |    CAST(round(-ln(CAST(coalesce(cb, 0) + 1 AS DOUBLE) /
         |                   (coalesce(cu, 0) + v)) * 1e6) AS BIGINT) AS nll
         |  FROM docbi
         |  LEFT JOIN refbi USING (w1, w2)
         |  LEFT JOIN refuni USING (w1)
         |  CROSS JOIN vocab)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(nll) // count(*) AS BIGINT) AS avg_nll_micro,
         |  (CAST(sum(nll) // count(*) AS BIGINT)) <= $FluencyNllMicro
         |    AS is_fluent
         |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q77_dedup_clusters" -> clustersOracle,
    "q85_dedup_clusters_star" -> clustersOracle,
    // q175: the SAME recursive closure restricted to clusters holding a
    // batch member — the incremental merge must reproduce it exactly
    "q175_incremental_dedup_clusters" ->
      s"""$clustersCtes,
         |csize AS (SELECT cluster_id, count(*) AS cluster_size
         |          FROM comp GROUP BY cluster_id),
         |touched AS (SELECT DISTINCT cluster_id FROM comp
         |            WHERE doc_id % 10 = 0)
         |SELECT comp.doc_id, comp.cluster_id,
         |  CAST(cluster_size AS BIGINT) AS cluster_size
         |FROM comp JOIN csize USING (cluster_id)
         |JOIN touched USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,
    // q143 NESTS the cluster closure (singletons default to their own
    // id, the q129 rule) so the histogram partitions the whole corpus
    "q143_dup_size_histogram" ->
      s"""$clustersCtes,
         |allc AS (
         |  SELECT d.doc_id, coalesce(comp.cluster_id, d.doc_id)
         |    AS cluster_id
         |  FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id),
         |famsz AS (
         |  SELECT cluster_id, count(*) AS fam_size
         |  FROM allc GROUP BY cluster_id)
         |SELECT fam_size, count(*) AS n_families,
         |  CAST(fam_size * count(*) AS BIGINT) AS n_docs
         |FROM famsz GROUP BY fam_size ORDER BY fam_size""".stripMargin,
    // q168 nests the same whole-corpus family partition as q143 and
    // projects per doc instead of histogramming
    "q168_soft_dedup_weights" ->
      s"""$clustersCtes,
         |allc AS (
         |  SELECT d.doc_id, coalesce(comp.cluster_id, d.doc_id) AS fam
         |  FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id),
         |famsz AS (
         |  SELECT fam, count(*) AS n_members FROM allc GROUP BY fam)
         |SELECT doc_id, fam, n_members,
         |  1000000 // n_members AS weight_micro
         |FROM allc JOIN famsz USING (fam)
         |ORDER BY doc_id""".stripMargin,
    "q88_cluster_survivors" ->
      s"""$clustersCtes,
         |labels AS (
         |  SELECT doc_id, cluster_id,
         |    count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |  FROM comp),
         |quality AS (
         |  SELECT doc_id,
         |    round(least(1.0, CAST(len(w) AS DOUBLE) / 120.0) *
         |          (CAST(len(list_distinct(w)) AS DOUBLE) / len(w)), 6)
         |      AS quality
         |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS w
         |        FROM documents)),
         |ranked AS (
         |  SELECT cluster_id, doc_id, quality, cluster_size,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY quality DESC, doc_id) AS rn
         |  FROM labels JOIN quality USING (doc_id))
         |SELECT cluster_id, doc_id AS kept_id, quality, cluster_size
         |FROM ranked WHERE rn = 1 ORDER BY kept_id""".stripMargin,
    "q78_repetition_stats" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS w
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    len(w) AS n_words,
        |    len(list_distinct(w)) AS n_distinct,
        |    list_max(list_transform(list_distinct(w),
        |      d -> len(list_filter(w, x -> x = d)))) AS top_freq,
        |    CASE WHEN len(w) >= 2 THEN len(w) - 1 ELSE 0 END AS n_bi,
        |    CASE WHEN len(w) >= 2 THEN
        |      len(list_distinct(list_transform(range(1, len(w)),
        |        i -> w[i] || ' ' || w[i+1])))
        |    ELSE 0 END AS n_bi_distinct
        |  FROM w),
        |r AS (
        |  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |    round(CAST(n_distinct AS DOUBLE) / n_words, 6)
        |      AS type_token_ratio,
        |    round(CAST(top_freq AS DOUBLE) / n_words, 6)
        |      AS top_word_ratio,
        |    CASE WHEN n_bi > 0 THEN
        |      round(1 - CAST(n_bi_distinct AS DOUBLE) / n_bi, 6)
        |    ELSE 0.0 END AS dup_bigram_ratio
        |  FROM m)
        |SELECT doc_id, n_words, type_token_ratio, top_word_ratio,
        |  dup_bigram_ratio,
        |  CASE WHEN top_word_ratio > 0.2 OR dup_bigram_ratio > 0.4
        |    THEN 'repetitive' ELSE 'ok' END AS quality_flag
        |FROM r ORDER BY doc_id""".stripMargin,
    "q79_pii_scrub" ->
      s"""WITH seeded AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 7 = 0 THEN
         |      ' contact user' || CAST(doc_id AS VARCHAR) ||
         |      '@example.com now' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0 THEN
         |      ' call 555-' ||
         |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
         |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |    ELSE '' END AS text
         |  FROM documents),
         |scanned AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(text, '$EmailRe')) AS n_emails,
         |    len(regexp_extract_all(text, '$PhoneRe')) AS n_phones,
         |    regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
         |      '$PhoneRe', '<PHONE>', 'g') AS redacted
         |  FROM seeded)
         |SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
         |  CAST(n_phones AS BIGINT) AS n_phones,
         |  CAST(length(redacted) AS BIGINT) AS redacted_chars,
         |  CAST(len(regexp_extract_all(redacted, '$EmailRe')) +
         |       len(regexp_extract_all(redacted, '$PhoneRe')) AS BIGINT)
         |    AS residual_pii
         |FROM scanned WHERE n_emails + n_phones > 0
         |ORDER BY doc_id""".stripMargin,
    "q84_quality_classifier" -> {
      def hexAt(i: Int) =
        s"(instr('0123456789abcdef', substring(md5('graft-w:' || t), $i, 1)) - 1)"
      s"""WITH w AS (
         |  SELECT doc_id, lang, string_split_regex(text, '\\s+') AS w
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, lang, len(w) AS n_tokens,
         |    CAST(list_sum(list_transform(w, t ->
         |      ${hexAt(1)} * 256 + ${hexAt(2)} * 16 + ${hexAt(3)} - 2048))
         |      AS BIGINT) AS score
         |  FROM w),
         |r AS (
         |  SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, score,
         |    round(CAST(score AS DOUBLE) / (n_tokens * 2048.0), 6)
         |      AS mean_weight
         |  FROM s)
         |SELECT doc_id, lang, n_tokens, score, mean_weight,
         |  CASE WHEN mean_weight >= $QualityThreshold THEN 'keep'
         |       ELSE 'drop' END AS decision
         |FROM r ORDER BY doc_id""".stripMargin
    },
    // q171: the q84 scoring CTEs under the independent toxicity salt,
    // thresholded on the HIGH tail (safety flags outliers, quality
    // drops the bottom half)
    "q171_toxicity_classifier" -> {
      def hexAt(i: Int) =
        s"(instr('0123456789abcdef', substring(md5('$ToxSalt' || t), $i, 1)) - 1)"
      s"""WITH w AS (
         |  SELECT doc_id, lang, string_split_regex(text, '\\s+') AS w
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, lang, len(w) AS n_tokens,
         |    CAST(list_sum(list_transform(w, t ->
         |      ${hexAt(1)} * 256 + ${hexAt(2)} * 16 + ${hexAt(3)} - 2048))
         |      AS BIGINT) AS score
         |  FROM w),
         |r AS (
         |  SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, score,
         |    round(CAST(score AS DOUBLE) / (n_tokens * 2048.0), 6)
         |      AS mean_weight
         |  FROM s)
         |SELECT doc_id, lang, n_tokens, score, mean_weight,
         |  CASE WHEN mean_weight >= $ToxicityThreshold THEN 'toxic'
         |       ELSE 'clean' END AS decision
         |FROM r ORDER BY doc_id""".stripMargin
    },
    // q122: the q84 scoring CTEs with source riding along; the cutoff
    // is quantile_cont at the same (n-1)p rule as Spark percentile
    // (q35 precedent), rounded 6 dp BEFORE the pass comparison so both
    // engines count identical survivors
    "q122_quality_calibration" -> {
      def hexAt(i: Int) =
        s"(instr('0123456789abcdef', substring(md5('graft-w:' || t), $i, 1)) - 1)"
      s"""WITH w AS (
         |  SELECT doc_id, source, string_split_regex(text, '\\s+') AS w
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, source, len(w) AS n_tokens,
         |    CAST(list_sum(list_transform(w, t ->
         |      ${hexAt(1)} * 256 + ${hexAt(2)} * 16 + ${hexAt(3)} - 2048))
         |      AS BIGINT) AS score
         |  FROM w),
         |r AS (
         |  SELECT doc_id, source,
         |    round(CAST(score AS DOUBLE) / (n_tokens * 2048.0), 6)
         |      AS mean_weight
         |  FROM s),
         |cut AS (
         |  SELECT source, count(*) AS n_docs,
         |    round(quantile_cont(mean_weight, $CalibPct), 6) AS cutoff
         |  FROM r GROUP BY source)
         |SELECT r.source, CAST(any_value(n_docs) AS BIGINT) AS n_docs,
         |  any_value(cutoff) AS cutoff,
         |  CAST(count(*) FILTER (mean_weight >= cutoff) AS BIGINT)
         |    AS n_pass,
         |  CAST(count(*) FILTER (mean_weight >= cutoff) * 1000000 //
         |    any_value(n_docs) AS BIGINT) AS pass_micro
         |FROM r JOIN cut USING (source)
         |GROUP BY r.source ORDER BY r.source""".stripMargin
    },
    "q129_cluster_split" -> clusterSplitOracle,
    "q138_source_report" ->
      """WITH h AS (
        |  SELECT doc_id, source, n_chars, sha256(text) AS hh,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
        |      AS n_tokens,
        |    CAST(round(
        |      round(least(1.0, CAST(len(string_split_regex(text, '\s+'))
        |              AS DOUBLE) / 120.0) *
        |            (CAST(len(list_distinct(string_split_regex(text,
        |              '\s+'))) AS DOUBLE) /
        |             len(string_split_regex(text, '\s+'))), 6)
        |      * 1e6) AS BIGINT) AS qmicro
        |  FROM documents),
        |fam AS (SELECT hh, count(*) AS fam FROM h GROUP BY hh)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  count(CASE WHEN fam >= 2 THEN 1 END) AS n_dup_docs,
        |  CAST(sum(qmicro) // count(*) AS BIGINT) AS mean_quality_micro
        |FROM h JOIN fam USING (hh)
        |GROUP BY source ORDER BY source""".stripMargin,
    "q131_shard_manifest" ->
      s"""WITH k AS (
         |  SELECT doc_id, md5('graft-epoch0:' || doc_id) AS h
         |  FROM documents)
         |SELECT doc_id,
         |  CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
         |    // ${16 / EpochShards} AS BIGINT) AS shard_id,
         |  CAST(row_number() OVER (
         |    PARTITION BY (strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
         |      // ${16 / EpochShards}
         |    ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
         |FROM k ORDER BY shard_id, pos""".stripMargin,
    "q132_snapshot_diff" ->
      """WITH olds AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v0'
        |             ELSE text END) AS old_hash
        |  FROM documents WHERE doc_id % 11 <> 0),
        |news AS (
        |  SELECT doc_id, md5(text) AS new_hash
        |  FROM documents WHERE doc_id % 17 <> 0)
        |SELECT doc_id,
        |  CASE WHEN old_hash IS NULL THEN 'added'
        |       WHEN new_hash IS NULL THEN 'removed'
        |       WHEN old_hash <> new_hash THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  old_hash, new_hash
        |FROM olds FULL OUTER JOIN news USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q141_mixture_recipe" ->
      s"""WITH s AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT)
         |      AS n_tokens
         |  FROM documents GROUP BY source),
         |w AS (
         |  SELECT *, CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6)
         |    AS BIGINT) AS weight_micro FROM s),
         |t AS (SELECT CAST(sum(weight_micro) AS BIGINT) AS w_tot FROM w)
         |SELECT source, n_docs, n_tokens, weight_micro,
         |  CAST(weight_micro * 1000000 // w_tot AS BIGINT) AS share_micro,
         |  CAST($RecipeTokenBudget * weight_micro // w_tot AS BIGINT)
         |    AS target_tokens,
         |  CAST(($RecipeTokenBudget * weight_micro // w_tot) * 1000000
         |    // n_tokens AS BIGINT) AS repeat_micro
         |FROM w, t ORDER BY source""".stripMargin,
    "q142_snapshot_drift" ->
      """WITH olds AS (
        |  SELECT source, least(9, CAST(len(string_split_regex(
        |      CASE WHEN doc_id % 13 = 0 THEN text || ' v0' ELSE text END,
        |      '\s+')) AS BIGINT) // 32) AS bucket
        |  FROM documents WHERE doc_id % 11 <> 0),
        |news AS (
        |  SELECT source, least(9, CAST(len(string_split_regex(text,
        |      '\s+')) AS BIGINT) // 32) AS bucket
        |  FROM documents WHERE doc_id % 17 <> 0),
        |hist AS (
        |  SELECT source, bucket, CAST(sum(c_old) AS BIGINT) AS c_old,
        |    CAST(sum(c_new) AS BIGINT) AS c_new
        |  FROM (
        |    SELECT source, bucket, 1 AS c_old, 0 AS c_new FROM olds
        |    UNION ALL
        |    SELECT source, bucket, 0, 1 FROM news)
        |  GROUP BY source, bucket),
        |tot AS (
        |  SELECT source, CAST(sum(c_old) AS BIGINT) AS n_old,
        |    CAST(sum(c_new) AS BIGINT) AS n_new
        |  FROM hist GROUP BY source)
        |SELECT source, n_old, n_new,
        |  CAST(sum(abs(c_old * 1000000 // greatest(n_old, 1)
        |             - c_new * 1000000 // greatest(n_new, 1))) // 2
        |    AS BIGINT) AS tv_micro
        |FROM hist JOIN tot USING (source)
        |GROUP BY source, n_old, n_new ORDER BY source""".stripMargin,
    // q146: the oracle runs the DIRECT per-source running-sum window —
    // the Spark side's block-partitioned prefix sum is provably the
    // same order (div is monotone in the sort key)
    "q146_budget_select" ->
      """WITH s AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
        |      AS n_tokens,
        |    CAST(round(round(least(1.0,
        |        CAST(len(string_split_regex(text, '\s+')) AS DOUBLE)
        |          / 120.0) *
        |      (CAST(len(list_distinct(string_split_regex(text, '\s+')))
        |          AS DOUBLE) / len(string_split_regex(text, '\s+'))), 6)
        |      * 1e6) AS BIGINT) AS qmicro
        |  FROM documents),
        |agg AS (SELECT source, CAST(sum(n_tokens) AS BIGINT)
        |          AS src_tokens FROM s GROUP BY source),
        |w AS (SELECT source, src_tokens,
        |        CAST(round(sqrt(CAST(src_tokens AS DOUBLE)) * 1e6)
        |          AS BIGINT) AS wm FROM agg),
        |t AS (SELECT CAST(sum(wm) AS BIGINT) AS w_tot,
        |        CAST(sum(src_tokens) AS BIGINT) AS tok_tot FROM w),
        |tgt AS (SELECT source,
        |          CAST((tok_tot // 2) * (wm * 1000000 // w_tot)
        |            // 1000000 AS BIGINT) AS target_tokens
        |        FROM w, t),
        |r AS (SELECT doc_id, source, n_tokens,
        |        coalesce(CAST(sum(n_tokens) OVER (PARTITION BY source
        |          ORDER BY qmicro DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          AS BIGINT), 0) AS bfr
        |      FROM s)
        |SELECT source, count(*) AS n_kept,
        |  CAST(sum(n_tokens) AS BIGINT) AS tokens_kept, target_tokens,
        |  CAST(sum(n_tokens) * 1000000 // greatest(target_tokens, 1)
        |    AS BIGINT) AS fill_micro
        |FROM r JOIN tgt USING (source)
        |WHERE bfr < target_tokens
        |GROUP BY source, target_tokens ORDER BY source""".stripMargin,
    // q161: the hex32 fragment is the SAME text Spark parses; u is an
    // exact dyadic rational and the priority one IEEE division, so both
    // engines rank the identical top-(K+1) set.
    "q161_pps_sample" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
         |      AS n_tokens,
         |    md5('graft-pps:' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(n_tokens AS DOUBLE) * 4294967296.0 /
         |      CAST(($ppsHex32) + 1 AS DOUBLE) AS prio
         |  FROM w),
         |top AS (SELECT * FROM p ORDER BY prio DESC, doc_id
         |        LIMIT ${PpsK + 1}),
         |tau AS (SELECT doc_id AS tid, prio AS t FROM top
         |        ORDER BY prio ASC, doc_id DESC LIMIT 1)
         |SELECT top.doc_id, top.n_tokens,
         |  round(greatest(CAST(top.n_tokens AS DOUBLE), tau.t), 6)
         |    AS est_tokens
         |FROM top, tau WHERE top.doc_id <> tau.tid
         |ORDER BY top.doc_id""".stripMargin,
    "q147_source_overlap" ->
      s"""WITH segarr AS (
         |  SELECT source, list_transform(
         |    range(0, CAST(ceil(len(w) / ${SegWords}.0) AS INT)),
         |    i -> array_to_string(
         |      list_slice(w, i*$SegWords + 1, i*$SegWords + $SegWords), ' '))
         |    AS sl
         |  FROM (SELECT source, string_split_regex(text, '\\s+') AS w
         |        FROM documents)),
         |segs AS (SELECT DISTINCT source, md5(unnest(sl)) AS sh
         |         FROM segarr),
         |vol AS (SELECT source, count(*) AS n_segs FROM segs
         |        GROUP BY source),
         |p AS (SELECT a.source AS src_a, b.source AS src_b,
         |        count(*) AS n_shared
         |      FROM segs a JOIN segs b
         |        ON a.sh = b.sh AND a.source < b.source
         |      GROUP BY 1, 2)
         |SELECT src_a, src_b, n_shared, va.n_segs AS segs_a,
         |  vb.n_segs AS segs_b,
         |  CAST(n_shared * 1000000 // least(va.n_segs, vb.n_segs)
         |    AS BIGINT) AS overlap_micro
         |FROM p JOIN vol va ON va.source = p.src_a
         |       JOIN vol vb ON vb.source = p.src_b
         |ORDER BY src_a, src_b""".stripMargin,
    // q148 NESTS the cluster closure + q88's quality CTE: top-M per
    // family where q88 elects only M = 1
    "q148_cluster_caps" ->
      s"""$clustersCtes,
         |labels AS (
         |  SELECT doc_id, cluster_id,
         |    count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |  FROM comp),
         |quality AS (
         |  SELECT doc_id,
         |    round(least(1.0, CAST(len(w) AS DOUBLE) / 120.0) *
         |          (CAST(len(list_distinct(w)) AS DOUBLE) / len(w)), 6)
         |      AS quality
         |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS w
         |        FROM documents)),
         |ranked AS (
         |  SELECT cluster_id, doc_id, quality, cluster_size,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY quality DESC, doc_id) AS rn
         |  FROM labels JOIN quality USING (doc_id))
         |SELECT cluster_id, CAST(rn AS BIGINT) AS rk, doc_id, quality,
         |  cluster_size
         |FROM ranked WHERE rn <= $ClusterCap
         |ORDER BY cluster_id, rk""".stripMargin,
    // q156: the q114 window CTE split corpus/total; known = corpus-side
    // count ≥ 2, newly = batch arrival completed the collision
    "q156_incremental_substring_report" ->
      s"""WITH wins AS (
         |  SELECT doc_id, unnest(CASE WHEN len(wa) >= $DupWinWords
         |    THEN list_transform(range(0, len(wa) - $DupWinWords + 1),
         |      i -> array_to_string(
         |        list_slice(wa, i + 1, i + $DupWinWords), ' '))
         |    ELSE []::VARCHAR[] END) AS w
         |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS wa
         |        FROM documents)),
         |cnd AS (SELECT w, count(DISTINCT doc_id) AS cnd FROM wins
         |        WHERE doc_id % 10 <> 0 GROUP BY w),
         |tnd AS (SELECT w, count(DISTINCT doc_id) AS tnd FROM wins
         |        GROUP BY w),
         |st AS (SELECT tnd.w, coalesce(cnd.cnd, 0) AS cnd, tnd
         |       FROM tnd LEFT JOIN cnd ON tnd.w = cnd.w),
         |per AS (
         |  SELECT wins.doc_id, count(*) AS n_win,
         |    sum(CASE WHEN st.cnd >= 2 THEN 1 ELSE 0 END) AS nk,
         |    sum(CASE WHEN st.cnd < 2 AND st.tnd >= 2 THEN 1 ELSE 0 END)
         |      AS nn
         |  FROM wins JOIN st ON wins.w = st.w
         |  WHERE wins.doc_id % 10 = 0
         |  GROUP BY wins.doc_id)
         |SELECT doc_id, CAST(coalesce(n_win, 0) AS BIGINT) AS n_win,
         |  CAST(coalesce(nk, 0) AS BIGINT) AS n_known_dup,
         |  CAST(coalesce(nn, 0) AS BIGINT) AS n_newly_dup,
         |  CAST(CASE WHEN coalesce(n_win, 0) = 0 THEN 0
         |    ELSE (coalesce(nk, 0) + coalesce(nn, 0)) * 1000000 // n_win
         |    END AS BIGINT) AS dup_micro
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) b
         |LEFT JOIN per USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // q158: distinct batch windows probed against the corpus-side
    // distinct window set; zero-window docs are fully novel
    "q158_novelty_report" ->
      s"""WITH wins AS (
         |  SELECT doc_id, unnest(CASE WHEN len(wa) >= $DupWinWords
         |    THEN list_transform(range(0, len(wa) - $DupWinWords + 1),
         |      i -> array_to_string(
         |        list_slice(wa, i + 1, i + $DupWinWords), ' '))
         |    ELSE []::VARCHAR[] END) AS w
         |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS wa
         |        FROM documents)),
         |cw AS (SELECT DISTINCT w FROM wins WHERE doc_id % 10 <> 0),
         |bw AS (SELECT DISTINCT doc_id, w FROM wins
         |       WHERE doc_id % 10 = 0),
         |per AS (
         |  SELECT bw.doc_id, count(*) AS n_win,
         |    sum(CASE WHEN cw.w IS NOT NULL THEN 1 ELSE 0 END) AS n_seen
         |  FROM bw LEFT JOIN cw ON bw.w = cw.w
         |  GROUP BY bw.doc_id)
         |SELECT doc_id, CAST(coalesce(n_win, 0) AS BIGINT) AS n_win,
         |  CAST(coalesce(n_seen, 0) AS BIGINT) AS n_seen,
         |  CAST(CASE WHEN coalesce(n_win, 0) = 0 THEN 1000000
         |    ELSE (n_win - n_seen) * 1000000 // n_win
         |    END AS BIGINT) AS novelty_micro
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) b
         |LEFT JOIN per USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // q154: both snapshots' dup rates from the q132 fixtures; FULL
    // JOIN + coalesce so a source absent from one side still reports
    "q154_snapshot_dedup_trend" ->
      """WITH olds AS (
        |  SELECT source,
        |    md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v0'
        |             ELSE text END) AS hh
        |  FROM documents WHERE doc_id % 11 <> 0),
        |news AS (
        |  SELECT source, md5(text) AS hh
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT source, md5(text) AS hh
        |  FROM documents WHERE doc_id % 19 = 0),
        |so AS (
        |  SELECT source, count(*) AS n,
        |    count(*) FILTER (fam >= 2) AS dups
        |  FROM (SELECT source, count(*) OVER (PARTITION BY hh) AS fam
        |        FROM olds)
        |  GROUP BY source),
        |sn AS (
        |  SELECT source, count(*) AS n,
        |    count(*) FILTER (fam >= 2) AS dups
        |  FROM (SELECT source, count(*) OVER (PARTITION BY hh) AS fam
        |        FROM news)
        |  GROUP BY source)
        |SELECT source,
        |  coalesce(so.n, 0) AS n_old,
        |  CAST(coalesce(so.dups, 0) * 1000000
        |    // greatest(coalesce(so.n, 0), 1) AS BIGINT)
        |    AS dup_old_micro,
        |  coalesce(sn.n, 0) AS n_new,
        |  CAST(coalesce(sn.dups, 0) * 1000000
        |    // greatest(coalesce(sn.n, 0), 1) AS BIGINT)
        |    AS dup_new_micro,
        |  CAST(coalesce(sn.dups, 0) * 1000000
        |    // greatest(coalesce(sn.n, 0), 1)
        |    - coalesce(so.dups, 0) * 1000000
        |    // greatest(coalesce(so.n, 0), 1) AS BIGINT) AS delta_micro
        |FROM so FULL OUTER JOIN sn USING (source)
        |ORDER BY source""".stripMargin,
    // q155: the q145 rank rule on both snapshot universes, overlap by
    // conditional aggregation; stable fraction over the fixed K
    "q155_eval_sample_churn" ->
      s"""WITH o AS (
         |  SELECT lang, doc_id FROM (
         |    SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
         |      ORDER BY md5('graft-eval:' || doc_id), doc_id) AS rk
         |    FROM documents WHERE doc_id % 11 <> 0)
         |  WHERE rk <= $EvalSampleK),
         |n AS (
         |  SELECT lang, doc_id FROM (
         |    SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
         |      ORDER BY md5('graft-eval:' || doc_id), doc_id) AS rk
         |    FROM documents WHERE doc_id % 17 <> 0)
         |  WHERE rk <= $EvalSampleK),
         |m AS (
         |  SELECT lang, doc_id, max(in_old) AS in_old, max(in_new) AS in_new
         |  FROM (
         |    SELECT lang, doc_id, 1 AS in_old, 0 AS in_new FROM o
         |    UNION ALL
         |    SELECT lang, doc_id, 0, 1 FROM n)
         |  GROUP BY lang, doc_id)
         |SELECT lang,
         |  CAST(sum(in_old * in_new) AS BIGINT) AS n_stable,
         |  CAST(sum(in_new * (1 - in_old)) AS BIGINT) AS n_added,
         |  CAST(sum(in_old * (1 - in_new)) AS BIGINT) AS n_dropped,
         |  CAST(sum(in_old * in_new) * 1000000 // $EvalSampleK AS BIGINT)
         |    AS stable_micro
         |FROM m GROUP BY lang ORDER BY lang""".stripMargin,
    // q145: the oracle ranks directly per language — the Spark side's
    // two-level shard rank is provably the same selection
    "q145_eval_sample" ->
      s"""SELECT lang, rk, doc_id FROM (
         |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
         |    ORDER BY md5('graft-eval:' || doc_id), doc_id) AS rk
         |  FROM documents)
         |WHERE rk <= $EvalSampleK ORDER BY lang, rk""".stripMargin,
    "q119_substring_dup_remove" ->
      s"""WITH wa AS (
         |  SELECT doc_id, string_split_regex(text, '\\s+') AS w
         |  FROM documents),
         |wins AS (
         |  SELECT doc_id, i AS pos,
         |    array_to_string(list_slice(w, i + 1, i + $DupWinWords), ' ')
         |      AS g
         |  FROM wa, LATERAL unnest(range(0, len(w) - $DupWinWords + 1))
         |    AS t(i)
         |  WHERE len(w) >= $DupWinWords),
         |dup AS (
         |  SELECT g FROM (
         |    SELECT g, count(DISTINCT doc_id) AS nd FROM wins GROUP BY g)
         |  WHERE nd >= 2),
         |cov AS (
         |  SELECT DISTINCT doc_id, pos + j AS wp
         |  FROM wins JOIN dup USING (g),
         |    LATERAL unnest(range(0, $DupWinWords)) AS u(j)),
         |wordpos AS (
         |  SELECT doc_id, i AS wp, w[i + 1] AS word
         |  FROM wa, LATERAL unnest(range(0, len(w))) AS t(i)),
         |m AS (
         |  SELECT wordpos.doc_id, wordpos.wp, word,
         |    cov.wp IS NOT NULL AS covered
         |  FROM wordpos LEFT JOIN cov
         |    ON cov.doc_id = wordpos.doc_id AND cov.wp = wordpos.wp)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(count(*) FILTER (covered) AS BIGINT) AS n_removed,
         |  coalesce(string_agg(word, ' ' ORDER BY wp) FILTER (NOT covered),
         |    '') AS cleaned_text
         |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q120: q89's segment CTEs with the source riding along; the
    // boilerplate set is the DF-thresholded (source, seg) pairs and the
    // cut applies to EVERY occurrence (no keeper rank)
    "q120_boilerplate_remove" ->
      s"""WITH segarr AS (
         |  SELECT doc_id, source, list_transform(
         |    range(0, CAST(ceil(len(w) / ${SegWords}.0) AS INT)),
         |    i -> {'pos': i, 'seg': array_to_string(
         |      list_slice(w, i*$SegWords + 1, i*$SegWords + $SegWords), ' ')}) AS sl
         |  FROM (SELECT doc_id, source, string_split_regex(text, '\\s+') AS w
         |        FROM documents)),
         |segs AS (SELECT doc_id, source, len(sl) AS n_segs,
         |         unnest(sl, recursive := true) FROM segarr),
         |bp AS (
         |  SELECT source, seg FROM (
         |    SELECT source, seg, count(DISTINCT doc_id) AS nd
         |    FROM segs GROUP BY source, seg)
         |  WHERE nd >= $BoilerplateMinDocs),
         |marked AS (
         |  SELECT s.doc_id, s.n_segs, s.pos, s.seg, bp.seg IS NULL AS kept
         |  FROM segs s LEFT JOIN bp
         |    ON s.source = bp.source AND s.seg = bp.seg)
         |SELECT doc_id, CAST(any_value(n_segs) AS BIGINT) AS n_segs,
         |  CAST(count(*) FILTER (kept) AS BIGINT) AS n_kept,
         |  coalesce(string_agg(seg, ' ' ORDER BY pos) FILTER (kept), '')
         |    AS cleaned_text
         |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q116_dsir_importance" -> {
      def hexAt(i: Int) =
        s"(instr('0123456789abcdef', substring(h, $i, 1)) - 1)"
      s"""WITH wordsarr AS (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id, string_split_regex(text, '\\s+') AS w
         |    FROM documents) WHERE len(w) >= 2),
         |feats0 AS (
         |  SELECT doc_id, md5('$DsirSalt' || w[i] || ' ' || w[i+1]) AS h
         |  FROM wordsarr, LATERAL unnest(range(1, len(w))) AS t(i)),
         |feats AS (
         |  SELECT doc_id,
         |    ${hexAt(1)} * 256 + ${hexAt(2)} * 16 + ${hexAt(3)} AS b
         |  FROM feats0),
         |counts AS (
         |  SELECT b,
         |    sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS ct,
         |    sum(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS cr
         |  FROM feats GROUP BY b),
         |tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM counts),
         |lr AS (
         |  SELECT b,
         |    CAST(round((ln(CAST(ct + 1 AS DOUBLE) / (nt + $DsirBuckets))
         |      - ln(CAST(cr + 1 AS DOUBLE) / (nr + $DsirBuckets))) * 1e6)
         |      AS BIGINT) AS lr
         |  FROM counts, tot),
         |scored AS (
         |  SELECT doc_id, count(*) AS n_bigrams, sum(lr) AS weight_micro
         |  FROM feats JOIN lr USING (b)
         |  WHERE doc_id % 10 <> 0
         |  GROUP BY doc_id)
         |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
         |  CAST(weight_micro AS BIGINT) AS weight_micro,
         |  round(CAST(weight_micro AS DOUBLE) / n_bigrams, 6) AS avg_weight,
         |  weight_micro >= 0 AS selected
         |FROM scored ORDER BY doc_id""".stripMargin
    },
    "q76_pack_sequences" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang, doc_id // $PackShardDocs AS shard,
         |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |cums AS (
         |  SELECT doc_id, lang, shard, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM toks)
         |SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard, n_tokens,
         |  CAST(shard * 4294967296 + (cum - n_tokens) // $PackTokens AS BIGINT)
         |    AS seq_start,
         |  CAST(shard * 4294967296 + (cum - 1) // $PackTokens AS BIGINT)
         |    AS seq_end
         |FROM cums ORDER BY doc_id""".stripMargin)

  /** q115's oracle NESTS the stage oracles as subqueries (the q110
    * composition pattern) — funnel and stages cannot drift apart. */
  val oracle: Map[String, String] = oracleMain + {
    // q176 NESTS the q74/q172 oracles so the rung comparison cannot
    // drift from either rung's own verdict
    "q176_decon_rung_report" ->
      s"""WITH ex AS (SELECT doc_id FROM (
         |${oracleMain("q74_decontaminate")})),
         |fz AS (SELECT doc_id FROM (
         |${oracleMain("q172_fuzzy_decontaminate")})),
         |tagged AS (
         |  SELECT CASE
         |    WHEN doc_id IN (SELECT doc_id FROM ex)
         |     AND doc_id IN (SELECT doc_id FROM fz) THEN 'both'
         |    WHEN doc_id IN (SELECT doc_id FROM ex) THEN 'exact_only'
         |    WHEN doc_id IN (SELECT doc_id FROM fz) THEN 'fuzzy_only'
         |    ELSE 'clean' END AS rung
         |  FROM documents WHERE doc_id % 10 <> 0)
         |SELECT rung, count(*) AS n_docs FROM tagged
         |GROUP BY rung ORDER BY rung""".stripMargin
  } + {
    // q174 NESTS the q84/q171 oracles (the q115 rule) so the sweep and
    // the shipped classifiers cannot score differently; thresholds via
    // LATERAL unnest of the same micro grid
    "q174_threshold_sweep" ->
      s"""WITH scored AS (
         |  SELECT 'quality' AS model, mean_weight FROM (
         |${oracleMain("q84_quality_classifier")})
         |  UNION ALL
         |  SELECT 'toxicity' AS model, mean_weight FROM (
         |${oracleMain("q171_toxicity_classifier")})),
         |th AS (SELECT unnest([${SweepThresholds.mkString(", ")}])
         |         AS threshold_micro)
         |SELECT model, CAST(threshold_micro AS BIGINT) AS threshold_micro,
         |  count(*) AS n_docs,
         |  CAST(count(*) FILTER (mean_weight >=
         |    CAST(threshold_micro AS DOUBLE) / 1000000.0) AS BIGINT)
         |    AS n_above,
         |  CAST(count(*) FILTER (mean_weight >=
         |    CAST(threshold_micro AS DOUBLE) / 1000000.0) * 1000000
         |    // count(*) AS BIGINT) AS above_micro
         |FROM scored CROSS JOIN th
         |GROUP BY model, threshold_micro
         |ORDER BY model, threshold_micro""".stripMargin
  } + {
    "q115_curation_funnel" ->
      s"""WITH s2 AS (SELECT keep_id AS doc_id FROM (
         |${LLMQueries.oracle("q60_exact_dedup")})),
         |s3 AS (SELECT doc_id FROM s2 WHERE doc_id IN (
         |  SELECT doc_id FROM (
         |${oracleMain("q78_repetition_stats")})
         |  WHERE quality_flag = 'ok')),
         |s4 AS (SELECT doc_id FROM s3 WHERE doc_id NOT IN (
         |  SELECT doc_id FROM (
         |${oracleMain("q92_lm_fluency")})
         |  WHERE NOT is_fluent)),
         |s5 AS (SELECT doc_id FROM s4 WHERE doc_id NOT IN (
         |  SELECT doc_id FROM (
         |${oracleMain("q74_decontaminate")}))),
         |s6 AS (SELECT doc_id FROM s5 WHERE doc_id IN (
         |  SELECT doc_id FROM (
         |${oracleMain("q84_quality_classifier")})
         |  WHERE decision = 'keep')),
         |s7 AS (SELECT doc_id FROM s6 WHERE doc_id IN (
         |  SELECT doc_id FROM (
         |${oracleMain("q171_toxicity_classifier")})
         |  WHERE decision = 'clean'))
         |SELECT stage, stage_name, n_docs FROM (
         |  SELECT CAST(1 AS BIGINT) AS stage, 'all' AS stage_name,
         |    (SELECT count(*) FROM documents) AS n_docs
         |  UNION ALL SELECT 2, 'exact_dedup', (SELECT count(*) FROM s2)
         |  UNION ALL SELECT 3, 'repetition_filter', (SELECT count(*) FROM s3)
         |  UNION ALL SELECT 4, 'fluency_filter', (SELECT count(*) FROM s4)
         |  UNION ALL SELECT 5, 'decontaminate', (SELECT count(*) FROM s5)
         |  UNION ALL SELECT 6, 'quality_classifier',
         |    (SELECT count(*) FROM s6)
         |  UNION ALL SELECT 7, 'toxicity_filter',
         |    (SELECT count(*) FROM s7)
         |) ORDER BY stage""".stripMargin
  } + {
    // q157 NESTS the five stage oracles (the q115 rule): disposition =
    // the first funnel stage, in production order, that drops the doc
    "q157_funnel_disposition" ->
      s"""WITH s2 AS (SELECT keep_id AS doc_id FROM (
         |${LLMQueries.oracle("q60_exact_dedup")})),
         |rep_ok AS (SELECT doc_id FROM (
         |${oracleMain("q78_repetition_stats")})
         |  WHERE quality_flag = 'ok'),
         |unfl AS (SELECT doc_id FROM (
         |${oracleMain("q92_lm_fluency")})
         |  WHERE NOT is_fluent),
         |cont AS (SELECT DISTINCT doc_id FROM (
         |${oracleMain("q74_decontaminate")})),
         |qk AS (SELECT doc_id FROM (
         |${oracleMain("q84_quality_classifier")})
         |  WHERE decision = 'keep'),
         |toxc AS (SELECT doc_id FROM (
         |${oracleMain("q171_toxicity_classifier")})
         |  WHERE decision = 'clean')
         |SELECT d.doc_id, d.source,
         |  CASE
         |    WHEN d.doc_id NOT IN (SELECT doc_id FROM s2)
         |      THEN 'dropped_exact_dup'
         |    WHEN d.doc_id NOT IN (SELECT doc_id FROM rep_ok)
         |      THEN 'dropped_repetition'
         |    WHEN d.doc_id IN (SELECT doc_id FROM unfl)
         |      THEN 'dropped_fluency'
         |    WHEN d.doc_id IN (SELECT doc_id FROM cont)
         |      THEN 'dropped_contaminated'
         |    WHEN d.doc_id NOT IN (SELECT doc_id FROM qk)
         |      THEN 'dropped_quality'
         |    WHEN d.doc_id NOT IN (SELECT doc_id FROM toxc)
         |      THEN 'dropped_toxicity'
         |    ELSE 'kept' END AS disposition
         |FROM documents d ORDER BY d.doc_id""".stripMargin
  } + {
    // q159: the DailyIngest gate chain over the q150 universe (eval =
    // mod 10, batch = train side mod DeconBatchMod); near-dup losers
    // need a VERIFIED jaccard ≥ ClusterThreshold against a smaller id.
    // ONE pairs_all CTE set over ALL docs serves BOTH banded gates:
    // near-dup = both-train pairs, fuzzy decon = cross-boundary pairs
    "q159_daily_ingest_disposition" ->
      (s"WITH ${LLMQueries.minhashPairsCtesOf("")}," +
       s" $gramsCte," +
       s"""exact_keep AS (
         |  SELECT min(doc_id) AS doc_id FROM documents
         |  WHERE doc_id % 10 <> 0 AND doc_id % $DeconBatchMod = 0
         |  GROUP BY sha256(text)
         |  HAVING sha256(text) NOT IN (
         |    SELECT sha256(text) FROM documents
         |    WHERE doc_id % 10 <> 0 AND doc_id % $DeconBatchMod <> 0)),
         |norm_keep AS (
         |  SELECT min(doc_id) AS doc_id FROM (
         |    SELECT doc_id,
         |      md5(trim(regexp_replace(regexp_replace(lower(text),
         |        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS nh
         |    FROM documents
         |    WHERE doc_id % 10 <> 0 AND doc_id % $DeconBatchMod = 0)
         |  GROUP BY nh
         |  HAVING nh NOT IN (
         |    SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
         |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))
         |    FROM documents
         |    WHERE doc_id % 10 <> 0 AND doc_id % $DeconBatchMod <> 0)),
         |near_loser AS (
         |  SELECT DISTINCT doc_b AS doc_id FROM pairs_all
         |  WHERE jaccard >= $ClusterThreshold
         |    AND doc_a % 10 <> 0 AND doc_b % 10 <> 0
         |    AND doc_b % $DeconBatchMod = 0),
         |fuzzy_cont AS (
         |  SELECT DISTINCT
         |    CASE WHEN doc_a % 10 <> 0 THEN doc_a ELSE doc_b END AS doc_id
         |  FROM pairs_all
         |  WHERE ((doc_a % 10 = 0) <> (doc_b % 10 = 0))
         |    AND jaccard >= $ClusterThreshold
         |    AND (CASE WHEN doc_a % 10 <> 0 THEN doc_a ELSE doc_b END)
         |      % $DeconBatchMod = 0),
         |cont AS (
         |  SELECT DISTINCT grams.doc_id FROM grams
         |  JOIN (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0) ev
         |    USING (g)
         |  WHERE grams.doc_id % 10 <> 0
         |    AND grams.doc_id % $DeconBatchMod = 0),
         |qk AS (SELECT doc_id FROM (
         |${oracleMain("q84_quality_classifier")})
         |  WHERE decision = 'keep'),
         |toxc AS (SELECT doc_id FROM (
         |${oracleMain("q171_toxicity_classifier")})
         |  WHERE decision = 'clean')
         |SELECT d.doc_id,
         |  CASE
         |    WHEN d.doc_id NOT IN (SELECT doc_id FROM exact_keep)
         |      THEN 'dropped_exact_dup'
         |    WHEN d.doc_id NOT IN (SELECT doc_id FROM norm_keep)
         |      THEN 'dropped_normalized_dup'
         |    WHEN d.doc_id IN (SELECT doc_id FROM near_loser)
         |      THEN 'dropped_near_dup'
         |    WHEN d.doc_id IN (SELECT doc_id FROM cont)
         |      THEN 'dropped_contaminated'
         |    WHEN d.doc_id IN (SELECT doc_id FROM fuzzy_cont)
         |      THEN 'dropped_fuzzy_contaminated'
         |    WHEN d.doc_id NOT IN (SELECT doc_id FROM qk)
         |      THEN 'dropped_quality'
         |    WHEN d.doc_id NOT IN (SELECT doc_id FROM toxc)
         |      THEN 'dropped_toxicity'
         |    ELSE 'kept' END AS disposition
         |FROM documents d
         |WHERE d.doc_id % 10 <> 0 AND d.doc_id % $DeconBatchMod = 0
         |ORDER BY d.doc_id""".stripMargin)
  } + {
    // q133 NESTS the q92 oracle (the q115 composition pattern) so the
    // bucketing and the scorer cannot drift apart
    "q133_nll_buckets" ->
      s"""WITH wl AS (
         |  SELECT s.doc_id, d.lang, s.avg_nll_micro
         |  FROM (SELECT doc_id, avg_nll_micro FROM (
         |${oracleMain("q92_lm_fluency")})) s
         |  JOIN documents d USING (doc_id)),
         |cuts AS (
         |  SELECT lang,
         |    round(quantile_cont(avg_nll_micro, 1.0/3), 6) AS c1,
         |    round(quantile_cont(avg_nll_micro, 2.0/3), 6) AS c2
         |  FROM wl GROUP BY lang)
         |SELECT doc_id, lang, avg_nll_micro,
         |  CASE WHEN avg_nll_micro <= c1 THEN 'head'
         |       WHEN avg_nll_micro <= c2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM wl JOIN cuts USING (lang) ORDER BY doc_id""".stripMargin
  }
}
