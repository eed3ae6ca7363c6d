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
    with CurationSubstrings
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
  // (same lesson as LLMQueries.docs); width AQE-sized (Scale.byKey, r16)
  private[operators] def docs(spark: SparkSession, dir: String): DataFrame =
    graft.Scale.byKey(Tables(spark, dir, "documents"), col("doc_id"))

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
      ((s: SparkSession, d: String) => DailyIngest.ingestDisposition(s, d)),
    "q198_mixed_manifest" -> (mixedManifest _))

  // ---- oracle SQL -----------------------------------------------------

  /** Assembled from the family traits so each oracle lives beside the
    * operator it checks (the LLMQueries.oracle convention; pure moves,
    * round 14 — entries byte-identical). */
  private[operators] val oracleMain: Map[String, String] =
    deconOracleMain ++ clustersOracleMain ++ substringsOracleMain ++
      samplingOracleMain ++ scoringOracleMain ++ lmOracleMain ++
      reportsOracleMain

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
