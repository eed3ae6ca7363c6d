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
object CurationQueries {

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
  private def docs(spark: SparkSession, dir: String): DataFrame =
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

  /** The eval-gram frame wrapped in the fail-fast cardinality guard
    * (the q100 kmeans packing-guard pattern): one slim count aggregate
    * of the already-bounded-in-production side, cross-joined as a
    * broadcast singleton; under the cap the projection is the identity,
    * over it every row raises before anything is broadcast-joined.
    * Shared by q74 (full pass) and q150 (daily flow) so both fail the
    * same way. */
  private[operators] def guardedEvalGrams(evalGrams: DataFrame,
      cap: Long = EvalGramBroadcastCap): DataFrame = {
    val n = evalGrams.agg(count(lit(1)).as("n_eval_grams"))
    evalGrams.crossJoin(broadcast(n))
      .select(when(col("n_eval_grams") <= cap, col("g"))
        .otherwise(raise_error(format_string(
          "decontamination eval-gram side is not benchmark-sized: " +
            s"%d distinct grams exceed the broadcast cap $cap — " +
            "screen against a bounded eval suite, not a corpus",
          col("n_eval_grams"))).cast("string")).as("g"))
  }

  /** Benchmark decontamination: docs sharing any 5-gram with the eval
    * set are contaminated and must be dropped before training. The eval
    * set here is carved from the corpus itself (doc_id % 10 == 0) so the
    * query is self-contained on the shipped tables; in production it is
    * any benchmark suite.
    *
    * Scale shape: the eval gram set is small (benchmarks are thousands
    * of documents, not billions) → distinct once, BROADCAST to every
    * executor — a precondition [[guardedEvalGrams]] enforces loudly
    * rather than assumes. The training side is a flat explode feeding a
    * broadcast hash join — no corpus-wide shuffle at all until the
    * per-doc rollup on doc_id (and that only over matching gram rows, a
    * tiny fraction of the corpus).
    */
  def decontaminateDocs(docsDf: DataFrame,
      evalCap: Long = EvalGramBroadcastCap): DataFrame = {
    val evalGrams = guardedEvalGrams(
      docsDf.filter(col("doc_id") % 10 === 0)
        .select(explode(gramsExpr).as("g")).distinct(), evalCap)
    val trainGrams = docsDf.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), gramsExpr.as("gs"))
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"),
        explode(col("gs")).as("g"))
    trainGrams
      .join(broadcast(evalGrams), Seq("g"))
      // gs is distinct per doc, so matching rows are unique (doc_id, g)
      // pairs and count(*) is the distinct overlapping-gram count
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(lit(1)).as("n_contaminated"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        round(col("n_contaminated").cast("double") / col("n_grams"), 6)
          .as("contamination_ratio"))
      .orderBy(col("doc_id"))
  }

  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminateDocs(docs(spark, dir))

  /** The persisted EVAL-gram index (IndexStore family `eval_grams`):
    * one distinct 5-gram per benchmark item — benchmark-sized, frozen
    * per benchmark RELEASE (it changes when the eval suite does, not
    * daily — the rebuild-class refresh cycle of bpe_vocab/dsir_model,
    * but read by every single ingest). */
  def evalGramIndex(docsDf: DataFrame): DataFrame =
    docsDf.filter(col("doc_id") % 10 === 0)
      .select(explode(gramsExpr).as("g")).distinct()

  /** Batch residue on the train side for the q150 daily flow (coprime
    * with the eval residue so the batch is a proper train slice). */
  private[graft] val DeconBatchMod = 7

  /** L53/q150: incremental DECONTAMINATION — q74 as a daily-ingest
    * flow: only today's arriving train docs screen against the
    * persisted eval-gram index; yesterday's corpus was screened when
    * it arrived, and the per-doc check is independent across docs, so
    * the restriction provably equals the full pass on the batch. Daily
    * cost is O(batch grams) through one broadcast join — corpus text
    * never re-explodes, which is the entire point of freezing the eval
    * grams as an artifact. */
  def incrementalDecontaminate(evalGrams: DataFrame,
      newDocs: DataFrame,
      evalCap: Long = EvalGramBroadcastCap): DataFrame =
    newDocs
      .select(col("doc_id"), gramsExpr.as("gs"))
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"),
        explode(col("gs")).as("g"))
      .join(broadcast(guardedEvalGrams(evalGrams, evalCap)), Seq("g"))
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(lit(1)).as("n_contaminated"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        round(col("n_contaminated").cast("double") / col("n_grams"), 6)
          .as("contamination_ratio"))
      .orderBy(col("doc_id"))

  /** q150 as an oracle query: eval index built in-query (as the oracle
    * must), today's train batch screened against it. */
  def incrementalDecontaminateDaily(spark: SparkSession,
      dir: String): DataFrame = {
    val d = docs(spark, dir)
    incrementalDecontaminate(evalGramIndex(d),
      d.filter(col("doc_id") % 10 =!= 0 &&
        col("doc_id") % DeconBatchMod === 0))
  }

  /** L74/q172: FUZZY decontamination — the near-dup verdict aimed
    * across the train/eval boundary. Exact-gram screening (q74) fires
    * on ANY single shared 5-gram, which is the recall-side instrument:
    * one quoted idiom flags a clean doc. This is the precision-side
    * one: a train doc is contaminated iff it would be elected into a
    * benchmark item's DUP CLUSTER — MinHash-banded candidates against
    * the eval suite, verified by exact shingle Jaccard ≥ the same
    * [[ClusterThreshold]] the dedup election uses (one threshold, one
    * meaning: "these are the same document"). The fuzzy/exact split is
    * how production decontamination actually runs (exact n-gram first,
    * similarity screen behind it); both rungs sit on the SAME persisted
    * signature machinery.
    *
    * Per contaminated train doc: how many eval items it collides with,
    * the smallest such eval id, and the strongest verified similarity.
    *
    * Scale shape: the probe side is the BOUNDED benchmark (the q74
    * broadcast argument, banded): eval bands probe the corpus band
    * index through [[LLMQueries.incrementalNearDupsFrom]], so corpus-
    * only buckets never enumerate, candidates require an eval endpoint,
    * and verification touches only candidate-endpoint shingle sets. At
    * 100 TB the corpus side is the ALREADY-PERSISTED text_bands/
    * text_sets families — fuzzy decon adds zero corpus-side artifacts. */
  def fuzzyDecontaminateDocs(docsDf: DataFrame): DataFrame = {
    val evalD = docsDf.filter(col("doc_id") % 10 === 0)
    val train = docsDf.filter(col("doc_id") % 10 =!= 0)
    val (tBands, tSets) = LLMQueries.signatureTables(train)
    val (eBandsRaw, eSets) = LLMQueries.signatureTables(evalD)
    fuzzyDeconRollup(LLMQueries.incrementalNearDupsFrom(tBands, tSets,
      eBandsRaw.localCheckpoint(eager = false), eSets))
  }

  def fuzzyDecontaminate(spark: SparkSession, dir: String): DataFrame =
    fuzzyDecontaminateDocs(docs(spark, dir))

  /** The train-side rollup of verified cross-boundary pairs — shared by
    * the full pass and the daily leg so the two cannot drift. Same-side
    * pairs (train×train from the full pass's union leg, batch×batch
    * from the daily probe) are dedup's business, not decon's. */
  private def fuzzyDeconRollup(pairs: DataFrame): DataFrame =
    pairs
      .filter((col("doc_a") % 10 === 0) =!= (col("doc_b") % 10 === 0))
      .filter(col("jaccard") >= ClusterThreshold)
      .select(
        when(col("doc_a") % 10 =!= 0, col("doc_a")).otherwise(col("doc_b"))
          .as("doc_id"),
        when(col("doc_a") % 10 === 0, col("doc_a")).otherwise(col("doc_b"))
          .as("eval_id"),
        col("jaccard"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_eval_matches"),
        min(col("eval_id")).as("top_eval_id"),
        max(col("jaccard")).as("max_jaccard"))
      .orderBy(col("doc_id"))

  /** L74b/q173: the DAILY leg of fuzzy decontamination — today's batch
    * probes the persisted EVAL signature tables (benchmark-sized,
    * frozen per benchmark release: `eval_grams`' lifecycle, banded).
    * Candidates require a batch endpoint, eval-only buckets never
    * enumerate, and per-doc independence makes the restriction provably
    * equal the full q172 pass on the batch (the q150 argument). */
  def incrementalFuzzyDecontaminate(evalBands: DataFrame,
      evalSets: DataFrame, newDocs: DataFrame): DataFrame =
    fuzzyDeconRollup(
      LLMQueries.incrementalNearDups(evalBands, evalSets, newDocs))

  /** [[incrementalFuzzyDecontaminate]] with the batch's signature
    * tables supplied — the DailyIngest gate reuses the once-per-day
    * batch MinHash pass it already shares with the near-dup gate
    * (compute each batch pass once per day, not once per consumer). */
  def incrementalFuzzyDecontaminateFrom(evalBands: DataFrame,
      evalSets: DataFrame, batchBands: DataFrame,
      batchSets: DataFrame): DataFrame =
    fuzzyDeconRollup(LLMQueries.incrementalNearDupsFrom(evalBands,
      evalSets, batchBands, batchSets))

  /** q173 as an oracle query: eval signature tables built in-query (as
    * the oracle must), today's train batch screened against them. */
  def incrementalFuzzyDecontaminateDaily(spark: SparkSession,
      dir: String): DataFrame = {
    val d = docs(spark, dir)
    val (eBands, eSets) =
      LLMQueries.signatureTables(d.filter(col("doc_id") % 10 === 0))
    incrementalFuzzyDecontaminate(eBands, eSets,
      d.filter(col("doc_id") % 10 =!= 0 &&
        col("doc_id") % DeconBatchMod === 0))
  }

  /** L77/q176: decon RUNG comparison — the audit that closes the
    * two-rung story: per train doc, which decontamination rung(s) flag
    * it — `both`, `exact_only` (a shared 5-gram without document-level
    * similarity: the quoted-idiom case the fuzzy rung deliberately
    * ignores), `fuzzy_only` (document-level similarity with zero shared
    * 5-grams: heavy-rewrite leakage the exact rung cannot see), or
    * `clean`. The relative sizes are what an eval owner reads to set
    * the deployment (exact-only drops are the recall rung's false-
    * positive budget; fuzzy-only drops justify running the second
    * rung at all). Scale shape: two proven flag frames left-joined on
    * a slim id projection, one 4-group rollup — text never moves. */
  def deconRungReportDocs(docsDf: DataFrame): DataFrame = {
    val exactF = decontaminateDocs(docsDf)
      .select(col("doc_id"), lit(true).as("f_ex"))
    val fuzzyF = fuzzyDecontaminateDocs(docsDf)
      .select(col("doc_id"), lit(true).as("f_fz"))
    docsDf.filter(col("doc_id") % 10 =!= 0).select(col("doc_id"))
      .join(exactF, Seq("doc_id"), "left")
      .join(fuzzyF, Seq("doc_id"), "left")
      .select(
        when(col("f_ex").isNotNull && col("f_fz").isNotNull, "both")
          .when(col("f_ex").isNotNull, "exact_only")
          .when(col("f_fz").isNotNull, "fuzzy_only")
          .otherwise("clean").as("rung"))
      .groupBy(col("rung")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("rung"))
  }

  def deconRungReport(spark: SparkSession, dir: String): DataFrame =
    deconRungReportDocs(docs(spark, dir))

  /** L8b/q137: CONTAMINATION REPORT — the audit mirror of q74. q74
    * answers "which train docs must be dropped"; this answers the
    * question an eval owner asks: per EVAL document, how many train
    * docs share a 5-gram with it and what fraction of its own grams
    * leak anywhere into the training side. An eval doc with a high hit
    * ratio is compromised as a benchmark item even AFTER q74 drops the
    * offending train docs (the next crawl re-introduces them);
    * zero-overlap eval docs appear with zeros, so the report is
    * complete over the eval set.
    *
    * Scale shape: the eval side is benchmark-sized → exploded grams
    * BROADCAST (the q74 argument, reversed); the train side is the
    * same flat explode feeding the broadcast hash join, and the rollup
    * aggregates only matching rows. count_distinct over two columns is
    * one Expand×2 of those matching rows — never corpus-sized. */
  def contaminationReportDocs(docsDf: DataFrame): DataFrame = {
    val evalDocs = docsDf.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("eval_id"), gramsExpr.as("gs"))
      .select(col("eval_id"), size(col("gs")).cast("long")
        .as("n_eval_grams"), col("gs"))
    val evalG = evalDocs
      .select(col("eval_id"), explode(col("gs")).as("g"))
    val trainG = docsDf.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), explode(gramsExpr).as("g"))
    val hits = trainG.join(broadcast(evalG), Seq("g"))
      .groupBy(col("eval_id"))
      .agg(count_distinct(col("doc_id")).as("n_train_docs"),
        count_distinct(col("g")).as("n_hit_grams"))
    evalDocs.select(col("eval_id"), col("n_eval_grams"))
      .join(hits, Seq("eval_id"), "left")
      .select(col("eval_id"), col("n_eval_grams"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        round(coalesce(col("n_hit_grams"), lit(0L)).cast("double") /
          col("n_eval_grams"), 6).as("hit_ratio"))
      .orderBy(col("eval_id"))
  }

  def contaminationReport(spark: SparkSession, dir: String): DataFrame =
    contaminationReportDocs(docs(spark, dir))

  /** L43/q138: per-source CORPUS REPORT CARD — the one-table health
    * summary a data lead reads before signing off a snapshot: per
    * source, document and byte volume, whitespace-token volume, how
    * many docs sit in a corpus-wide exact-dup family, and mean quality
    * — the table that decides which source gets capped (q107),
    * reweighted (q90) or re-crawled. One row per source; every column
    * derives from already-proven operator definitions.
    *
    * Determinism: mean quality is an exact integer mean of per-doc
    * micro-unit scores (round(q·1e6) of the 6-dp-rounded qualityExpr —
    * double-rounding is engine-identical), dup membership compares
    * corpus-wide sha2 family sizes. Scale shape: one hash groupBy +
    * join-back (the q60 shuffle class: 64-hex keys) and one
    * partial-aggregating per-source rollup; text never shuffles. */
  def sourceReportDocs(docsDf: DataFrame): DataFrame = {
    val h = docsDf.select(col("doc_id"), col("source"), col("n_chars"),
      sha2(col("text"), 256).as("hh"),
      size(split(col("text"), "\\s+")).cast("long").as("n_tokens"),
      expr("cast(round(" +
        "round(transform(array(split(text, '\\\\s+'))," +
        " w -> least(1.0d, size(w) / 120.0d)" +
        " * (size(array_distinct(w)) / cast(size(w) as double)))[0], 6)" +
        " * 1e6) as bigint)").as("qmicro"))
    val fam = h.groupBy(col("hh")).agg(count(lit(1)).as("fam"))
    h.join(fam, Seq("hh"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_tokens")).as("n_tokens"),
        count(when(col("fam") >= 2, 1)).as("n_dup_docs"),
        expr("sum(qmicro) div count(*)").as("mean_quality_micro"))
      .orderBy(col("source"))
  }

  def sourceReport(spark: SparkSession, dir: String): DataFrame =
    sourceReportDocs(docs(spark, dir))

  /** Per-language sampling rates as 8-hex-digit md5-prefix thresholds
    * (rate ≈ threshold / 2^32): a doc is kept iff the first 8 hex chars
    * of md5("graft-sample:" <doc_id>) sort below its language's
    * threshold. Fixed-width lowercase hex compares exactly like the
    * 32-bit number it encodes, in Spark and DuckDB alike.
    */
  private val SampleRates: Seq[(String, String)] = Seq(
    "en" -> "e6666666", // ≈0.90
    "de" -> "80000000", // ≈0.50
    "es" -> "80000000",
    "fr" -> "80000000",
    "zh" -> "40000000") // ≈0.25
  private val DefaultRate = "80000000"

  /** Deterministic hash-stratified sample + train/val/test split. Both
    * decisions are pure functions of doc_id (salted md5 prefixes, one
    * salt per decision so sampling and splitting are independent), so
    * the assignment is stable under reruns, repartitioning, and
    * incremental appends — the property a 100 TB pipeline actually
    * needs from its sampler, and one rand()-based sampling does not
    * have. No shuffle except the final summary rollup.
    */
  def hashSplitDocs(docsDf: DataFrame): DataFrame = {
    val sampleHash =
      substring(md5(concat(lit("graft-sample:"),
        col("doc_id").cast("string"))), 1, 8)
    val splitHash =
      substring(md5(concat(lit("graft-split:"),
        col("doc_id").cast("string"))), 1, 8)
    val rateFor = SampleRates.foldRight(lit(DefaultRate)) {
      case ((lang, hex), elseCol) =>
        when(col("lang") === lang, lit(hex)).otherwise(elseCol)
    }
    docsDf
      .filter(sampleHash < rateFor)
      .withColumn("split",
        when(splitHash < "cccccccc", "train")      // ≈0.80
          .when(splitHash < "e6666666", "val")     // ≈0.10
          .otherwise("test"))                      // ≈0.10
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), "\\s+")).cast("long"))
          .as("total_tokens"))
      .orderBy(col("lang"), col("split"))
  }

  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    hashSplitDocs(docs(spark, dir))

  /** Docs kept per language by the q145 eval sampler. */
  val EvalSampleK = 20

  /** q145's own shard-width knob (the q107/SourceCapShardDocs rule:
    * every two-level rank owns its width). */
  val EvalSampleShardDocs = 128L

  /** L48/q145: EXACT-K stratified eval sample — exactly [[EvalSampleK]]
    * docs per language, selected by salted-md5 order. q75's
    * rate-threshold sampler is append-stable but only approximates its
    * sizes (rate·N ± binomial noise — useless when the eval budget is
    * "exactly 500 per language"); hash-ORDER selection pins the size
    * exactly, trading perfect append-stability for O(1)-expected churn
    * per append (a new doc displaces at most the K-th member of its own
    * language). Still a pure function of doc_id — rerun- and
    * partition-independent, never rand().
    *
    * Scale shape: lang is a constant-cardinality HOT key, so the rank
    * must not be one lang-keyed window (the q76/q107 lesson verbatim):
    * rank locally per (lang, doc_id-range shard) — shard cardinality
    * grows with the corpus — keep ≤ K per shard, and the final lang
    * rank sees shards×K survivors. Equivalent to the direct rank: a
    * global top-K row has fewer than K rows ordered above it anywhere,
    * a fortiori within its own shard. */
  def evalSampleDocs(docsDf: DataFrame): DataFrame = {
    val scored = docsDf.select(col("doc_id"), col("lang"),
        md5(concat(lit("graft-eval:"), col("doc_id").cast("string")))
          .as("h"))
      .withColumn("shard", expr(s"doc_id div $EvalSampleShardDocs"))
    val local = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("h"), col("doc_id"))
    val survivors = scored.withColumn("lrk", row_number().over(local))
      .filter(col("lrk") <= EvalSampleK)
      .drop("lrk", "shard")
    val global = Window.partitionBy(col("lang"))
      .orderBy(col("h"), col("doc_id"))
    survivors.withColumn("rk", row_number().over(global))
      .filter(col("rk") <= EvalSampleK)
      .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"))
      .orderBy(col("lang"), col("rk"))
  }

  def evalSample(spark: SparkSession, dir: String): DataFrame =
    evalSampleDocs(docs(spark, dir))

  /** Sequence packing, concat-then-chunk: concatenate each (language,
    * shard)'s documents in doc_id order and cut the token stream into
    * [[PackTokens]]-token training sequences. Each document lands in the
    * chunk range [seq_start, seq_end] of its shard's stream — the index
    * a sample loader needs to locate any document.
    *
    * Scale shape: the running-sum window is keyed by (lang, shard) where
    * shard = doc_id div [[PackShardDocs]] — NOT by lang alone, which at
    * any corpus size funnels a 5-language corpus through 5 reducers
    * (VERDICT r5-r7 "weak spot" L10). Chunk numbering only needs to be
    * dense within a shard, never global, so packing is embarrassingly
    * parallel across shards: chunk ids are shard-prefixed
    * (`shard << 32 | local`), trading global density for a window whose
    * key cardinality GROWS with the corpus. A production corpus would
    * raise [[PackShardDocs]] so a shard ≈ one writer task's output (the
    * knob is one val); 128 keeps several shards live even at sf0.001 so
    * the cross-shard boundary semantics stay oracle-tested.
    */
  def packSequencesDocs(docsDf: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docsDf
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("shard", expr(s"doc_id div $PackShardDocs"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
        expr(s"shiftleft(shard, 32) + (cum - n_tokens) div $PackTokens")
          .as("seq_start"),
        expr(s"shiftleft(shard, 32) + (cum - 1) div $PackTokens")
          .as("seq_end"))
      .orderBy(col("doc_id"))
  }

  def packSequences(spark: SparkSession, dir: String): DataFrame =
    packSequencesDocs(docs(spark, dir))

  /** L56/q153: PACKING-EFFICIENCY report — the padding-waste metric for
    * q76's concat-then-chunk layout: per language, shard count, token
    * volume, chunk count, padded tokens, and fill as a micro fraction.
    * Padding is paid GPU time — a language whose shards end half-empty
    * (many tiny shards, or one straggler doc per shard) burns that
    * fraction of every training step it appears in; the fix is raising
    * [[PackShardDocs]] for that slice, and this table says when. Shares
    * q76's exact constants and shard rule, so it reports the REAL
    * layout, not an estimate.
    *
    * Scale shape: one (lang, shard) partial-aggregating rollup + a
    * |langs|-sized final aggregate; exact integer arithmetic — ceil
    * via (n + k-1) div k, so no doubles anywhere. */
  def packingEfficiencyDocs(docsDf: DataFrame): DataFrame = {
    val perShard = docsDf
      .select(col("lang"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"),
        expr(s"doc_id div $PackShardDocs").as("shard"))
      .groupBy(col("lang"), col("shard"))
      .agg(sum(col("n_tokens")).as("stok"))
      .withColumn("chunks",
        expr(s"(stok + ${PackTokens - 1}) div $PackTokens"))
    perShard.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_shards"), sum(col("stok")).as("n_tokens"),
        sum(col("chunks")).as("n_chunks"))
      .select(col("lang"), col("n_shards"), col("n_tokens"),
        col("n_chunks"),
        expr(s"n_chunks * $PackTokens - n_tokens").as("pad_tokens"),
        expr(s"n_tokens * 1000000L div (n_chunks * $PackTokens)")
          .as("fill_micro"))
      .orderBy(col("lang"))
  }

  def packingEfficiency(spark: SparkSession, dir: String): DataFrame =
    packingEfficiencyDocs(docs(spark, dir))

  /** Per-document repetition / quality metrics in the style of the
    * published Gopher quality rules (Rae et al. 2021 §A1.1): type-token
    * ratio, most-frequent-word mass, and duplicate-bigram mass, plus a
    * threshold flag. Repetitious documents are the single biggest
    * quality problem in web-scale training corpora, and these three
    * metrics are the standard cheap detectors.
    *
    * Scale shape: one narrow projection — every metric is a per-row
    * lambda over the split word array (bound ONCE via the
    * transform-array idiom; see gramsExpr), so there is no explode, no
    * shuffle, and the operator is embarrassingly parallel at any corpus
    * size. The top-word count is O(distinct·words) per row, which is
    * the right trade below ~10k words/doc; a mega-doc corpus would
    * explode+count instead (same numbers, one extra shuffle).
    */
  def repetitionStatsDocs(docsDf: DataFrame): DataFrame = {
    val stats = expr(
      "transform(array(split(text, '\\\\s+')), w -> struct(" +
        " size(w) AS n_words," +
        " size(array_distinct(w)) AS n_distinct," +
        " array_max(transform(array_distinct(w)," +
        "   d -> size(filter(w, x -> x = d)))) AS top_freq," +
        " if(size(w) >= 2, array(" +
        "   size(w) - 1," +
        "   size(array_distinct(transform(sequence(0, size(w)-2)," +
        "     i -> concat(w[i], ' ', w[i+1]))))), array(0, 0)) AS bi))[0]")
    docsDf
      .select(col("doc_id"), stats.as("s"))
      .select(
        col("doc_id"),
        col("s.n_words").cast("long").as("n_words"),
        round(col("s.n_distinct").cast("double") / col("s.n_words"), 6)
          .as("type_token_ratio"),
        round(col("s.top_freq").cast("double") / col("s.n_words"), 6)
          .as("top_word_ratio"),
        when(col("s.bi")(0) > 0,
          round(lit(1.0) - col("s.bi")(1).cast("double") / col("s.bi")(0), 6))
          .otherwise(0.0).as("dup_bigram_ratio"))
      .withColumn("quality_flag",
        when(col("top_word_ratio") > 0.2 || col("dup_bigram_ratio") > 0.4,
          "repetitive").otherwise("ok"))
      .orderBy(col("doc_id"))
  }

  def repetitionStats(spark: SparkSession, dir: String): DataFrame =
    repetitionStatsDocs(docs(spark, dir))

  /** PII patterns: simple-ASCII email and NNN-NNN-NNNN phone. Kept to
    * syntax Java regex and RE2 (DuckDB) interpret identically — char
    * classes and bounded repetition only, no backrefs or lookaround. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII scrub: detect emails/phones, replace them with placeholder
    * tokens, and report per-doc counts plus a residual self-check
    * (PII matches remaining AFTER redaction — must be 0). Emits only
    * docs that contained PII.
    *
    * Scale shape: pure per-row regex projection + filter — no shuffle
    * except the output ORDER BY. At 100 TB the regex cost is the whole
    * cost, so patterns stay anchored-free and backtracking-free.
    */
  def piiScrubDocs(docsDf: DataFrame): DataFrame = {
    // patterns go through the typed API (lit), NOT expr(): Spark's SQL
    // string-literal parser strips unrecognized escapes, so '\.' inside
    // an expr() string silently becomes the any-char '.'
    def matches(c: Column, re: String): Column =
      size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
    val redacted = regexp_replace(
      regexp_replace(col("text"), EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
    docsDf
      .select(
        col("doc_id"),
        matches(col("text"), EmailRe).as("n_emails"),
        matches(col("text"), PhoneRe).as("n_phones"),
        redacted.as("redacted"))
      .filter(col("n_emails") + col("n_phones") > 0)
      .select(
        col("doc_id"), col("n_emails"), col("n_phones"),
        length(col("redacted")).cast("long").as("redacted_chars"),
        (matches(col("redacted"), EmailRe) +
          matches(col("redacted"), PhoneRe)).as("residual_pii"))
      .orderBy(col("doc_id"))
  }

  /** q79 fixture: the shipped documents are digit-free word streams
    * (verified — no [0-9] anywhere), so PII is seeded deterministically
    * from doc_id: every 7th doc gains an email, every 11th a phone
    * number. The oracle replays the identical seeding. */
  def seedPii(docsDf: DataFrame): DataFrame =
    docsDf.select(
      col("doc_id"),
      concat(
        col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(""),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise("")).as("text"))

  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    piiScrubDocs(seedPii(docs(spark, dir)))

  /** Model-based quality filtering (the CCNet/DCLM-style classifier
    * stage): score every document with a hashed linear model — each
    * token hashes to a signed integer weight, the document score is the
    * exact integer sum, and the keep/drop decision thresholds the
    * normalized mean. Here the per-feature weights are derived from a
    * salted md5 (so the DuckDB oracle recomputes them verbatim); in
    * production they come from a trained weight table shipped to every
    * executor — same plan either way, because the lookup is a pure
    * per-token function.
    *
    * Scale shape: one shuffle-free projection. The dot product is an
    * INTEGER sum (weights are 12-bit ints centered on 0), so the score
    * is bit-identical at any partition count or token order — the same
    * OracleParity argument as the money aggregates. The md5 runs once
    * per token via the lambda-bind idiom.
    */
  /** Shared q84/q122/q171 scoring projection — ONE definition per SALT
    * so a classifier and its consumers can never score differently:
    * doc_id, lang, source, n_tokens, score, mean_weight.
    * 12-bit hash weight in [-2048, 2047]: value of the first 3 hex
    * digits of md5(<salt> <token>), shifted. instr-on-hex-digit is
    * the portable hex→int (Spark conv() has no DuckDB twin). */
  private[graft] def qualityScoredDocs(docsDf: DataFrame): DataFrame =
    hashScoredDocs(docsDf, QualitySalt)

  /** Weight-table salts: each model FAMILY is the same hashed linear
    * scorer under a different salt — in production, a different trained
    * weight table shipped per model (quality, toxicity, ...); here the
    * salt is what makes the two models' weights independent. */
  private[graft] val QualitySalt = "graft-w:"
  private[graft] val ToxSalt = "graft-tox:"

  /** The per-row (n_tokens, score) scorer of [[hashScoredDocs]] as ONE
    * expression over `text` — exposed so a streaming stage can ride the
    * scorer inline on a frame that must keep its other columns (a
    * stream cannot self-join its own projection). */
  private[graft] def hashScoreStruct(salt: String): Column = {
    def hexAt(i: Int) =
      s"(instr('0123456789abcdef', substring(h, $i, 1)) - 1)"
    val weightOf =
      s"transform(w, t -> transform(array(md5(concat('$salt', t)))," +
        s" h -> ${hexAt(1)} * 256 + ${hexAt(2)} * 16 + ${hexAt(3)}" +
        s" - 2048)[0])"
    expr(
      "transform(array(split(text, '\\\\s+')), w -> struct(" +
        " size(w) AS n_tokens," +
        s" aggregate($weightOf, cast(0 as bigint)," +
        "   (acc, x) -> acc + x) AS score))[0]")
  }

  /** [[hashScoreStruct]]'s mean weight (the decision statistic), from
    * the already-projected struct column. */
  private[graft] def meanWeightOf(s: Column): Column =
    round(s.getField("score").cast("double") /
      (s.getField("n_tokens") * 2048.0), 6)

  private[graft] def hashScoredDocs(docsDf: DataFrame,
      salt: String): DataFrame = {
    // q84's contract never needed source; synthesize it when a caller
    // (tests) scores a source-less frame
    val src = if (docsDf.columns.contains("source")) docsDf
              else docsDf.withColumn("source", lit(""))
    src
      .select(col("doc_id"), col("lang"), col("source"),
        hashScoreStruct(salt).as("s"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("s.n_tokens").cast("long").as("n_tokens"),
        col("s.score").as("score"),
        meanWeightOf(col("s")).as("mean_weight"))
  }

  /** q84's operating point: the corpus MEDIAN of the hashed weight
    * table's mean_weight (≈ −0.15 at every test SF). A raw weight
    * table has no reason to center on zero — the round-9 constant
    * `>= 0` silently kept only ~2% of docs, which degenerated every
    * downstream funnel/ingest demo to a near-empty kept set. A trained
    * classifier's threshold is likewise CALIBRATED on held-out data,
    * never assumed; "keep the top half" is the documented contract. */
  val QualityThreshold = -0.15

  def qualityClassifierDocs(docsDf: DataFrame): DataFrame =
    qualityScoredDocs(docsDf)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("score"),
        col("mean_weight"))
      .withColumn("decision",
        when(col("mean_weight") >= QualityThreshold, "keep")
          .otherwise("drop"))
      .orderBy(col("doc_id"))

  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    qualityClassifierDocs(docs(spark, dir))

  /** Toxicity decision threshold on the mean hashed weight: unlike
    * quality (which drops the BOTTOM half at its calibrated median),
    * a safety filter flags the HIGH tail — 0.28 sits between the
    * corpus p85 and p95 under the [[ToxSalt]] weights at both test
    * SFs, the ~10% drop rate a production toxicity stage runs at. */
  val ToxicityThreshold = 0.28

  /** L73/q171: TOXICITY classifier — the second model family of the
    * funnel (VERDICT r9 "Next round" #9): the exact q84 hashed-linear
    * scorer shape under an independent weight table ([[ToxSalt]] — in
    * production, a trained safety model's weights), thresholded on the
    * HIGH tail: a doc whose mean weight clears [[ToxicityThreshold]] is
    * `toxic`, everything else `clean`. Same scale shape as q84: one
    * shuffle-free projection, exact integer token-weight sum, the mean
    * the only double (6-dp rounded).
    *
    * Wired as the SIXTH funnel stage (q115/q157) and the last
    * DailyIngest gate, so the safety drop is accounted per first
    * failing gate like every other stage. */
  def toxicityClassifierDocs(docsDf: DataFrame): DataFrame =
    hashScoredDocs(docsDf, ToxSalt)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("score"),
        col("mean_weight"))
      .withColumn("decision",
        when(col("mean_weight") >= ToxicityThreshold, "toxic")
          .otherwise("clean"))
      .orderBy(col("doc_id"))

  def toxicityClassifier(spark: SparkSession, dir: String): DataFrame =
    toxicityClassifierDocs(docs(spark, dir))

  /** q174's threshold grid in micro units: −0.40 … 0.50 step 0.05 —
    * spans both shipped operating points with margin on each side. */
  private[operators] val SweepThresholds: Seq[Long] =
    (-8 to 10).map(_ * 50000L)

  /** L75/q174: classifier OPERATING-CURVE sweep — per model family and
    * candidate threshold, the doc count and pass rate. The table a data
    * lead reads to SET an operating point ([[QualityThreshold]] /
    * [[ToxicityThreshold]]) instead of assuming one: this round's q84
    * calibration bug (a `>= 0` constant silently keeping 2% of docs)
    * is exactly the failure this report makes impossible to miss — the
    * zero row would have read `24000 micro`, not the documented "top
    * half". Sweeping BOTH families in one frame also shows the two
    * weight tables' distributions side by side (they differ only by
    * salt, so any rate gap at a shared threshold is the model, not the
    * corpus).
    *
    * Scale shape: one scan per model family (the q84 shuffle-free
    * scoring projection), a 19-int explode per slim (model,
    * mean_weight) row that partial-aggregates immediately to
    * 2·|grid| groups — text dies at the scan, the shuffle carries 38
    * rows. Rates are exact integer micro units. */
  def thresholdSweepDocs(docsDf: DataFrame): DataFrame = {
    def leg(salt: String, model: String) =
      hashScoredDocs(docsDf, salt)
        .select(lit(model).as("model"), col("mean_weight"))
    leg(QualitySalt, "quality")
      .unionByName(leg(ToxSalt, "toxicity"))
      .select(col("model"), col("mean_weight"),
        explode(lit(SweepThresholds.toArray)).as("threshold_micro"))
      .groupBy(col("model"), col("threshold_micro"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("mean_weight") >=
          col("threshold_micro").cast("double") / 1000000.0, 1))
          .as("n_above"))
      .withColumn("above_micro", expr("n_above * 1000000L div n_docs"))
      .orderBy(col("model"), col("threshold_micro"))
  }

  def thresholdSweep(spark: SparkSession, dir: String): DataFrame =
    thresholdSweepDocs(docs(spark, dir))

  /** Per-source calibration percentile for q122: the bottom
    * [[CalibPct]] of each source's docs fall below its cutoff. */
  val CalibPct = 0.30

  /** L34/q122: per-source quality-threshold CALIBRATION — the step a
    * real curation run performs between scoring (q84) and filtering:
    * one global cutoff over-prunes clean sources and under-prunes noisy
    * ones, so the keep/drop threshold is calibrated per source at the
    * [[CalibPct]] score percentile (every source sheds its own worst
    * tail). Reports, per source, the calibrated cutoff, doc count, and
    * survivors at that cutoff — the table a mixture designer reads
    * before q90/q116 reweighting.
    *
    * Determinism: mean_weight is q84's 6-dp-rounded double; the cutoff
    * is the exact interpolated percentile rounded to the same 6 dp
    * (Spark `percentile` and DuckDB `quantile_cont` share the (n-1)·p
    * rule — the q35 precedent), and the pass predicate compares the two
    * ROUNDED values, so both engines count identical survivors. Scale
    * shape: exact percentile buffers one source's scores per group —
    * bounded by docs-per-source; at 100 TB swap `percentile` for
    * `percentile_approx` (the q86 sketch pattern) and nothing else
    * changes. The cutoff table is |sources| rows and broadcasts back
    * for the survivor count. */
  def qualityCalibrationDocs(docsDf: DataFrame): DataFrame = {
    val s = qualityScoredDocs(docsDf)
    val cuts = s.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(expr(s"percentile(mean_weight, $CalibPct)"), 6).as("cutoff"))
    s.join(broadcast(cuts), Seq("source"))
      .groupBy(col("source"))
      .agg(first(col("n_docs")).as("n_docs"),
        first(col("cutoff")).as("cutoff"),
        count(when(col("mean_weight") >= col("cutoff"), 1)).as("n_pass"))
      .withColumn("pass_micro", expr("n_pass * 1000000L div n_docs"))
      .orderBy(col("source"))
  }

  def qualityCalibration(spark: SparkSession, dir: String): DataFrame =
    qualityCalibrationDocs(docs(spark, dir))

  /** Jaccard threshold above which a near-dup pair becomes a cluster
    * edge. */
  val ClusterThreshold = 0.5

  /** Near-dup cluster formation: connected components over an
    * undirected pair graph, by iterative min-label propagation — each
    * round every node adopts the smallest label among itself and its
    * neighbors, converging in O(component diameter) rounds to
    * cluster_id = min doc_id of the component. This is the step a real
    * dedup pipeline needs between PAIRS (q64) and SURVIVORS: near-dup
    * similarity is not transitive, so survivor election must happen
    * per connected component, not per pair.
    *
    * Scale posture: each round is two hash joins + a min aggregation on
    * (id, label) pairs — all key-partitioned, no driver data except the
    * one-long convergence count per round. Rounds = component diameter,
    * and near-dup components are shallow (dups of a common source);
    * for adversarial long-chain graphs the public large-star/small-star
    * formulation (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC 2014) drops rounds to O(log n) with the same
    * per-round join shape. The iteration cap is a safety net, not a
    * correctness device — the loop exits on the first unchanged round.
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    // localCheckpoint (eager) after every round: persist alone keeps the
    // DATA hot but the logical plan still nests one union+aggregate per
    // round, and Catalyst re-analysis of that growing tree dominates an
    // iterative loop within a handful of rounds (measured: a 12-round
    // toy graph analysis-stalled for minutes). Checkpointing truncates
    // lineage so every round plans against a flat scan; on a cluster the
    // same code uses reliable checkpoint() to a DFS dir for fault
    // tolerance.
    val sym = edges
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val neighborMin = sym.join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("label"))
      val next = labels.select(col("id"), col("label"))
        .union(neighborMin)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).count()
      labels = next
      rounds += 1
    }
    // stale labels would silently mislabel clusters downstream — fail loud
    require(changed == 0,
      s"connectedComponents did not converge within $rounds rounds")
    withClusterSizes(
      labels.select(col("id").as("doc_id"), col("label").as("cluster_id")))
  }

  /** Cluster sizing for a (doc_id, cluster_id) membership frame via a
    * partial-aggregating `groupBy(cluster_id).agg(count)` + join-back —
    * NEVER `count().over(Window.partitionBy(cluster_id))`: a web-scale
    * dedup's raison d'être is mega-clusters, and a cluster_id-keyed
    * window funnels every member of one through a single reducer, while
    * the aggregate map-side-combines it to one row per task and the
    * join-back is AQE-skew-splittable (the q89 segment-keeper / q91
    * election argument, applied to the CC family — VERDICT r5/r6
    * "What's wrong" #1). PlanAuditSpec asserts q77/q85/q88 window-free.
    */
  private def withClusterSizes(members: DataFrame): DataFrame = {
    val sizes = members.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    members.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  /** q77: components of the q64 near-dup graph at jaccard ≥ 0.5. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    connectedComponents(
      LLMQueries.minhashPairs(spark, dir)
        .filter(col("jaccard") >= ClusterThreshold)
        .select(col("doc_a"), col("doc_b")))

  /** Connected components via alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the adversarial-diameter scale path that
    * [[connectedComponents]]'s min-label propagation is not: rounds are
    * O(log n) in the component size instead of O(diameter), so a
    * pathological million-node chain converges in ~20 rounds, not a
    * million. Each round is two groupBy-min aggregations and two
    * key-partitioned joins over the canonical (larger → smaller) edge
    * set; no driver data except the convergence counts.
    *
    * Returns the same (doc_id, cluster_id, cluster_size) frame as the
    * propagation variant, plus the round count for diameter tests.
    */
  def connectedComponentsStar(edges: DataFrame): (DataFrame, Int) = {
    // canonical undirected edges, larger endpoint first
    var e = edges.select(
      greatest(col("doc_a"), col("doc_b")).as("u"),
      least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var rounds = 0
    var done = false
    // carried across rounds: last round's `next.count()` is this round's
    // |e|, so convergence costs ONE count action per round, not two
    var eCount = e.count()
    while (!done && rounds < 50) {
      // large-star: every neighbor LARGER than u links to
      // min(Γ(u) ∪ {u}); each undirected edge is seen once from its
      // smaller endpoint
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val minsL = sym.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      val large = sym.join(minsL, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // small-star: all (smaller) neighbors of u and u itself link to
      // the minimum of the star
      val minsS = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = large.join(minsS, "u").where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(minsS.select(col("u"), col("m").as("v")))
        .distinct().localCheckpoint()
      // converged ⟺ next == e as sets; both are distinct, so equal counts
      // + empty one-sided difference suffice. The difference is a plain
      // left-anti hash join (cheaper than EXCEPT's set op) and only runs
      // when the counts already match — the propagation loop's
      // changed-count idiom, applied to edge sets.
      val nextCount = next.count()
      done = nextCount == eCount &&
        next.join(e, Seq("u", "v"), "left_anti").isEmpty
      eCount = nextCount
      e = next
      rounds += 1
    }
    // the star-forest extraction below ASSUMES convergence: on a
    // non-converged edge set a node can hold several out-edges and the
    // labels would be silently wrong — fail loud instead
    require(done,
      s"connectedComponentsStar did not converge within $rounds rounds")
    // converged edge set is a star forest: u → component min; roots
    // (the mins) have no outgoing edge
    val roots = e.select(col("v")).distinct()
      .join(e.select(col("u")).distinct(),
        col("v") === col("u"), "left_anti")
      .select(col("v").as("doc_id"), col("v").as("cluster_id"))
    val labels = e.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .union(roots)
    (withClusterSizes(labels), rounds)
  }

  /** q85: q77's cluster formation on the O(log n)-round star algorithm —
    * same pair graph, same oracle, different (scale-proof) iteration. */
  def dedupClustersStar(spark: SparkSession, dir: String): DataFrame =
    connectedComponentsStar(
      LLMQueries.minhashPairs(spark, dir)
        .filter(col("jaccard") >= ClusterThreshold)
        .select(col("doc_a"), col("doc_b")))._1

  /** L38/q129: cluster-aware (leakage-proof) train/val/test split —
    * the ML-hygiene fix q75's doc-hash split cannot give: hashing PER
    * DOCUMENT puts ~2·p·(1−p) of every near-dup pair across the
    * train/eval boundary, and evaluating on a near-copy of a training
    * doc is the contamination q74 exists to catch. Here the split hash
    * is keyed by the near-dup CLUSTER id (q85's star CC; singletons are
    * their own cluster), so an entire duplicate family lands on one
    * side of every boundary by construction. Same salted-md5 threshold
    * rule as q75 — deterministic under reruns, repartitions and
    * appends (a new member joins its family's existing split).
    *
    * Scale shape: the CC is q85's O(log n)-round star path; the split
    * itself adds one left join against the (paired-docs-only) cluster
    * map and a per-row hash — no new shuffle class. */
  def clusterSplit(spark: SparkSession, dir: String): DataFrame = {
    val comp = dedupClustersStar(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val h = substring(md5(concat(lit("graft-csplit:"),
      col("cluster_id").cast("string"))), 1, 8)
    docs(spark, dir).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(h < "cccccccc", "train")
          .when(h < "e6666666", "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))
  }

  /** q88: the END of the near-dup pipeline — one canonical survivor per
    * connected component, electing the max-quality member (q71's rule)
    * with doc_id as the deterministic tie-break. Composes pairs (q64) →
    * clusters (q85's star CC) → survivors in a single query; everything
    * downstream of clustering is one partial-aggregating groupBy over
    * cluster_id, so survivor election adds exactly one key-partitioned
    * shuffle at any corpus size — and a mega-cluster map-side-combines
    * under it instead of funneling through one window reducer.
    */
  def clusterSurvivors(spark: SparkSession, dir: String): DataFrame =
    electSurvivors(dedupClustersStar(spark, dir),
      docs(spark, dir)
        .select(col("doc_id"), LLMQueries.qualityExpr.as("quality")))

  /** Survivor election: max quality wins per cluster, min doc_id breaks
    * ties. ONE partial-aggregating groupBy (`max(struct(quality,
    * -doc_id))` ⟺ max quality, min doc_id tie-break — the q71/q91
    * election), NOT a cluster_id-keyed `row_number` window: a
    * mega-cluster map-side-combines under the aggregate where a window
    * would single-reduce every member (see [[withClusterSizes]]).
    * cluster_size rides along via `max` — it is constant per cluster. */
  private[graft] def electSurvivors(clusters: DataFrame,
      scored: DataFrame): DataFrame =
    clusters.join(scored, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("nid"))).as("best"),
        max(col("cluster_size")).as("cluster_size"))
      .select(col("cluster_id"), (-col("best.nid")).as("kept_id"),
        col("best.quality").as("quality"), col("cluster_size"))
      .orderBy(col("kept_id"))

  /** L76/q175: incremental near-dup CLUSTER maintenance — the text-side
    * twin of q104's contracted merge, closing the text dedup lifecycle:
    * q96 gives the daily PAIRS, but a pipeline serves cluster LABELS
    * (q129's split keys on them, q88 elects within them), and
    * re-running q85's CC over a 100 TB corpus nightly is exactly the
    * rescan the persisted indexes exist to avoid. Given the persisted
    * signature tables and the persisted label table, emit every member
    * of every cluster the FULL q77/q85 pass over corpus ∪ batch would
    * form that contains ≥ 1 batch doc — without re-pairing or
    * re-clustering the corpus.
    *
    * Mechanics: (1) q96's incremental verified pairs (every pair has a
    * batch endpoint by construction); (2) corpus endpoints CONTRACT to
    * their persisted label (or themselves if unclustered) — corpus-
    * corpus connectivity is already fully inside the label table,
    * because banding is per-doc and corpus-corpus candidates are
    * batch-independent; (3) star-CC over the contracted BATCH-SIZED
    * graph — a batch doc bridging two corpus clusters merges them here,
    * whole clusters moving as single nodes; (4) members re-enumerate
    * from the label table only for touched clusters. Daily cost is
    * O(batch + candidate pairs + touched-cluster members).
    *
    * The label table is the persisted artifact (IndexStore `text_cc`);
    * its compaction (relabel touched + append new members) equals a
    * from-scratch rebuild — spec-pinned, same contract as every index
    * family. */
  def incrementalDedupClusters(bandsC: DataFrame, setsC: DataFrame,
      ccC: DataFrame, newDocs: DataFrame): DataFrame =
    withClusterSizes(incrementalClusterMembers(bandsC, setsC, ccC, newDocs))

  /** The (doc_id, cluster_id) membership rows of batch-touched clusters
    * — shared by the q175 report and the `text_cc` compaction. */
  private[operators] def incrementalClusterMembers(bandsC: DataFrame,
      setsC: DataFrame, ccC: DataFrame, newDocs: DataFrame): DataFrame = {
    val pairs = LLMQueries.incrementalNearDups(bandsC, setsC, newDocs)
      .filter(col("jaccard") >= ClusterThreshold)
      .select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .join(ccC.select(col("doc_id").as("doc_a"),
        col("cluster_id").as("la")), Seq("doc_a"), "left")
      .join(ccC.select(col("doc_id").as("doc_b"),
        col("cluster_id").as("lb")), Seq("doc_b"), "left")
      .select(coalesce(col("la"), col("doc_a")).as("doc_a"),
        coalesce(col("lb"), col("doc_b")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
    // contracted CC: nodes are labels, batch ids, and corpus singleton
    // endpoints — batch-sized by the q96 candidate contract
    val comps = connectedComponentsStar(edges)._1
      .select(col("doc_id").as("node"), col("cluster_id").as("tmp"))
    // the merged cluster id is min(node): every label IS its cluster's
    // min member id, every raw node its own id
    val nodeMap = comps
      .join(comps.groupBy(col("tmp")).agg(min(col("node")).as("new_id")),
        Seq("tmp"))
      .select(col("node"), col("new_id"))
      .localCheckpoint(eager = false) // feeds member + anti join-backs
    // ONE broadcast-probed corpus scan enumerates touched-cluster
    // members; which nodes matched a label falls out of the same rows,
    // so the raw-node (batch doc / corpus singleton) anti-join runs
    // over two BATCH-sized frames — the daily path never shuffles the
    // corpus label table (an earlier draft anti-joined nodeMap against
    // a distinct() of every corpus label: a corpus-wide exchange per
    // day, the exact cost the persisted index exists to avoid)
    val labelHits = ccC
      .join(broadcast(nodeMap.withColumnRenamed("node", "cluster_id")),
        Seq("cluster_id"))
      .localCheckpoint(eager = false) // feeds members + touched labels
    val touchedLabels = labelHits
      .select(col("cluster_id").as("node")).distinct()
    val rawMembers = nodeMap
      .join(touchedLabels, Seq("node"), "left_anti")
      .select(col("node").as("doc_id"), col("new_id"))
    labelHits.select(col("doc_id"), col("new_id"))
      .unionByName(rawMembers)
      .select(col("doc_id"), col("new_id").as("cluster_id"))
  }

  /** q175 as an oracle query: corpus-side tables built in-query over
    * the q96 universe (corpus = doc_id % 10 ≠ 0, batch = the rest). */
  def incrementalDedupClustersDaily(spark: SparkSession,
      dir: String): DataFrame = {
    val d = docs(spark, dir)
    val corpus = d.filter(col("doc_id") % 10 =!= 0)
    val batch = d.filter(col("doc_id") % 10 === 0)
    val (bandsC, setsC) = LLMQueries.signatureTables(corpus)
    val ccC = connectedComponentsStar(
      LLMQueries.minhashPairsOf(corpus)
        .filter(col("jaccard") >= ClusterThreshold)
        .select(col("doc_a"), col("doc_b")))._1
      .select(col("doc_id"), col("cluster_id"))
    incrementalDedupClusters(bandsC, setsC, ccC, batch)
  }

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
  private val segArrExpr = expr(
    "transform(array(split(text, '\\\\s+'))," +
      s" w -> transform(sequence(0, cast(ceil(size(w) / ${SegWords}.0d)" +
      s" as int) - 1), i -> concat_ws(' ', slice(w, i * $SegWords + 1," +
      s" $SegWords))))[0]")

  /** (doc_id, n_segs, pos, seg) — one row per segment occurrence. */
  private def segRows(docsDf: DataFrame): DataFrame =
    docsDf
      .select(col("doc_id"), segArrExpr.as("sl"))
      .select(col("doc_id"), size(col("sl")).cast("long").as("n_segs"),
        posexplode(col("sl")))
      .toDF("doc_id", "n_segs", "pos", "seg")

  /** Reassemble docs from their surviving segment occurrences: count +
    * in-order concat via conditional aggregation, so docs whose EVERY
    * segment is a duplicate survive with empty text. */
  private def reassemble(marked: DataFrame): DataFrame =
    marked
      .groupBy(col("doc_id"))
      .agg(first(col("n_segs")).as("n_segs"),
        count(when(col("kept"), 1)).as("n_kept"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(CASE WHEN kept THEN" +
            " struct(pos, seg) END)), s -> s.seg)")).as("cleaned_text"))
      .orderBy(col("doc_id"))

  def segmentDedupDocs(docsDf: DataFrame): DataFrame = {
    val segs = segRows(docsDf)
    val keepers = segs.groupBy(col("seg"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("kp"))
    reassemble(segs.join(keepers, Seq("seg"))
      .withColumn("kept",
        col("doc_id") === col("kp.doc_id") && col("pos") === col("kp.pos")))
  }

  /** The persisted corpus segment index for [[incrementalSegmentDedup]]:
    * one row per distinct segment seen in the corpus. Presence is all the
    * incremental pass needs (corpus keepers beat any batch occurrence),
    * so the index is a single string column — compact to store and to
    * anti-join against. */
  def segmentIndex(docsDf: DataFrame): DataFrame =
    segRows(docsDf).select(col("seg")).distinct()

  /** Incremental segment dedup: clean an incoming batch against a
    * persisted corpus segment index WITHOUT re-reading corpus text —
    * same daily-ingest contract as [[graft.operators.LLMQueries
    * .incrementalExactDedup]]/incrementalNearDups, completing the
    * incremental family at sub-document granularity. A batch segment
    * occurrence survives iff its segment is absent from the corpus
    * index AND it is the batch-wide first occurrence. Equals the full
    * pass restricted to the batch whenever batch doc_ids sort after
    * corpus doc_ids (the append-only id discipline the other
    * incremental operators already assume); the invariant is asserted
    * in CurationQueriesSpec. Daily cost: O(batch) segment rows through
    * one aggregate plus one seg-keyed join against the index.
    */
  def incrementalSegmentDedup(corpusSegs: DataFrame,
      newDocs: DataFrame): DataFrame = {
    val segs = segRows(newDocs)
    val batchKeepers = segs.groupBy(col("seg"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("kp"))
    reassemble(segs
      .join(batchKeepers, Seq("seg"))
      .join(corpusSegs.select(col("seg"), lit(true).as("known")),
        Seq("seg"), "left")
      .withColumn("kept",
        col("known").isNull &&
          col("doc_id") === col("kp.doc_id") && col("pos") === col("kp.pos")))
  }

  def segmentDedup(spark: SparkSession, dir: String): DataFrame =
    segmentDedupDocs(docs(spark, dir))

  /** A segment is boilerplate within its source iff it occurs in at
    * least this many distinct documents of that source (L32/q120). */
  val BoilerplateMinDocs = 2

  /** L32: per-source BOILERPLATE removal — the CCNet/jusText cleaning
    * pass, distinct from q89's dedup in both criterion and effect:
    * dedup keeps the corpus-wide FIRST copy of any repeated segment,
    * while boilerplate removal targets segments frequent WITHIN ONE
    * SOURCE (nav bars, cookie banners, site footers — document-frequency
    * ≥ [[BoilerplateMinDocs]] in that source) and cuts them from EVERY
    * member document: a site's footer should survive in zero documents,
    * not one. Source-scoping is what keeps a phrase that is merely
    * common across the whole web from being treated as template markup.
    *
    * Scale shape: the (source, seg) document-frequency comes from one
    * partial-aggregating two-phase count-distinct — a hot footer
    * collapses map-side per task instead of funnelling through a
    * window reducer; the boilerplate set (DF-filtered) is far smaller
    * than the segment universe and the join back on (source, seg) is
    * AQE-skew-splittable; reassembly is q89's conditional aggregation,
    * so an all-boilerplate doc survives with empty text. Shuffles carry
    * ids and [[SegWords]]-word segments, never documents. */
  def boilerplateRemoveDocs(docsDf: DataFrame): DataFrame = {
    // source rides through the explode — no join back to the docs table
    val segs = docsDf
      .select(col("doc_id"), col("source"), segArrExpr.as("sl"))
      .select(col("doc_id"), col("source"),
        size(col("sl")).cast("long").as("n_segs"), posexplode(col("sl")))
      .toDF("doc_id", "source", "n_segs", "pos", "seg")
    val bp = segs.groupBy(col("source"), col("seg"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= BoilerplateMinDocs)
      .select(col("source"), col("seg"), lit(true).as("bp"))
    reassemble(segs.join(bp, Seq("source", "seg"), "left")
      .withColumn("kept", col("bp").isNull))
  }

  def boilerplateRemove(spark: SparkSession, dir: String): DataFrame =
    boilerplateRemoveDocs(docs(spark, dir))

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

  /** (doc_id, w) — one row per [[winsExpr]] window occurrence; shared
    * by q114's stats, the q156 incremental report and q158 novelty. */
  private def winRows(docsDf: DataFrame): DataFrame =
    docsDf
      .select(col("doc_id"), posexplode(winsExpr))
      .select(col("doc_id"), col("col").as("w"))

  /** L15b: cross-document exact-SUBSTRING duplication stats — the
    * sliding-window flavor of dedup (public precedent: "Deduplicating
    * Training Data Makes Language Models Better", Lee et al. 2022,
    * which dedups on ≥k-token substrings): q89's consecutive segments
    * miss a duplicated passage that straddles a segment boundary, while
    * EVERY [[DupWinWords]]-word window of a copied passage matches here
    * regardless of alignment. Reported per document: window count,
    * windows whose exact text recurs in ≥2 distinct documents, and the
    * duplicated fraction in integer micro-units — the statistic a
    * curation pass thresholds on.
    *
    * Scale shape: the window explode is the corpus × ~words/doc row
    * stream every substring dedup pays; duplicated grams come from ONE
    * partial-aggregating `groupBy(w)` (map-side combined — a hot
    * boilerplate gram collapses per task, the q89 keeper argument), and
    * the join back is gram-keyed and AQE-skew-splittable. Short docs
    * (< window) surface with zero windows via the left join from the
    * documents table, not a post-hoc union. */
  def substringDupStatsDocs(docsDf: DataFrame): DataFrame = {
    val wins = winRows(docsDf)
    val dupGrams = wins.groupBy(col("w"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("w"))
    val perDoc = wins
      .join(dupGrams.withColumn("dup", lit(1)), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_win"),
        count(col("dup")).as("n_dup"))
    docsDf.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_win"), lit(0L)).as("n_win"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_micro",
        when(col("n_win") === 0, lit(0L))
          .otherwise(expr("n_dup * 1000000L div n_win")))
      .orderBy(col("doc_id"))
  }

  /** L15c: cross-document duplicated-SPAN removal — the second half of
    * Lee et al. 2022's substring dedup: q114 measures duplication,
    * this operator REWRITES the corpus with every duplicated span cut
    * out. A word position is covered iff any [[DupWinWords]]-window
    * containing it recurs verbatim in ≥ 2 distinct documents; the
    * cleaned document keeps exactly its uncovered words, in order
    * (so a passage pasted into two documents disappears from both —
    * the symmetric variant; keep-first needs only q89's min-struct
    * keeper added to the dup-gram aggregate).
    *
    * Scale shape: the gram aggregate is q114's (partial-aggregated,
    * hot grams collapse map-side); coverage fans each duplicated
    * window into [[DupWinWords]] slim (doc_id, wp) rows — O(dup
    * windows), not O(corpus windows); reassembly is q89's conditional
    * aggregation over the word explode. Everything shuffles ids and
    * single words, never documents.
    */
  def substringDupRemoveDocs(docsDf: DataFrame): DataFrame = {
    val words = docsDf
      .select(col("doc_id"), split(col("text"), "\\s+").as("wa"))
    val wins = words.filter(size(col("wa")) >= DupWinWords)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(wa) - $DupWinWords)," +
          s" i -> concat_ws(' ', slice(wa, i + 1, $DupWinWords)))")))
      .select(col("doc_id"), col("pos"), col("col").as("w"))
    val dupGrams = wins.groupBy(col("w"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("w"))
    val covered = wins.join(dupGrams, Seq("w"))
      .select(col("doc_id"),
        explode(expr(s"sequence(pos, pos + ${DupWinWords - 1})")).as("wp"))
      .distinct()
    words
      .select(col("doc_id"), posexplode(col("wa")).as(Seq("wp", "word")))
      .join(covered.withColumn("cov", lit(1)), Seq("doc_id", "wp"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        count(col("cov")).as("n_removed"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(CASE WHEN cov IS NULL THEN" +
            " struct(wp, word) END)), s -> s.word)")).as("cleaned_text"))
      .orderBy(col("doc_id"))
  }

  def substringDupRemove(spark: SparkSession, dir: String): DataFrame =
    substringDupRemoveDocs(docs(spark, dir))

  def substringDupStats(spark: SparkSession, dir: String): DataFrame =
    substringDupStatsDocs(docs(spark, dir))

  /** The corpus substring-window index (IndexStore family
    * `substr_windows`): one (window md5, distinct-corpus-doc count)
    * row per known window — 16+8 bytes/row, window text never
    * persists. */
  def substrWindowIndex(corpusDocs: DataFrame): DataFrame =
    substrWindowIndexFrom(docWindows(corpusDocs))

  /** [[substrWindowIndex]] over a precomputed [[docWindows]] frame. */
  def substrWindowIndexFrom(windows: DataFrame): DataFrame =
    windows.groupBy(col("wh"))
      .agg(countDistinct(col("doc_id")).as("nd"))

  /** The (doc_id, wh) window rows of a document frame — the ONE
    * window-explode pass a daily run needs: both reports and the index
    * persistence consume it ([[DailyIngest]] computes it once per day,
    * checkpointed; it was being paid three times, and the window
    * explode dominates the batch-side index persistence in IngestSoak's
    * delta-write leg). */
  def docWindows(docsDf: DataFrame): DataFrame =
    winRows(docsDf).select(col("doc_id"), md5(col("w")).as("wh"))

  /** L59/q156: incremental SUBSTRING-DUP report — the daily-ingest
    * rendering of the one dedup family whose full pass (q119) must
    * rewrite CORPUS docs too: a batch window colliding with a single
    * corpus doc makes BOTH newly duplicated. The daily report
    * therefore splits each batch doc's duplicated windows into KNOWN
    * (corpus-side count already ≥ 2 — the corpus rewrite covers them)
    * and NEWLY duplicated (the batch's arrival created the collision —
    * these flag corpus docs for the next q119 re-clean). n_known +
    * n_newly equals the full q114 count over (corpus ∪ batch)
    * restricted to batch docs, which is what the oracle checks.
    * Daily cost: O(batch windows) against the persisted index. */
  /** Per-wh corpus totals restricted to the windows the batch touches —
    * the only rows either report reads. Accepts BOTH index layouts: a
    * compacted snapshot (one row per wh) and the DELTA layout (one
    * partial (wh, nd) row per generation — [[DailyIngest.runDelta]]);
    * the aggregation runs AFTER the batch-bounded semi-join, so totals
    * cost O(batch windows), never a corpus-wide shuffle. Corpus and
    * batch doc ids are disjoint, so partial distinct-doc counts ADD. */
  private def touchedWins(corpusWins: DataFrame,
      batchWins: DataFrame): DataFrame =
    // no broadcast hint: batch windows range from thousands (sf0.001)
    // to millions (soak) of md5 keys — AQE broadcasts when they fit
    // and falls back to the same shuffle the pre-delta report paid
    corpusWins
      .join(batchWins.select(col("wh")).distinct(), Seq("wh"), "left_semi")
      .groupBy(col("wh")).agg(sum(col("nd")).as("nd"))

  def incrementalSubstringReport(corpusWins: DataFrame,
      newDocs: DataFrame): DataFrame =
    incrementalSubstringReportFrom(corpusWins, newDocs,
      // feeds the batch-side distinct count AND the per-doc rollup —
      // different subplans, so exchange reuse can't dedupe the explode
      docWindows(newDocs).localCheckpoint(eager = false))

  /** [[incrementalSubstringReport]] over a precomputed (reusable)
    * [[docWindows]] frame of the batch. */
  def incrementalSubstringReportFrom(corpusWins: DataFrame,
      newDocs: DataFrame, batchWins: DataFrame): DataFrame = {
    val bw = batchWins
    val bnd = bw.groupBy(col("wh"))
      .agg(countDistinct(col("doc_id")).as("bnd"))
    val status = bnd.join(touchedWins(corpusWins, bw), Seq("wh"), "left")
      .select(col("wh"), coalesce(col("nd"), lit(0L)).as("cnd"),
        col("bnd"))
      .withColumn("known", col("cnd") >= 2)
      .withColumn("newly", !(col("cnd") >= 2) && col("cnd") + col("bnd") >= 2)
    val perDoc = bw.join(status, Seq("wh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_win"),
        count(when(col("known"), 1)).as("n_known_dup"),
        count(when(col("newly"), 1)).as("n_newly_dup"))
    newDocs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_win"), lit(0L)).as("n_win"),
        coalesce(col("n_known_dup"), lit(0L)).as("n_known_dup"),
        coalesce(col("n_newly_dup"), lit(0L)).as("n_newly_dup"))
      .withColumn("dup_micro",
        when(col("n_win") === 0, lit(0L)).otherwise(
          expr("(n_known_dup + n_newly_dup) * 1000000L div n_win")))
      .orderBy(col("doc_id"))
  }

  /** q156 as an oracle query: corpus index built in-query, batch
    * (doc_id ≡ 0 mod 10) reported against it. */
  def incrementalSubstringReportDaily(spark: SparkSession,
      dir: String): DataFrame = {
    val d = docs(spark, dir)
    incrementalSubstringReport(
      substrWindowIndex(d.filter(col("doc_id") % 10 =!= 0)),
      d.filter(col("doc_id") % 10 === 0))
  }

  /** L60/q158: n-gram NOVELTY scoring — the data-selection measure
    * dual to q156's dup report: per batch doc, how many of its DISTINCT
    * [[DupWinWords]]-word windows the corpus has never seen. Dedup asks
    * "is this a copy?"; novelty asks "does this add anything?" — a doc
    * whose windows are all corpus-known carries no new n-gram content
    * even if no single source document duplicates it (stitched/spun
    * pages), while high-novelty docs are the ones worth ingest priority
    * when the token budget (q146) is tight. A second consumer of the
    * SAME persisted `substr_windows` index (presence is the signal; the
    * count rides along for q156): one index, two reports, zero extra
    * corpus passes.
    *
    * Convention: windows are counted DISTINCT per doc (novelty is about
    * vocabulary coverage, not repetition — q78 owns repetition); a doc
    * too short for any window is fully novel (1e6 micro) — the corpus
    * has seen none of it. Daily cost: O(batch windows) against the
    * index. */
  def noveltyReport(corpusWins: DataFrame,
      newDocs: DataFrame): DataFrame =
    noveltyReportFrom(corpusWins, newDocs, docWindows(newDocs))

  /** [[noveltyReport]] over a precomputed [[docWindows]] frame of the
    * batch (novelty distincts it — coverage, not repetition). */
  def noveltyReportFrom(corpusWins: DataFrame, newDocs: DataFrame,
      batchWins: DataFrame): DataFrame = {
    val bw = batchWins
      .distinct()
      .localCheckpoint(eager = false) // feeds the semi-join AND perDoc
    val perDoc = bw
      .join(touchedWins(corpusWins, bw)
          .select(col("wh"), lit(true).as("seen")),
        Seq("wh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_win"),
        count(when(col("seen"), 1)).as("n_seen"))
    newDocs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_win"), lit(0L)).as("n_win"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"))
      .withColumn("novelty_micro",
        when(col("n_win") === 0, lit(1000000L)).otherwise(
          expr("(n_win - n_seen) * 1000000L div n_win")))
      .orderBy(col("doc_id"))
  }

  /** q158 as an oracle query: same corpus/batch split as q156. */
  def noveltyReportDaily(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    noveltyReport(
      substrWindowIndex(d.filter(col("doc_id") % 10 =!= 0)),
      d.filter(col("doc_id") % 10 === 0))
  }

  /** L61/q157: per-doc funnel DISPOSITION — the row-level explain of
    * the q115 funnel: for every document, either `kept` or the FIRST
    * stage (in the funnel's production order) that dropped it. The
    * funnel chart says a stage shed 12% — this table says WHICH docs,
    * which is what a data lead actually inspects before loosening a
    * gate, and what a provenance record has to store per doc. Every
    * predicate IS the corresponding proven operator (q60/q78/q92/q74/
    * q84), composed here as slim boolean flag frames; the oracle nests
    * the stage oracles (the q115 rule), so the explain can never
    * disagree with the funnel it explains — a reconciliation the spec
    * asserts directly (stage-k survivors == docs kept or dropped at a
    * stage > k).
    *
    * Scale shape: five left joins of (doc_id, true) frames onto the
    * slim (doc_id, source) projection — text never moves, and the flag
    * frames partial-aggregate before joining; one case-when decides. */
  /** (doc_id, source, o, disposition): o = the funnel stage the doc
    * failed to survive (2..6), 7 = kept — the per-doc frame BOTH q157
    * and q115 render (one definition, so the explain and the chart can
    * never disagree). Each stage operator appears as exactly one slim
    * flag-join subtree, computed once per job — no checkpoints, no
    * union branches racing to materialize shared caches. */
  private def dispositionFrame(spark: SparkSession,
      dir: String): DataFrame =
    dispositionFrameOf(docs(spark, dir))

  /** [[dispositionFrame]] over an EXPLICIT document universe — what the
    * composed lifecycle needs (ReleaseBuild off an ingest chain's kept
    * docs ∪ the benchmark holdout); every stage is the SAME Docs-shaped
    * operator the (spark, dir) rendering uses. */
  private[operators] def dispositionFrameOf(docsDf: DataFrame): DataFrame = {
    val d = docsDf.select(col("doc_id"), col("source"))
    // every stage operator is already unique per doc_id (keep_ids and
    // per-doc aggregates), so no distinct — five fewer exchanges
    def flag(df: DataFrame, name: String): DataFrame =
      df.select(col("doc_id")).withColumn(name, lit(true))
    val winner = flag(LLMQueries.exactDedupDocs(docsDf)
      .select(col("keep_id").as("doc_id")), "f_win")
    val repOk = flag(repetitionStatsDocs(docsDf)
      .filter(col("quality_flag") === "ok"), "f_rep")
    val unfluent = flag(lmFluencyDocs(docsDf)
      .filter(!col("is_fluent")), "f_unfl")
    val contaminated = flag(decontaminateDocs(docsDf), "f_cont")
    val qualKeep = flag(qualityClassifierDocs(docsDf)
      .filter(col("decision") === "keep"), "f_qual")
    val toxClean = flag(toxicityClassifierDocs(docsDf)
      .filter(col("decision") === "clean"), "f_tox")
    d.join(winner, Seq("doc_id"), "left")
      .join(repOk, Seq("doc_id"), "left")
      .join(unfluent, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .join(qualKeep, Seq("doc_id"), "left")
      .join(toxClean, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(col("f_win").isNull, 2)
          .when(col("f_rep").isNull, 3)
          .when(col("f_unfl").isNotNull, 4)
          .when(col("f_cont").isNotNull, 5)
          .when(col("f_qual").isNull, 6)
          .when(col("f_tox").isNull, 7)
          .otherwise(8).as("o"))
      .withColumn("disposition", expr(
        "element_at(array('dropped_exact_dup', 'dropped_repetition'," +
          " 'dropped_fluency', 'dropped_contaminated'," +
          " 'dropped_quality', 'dropped_toxicity', 'kept'), o - 1)"))
  }

  def funnelDisposition(spark: SparkSession, dir: String): DataFrame =
    dispositionFrame(spark, dir)
      .select(col("doc_id"), col("source"), col("disposition"))
      .orderBy(col("doc_id"))

  /** [[funnelDisposition]] over an explicit universe (the ReleaseBuild
    * composed-lifecycle entry point). */
  def funnelDispositionOf(docsDf: DataFrame): DataFrame =
    dispositionFrameOf(docsDf)
      .select(col("doc_id"), col("source"), col("disposition"))
      .orderBy(col("doc_id"))

  /** L28: the curation FUNNEL — the whole cleaning pass a training run
    * actually executes, as ONE oracle query: exact dedup → Gopher
    * repetition filter → LM fluency filter → benchmark decontamination
    * → model-based quality classifier, each stage applied to the
    * previous stage's survivors, reporting per-stage survivor counts
    * (the funnel chart every curation report opens with). Every stage
    * IS the corresponding proven operator (q60/q78/q92/q74/q84) — this
    * query adds composition, not new predicates, and its oracle nests
    * the stage oracles as subqueries (the q110 pattern), so the funnel
    * can never drift from its stages.
    *
    * Stage conventions: docs too short for a fluency score pass that
    * stage (unscorable ≠ unfluent); q74 lists exactly the contaminated
    * docs, so decontamination is an anti-join on its output. Scale
    * shape: the chart is ONE aggregate over [[dispositionFrame]]
    * (stage-k survivors == docs whose first failing stage is later
    * than k — stage predicates are per-doc, so the sequential funnel
    * and the first-failure decomposition agree by construction). The
    * earlier formulation unioned six per-stage count branches over a
    * lazily-checkpointed chain; under concurrent schedulers the
    * branches race to materialize the shared caches and a stage can
    * recompute once per downstream branch. This shape executes every
    * stage subtree exactly once by construction (same physical plan as
    * q157 below the top operator), identical six output rows. */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame =
    dispositionFrame(spark, dir)
      .agg(count(lit(1)).as("n1"),
        count(when(col("o") > 2, 1)).as("n2"),
        count(when(col("o") > 3, 1)).as("n3"),
        count(when(col("o") > 4, 1)).as("n4"),
        count(when(col("o") > 5, 1)).as("n5"),
        count(when(col("o") > 6, 1)).as("n6"),
        count(when(col("o") > 7, 1)).as("n7"))
      .select(expr(
        "stack(7, 1L, 'all', n1, 2L, 'exact_dedup', n2," +
          " 3L, 'repetition_filter', n3, 4L, 'fluency_filter', n4," +
          " 5L, 'decontaminate', n5, 6L, 'quality_classifier', n6," +
          " 7L, 'toxicity_filter', n7)" +
          " as (stage, stage_name, n_docs)"))
      .orderBy(col("stage"))

  /** q98: the daily-ingest segment-dedup flow as an ORACLE query — the
    * corpus/batch residue split the q96/q97 incremental family uses
    * (doc_id % 10 = 0 is today's batch). The corpus leg persists only
    * its [[segmentIndex]] (one row per distinct segment string); the
    * batch leg flows through [[incrementalSegmentDedup]]. The oracle
    * expresses the incremental semantics directly: a batch occurrence
    * is kept iff it is the batch-wide first occurrence AND its segment
    * is absent from the corpus index — corpus keepers beat any batch
    * occurrence regardless of id order, which is why this is NOT the
    * full q89 pass restricted to the batch.
    */
  def incrementalSegmentDedupDaily(spark: SparkSession,
      dir: String): DataFrame = {
    val d = docs(spark, dir)
    incrementalSegmentDedup(
      segmentIndex(d.filter(col("doc_id") % 10 =!= 0)),
      d.filter(col("doc_id") % 10 === 0))
  }

  /** Source mixture weights, derived from the source id so the query is
    * self-contained: src<n> gets weight 0.5 + (n mod 3) — i.e. 0.5
    * (downsample), 1.5, or 2.5 (upsample). The fractional part is always
    * .5, whose 32-bit hex threshold is exact in both engines. */
  private val MixSalt = "graft-mix:"

  /** Data mixing: up/down-sample each source to its target mixture
    * weight, deterministically. Every document gets `floor(w)` whole
    * copies plus one more iff its salted hash clears the fractional
    * threshold — a pure function of doc_id, so the mixed corpus is
    * reproducible under reruns, repartitioning, and incremental appends
    * (same property as the q75 sampler, extended to weights > 1).
    * Output is the mixed-corpus id frame (doc_id, source, copy_id);
    * training consumes it joined back to the text by doc_id.
    *
    * Scale shape: one narrow projection + explode — no shuffle at all
    * until the output sort (oracle determinism only). Copy multiplicity
    * never materializes text: the explode carries ids, and the text join
    * happens AFTER any further sampling/packing, so a weight-2.5 source
    * costs 2.5× ids, not 2.5× corpus bytes.
    */
  def sourceMixtureDocs(docsDf: DataFrame): DataFrame = {
    // a digit-less source id maps to stratum 0 in BOTH engines — without
    // the guard Spark's cast('' as int) nulls (silently dropping the doc)
    // while DuckDB's CAST errors; the oracle carries the same CASE
    val srcDigits = regexp_extract(col("source"), "(\\d+)", 1)
    val srcNum = when(length(srcDigits) === 0, 0)
      .otherwise(srcDigits.cast("int"))
    val wgt = lit(0.5) + (srcNum % 3).cast("double")
    val frac = substring(md5(concat(lit(MixSalt),
      col("doc_id").cast("string"))), 1, 8) < "80000000"
    docsDf
      .select(col("doc_id"), col("source"),
        (floor(wgt).cast("int") + when(frac, 1).otherwise(0)).as("n_rep"))
      .select(col("doc_id"), col("source"),
        // sequence(1, 0) DESCENDS in Spark — guard the zero-copy case
        explode(when(col("n_rep") >= 1,
          sequence(lit(1), col("n_rep"))).otherwise(
          array().cast("array<int>"))).as("copy_id"))
      .select(col("doc_id"), col("source"), col("copy_id").cast("long")
        .as("copy_id"))
      .orderBy(col("doc_id"), col("copy_id"))
  }

  def sourceMixture(spark: SparkSession, dir: String): DataFrame =
    sourceMixtureDocs(docs(spark, dir))

  /** Token budget the q141 recipe allocates across sources — a constant
    * so the oracle can repeat the arithmetic. */
  val RecipeTokenBudget = 1000000L

  /** L45/q141: TEMPERATURE-SAMPLING mixture recipe — the "data recipe"
    * table a training run is configured from. q90 applies externally
    * GIVEN weights; this derives them: per-source weight ∝ tokens^α
    * with α = 0.5 (the mT5/UniMax temperature rule — α < 1 upsamples
    * small sources relative to their raw share so one dominant crawl
    * can't drown the tail), normalized to [[RecipeTokenBudget]] target
    * tokens, with the per-source repeat factor (target/actual — > 1e6
    * micro means the source runs multiple epochs) a sampler like q90
    * consumes directly.
    *
    * Determinism: the only double step is sqrt of an exact-integer
    * token count — IEEE-754 correctly rounded in both engines — then
    * round(·1e6) into micro-unit longs; everything after is exact
    * integer arithmetic (the q92/q116 rule). Bounds: weight_micro =
    * sqrt(tokens)·1e6 ≤ 3.2e12 at 1e13 tokens (100 TB of text), so the
    * ·1e6 share numerator stays under 2^63.
    *
    * Scale shape: one partial-aggregating per-source rollup (|sources|
    * rows) + a 1-row broadcast total — text never shuffles; the recipe
    * frame is broadcast-sized by construction. */
  def mixtureRecipeDocs(docsDf: DataFrame): DataFrame = {
    val perSource = docsDf
      .select(col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .withColumn("weight_micro",
        expr("cast(round(sqrt(cast(n_tokens as double)) * 1e6) as bigint)"))
    val tot = perSource.agg(sum(col("weight_micro")).as("w_tot"))
    perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("weight_micro"),
        expr("weight_micro * 1000000L div w_tot").as("share_micro"),
        expr(s"${RecipeTokenBudget}L * weight_micro div w_tot")
          .as("target_tokens"),
        expr(s"(${RecipeTokenBudget}L * weight_micro div w_tot)" +
          " * 1000000L div n_tokens").as("repeat_micro"))
      .orderBy(col("source"))
  }

  def mixtureRecipe(spark: SparkSession, dir: String): DataFrame =
    mixtureRecipeDocs(docs(spark, dir))

  /** Max documents kept per source (L26) — the over-representation guard
    * every curated corpus applies to its dominant domains. */
  val SourceCap = 25

  /** L26: per-source document caps — keep the top [[SourceCap]] docs per
    * source by (quality desc, doc_id). A source is a HOT key by
    * construction (a web-scale corpus holds millions of docs under a
    * handful of sources), so the rank must NOT be one source-keyed
    * window — that funnels the corpus through |sources| reducers (the
    * q76 lesson). Two-level top-K instead: each (source, doc_id-range
    * shard) ranks locally — shard cardinality GROWS with the corpus —
    * and only shard survivors (≤ SourceCap rows per shard, corpus-size-
    * independent) meet in the final source-keyed rank, whose input is
    * shards × K rows, not the corpus. Equivalent to the direct global
    * rank because a global top-K doc has fewer than K docs of its source
    * above it anywhere, a fortiori within its own shard.
    */
  def sourceCapsDocs(docsDf: DataFrame): DataFrame = {
    val scored = docsDf.select(col("doc_id"), col("source"),
        LLMQueries.qualityExpr.as("quality"))
      .withColumn("shard", expr(s"doc_id div $SourceCapShardDocs"))
    val local = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("quality").desc, col("doc_id"))
    val survivors = scored.withColumn("lrk", row_number().over(local))
      .filter(col("lrk") <= SourceCap)
      .drop("lrk", "shard")
    val global = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    survivors.withColumn("rk", row_number().over(global))
      .filter(col("rk") <= SourceCap)
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("quality"))
      .orderBy(col("source"), col("rk"))
  }

  def sourceCaps(spark: SparkSession, dir: String): DataFrame =
    sourceCapsDocs(docs(spark, dir))

  /** Fluency threshold in NLL micro-nats: docs whose average bigram
    * negative-log-likelihood exceeds this are flagged disfluent. */
  val FluencyNllMicro = 3600000L

  /** CCNet-style LM fluency scoring (the "perplexity filter"): an add-one
    * bigram model is estimated on a reference slice of the corpus
    * (doc_id % 10 == 0 — in production: Wikipedia or another clean
    * corpus), and every other document is scored by its mean bigram NLL
    * under that model. High mean NLL = text the reference LM finds
    * surprising = boilerplate/garble candidates.
    *
    * Determinism: each bigram's NLL is rounded to integer micro-nats
    * BEFORE the per-doc sum, so the aggregate is an exact integer sum —
    * order- and partition-independent — and the mean is an integer
    * floor-division (values are non-negative, so Spark's truncating
    * `div` and DuckDB's floor `//` agree). ln() itself is the same
    * exposure q63's TF-IDF score already has.
    *
    * Scale shape: the model (bigram + unigram counts, vocab size) is
    * bounded by the REFERENCE corpus, not the training corpus — CCNet
    * uses Wikipedia — so both model tables broadcast; the training side
    * is one explode + two broadcast joins + one doc_id rollup. The
    * unigram table derives from the bigram table (sum over w1), sharing
    * its aggregation rather than re-scanning the reference.
    */
  def lmFluencyDocs(docsDf: DataFrame): DataFrame = {
    val allWords = docsDf
      .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
    val wordsArr = allWords
      // sequence(0, -1) DESCENDS in Spark: a 1-word doc must not reach
      // the bigram transform (DuckDB's range(1, 1) is empty naturally)
      .filter(size(col("w")) >= 2)
    val biExpr = expr(
      "transform(sequence(0, size(w) - 2)," +
        " i -> struct(w[i] AS w1, w[i+1] AS w2))")
    val refBi = wordsArr.filter(col("doc_id") % 10 === 0)
      .select(explode(biExpr).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cb"))
    val refUni = refBi.groupBy(col("w1"))
      .agg(sum(col("cb")).as("cu"))
    // vocab from the UNfiltered reference slice — the oracle counts a
    // 1-word ref doc's token in V even though it yields no bigram
    val vocab = allWords.filter(col("doc_id") % 10 === 0)
      .select(explode(col("w")).as("t")).agg(count_distinct(col("t")).as("v"))
    wordsArr.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), explode(biExpr).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .join(broadcast(refBi), Seq("w1", "w2"), "left")
      .join(broadcast(refUni), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("nll", expr(
        "cast(round(-ln(cast(coalesce(cb, 0) + 1 as double)" +
          " / (coalesce(cu, 0) + v)) * 1e6) as bigint)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        // exact integer division — nll sums are non-negative, so Spark's
        // truncating `div` equals DuckDB's floor `//`
        expr("sum(nll) div count(*)").as("avg_nll_micro"))
      .withColumn("is_fluent", col("avg_nll_micro") <= FluencyNllMicro)
      .orderBy(col("doc_id"))
  }

  def lmFluency(spark: SparkSession, dir: String): DataFrame =
    lmFluencyDocs(docs(spark, dir))

  /** Top-bigram report size for [[knBigramLm]]. */
  private val KnTopBigrams = 30

  /** Absolute discount D — Kneser–Ney's standard 0.75. */
  private val KnDiscount = 0.75

  /** The interpolated-KN estimate in integer micro-units over columns
    * (cb, cu, n1f, n1b, bt) — identical text (modulo double-literal
    * suffix) to the oracle's, so both engines evaluate the same double
    * expression:  max(c−D,0)/c(w1) + D·N1+(w1,·)/c(w1) · N1+(·,w2)/B. */
  private val KnScoreSql: String =
    // `d` suffixes: an unsuffixed 0.75 parses as DECIMAL in Spark SQL
    // and the all-integer second term would then round in decimal
    // arithmetic mid-chain; DuckDB promotes every division to DOUBLE
    s"cast(round((greatest(cb - ${KnDiscount}d, 0.0d) / cu" +
      s" + ${KnDiscount}d * n1f / cu * n1b / bt) * 1e6) as bigint)"

  /** L46/q165: interpolated Kneser–Ney bigram estimation — the
    * LM-training counts table behind the q92-style fluency filters: for
    * each bigram, its raw count, context total, fan-out/fan-in TYPE
    * counts (how many distinct continuations/contexts — KN's "novel
    * continuation" statistic), and the discounted interpolated
    * probability. Add-one (q92) over-smooths frequent contexts; KN's
    * continuation probability is the production choice for counting-LM
    * quality filters.
    *
    * Determinism: every input to the formula is an exact integer count;
    * the single double expression is rounded to micro-units; top-k by
    * (count, bigram) total order via TakeOrderedAndProject.
    *
    * Scale shape: ONE corpus-wide shuffle (the bigram-type count, which
    * collapses at vocab²-bounded cardinality); every derived statistic
    * aggregates the slim count table, not the corpus. `ctx`/`fanIn` are
    * vocabulary-sized broadcasts here — t-keyed shuffle joins at
    * web-corpus vocab, exactly the q93 df trade. */
  def knBigramLm(spark: SparkSession, dir: String): DataFrame =
    knFromBigrams(knBigramTable(docs(spark, dir)))

  /** The corpus bigram-TYPE count table (w1, w2, cb) — the KN family's
    * ENTIRE persistable state: counts are additive across disjoint
    * document sets (bigrams never cross a document boundary), so two
    * tables merge by groupBy-sum and every other KN statistic derives
    * from the merged table. */
  private[operators] def knBigramTable(docsDf: DataFrame): DataFrame = {
    val wordsArr = docsDf
      .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      // sequence(0, -1) DESCENDS in Spark: a 1-word doc must not reach
      // the bigram transform (DuckDB's range(1, 1) is empty naturally)
      .filter(size(col("w")) >= 2)
    val biExpr = expr(
      "transform(sequence(0, size(w) - 2)," +
        " i -> struct(w[i] AS w1, w[i+1] AS w2))")
    wordsArr.select(explode(biExpr).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cb"))
  }

  /** Additive merge of two bigram-count tables (the KN family's
    * compaction AND daily-merge rule — same shape as bm25's tf union). */
  private[operators] def mergeBigrams(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("w1"), col("w2"))
      .agg(sum(col("cb")).as("cb"))

  /** The KN head over a bigram-count table: context totals, type
    * fan-out/fan-in, the type total, and the discounted estimate. */
  private[operators] def knFromBigrams(bi: DataFrame): DataFrame = {
    val ctx = bi.groupBy(col("w1"))
      .agg(sum(col("cb")).as("cu"), count(lit(1)).as("n1f"))
    val fanIn = bi.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val types = bi.agg(count(lit(1)).as("bt"))
    bi.join(broadcast(ctx), Seq("w1"))
      .join(broadcast(fanIn), Seq("w2"))
      .crossJoin(broadcast(types))
      .withColumn("pkn_micro", expr(KnScoreSql))
      .select(col("w1"), col("w2"), col("cb"), col("cu"),
        col("n1f"), col("n1b"), col("pkn_micro"))
      .orderBy(col("cb").desc, col("w1"), col("w2"))
      .limit(KnTopBigrams)
  }

  /** Fluency cut for [[knFluency]] — same scale as [[FluencyNllMicro]]
    * (micro-nats per bigram) but KN's discounting sits lower than
    * add-one on in-domain text, so the gate tightens accordingly. */
  val KnFluencyNllMicro = 3200000L

  /** The per-bigram interpolated-KN probability with an add-one-smoothed
    * continuation floor, over (cb, cu, n1f, n1b, bt, v) where NULL
    * cb/cu/n1b mean "unseen in the reference" — identical text (modulo
    * double-literal suffix) in both engines:
    * seen pair   → (c−D)/cu + D·n1f/cu · pcont
    * seen w1     → D·n1f/cu · pcont          (discount mass backs off)
    * unseen w1   → pcont                     (all mass to continuation)
    * pcont(w2) = (N1+(·,w2)+1)/(B+V) — positive everywhere, so NLL is
    * always finite and non-negative (p ≤ 1 since n1f ≤ cu). */
  private def knProbSql(suffix: String): String =
    s"(CASE WHEN cb IS NOT NULL THEN (cb - $KnDiscount$suffix) / cu" +
      s" ELSE 0.0$suffix END" +
      s" + (CASE WHEN cu IS NOT NULL THEN $KnDiscount$suffix * n1f / cu" +
      s" ELSE 1.0$suffix END)" +
      " * ((coalesce(n1b, 0) + 1) / (bt + v)))"

  /** L46c/q169: KN-model fluency scoring — the q92 flow with the q165
    * model: an interpolated Kneser–Ney bigram LM is estimated on the
    * reference slice (doc_id % 10 == 0, q92's convention) and every
    * other document is scored by its mean bigram NLL under it. Add-one
    * (q92) over-penalizes frequent contexts with many continuations;
    * KN's discounted interpolation is what production perplexity
    * filters (CCNet-class) actually run, so the two scorers bracket the
    * same gate and this one is the production-shaped instance.
    *
    * Determinism: one double expression per bigram rounded to integer
    * micro-nats before the per-doc sum (the q92 rule); the mean is a
    * non-negative integer floor-division.
    *
    * Scale shape: the model (bigram counts + context/continuation type
    * tables + two scalars) is bounded by the REFERENCE corpus — all
    * broadcasts; the training side is one explode + three broadcast
    * left-joins + one doc_id rollup. Exactly q92's join plan with one
    * more |vocab|-row broadcast. */
  def knFluency(spark: SparkSession, dir: String): DataFrame =
    knFluencyDocs(docs(spark, dir))

  private[operators] def knFluencyDocs(docsDf: DataFrame): DataFrame = {
    val allWords = docsDf
      .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
    val wordsArr = allWords.filter(size(col("w")) >= 2)
    val biExpr = expr(
      "transform(sequence(0, size(w) - 2)," +
        " i -> struct(w[i] AS w1, w[i+1] AS w2))")
    val refBi = wordsArr.filter(col("doc_id") % 10 === 0)
      .select(explode(biExpr).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cb"))
    val ctx = refBi.groupBy(col("w1"))
      .agg(sum(col("cb")).as("cu"), count(lit(1)).as("n1f"))
    val fanIn = refBi.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    // bt (bigram types) and v (add-one vocab, q92's unfiltered-slice
    // rule) collapse to one broadcast row
    val scalars = refBi.agg(count(lit(1)).as("bt")).crossJoin(
      allWords.filter(col("doc_id") % 10 === 0)
        .select(explode(col("w")).as("t"))
        .agg(count_distinct(col("t")).as("v")))
    wordsArr.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), explode(biExpr).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .join(broadcast(refBi), Seq("w1", "w2"), "left")
      .join(broadcast(ctx), Seq("w1"), "left")
      .join(broadcast(fanIn), Seq("w2"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("nll", expr(
        s"cast(round(-ln(${knProbSql("d")}) * 1e6) as bigint)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        // non-negative (p ≤ 1), so truncating div == flooring //
        expr("sum(nll) div count(*)").as("avg_nll_micro"))
      .withColumn("is_fluent", col("avg_nll_micro") <= KnFluencyNllMicro)
      .orderBy(col("doc_id"))
  }

  /** L46b/q167: incremental KN — a daily batch updates the LM by
    * MERGING its bigram counts into the persisted corpus table
    * (additive, so merge == full recount by construction); corpus TEXT
    * is never re-scanned. The (corpus ∪ batch) union covers the whole
    * documents table, so the answer IS q165's — one shared oracle,
    * zero drift. */
  def incrementalKn(corpusBi: DataFrame, newDocs: DataFrame): DataFrame =
    knFromBigrams(mergeBigrams(corpusBi, knBigramTable(newDocs)))

  /** q167 as an oracle query: corpus bigram table built in-query (as
    * the oracle must), batch merged against it. */
  def incrementalKnDaily(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    incrementalKn(
      knBigramTable(d.filter(col("doc_id") % LLMQueries.BatchMod =!= 0)),
      d.filter(col("doc_id") % LLMQueries.BatchMod === 0))
  }

  /** Hashed-feature bucket count for DSIR importance weights (2¹² —
    * three md5 hex digits, the q84 idiom). */
  val DsirBuckets = 4096

  private val DsirSalt = "graft-dsir:"

  /** L29: DSIR-style data selection via importance resampling (Xie et
    * al. 2023): estimate bag-of-hashed-bigram distributions for a
    * TARGET domain slice (doc_id % 10 == 0 — in production: Wikipedia /
    * books / the downstream task's domain) and for the RAW pool, then
    * score every raw document by its importance log-ratio
    * log p_target(x) − log p_raw(x) = Σ_feature lr(bucket). Documents
    * whose features look more target-like than raw-like (weight ≥ 0)
    * are selected; production resamples proportionally, which only
    * changes the final threshold into a q75-style salted-hash draw.
    *
    * Determinism: each bucket's log-ratio is rounded to integer
    * micro-nats ONCE in the [[DsirBuckets]]-row model table, and the
    * per-doc weight is the exact integer sum of its occurrences'
    * bucket values — order- and partition-independent (the q92 rule).
    * The average is a rounded double (never integer division — weights
    * go negative, where Spark `div` and DuckDB `//` disagree).
    *
    * Scale shape: the model is TWO bounded aggregates — bucket counts
    * partial-aggregate to ≤ 2¹² rows per task before a tiny shuffle,
    * totals derive from the bucket table — and broadcasts; scoring is
    * one explode + broadcast join + per-doc rollup. The corpus never
    * shuffles anything wider than (doc_id, bucket) partial sums.
    */
  /** (doc_id, b) hashed-bigram feature rows — 12-bit bucket = first 3
    * hex digits of md5(salt || w1 || ' ' || w2); lambda-bind so the md5
    * runs once per bigram. */
  private def dsirFeats(docsDf: DataFrame): DataFrame = {
    def hexAt(i: Int) =
      s"(instr('0123456789abcdef', substring(h, $i, 1)) - 1)"
    val bucketsOf = expr(
      "transform(sequence(0, size(w) - 2)," +
        s" i -> transform(array(md5(concat('$DsirSalt', w[i], ' ', w[i+1])))," +
        s"   h -> ${hexAt(1)} * 256 + ${hexAt(2)} * 16 + ${hexAt(3)})[0])")
    docsDf
      .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(bucketsOf).as("b"))
  }

  private def dsirIsTarget = col("doc_id") % 10 === 0

  /** The (b, lr) importance model — the PERSISTABLE artifact a pipeline
    * trains once per snapshot (IndexStore family `dsir_model`): per
    * bucket, the add-one log-ratio of the target-slice vs raw-pool
    * distributions, pre-rounded to integer micro-nats. ≤ [[DsirBuckets]]
    * rows, broadcastable anywhere. */
  def dsirModelOf(docsDf: DataFrame): DataFrame = {
    val feats = dsirFeats(docsDf)
    val counts = feats.groupBy(col("b"))
      .agg(sum(when(dsirIsTarget, 1L).otherwise(0L)).as("ct"),
        sum(when(dsirIsTarget, 0L).otherwise(1L)).as("cr"))
    val totals = counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    counts.crossJoin(broadcast(totals))
      .withColumn("lr", expr(
        s"cast(round((ln((ct + 1) / cast(nt + $DsirBuckets as double))" +
          s" - ln((cr + 1) / cast(nr + $DsirBuckets as double))) * 1e6)" +
          " as bigint)"))
      .select(col("b"), col("lr"))
  }

  /** Score a document frame against a (possibly disk-read) frozen
    * importance model — the daily leg of the DSIR lifecycle. */
  def dsirScoreWith(model: DataFrame, docsDf: DataFrame): DataFrame =
    dsirFeats(docsDf)
      .join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lr")).as("weight_micro"))
      .withColumn("avg_weight",
        round(col("weight_micro").cast("double") / col("n_bigrams"), 6))
      .withColumn("selected", col("weight_micro") >= 0)
      .orderBy(col("doc_id"))

  def dsirImportanceDocs(docsDf: DataFrame): DataFrame =
    dsirScoreWith(dsirModelOf(docsDf), docsDf.filter(!dsirIsTarget))

  def dsirImportance(spark: SparkSession, dir: String): DataFrame =
    dsirImportanceDocs(docs(spark, dir))

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

  /** L39/q131: training-shard MANIFEST — the serialization step between
    * a curated corpus and a training run: a deterministic seeded epoch
    * shuffle (every run and every resume sees the same order) plus
    * shard assignment, emitting (doc_id, shard_id, pos) — which shard
    * file a document lands in and at which position. The "shuffle" is
    * ordering by a salted md5 of the doc id (q75's determinism rule:
    * stable under reruns, repartitions and appends-to-other-shards);
    * shards are HASH-RANGE slices of the key space, so shard file
    * boundaries are reproducible from the key alone.
    *
    * Scale shape: the corpus-facing rank window is keyed by (shard,
    * block) where block = the key's [[EpochBlockHexDigits]]-hex prefix
    * — a prefix of the sort key, so per-block ranks + block offsets
    * compose to the exact in-shard position without EVER ranking a
    * whole shard in one reducer (the q76/q107 two-level lesson applied
    * to global ordering). Block offsets come from a bounded
    * (shard, block) size table — ≤ 16^w rows regardless of corpus
    * size. The oracle IS the direct one-window-per-shard rank. */
  def shardManifestDocs(docsDf: DataFrame): DataFrame = {
    val keyed = docsDf
      .select(col("doc_id"),
        md5(concat(lit("graft-epoch0:"), col("doc_id").cast("string")))
          .as("h"))
      .withColumn("shard_id",
        expr(s"(instr('0123456789abcdef', substring(h, 1, 1)) - 1)" +
          s" div ${16 / EpochShards}"))
      .withColumn("block", substring(col("h"), 1, EpochBlockHexDigits))
    val local = Window.partitionBy(col("shard_id"), col("block"))
      .orderBy(col("h"), col("doc_id"))
    val ranked = keyed.withColumn("lrk", row_number().over(local))
    val sizes = keyed.groupBy(col("shard_id"), col("block"))
      .agg(count(lit(1)).as("cnt"))
    // the offsets window runs over the BOUNDED block-size table, not
    // the corpus (16^w rows max — same class as q76's shard table)
    val off = Window.partitionBy(col("shard_id")).orderBy(col("block"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sizes
      .withColumn("off", coalesce(sum(col("cnt")).over(off), lit(0L)))
      .select(col("shard_id"), col("block"), col("off"))
    ranked.join(offsets, Seq("shard_id", "block"))
      .select(col("doc_id"), col("shard_id").cast("long").as("shard_id"),
        (col("off") + col("lrk") - 1).cast("long").as("pos"))
      .orderBy(col("shard_id"), col("pos"))
  }

  def shardManifest(spark: SparkSession, dir: String): DataFrame =
    shardManifestDocs(docs(spark, dir))

  /** L41/q133: CCNet-style perplexity BUCKETING — the published CCNet
    * move downstream of the q92 scorer: within each language, docs are
    * split into head / middle / tail terciles of LM score (head =
    * lowest NLL = most reference-like), and training mixes sample the
    * buckets at different rates instead of hard-filtering at one
    * threshold (q92's flag). Per-language terciles matter for the same
    * reason as q122's per-source cutoffs: a single global boundary
    * over-prunes whole languages.
    *
    * Determinism: scores are q92's exact integer micro-nats; the two
    * cutoffs are interpolated percentiles rounded to 6 dp before any
    * comparison (the q122 rule — Spark `percentile` and DuckDB
    * `quantile_cont` share the (n-1)·p interpolation). Scale shape:
    * the exact percentile buffers one language's scores per group —
    * swap in `percentile_approx` (q86) at 100 TB; the cutoff table is
    * |languages| rows and broadcasts back for bucket assignment. */
  def nllBucketsDocs(docsDf: DataFrame): DataFrame = {
    val scored = lmFluencyDocs(docsDf)
      .select(col("doc_id"), col("avg_nll_micro"))
    val wl = scored.join(docsDf.select(col("doc_id"), col("lang")), "doc_id")
    val cuts = wl.groupBy(col("lang")).agg(
      round(expr("percentile(avg_nll_micro, cast(1 as double)/3)"), 6)
        .as("c1"),
      round(expr("percentile(avg_nll_micro, cast(2 as double)/3)"), 6)
        .as("c2"))
    wl.join(broadcast(cuts), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("avg_nll_micro"),
        when(col("avg_nll_micro") <= col("c1"), "head")
          .when(col("avg_nll_micro") <= col("c2"), "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }

  def nllBuckets(spark: SparkSession, dir: String): DataFrame =
    nllBucketsDocs(docs(spark, dir))

  /** L40/q132: snapshot DIFF — the corpus-versioning delta between two
    * snapshot versions (what changed since the last training refresh):
    * every doc id is classified added / removed / changed / unchanged
    * by comparing content hashes across versions. The two snapshots
    * are derived fixtures (the q79 seeding pattern — the testdata ships
    * one version): old = docs with id % 11 ≠ 0, with ids % 13 = 0
    * carrying a prior text revision; new = docs with id % 17 ≠ 0.
    *
    * Scale shape: each side reduces to (doc_id, 32-hex md5) AT THE
    * SCAN — text bytes never shuffle — and the diff is one full-outer
    * hash join on doc_id. At 100 TB both sides are slim key/hash
    * tables; AQE handles the skewless equi-join. */
  def snapshotDiffDocs(docsDf: DataFrame): DataFrame = {
    val oldSnap = docsDf.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v0")))
          .otherwise(col("text"))).as("old_hash"))
    val newSnap = docsDf.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("new_hash"))
    oldSnap.join(newSnap, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged").as("status"),
        col("old_hash"), col("new_hash"))
      .orderBy(col("doc_id"))
  }

  def snapshotDiff(spark: SparkSession, dir: String): DataFrame =
    snapshotDiffDocs(docs(spark, dir))

  /** L46/q142: snapshot DISTRIBUTION drift — the release monitor that
    * catches what q132's row diff can't: a snapshot whose documents all
    * changed "a little" in the same direction (a crawler started
    * truncating, a filter started over-firing) shifts the per-source
    * length DISTRIBUTION even when row counts look healthy. Per source:
    * total-variation distance between the old and new snapshots'
    * token-length histograms (10 buckets of 32 tokens, top-coded), over
    * the same two snapshot fixtures as q132.
    *
    * Determinism: per-bucket fractions are micro-unit integer floors
    * (c·1e6 div N, ≤ 1e6 — overflow-free at any corpus size), TV is an
    * exact integer sum of absolute differences halved; no doubles
    * anywhere. tv_micro ∈ [0, 1e6]: 0 = identical shape, 1e6 = disjoint.
    *
    * Scale shape: two narrow scans project (source, bucket) rows — text
    * never shuffles — into one partial-aggregating histogram groupBy
    * (|sources|·10 rows) and a |sources|-row rollup. */
  def snapshotDriftDocs(docsDf: DataFrame): DataFrame = {
    val bucket =
      expr("least(9L, cast(size(split(text, '\\\\s+')) as bigint) div 32)")
    val oldSnap = docsDf.filter(col("doc_id") % 11 =!= 0)
      .select(col("source"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v0")))
          .otherwise(col("text")).as("text"))
      .select(col("source"), bucket.as("bucket"),
        lit(1L).as("c_old"), lit(0L).as("c_new"))
    val newSnap = docsDf.filter(col("doc_id") % 17 =!= 0)
      .select(col("source"), bucket.as("bucket"),
        lit(0L).as("c_old"), lit(1L).as("c_new"))
    val hist = oldSnap.unionByName(newSnap)
      .groupBy(col("source"), col("bucket"))
      .agg(sum(col("c_old")).as("c_old"), sum(col("c_new")).as("c_new"))
    val totals = hist.groupBy(col("source"))
      .agg(sum(col("c_old")).as("n_old"), sum(col("c_new")).as("n_new"))
    hist.join(totals, Seq("source"))
      .groupBy(col("source"), col("n_old"), col("n_new"))
      .agg(expr("sum(abs(c_old * 1000000L div greatest(n_old, 1L)" +
        " - c_new * 1000000L div greatest(n_new, 1L))) div 2")
        .as("tv_micro"))
      .select(col("source"), col("n_old"), col("n_new"), col("tv_micro"))
      .orderBy(col("source"))
  }

  def snapshotDrift(spark: SparkSession, dir: String): DataFrame =
    snapshotDriftDocs(docs(spark, dir))

  /** Quality-block width in micro-units for q146's distributed prefix
    * sum — parallelism is |sources| × (1e6 / width) local windows, a
    * KNOB-bounded fan-out (the standard range-partitioned prefix-sum
    * trade): narrower blocks buy more reducers at the cost of a larger
    * (still bounded) offset table. */
  val BudgetQualityBlockMicros = 10000L

  /** L49/q146: BUDGET-bounded selection — materializes the q141 recipe
    * into an actual document selection: each source keeps its
    * highest-quality documents, in (quality desc, doc_id) order, until
    * its token target is exhausted (the crossing document is kept, so
    * budgets always fill). Targets are HALF the corpus's token volume
    * split by q141's temperature weights — big sources truncate hard,
    * up-weighted small sources keep everything (fill pegs at their own
    * volume).
    *
    * Scale shape: the running token sum is a DISTRIBUTED PREFIX SUM,
    * never one source-keyed window (the q76/q107 hot-key rule): local
    * before-sums within (source, quality-block) — block = qmicro div
    * [[BudgetQualityBlockMicros]], order-ALIGNED with the sort key
    * because div is monotone — plus a bounded (|sources| × |blocks|)
    * block-offset table. Exact integer arithmetic throughout; the
    * micro-share product stays under 2^63 up to ~1.8e13 corpus tokens
    * (switch the share to decimal past ~90 TB of text). */
  def budgetSelectDocs(docsDf: DataFrame): DataFrame = {
    val s = docsDf.select(col("doc_id"), col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"),
        round(LLMQueries.qualityExpr * 1e6).cast("bigint").as("qmicro"))
      .withColumn("qblock", expr(s"qmicro div $BudgetQualityBlockMicros"))
      // feeds the local-window leg, the block-offset leg and the
      // targets aggregate — one tokenize+score pass, not four
      .localCheckpoint(eager = false)
    val agg = s.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
      .withColumn("wm",
        expr("cast(round(sqrt(cast(src_tokens as double)) * 1e6) as bigint)"))
    val tot = agg.agg(sum(col("wm")).as("w_tot"),
      sum(col("src_tokens")).as("tok_tot"))
    val targets = agg.crossJoin(broadcast(tot))
      .select(col("source"),
        expr("(tok_tot div 2) * (wm * 1000000L div w_tot) div 1000000L")
          .as("target_tokens"))
    val wLocal = Window.partitionBy(col("source"), col("qblock"))
      .orderBy(col("qmicro").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = s.withColumn("before_local",
      coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    val wBlocks = Window.partitionBy(col("source"))
      .orderBy(col("qblock").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = s.groupBy(col("source"), col("qblock"))
      .agg(sum(col("n_tokens")).as("btok"))
      .withColumn("boffset", coalesce(sum(col("btok")).over(wBlocks), lit(0L)))
      .select(col("source"), col("qblock"), col("boffset"))
    local.join(offsets, Seq("source", "qblock"))
      .join(broadcast(targets), Seq("source"))
      .filter(col("before_local") + col("boffset") < col("target_tokens"))
      .groupBy(col("source"), col("target_tokens"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("tokens_kept"))
      .select(col("source"), col("n_kept"), col("tokens_kept"),
        col("target_tokens"),
        expr("tokens_kept * 1000000L div greatest(target_tokens, 1L)")
          .as("fill_micro"))
      .orderBy(col("source"))
  }

  def budgetSelect(spark: SparkSession, dir: String): DataFrame =
    budgetSelectDocs(docs(spark, dir))

  /** Sample size for q161's priority sample — small enough that the
    * smallest sf (500 docs) keeps a meaningful threshold item;
    * production sizes K by the target standard error (the estimator's
    * relative stdev is ≈ 1/sqrt(K−1)). */
  private[operators] val PpsK = 40

  /** hex→int of the first 8 md5 hex digits of a column named `h` —
    * instr-on-hex-digit is the portable idiom (the q84 rule: Spark
    * `conv()` has no DuckDB twin); the SAME fragment text parses in
    * both engines, so the two sides cannot drift. */
  private val ppsHex32 = (1 to 8)
    .map(i => s"(instr('0123456789abcdef', substring(h, $i, 1)) - 1)")
    .zipWithIndex
    .map { case (d, i) => // the fold must run in 64-bit: 8 digits > 2^31
      if (i == 0) s"cast($d as bigint)" else d }
    .reduceLeft((a, b) => s"($a * 16 + $b)")

  /** L64/q161: WEIGHT-PROPORTIONAL corpus sample (priority sampling,
    * Duffield–Lund–Thorup) — the ESTIMATION sampler the suite's other
    * three cannot replace: q75 samples at a uniform rate (token-weighted
    * statistics then need post-hoc reweighting whose variance blows up
    * on heavy docs), q145 pins exact-K per language (uniform again),
    * q146 selects deterministically by quality (not a sample — no
    * estimator exists). Priority sampling gives inclusion probability
    * ∝ tokens with an unbiased Horvitz–Thompson-style estimator: per
    * doc, priority = w / u with u ∈ (0,1] a salted-md5 uniform (a pure
    * function of doc_id — the q75 determinism rule, so reruns and
    * appends re-draw nothing); keep the top K priorities; the (K+1)-th
    * is the threshold τ, and each kept doc estimates max(w, τ) tokens.
    * E[Σ est] = Σ w exactly, so a 40-doc sample audits the token mass
    * (or any token-weighted statistic) of a 100 TB corpus within
    * ~1/√(K−1) relative error without scanning it twice.
    *
    * Engine portability: u = (hex32(md5) + 1) / 2^32 — every operand an
    * integer exactly representable in double — and priority =
    * w · 2^32 / u32 is ONE correctly-rounded IEEE division, so both
    * engines rank the identical set (doc_id breaks ties). Scale shape:
    * one scan into a TakeOrderedAndProject top-(K+1) — no window, no
    * hot reducer; the τ/sample split runs over K+1 broadcast rows. */
  def ppsSampleDocs(docsDf: DataFrame): DataFrame =
    ppsFinish(ppsPriorityTable(docsDf))

  def ppsSample(spark: SparkSession, dir: String): DataFrame =
    ppsSampleDocs(docs(spark, dir))

  /** The (doc_id, n_tokens, prio) top-(K+1) priority table of a doc
    * frame — the PERSISTED state that makes q161 incrementally
    * maintainable: priorities are pure per-doc functions, so the
    * top-(K+1) of (corpus ∪ batch) equals the top-(K+1) of (corpus's
    * persisted top-(K+1) ∪ the batch's own top-(K+1)) — a daily sample
    * refresh reads K+1 rows and scans ONLY the batch, never the corpus
    * (IndexStore `pps_sample` family; disk==memory spec-pinned against
    * the full q161 pass). */
  def ppsPriorityTable(docsDf: DataFrame): DataFrame =
    docsDf
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"),
        md5(concat(lit("graft-pps:"), col("doc_id").cast("string")))
          .as("h"))
      .withColumn("prio", expr("cast(n_tokens as double) * 4294967296.0" +
        s" / cast(($ppsHex32) + 1 as double)"))
      .drop("h")
      .orderBy(col("prio").desc, col("doc_id"))
      .limit(PpsK + 1)

  /** q161's τ/estimate tail over an already-priority-ranked union —
    * shared by the full pass and the incremental merge. */
  private[operators] def ppsFinish(ranked: DataFrame): DataFrame = {
    val top = ranked.orderBy(col("prio").desc, col("doc_id"))
      .limit(PpsK + 1)
      .localCheckpoint(eager = false) // K+1 rows feed τ AND the sample
    val tau = top.orderBy(col("prio").asc, col("doc_id").desc).limit(1)
      .select(col("doc_id").as("tid"), col("prio").as("t"))
    top.crossJoin(broadcast(tau))
      .filter(col("doc_id") =!= col("tid"))
      .select(col("doc_id"), col("n_tokens"),
        round(greatest(col("n_tokens").cast("double"), col("t")), 6)
          .as("est_tokens"))
      .orderBy(col("doc_id"))
  }

  /** The incremental q161: merge today's batch into the persisted
    * corpus priority table — O(batch) daily cost, K+1 corpus rows. */
  def incrementalPpsSample(corpusPrio: DataFrame,
      newDocs: DataFrame): DataFrame =
    ppsFinish(corpusPrio.unionByName(ppsPriorityTable(newDocs)))

  /** L54/q151: RELEASE-FUNNEL report — the per-source sign-off table
    * for a training-corpus release, composing the two mandatory gates
    * in their production order: exact dedup (q60's keep-min rule) then
    * benchmark decontamination (q74's flag set), over the train side
    * only (eval docs are held out by definition). One row per source:
    * docs in, docs surviving dedup, docs surviving decontamination,
    * and the final token volume a release manifest records. The oracle
    * NESTS the q60/q74 fragments (the q115 rule) so the funnel cannot
    * drift from its stages.
    *
    * Scale shape: dedup is q60's 64-hex hash groupBy joined back as a
    * keeper flag; decon reduces q74's broadcast gram join to a
    * distinct flag set; ONE pass over train with per-doc flags feeding
    * ONE per-source conditional rollup — no union branches, so no
    * concurrent re-materialization of the shared hash+tokenize pass
    * (the q115 lesson) and a single source-keyed shuffle over slim
    * rows. */
  def releaseFunnelDocs(docsDf: DataFrame): DataFrame = {
    val train = docsDf.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), col("source"),
        sha2(col("text"), 256).as("hh"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      // feeds the keeper-election leg AND the main leg — different
      // subplans, so exchange reuse can't dedupe the hash+tokenize
      .localCheckpoint(eager = false)
    val keepIds = train.groupBy(col("hh"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(true).as("kd"))
    val flagged = decontaminateDocs(docsDf)
      .select(col("doc_id"), lit(true).as("fl"))
    train.join(keepIds, Seq("doc_id"), "left")
      .join(flagged, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("kd"), 1)).as("n_after_dedup"),
        count(when(col("kd") && col("fl").isNull, 1)).as("n_final"),
        coalesce(sum(when(col("kd") && col("fl").isNull,
          col("n_tokens"))), lit(0L)).as("tokens_final"))
      .orderBy(col("source"))
  }

  def releaseFunnel(spark: SparkSession, dir: String): DataFrame =
    releaseFunnelDocs(docs(spark, dir))

  /** L50/q147: cross-source SHARED-SEGMENT matrix — the mirror-crawl /
    * syndication detector: for every unordered source pair, how many
    * distinct segments (q89's [[SegWords]]-word units) both carry, each
    * side's distinct-segment volume, and the overlap as a micro
    * fraction of the smaller side. Exact-doc overlap is subsumed
    * (identical docs share every segment); the table routes a
    * high-overlap pair to a crawl-dedup fix upstream of any per-doc
    * pass.
    *
    * Scale shape: segments reduce to md5 AT THE SCAN (32-hex keys
    * shuffle, text never does — the q60/q132 rule); the distinct
    * (source, hash) projection collapses segment popularity BEFORE the
    * self-join, so a boilerplate segment carried by millions of docs
    * contributes at most |sources|² pair rows, not a quadratic blowup
    * (the q120 DF argument). */
  def sourceOverlapDocs(docsDf: DataFrame): DataFrame = {
    val ss = docsDf
      .select(col("source"), explode(segArrExpr).as("seg"))
      .select(col("source"), md5(col("seg")).as("sh"))
      .distinct()
    // NO localCheckpoint here: the self-join legs are IDENTICAL
    // subplans, so Spark already reuses one exchange for all three
    // consumers (measured: a checkpoint made this 22% slower)
    val vol = ss.groupBy(col("source")).agg(count(lit(1)).as("n_segs"))
    ss.as("a")
      .join(ss.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(vol.select(col("source").as("src_a"),
        col("n_segs").as("segs_a"))), Seq("src_a"))
      .join(broadcast(vol.select(col("source").as("src_b"),
        col("n_segs").as("segs_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        col("segs_a"), col("segs_b"),
        expr("n_shared * 1000000L div least(segs_a, segs_b)")
          .as("overlap_micro"))
      .orderBy(col("src_a"), col("src_b"))
  }

  def sourceOverlap(spark: SparkSession, dir: String): DataFrame =
    sourceOverlapDocs(docs(spark, dir))

  /** Survivors kept per near-dup cluster by q148. */
  val ClusterCap = 3

  /** q148's own shard-width knob (the q107 rule: every two-level rank
    * owns its width). */
  val ClusterCapShardDocs = 128L

  /** L51/q148: per-cluster CAPS — the soft middle ground between q88
    * (one survivor per near-dup family) and no dedup at all: keep the
    * top [[ClusterCap]] members of every q85 cluster by (quality desc,
    * doc_id). SemDeDup-style pipelines keep a few diverse members per
    * family — one canonical loses paraphrase variance the model could
    * use; the cap bounds redundancy instead of erasing it.
    *
    * Scale shape: cluster_id is a DATA-DEPENDENT hot key (a boilerplate
    * mega-cluster is corpus-sized), so the rank is two-level per
    * (cluster_id, doc_id-range shard) — the q107 argument verbatim;
    * q88's aggregation trick covers only M = 1. */
  def clusterCaps(spark: SparkSession, dir: String): DataFrame = {
    val scored = dedupClustersStar(spark, dir)
      .join(docs(spark, dir)
        .select(col("doc_id"), LLMQueries.qualityExpr.as("quality")),
        Seq("doc_id"))
      .withColumn("cshard", expr(s"doc_id div $ClusterCapShardDocs"))
    val local = Window.partitionBy(col("cluster_id"), col("cshard"))
      .orderBy(col("quality").desc, col("doc_id"))
    val survivors = scored.withColumn("lrk", row_number().over(local))
      .filter(col("lrk") <= ClusterCap)
      .drop("lrk", "cshard")
    val global = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id"))
    survivors.withColumn("rk", row_number().over(global))
      .filter(col("rk") <= ClusterCap)
      .select(col("cluster_id"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("quality"), col("cluster_size"))
      .orderBy(col("cluster_id"), col("rk"))
  }

  /** L58/q155: EVAL-SAMPLE churn across snapshots — measures the
    * stability claim q145's doc makes (hash-ORDER selection churns
    * O(1) expected members per append): per language, the q145 sample
    * drawn from the OLD and NEW snapshot id-universes (q132's
    * fixtures) and how many members they share. A sampler whose eval
    * set rewrites itself every release silently invalidates every
    * longitudinal eval comparison — this is the table that proves ours
    * doesn't. Pure hash arithmetic end to end; the sampler logic is
    * [[evalSampleDocs]]'s rule verbatim on both sides.
    *
    * Scale shape: two two-level sample ranks (each the q145 plan) over
    * id/lang projections + one |langs|-row rollup of the K-sized
    * sample frames. */
  def evalSampleChurnDocs(docsDf: DataFrame): DataFrame = {
    val ids = docsDf.select(col("doc_id"), col("lang"))
    val oldIds = ids.filter(col("doc_id") % 11 =!= 0)
    val newIds = ids.filter(col("doc_id") % 17 =!= 0)
    val o = evalSampleDocs(oldIds).select(col("lang"), col("doc_id"))
    val n = evalSampleDocs(newIds).select(col("lang"), col("doc_id"))
    o.select(col("lang"), col("doc_id"), lit(1L).as("in_old"),
        lit(0L).as("in_new"))
      .unionByName(n.select(col("lang"), col("doc_id"),
        lit(0L).as("in_old"), lit(1L).as("in_new")))
      .groupBy(col("lang"), col("doc_id"))
      .agg(max(col("in_old")).as("in_old"), max(col("in_new")).as("in_new"))
      .groupBy(col("lang"))
      .agg(sum(col("in_old") * (lit(1L) - col("in_new"))).as("n_dropped"),
        sum(col("in_new") * (lit(1L) - col("in_old"))).as("n_added"),
        sum(col("in_old") * col("in_new")).as("n_stable"))
      .select(col("lang"), col("n_stable"), col("n_added"),
        col("n_dropped"),
        expr(s"n_stable * 1000000L div ${EvalSampleK}L")
          .as("stable_micro"))
      .orderBy(col("lang"))
  }

  def evalSampleChurn(spark: SparkSession, dir: String): DataFrame =
    evalSampleChurnDocs(docs(spark, dir))

  /** L57/q154: snapshot DEDUP-RATE trend — the release-over-release
    * regression gate for dedup itself: per source, the exact-dup rate
    * inside the OLD and NEW snapshots (q132's fixtures) and its delta.
    * A rate that jumps between releases means a crawler started
    * re-fetching (or a dedup stage silently stopped running) — caught
    * here before q60 pays the cleanup. Rates are micro-unit integer
    * floors; the delta is a plain subtraction (no signed division, the
    * Spark-div/DuckDB-// trap). The shipped corpus is dup-free, so the
    * NEW snapshot carries a seeded re-fetch fixture (every doc_id ≡ 0
    * mod 19 arrives again byte-identical — the q136 twin rule) making
    * the regression observable: old rates 0, new rates > 0.
    *
    * Scale shape: two q60-class hash groupBys + join-backs (32-hex
    * keys, text never shuffles) into one per-source rollup. */
  def snapshotDedupTrendDocs(docsDf: DataFrame): DataFrame = {
    def snapStats(df: DataFrame, tag: Int): DataFrame = {
      val h = df.select(col("source"), md5(col("text")).as("hh"))
      val fam = h.groupBy(col("hh")).agg(count(lit(1)).as("fam"))
      h.join(fam, Seq("hh"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          count(when(col("fam") >= 2, 1)).as("dups"))
        .select(col("source"), lit(tag).as("snap"), col("n"),
          col("dups"))
    }
    val oldSnap = docsDf.filter(col("doc_id") % 11 =!= 0)
      .select(col("source"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v0")))
          .otherwise(col("text")).as("text"))
    val newSnap = docsDf.filter(col("doc_id") % 17 =!= 0)
      .select(col("source"), col("text"))
      .unionByName(docsDf.filter(col("doc_id") % 19 === 0)
        .select(col("source"), col("text")))
    snapStats(oldSnap, 0).unionByName(snapStats(newSnap, 1))
      .groupBy(col("source"))
      .agg(
        coalesce(sum(when(col("snap") === 0, col("n"))), lit(0L))
          .as("n_old"),
        coalesce(sum(when(col("snap") === 0, col("dups"))), lit(0L))
          .as("dups_old"),
        coalesce(sum(when(col("snap") === 1, col("n"))), lit(0L))
          .as("n_new"),
        coalesce(sum(when(col("snap") === 1, col("dups"))), lit(0L))
          .as("dups_new"))
      .select(col("source"), col("n_old"),
        expr("dups_old * 1000000L div greatest(n_old, 1L)")
          .as("dup_old_micro"),
        col("n_new"),
        expr("dups_new * 1000000L div greatest(n_new, 1L)")
          .as("dup_new_micro"))
      .withColumn("delta_micro",
        col("dup_new_micro") - col("dup_old_micro"))
      .orderBy(col("source"))
  }

  def snapshotDedupTrend(spark: SparkSession, dir: String): DataFrame =
    snapshotDedupTrendDocs(docs(spark, dir))

  /** L47/q143: duplicate-family SIZE histogram — the dedup audit read
    * alongside q125/q127's recall/precision gates: how much of the
    * corpus sits in families of 2, of 3, of 10+? A fat tail says one
    * boilerplate template dominates (route to q120, not doc dedup); a
    * mass of 2s says crawl-level re-fetches (q60's exact pass handles
    * them cheaper than LSH). Families are q85's star-CC components over
    * the q64 pair graph; unpaired docs count as singleton families so
    * the histogram partitions the whole corpus (n_docs sums to |docs|).
    *
    * Scale shape: q85's O(log n) star CC + one long-key groupBy for
    * family sizes + a histogram rollup over ≤ max-family-size rows. */
  def dupSizeHistogram(spark: SparkSession, dir: String): DataFrame = {
    val comp = dedupClustersStar(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val sizes = docs(spark, dir).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("fam_size"))
    sizes.groupBy(col("fam_size"))
      .agg(count(lit(1)).as("n_families"))
      .select(col("fam_size"), col("n_families"),
        (col("fam_size") * col("n_families")).as("n_docs"))
      .orderBy(col("fam_size"))
  }

  /** L50b/q168: SOFT dedup — per-doc training weights 1/|family| over
    * the q85/q143 duplicate families instead of hard-dropping losers
    * (the SoftDeDup idea: duplicates carry signal about natural data
    * frequency, so down-weighting preserves the effective distribution
    * while hard dedup distorts it; every family contributes ~one doc's
    * worth of gradient regardless of its copy count). Emits the weight
    * a loss-weighted sampler consumes directly, in exact integer
    * micro-units (1e6 div n — non-negative, engine-identical floor).
    *
    * Scale shape: q85's star CC + one family-size groupBy + a join-back
    * on the long family key; text never moves past the pair stage. */
  def softDedupWeights(spark: SparkSession, dir: String): DataFrame = {
    val comp = dedupClustersStar(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val withFam = docs(spark, dir).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("fam", coalesce(col("cluster_id"), col("doc_id")))
    val sizes = withFam.groupBy(col("fam"))
      .agg(count(lit(1)).as("n_members"))
    withFam.join(sizes, Seq("fam"))
      .withColumn("weight_micro", expr("1000000 div n_members"))
      .select(col("doc_id"), col("fam"), col("n_members"),
        col("weight_micro"))
      .orderBy(col("doc_id"))
  }

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
  private val clustersCtes: String =
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
  private val clustersOracle: String =
    s"""$clustersCtes
       |SELECT doc_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM comp ORDER BY doc_id""".stripMargin

  /** q129 oracle: the q77/q85 recursive closure for the cluster map,
    * singletons defaulting to their own id, q75's threshold rule keyed
    * by the cluster id. */
  private val clusterSplitOracle: String =
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

  private val gramsCte =
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
  private val knOracle: String =
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

  private val oracleMain: Map[String, String] = Map(
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
