package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Sampling / selection / packing family (L9/L10/L16/L26/
  * L29/L39/L45/L48/L49/L56/L64): deterministic splits, exact-K and
  * PPS samples, source mixing/caps, budget selection, packing and
  * manifests — q75/q76/q90/q107/q116/q131/q141/q145/q146/q153/q161.
  *
  * Split out of CurationQueries by family (round 11, pure moves) —
  * the object mixes every family trait back in, so call sites and
  * behavior are unchanged; shared constants/oracles stay on the
  * object, reachable through the self-type.
  */
private[operators] trait CurationSampling {
  this: CurationQueries.type =>

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
  private[operators] def dsirFeats(docsDf: DataFrame): DataFrame = {
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

  private[operators] def dsirIsTarget = col("doc_id") % 10 === 0

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

  /** L101/q198: the epoch-ready MIXED manifest — recipe → application →
    * manifest composed into the table a training run actually loads
    * (VERDICT r14 "Next round" #3: ReleaseBuild shipped q141's
    * temperature weights and q131's shard manifest as SIBLING artifacts,
    * but the manifest sharded the kept docs uniformly — the repeat
    * factors were never applied). Three proven pieces, one flow:
    *
    *   1. q141's recipe fixes each source's target_tokens;
    *   2. the repeat application: every doc gets `target div src_tokens`
    *      whole copies (full epochs of its source), and the FRACTIONAL
    *      epoch takes a prefix of the source's docs in seeded-shuffle
    *      order (salted md5, the q131 rule) until the remaining token
    *      budget fills — the q146 crossing-doc rule, so Σ tokens per
    *      source lands within ONE document of target_tokens
    *      (q90's per-doc Bernoulli rounding hits the target only in
    *      expectation; a manifest must hit it exactly);
    *   3. q131's seeded shard assignment over (doc_id, copy_id) — the
    *      copy id salts the key, so repeats of one document scatter
    *      across shards and never collide in a batch.
    *
    * Scale shape: the fractional prefix sum is the q146 DISTRIBUTED
    * two-level prefix sum ((source, h-block) local windows + a bounded
    * block-offset table — h-block is a PREFIX of the sort key, so block
    * order aligns); copies explode ids only (the q90 rule — a weight-12
    * source costs 12× id rows, never 12× corpus bytes); shard positions
    * are the q131 two-level rank. The oracle nests the q141 oracle
    * verbatim and runs the direct one-window-per-source /
    * one-window-per-shard formulations. */
  def mixedManifestDocs(docsDf: DataFrame): DataFrame = {
    val s = docsDf.select(col("doc_id"), col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("h",
        md5(concat(lit(MixSalt), col("doc_id").cast("string"))))
      .withColumn("hblock", substring(col("h"), 1, EpochBlockHexDigits))
      // feeds the recipe rollup, the local windows and the offsets —
      // one tokenize pass, not three
      .transform(graft.Materialize.shared)
    // q141's targets re-derived over THIS universe (same arithmetic;
    // the oracle nests the q141 SQL itself)
    val agg = s.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
      .withColumn("wm",
        expr("cast(round(sqrt(cast(src_tokens as double)) * 1e6) as bigint)"))
    val tot = agg.agg(sum(col("wm")).as("w_tot"))
    val targets = agg.crossJoin(broadcast(tot))
      .withColumn("target_tokens",
        expr(s"${RecipeTokenBudget}L * wm div w_tot"))
      .select(col("source"),
        expr("target_tokens div src_tokens").as("whole"),
        expr("target_tokens % src_tokens").as("frac_target"))
    // the fractional-epoch prefix in (h, doc_id) order — two-level
    // (q146's rule; a source is a hot key by construction)
    val wLocal = Window.partitionBy(col("source"), col("hblock"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = s.withColumn("before_local",
      coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    val wBlocks = Window.partitionBy(col("source"))
      .orderBy(col("hblock"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = s.groupBy(col("source"), col("hblock"))
      .agg(sum(col("n_tokens")).as("btok"))
      .withColumn("boffset",
        coalesce(sum(col("btok")).over(wBlocks), lit(0L)))
      .select(col("source"), col("hblock"), col("boffset"))
    val copies = local.join(offsets, Seq("source", "hblock"))
      .join(broadcast(targets), Seq("source"))
      .select(col("doc_id"), col("source"),
        (col("whole") +
          when(col("before_local") + col("boffset") < col("frac_target"),
            1L).otherwise(0L)).as("n_rep"))
      .select(col("doc_id"), col("source"),
        // sequence(1, 0) DESCENDS in Spark — guard the zero-copy case
        explode(when(col("n_rep") >= 1,
          sequence(lit(1L), col("n_rep"))).otherwise(
          array().cast("array<bigint>"))).as("copy_id"))
    // q131's seeded shard assignment, copy-salted key
    val keyed = copies
      .withColumn("kh", md5(concat(lit("graft-epoch0:"),
        col("doc_id").cast("string"), lit(":"),
        col("copy_id").cast("string"))))
      .withColumn("shard_id",
        expr(s"(instr('0123456789abcdef', substring(kh, 1, 1)) - 1)" +
          s" div ${16 / EpochShards}"))
      .withColumn("block", substring(col("kh"), 1, EpochBlockHexDigits))
      .transform(graft.Materialize.shared) // rank leg + block-size leg
    val localRank = Window.partitionBy(col("shard_id"), col("block"))
      .orderBy(col("kh"), col("doc_id"), col("copy_id"))
    val ranked = keyed.withColumn("lrk", row_number().over(localRank))
    val sizes = keyed.groupBy(col("shard_id"), col("block"))
      .agg(count(lit(1)).as("cnt"))
    val off = Window.partitionBy(col("shard_id")).orderBy(col("block"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sizes
      .withColumn("off", coalesce(sum(col("cnt")).over(off), lit(0L)))
      .select(col("shard_id"), col("block"), col("off"))
    ranked.join(offs, Seq("shard_id", "block"))
      .select(col("doc_id"), col("copy_id"), col("source"),
        col("shard_id").cast("long").as("shard_id"),
        (col("off") + col("lrk") - 1).cast("long").as("pos"))
      .orderBy(col("shard_id"), col("pos"))
  }

  def mixedManifest(spark: SparkSession, dir: String): DataFrame =
    mixedManifestDocs(docs(spark, dir))

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
      .transform(graft.Materialize.shared)
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
      .transform(graft.Materialize.shared) // K+1 rows feed τ AND the sample
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

  /** Oracle SQL of the sampling/packing/mixture family — merged into
    * [[CurationQueries.oracleMain]] (pure move, round 14). */
  /** The q141 oracle as a reusable fragment — nested verbatim by q198
    * so the recipe the manifest applies and the recipe the gate checks
    * are one SQL text. */
  private[operators] def mixtureRecipeOracleSql: String =
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
       |FROM w, t ORDER BY source""".stripMargin

  private[operators] def samplingOracleMain: Map[String, String] = Map(
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
    "q141_mixture_recipe" -> mixtureRecipeOracleSql,
    // q198 NESTS the q141 oracle (the q115 rule) and runs the DIRECT
    // one-window formulations of both ranks the Spark side two-levels:
    // the fractional-epoch prefix sum per source and the per-shard
    // position rank (div/prefix blocks are monotone in the sort keys —
    // the q131/q146 equivalence arguments verbatim)
    "q198_mixed_manifest" ->
      s"""WITH rec AS (
         |  SELECT source, n_tokens AS src_tokens, target_tokens FROM (
         |$mixtureRecipeOracleSql)),
         |d AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
         |      AS n_tokens,
         |    md5('$MixSalt' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |j AS (
         |  SELECT d.*, rec.target_tokens // rec.src_tokens AS whole,
         |    rec.target_tokens % rec.src_tokens AS frac_target
         |  FROM d JOIN rec USING (source)),
         |pre AS (
         |  SELECT *, coalesce(sum(n_tokens) OVER (
         |    PARTITION BY source ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS before_tok
         |  FROM j),
         |rep AS (
         |  SELECT doc_id, source,
         |    whole + CASE WHEN before_tok < frac_target THEN 1 ELSE 0 END
         |      AS n_rep
         |  FROM pre),
         |copies AS (
         |  SELECT doc_id, source,
         |    CAST(unnest(range(1, n_rep + 1)) AS BIGINT) AS copy_id
         |  FROM rep),
         |k AS (
         |  SELECT *, md5('graft-epoch0:' || CAST(doc_id AS VARCHAR)
         |    || ':' || CAST(copy_id AS VARCHAR)) AS kh
         |  FROM copies)
         |SELECT doc_id, copy_id, source,
         |  CAST((strpos('0123456789abcdef', substr(kh, 1, 1)) - 1)
         |    // ${16 / EpochShards} AS BIGINT) AS shard_id,
         |  CAST(row_number() OVER (
         |    PARTITION BY (strpos('0123456789abcdef', substr(kh, 1, 1)) - 1)
         |      // ${16 / EpochShards}
         |    ORDER BY kh, doc_id, copy_id) - 1 AS BIGINT) AS pos
         |FROM k ORDER BY shard_id, pos""".stripMargin,
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
    // q145: the oracle ranks directly per language — the Spark side's
    // two-level shard rank is provably the same selection
    "q145_eval_sample" ->
      s"""SELECT lang, rk, doc_id FROM (
         |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
         |    ORDER BY md5('graft-eval:' || doc_id), doc_id) AS rk
         |  FROM documents)
         |WHERE rk <= $EvalSampleK ORDER BY lang, rk""".stripMargin,
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
}
