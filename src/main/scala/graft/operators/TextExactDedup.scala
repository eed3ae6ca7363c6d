package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** EXACT + NORMALIZED text dedup family (L1/L1c/L1d): sha2 keep-min
  * exact dedup, the C4-style normalized-key variant, the persisted
  * hash/norm-hash indexes, and their incremental daily legs —
  * q60/q97/q136/q139.
  *
  * Split out of TextDedup by family (round 15, pure moves — the
  * CurationQueries/VectorQueries recipe): members stay reachable
  * through the hub's self-type; shingling/banding machinery remains
  * in TextDedup.
  */
private[operators] trait TextExactDedup {
  this: LLMQueries.type =>

  /** q97: the daily-ingest exact-dedup flow as an ORACLE query — same
    * corpus/batch split as q96. The corpus leg persists only its
    * [[hashIndex]] (one distinct 64-hex sha2 per known text); the batch
    * leg flows through [[incrementalExactDedup]], so the daily pass
    * shuffles batch hashes plus an anti-join against the index — never
    * corpus text. Oracle: batch-internal winners whose text hash is
    * unseen in the corpus (sha2 is a pure per-document function, so the
    * incremental result is exactly expressible by DuckDB on the raw
    * tables).
    */
  def incrementalExactDedupDaily(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    incrementalExactDedup(
      hashIndex(d.filter(col("doc_id") % BatchMod =!= 0)),
      d.filter(col("doc_id") % BatchMod === 0))
  }

  /** L1: exact dedup — sha2(text)-keyed groups, keep the min doc_id
    * (deterministic winner). One hash-partitioned aggregation; at 100 TB
    * the 64-hex-char key shuffles instead of the full text.
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    exactDedupDocs(docs(spark, dir))

  def exactDedupDocs(docsDf: DataFrame): DataFrame =
    docsDf
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** The persisted corpus hash index for [[incrementalExactDedup]]:
    * one distinct 64-hex sha2 per known text. */
  def hashIndex(docsDf: DataFrame): DataFrame =
    docsDf.select(sha2(col("text"), 256).as("h")).distinct()

  /** Variant-id offset for the q136 normalization fixture. */
  private[operators] val NormVariantIdOffset = 2000000000L

  /** C4-style text normalization for dedup keys: lowercase, strip
    * non-alphanumerics to spaces, collapse runs, trim. Idempotent by
    * construction (spec-asserted). */
  private[graft] val normTextExpr = trim(
    regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))

  /** L1c/q136: NORMALIZED exact dedup — the C4/RefinedWeb move of
    * hashing a normalized rendering (lowercase, punctuation stripped,
    * whitespace collapsed) instead of raw bytes, so trivially-reformatted
    * copies (capitalization, trailing punctuation, double spaces)
    * collapse onto their original where q60's raw sha2 keeps them
    * distinct. The shipped corpus is already lower+space-clean, so the
    * variant copies that make normalization observable are seeded
    * deterministically (the q79/q109 fixture pattern): ids % 9 = 0 get a
    * leading-capital, trailing-"!!", double-spaced twin at id +
    * [[NormVariantIdOffset]]. `n_raw_variants` counts distinct RAW
    * hashes inside each normalized cluster — every seeded twin yields a
    * cluster with n_raw_variants = 2, exactly the dups raw dedup misses.
    *
    * Scale shape: identical to q60 — normalization happens AT THE SCAN,
    * the groupBy shuffles 32-hex keys + two counters, text never
    * shuffles. */
  def normalizedDedup(spark: SparkSession, dir: String): DataFrame =
    normUniverse(docs(spark, dir))
      .groupBy(md5(normTextExpr).as("nh"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        count_distinct(md5(col("text"))).as("n_raw_variants"))
      .select(col("keep_id"), col("n_copies"), col("n_raw_variants"))
      .orderBy(col("keep_id"))

  /** The q136/q139 universe: documents plus their seeded normalization
    * twins. [[NormVariantIdOffset]] is a multiple of [[BatchMod]], so a
    * twin inherits its original's daily-batch residue — a reformatted
    * re-crawl arrives in the same batch as its source would (the q111
    * ingest-shape argument). */
  private def normUniverse(docsDf: DataFrame): DataFrame = {
    val variants = docsDf.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + NormVariantIdOffset).as("doc_id"),
        concat(upper(substring(col("text"), 1, 1)),
          expr("substring(text, 2)"), lit("  !!")).as("text"))
    docsDf.select(col("doc_id"), col("text")).unionByName(variants)
  }

  /** The (corpus, batch) split of the q136 universe for the daily
    * flow — the corpus side is exactly what [[normHashIndex]]
    * persists. */
  def normSplit(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val u = normUniverse(docs(spark, dir))
    (u.filter(col("doc_id") % BatchMod =!= 0),
      u.filter(col("doc_id") % BatchMod === 0))
  }

  /** The persisted corpus NORMALIZED-hash index: one distinct 32-hex
    * md5 per known normalized rendering (IndexStore family
    * `norm_hash`). */
  def normHashIndex(corpusDocs: DataFrame): DataFrame =
    corpusDocs.select(md5(normTextExpr).as("nh")).distinct()

  /** L1d/q139: incremental NORMALIZED dedup — q97's daily-ingest flow
    * under q136's key rule: a batch doc survives iff its NORMALIZED
    * hash is corpus-unseen, min doc_id winning within the batch. The
    * case this catches that q97's raw key waves through: a reformatted
    * re-crawl of a corpus doc (new capitalization, trailing punct) has
    * novel raw bytes but a known normalized key, and dies at ingest.
    * Same O(batch) daily cost: the anti-join shuffles 32-hex keys,
    * corpus text never moves. */
  def incrementalNormalizedDedup(corpusNorm: DataFrame,
      newDocs: DataFrame): DataFrame =
    newDocs
      .withColumn("nh", md5(normTextExpr))
      .groupBy(col("nh"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .join(corpusNorm.select(col("nh")), Seq("nh"), "left_anti")
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** q139 as an oracle query: corpus index built in-query (as the
    * oracle must), batch cleaned against it. */
  def incrementalNormalizedDedupDaily(spark: SparkSession,
      dir: String): DataFrame = {
    val (corpus, batch) = normSplit(spark, dir)
    incrementalNormalizedDedup(normHashIndex(corpus), batch)
  }

  /** Incremental exact dedup: survivors of an incoming batch against a
    * persisted corpus hash index (sha2(text) keys — what [[exactDedup]]
    * materializes). Batch docs whose hash exists in the corpus are dups;
    * within the batch the min doc_id wins, as in the full pass. The
    * anti-join shuffles 64-hex keys only, never corpus text: daily cost
    * is O(batch), not O(corpus).
    */
  def incrementalExactDedup(corpusHashes: DataFrame,
      newDocs: DataFrame): DataFrame =
    newDocs
      .withColumn("h", sha2(col("text"), 256))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .join(corpusHashes.select(col("h")), Seq("h"), "left_anti")
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** Oracle SQL of this family — merged into
    * [[LLMQueries.oracle]] (pure move, round 15). */
  private[operators] def exactDedupOracle: Map[String, String] = Map(
    "q60_exact_dedup" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY sha256(text) ORDER BY keep_id""".stripMargin,
    "q136_normalized_dedup" ->
      s"""WITH t AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $NormVariantIdOffset,
         |    upper(substr(text, 1, 1)) || substr(text, 2) || '  !!'
         |  FROM documents WHERE doc_id % 9 = 0),
         |n AS (
         |  SELECT doc_id, text,
         |    trim(regexp_replace(regexp_replace(lower(text),
         |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nt
         |  FROM t)
         |SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
         |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_raw_variants
         |FROM n GROUP BY md5(nt) ORDER BY keep_id""".stripMargin,
    // q139: the q97 incremental shape under q136's normalized key —
    // batch-internal winners whose NORMALIZED hash the corpus never saw
    "q139_incremental_normalized_dedup" ->
      s"""WITH t AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $NormVariantIdOffset,
         |    upper(substr(text, 1, 1)) || substr(text, 2) || '  !!'
         |  FROM documents WHERE doc_id % 9 = 0),
         |n AS (
         |  SELECT doc_id,
         |    md5(trim(regexp_replace(regexp_replace(lower(text),
         |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS nh
         |  FROM t)
         |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
         |FROM n WHERE doc_id % 10 = 0
         |GROUP BY nh
         |HAVING nh NOT IN (SELECT nh FROM n WHERE doc_id % 10 <> 0)
         |ORDER BY keep_id""".stripMargin,
    // batch-internal winners whose hash the corpus has never seen
    "q97_incremental_exact_dedup" ->
      s"""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
         |FROM documents WHERE doc_id % $BatchMod = 0
         |GROUP BY sha256(text)
         |HAVING sha256(text) NOT IN (
         |  SELECT sha256(text) FROM documents WHERE doc_id % $BatchMod <> 0)
         |ORDER BY keep_id""".stripMargin)
}
