package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import scala.collection.immutable.ListMap

/** LLM-training-data pipeline operators over `documents` (SURVEY.md §2.9):
  * exact dedup (L1), MinHash+LSH near-dup with exact-Jaccard verification
  * (L2), SimHash signatures (L2), text stats / quality scoring / token
  * counting / language-ID heuristic (L5), TF-IDF term weighting (L6),
  * per-language rollups (L7), and rolling-hash document fingerprinting.
  *
  * Hashing is md5/sha2-based in BOTH engines so every query is
  * oracle-checkable: a fixed-width lowercase-hex substring compares
  * lexicographically exactly like the number it encodes, so `min(hex)` is
  * a portable MinHash without any engine-specific hash function.
  *
  * Scale posture: everything is explode → hash-partitioned groupBy (no
  * driver collects). The near-dup search is LSH-banded — candidate pairs
  * come from equi-joins on band keys, so the shuffle is O(candidate
  * pairs), never the O(n²) all-pairs cross join (SURVEY.md §4.3).
  */
object LLMQueries {

  private val NumHashes = 8
  private val RowsPerBand = 2 // 4 bands of 2 → catches Jaccard ≳ 0.4

  // Repartitioned up front: the sf parquet is ONE file → a one-partition
  // scan, and the shingle/hash explosion otherwise runs single-task up to
  // the first groupBy shuffle (same lesson as SpecPipeline.base).
  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("doc_id"))

  /** (doc_id, sh) with `sh` the distinct 3-word-shingle array, one row per
    * document that has ≥3 words (shorter docs have no shingles and are out
    * of near-dup scope, as in the exploded formulation this replaced).
    *
    * PERF, two deliberate choices:
    *  - `sh` is ONE expression: `transform(array(split(text)), w -> …)[0]`
    *    binds the word array to a lambda variable, so the regex split runs
    *    once per document no matter how many times the shingle lambda
    *    references `w`. Computing `w` in its own Project instead invites
    *    CollapseProject to substitute `split(text)` into every `w[i]`
    *    reference — ~250 regex splits per document, a measured 20×
    *    slowdown of this stage.
    *  - the result is `repartition`ed on doc_id: every consumer (the
    *    signature leg and both verification legs of the near-dup join)
    *    then hangs off ONE materialized exchange — ReusedExchange makes
    *    the shingling run once per query instead of once per leg.
    */
  private def shingledDocs(spark: SparkSession, dir: String): DataFrame =
    shingledOf(Tables(spark, dir, "documents"))

  /** The per-row shingle expression — ONE definition shared by the
    * batch projection and the streaming fuzzy-decon twin, so the two
    * can never shingle differently. */
  private[graft] val shingleArrayExpr: Column = expr(
    "transform(array(split(text, '\\\\s+'))," +
      " w -> array_distinct(transform(sequence(0, size(w)-3)," +
      " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))))")
    .getItem(0)

  /** The fused MinHash-signature+banding expression over a shingle
    * array column — the streaming-twin entry to [[bandsOf]]'s keys. */
  private[graft] def bandKeysOf(sh: Column): Column =
    graft.functions.MinHashBandKeys.minhashBandKeys(sh, NumHashes,
      RowsPerBand)

  /** The shingle projection over any (doc_id, text) frame. */
  private[operators] def shingledOf(docsDf: DataFrame): DataFrame = {
    val parts = docsDf.sparkSession.sessionState.conf.numShufflePartitions
    docsDf
      // spread the regex/shingle CPU across tasks first: the sf parquet is
      // one file → a one-partition scan (same lesson as SpecPipeline.base)
      .repartition(parts, col("doc_id"))
      .filter(size(split(col("text"), "\\s+")) >= 3)
      .select(col("doc_id"), shingleArrayExpr.as("sh"))
      .repartition(parts, col("doc_id"))
  }

  /** LSH band keys (doc_id, band, key) of a shingled frame — the table a
    * pipeline PERSISTS so tomorrow's batch never re-hashes the corpus.
    *
    * The signature+banding is ONE fused native expression
    * ([[graft.functions.MinHashBandKeys]], bit-identical to the
    * 8×`transform`+`array_min` HOF formulation it replaced — see
    * MinHashSigSpec): one shared MessageDigest, no per-shingle
    * concat/hex/substring allocations, hex rendered once per doc. */
  private[operators] def bandsOf(shingled: DataFrame): DataFrame =
    shingled
      .select(col("doc_id"), posexplode(bandKeysOf(col("sh"))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("key"))

  /** Per-doc shingle sets with sizes — the verification-side table a
    * pipeline persists next to [[bandsOf]]. */
  private[operators] def setsOf(shingled: DataFrame): DataFrame =
    shingled.select(col("doc_id"), col("sh"),
      size(col("sh")).cast("long").as("n_sh"))

  /** The (bands, sets) signature tables of a document frame — what an
    * incremental pipeline writes once per corpus snapshot. */
  def signatureTables(docsDf: DataFrame): (DataFrame, DataFrame) = {
    val shingled = shingledOf(docsDf)
    (bandsOf(shingled), setsOf(shingled))
  }

  /** Exact-Jaccard verification of candidate pairs against per-doc
    * shingle sets; keeps the shared-shingle contract of [[minhashPairs]]. */
  private def verifyPairs(cands: DataFrame, sets: DataFrame): DataFrame =
    cands
      .join(sets.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sets.as("zb"), col("doc_b") === col("zb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("za.sh"), col("zb.sh"))).cast("long")
          .as("n_inter"),
        col("za.n_sh").as("na"), col("zb.n_sh").as("nb"))
      .filter(col("n_inter") > 0)
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        round(col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter")), 6).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** L89/q189: TEXT band-occupancy audit — the q184/q185 report over
    * the q64 MinHash bands, completing the hot-bucket watch across all
    * three banded modalities (media q184, vector q185, text here): per
    * band, populated keys, max bucket occupancy, implied candidate-pair
    * volume Σ n·(n−1)/2 (exactly the band join's pre-dedup row count —
    * LLMQueriesSpec reconciles it) and the bucket/pair mass above the
    * shared hot threshold. The 100× soak's text_near_dup daily leg
    * (3.73M verified pairs, pair-volume-bound) is the load this audit
    * watches; unlike vectors, the soak's text replicas are perturbed
    * (` rep<r>`), so they are REAL near-dups — no exact pre-pass can
    * collapse them, which makes the occupancy watch the text family's
    * only early-warning knob. One [[graft.multimodal.Multimodal
    * .bandOccupancyOf]] definition and one hot-occupancy policy across
    * the three audits. */
  def textBandOccupancy(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.bandOccupancyOf(
      signatureTables(docs(spark, dir))._1)

  /** L91/q191: the TEXT band-cap operating curve — the q187/q188 report
    * over the q64 MinHash bands, completing the cap pricing across all
    * three banded modalities (VERDICT r12 "Next round" #2). Text is the
    * one modality where a per-bucket occupancy cap is the ONLY
    * pair-volume knob: the 100× soak's replicas are PERTURBED
    * (` rep<r>` suffixes), i.e. real near-dups with distinct shingle
    * sets, so no exact canonical pre-pass (the q186/q190 move) can
    * collapse them — when the q189 audit flags a hot bucket, capping is
    * the only response, and until this query that response was
    * unpriced. Truth = the q64-verified Jaccard pair set (band
    * candidates with ≥1 shared shingle — exactly what capless banding
    * emits and q77's clusters consume), so per cap the exact-integer
    * recall reads how much of today's q64 output a capped band join
    * would keep. Shares [[graft.multimodal.Multimodal.bandCapCurveOf]]
    * and [[graft.multimodal.Multimodal.BandCapSweep]] with the media
    * and vector flavors so the three curves can never price caps
    * differently.
    *
    * Scale shape: same audit tier as q187/q188 — ONE band self-join
    * (the q64 candidate join with per-bucket ranks riding along)
    * prices every cap at once; the verification legs only touch
    * candidate endpoints' shingle sets; the curve tail is a ≤4-row
    * broadcast join. */
  def textBandCapCurve(spark: SparkSession, dir: String): DataFrame = {
    val base = shingledOf(Tables(spark, dir, "documents"))
    val sets = setsOf(base)
    graft.multimodal.Multimodal.bandCapCurveOf(bandsOf(base), "doc_id",
      pairs => verifyPairs(pairs.toDF("doc_a", "doc_b"), sets)
        .select(col("doc_a"), col("doc_b")))
  }

  /** Incremental near-dup: pairs of an incoming batch against an already
    * signed corpus (plus batch-internal pairs) WITHOUT re-pairing the
    * corpus with itself — the daily-ingest flow at 100 TB, where corpus
    * signatures are petabyte-scale tables written once (signatureTables)
    * and each day's work is proportional to the batch, not the corpus.
    * Only band buckets touched by a new doc produce candidates; corpus-
    * only buckets never join.
    */
  def incrementalNearDups(corpusBands: DataFrame, corpusSets: DataFrame,
      newDocs: DataFrame, cap: Option[Int] = None): DataFrame = {
    val shingledNew = shingledOf(newDocs)
    // materialized lazily: newBands feeds BOTH the union leg and the
    // probe leg, and the MinHashBandKeys projection sits downstream of
    // the reusable shingle exchange — without the checkpoint each
    // consumer re-hashes the batch's signatures (2× the md5 work per
    // daily run). The batch is the small side by definition, so the
    // checkpoint is cheap; eager=false keeps plan construction/audit
    // free (the q70 lesson, uniformly — VERDICT r8 "What's wrong" #1).
    incrementalNearDupsFrom(corpusBands, corpusSets,
      bandsOf(shingledNew).localCheckpoint(eager = false),
      setsOf(shingledNew), cap)
  }

  /** [[incrementalNearDups]] with the batch's signature tables supplied
    * by the caller — the DailyIngest flow computes them ONCE per day
    * and reuses them for index persistence (one definition, one
    * execution; IngestSoak's batch-sigs leg prices the compute).
    * Contract: `newBands` feeds two subplans (probe + union), so pass
    * a reusable frame (a lazy localCheckpoint); `newSets` is read
    * once. */
  def incrementalNearDupsFrom(corpusBands: DataFrame,
      corpusSets: DataFrame, newBands: DataFrame,
      newSets: DataFrame, cap: Option[Int] = None): DataFrame = {
    // probe shape: (corpus ∪ new) bands join against NEW bands only — a
    // corpus-only bucket has no matching probe key and never enumerates
    // its pairs (a full self-join with an is-new residual predicate
    // would still expand every corpus bucket before filtering). The new
    // side is batch-sized, so AQE typically broadcasts it and the corpus
    // table is a pure scan; new×new pairs arrive from both directions
    // and collapse under least/greatest + distinct.
    val allBands = corpusBands.unionByName(newBands)
    // capped: ranks over the probed buckets' full corpus∪batch
    // membership, so the admitted set equals the capped FULL q64 join
    // restricted to batch-touching pairs (BandCapSpec); None keeps
    // today's exact probe join byte-identical
    val (aSide, nSide) = cap match {
      case None => (allBands, newBands)
      case Some(c) => graft.multimodal.Multimodal
        .cappedProbeSides(allBands, newBands, "doc_id", c)
    }
    // cands feeds the verify joins AND the endpoint filter below — the
    // lazy checkpoint keeps the band-probe join from running twice
    val cands = aSide.as("a")
      .join(nSide.as("n"),
        col("a.band") === col("n.band") && col("a.key") === col("n.key") &&
          col("a.doc_id") =!= col("n.doc_id"))
      .select(least(col("a.doc_id"), col("n.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("n.doc_id")).as("doc_b"))
      .distinct()
      .localCheckpoint(eager = false)
    // Verification only touches the sets of candidate ENDPOINTS — a
    // batch-bounded id set (every pair has a batch side, so endpoints ≤
    // 2·|candidates|). Without the semi-join the daily pass SHUFFLES
    // the whole corpus sets table for a handful of pairs — O(corpus)
    // recurring cost, the exact thing the persisted index exists to
    // avoid (measured on the 10× IndexSoak: the sets exchange dominated
    // the daily leg). The endpoint set broadcasts under AQE, so corpus
    // sets are scan-filtered in place with no corpus-wide exchange.
    val ends = cands
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    // The surviving sets union still needs ONE explicit doc_id exchange:
    // both union children end in an identical hashpartitioning(doc_id,
    // N) exchange (shingledOf's layout), and Spark 4.1 then treats the
    // union itself as co-partitioned, eliding the verify-join-side
    // shuffle — zipping a 2N-partition union leg against an N-partition
    // candidates leg ("Can't zip RDDs with unequal numbers of
    // partitions", observed on the 30× soak once the joins were too big
    // to broadcast). Post-filter the repartition moves candidate-sized
    // rows, not the corpus.
    val sets = corpusSets.unionByName(newSets)
      .join(broadcast(ends), Seq("doc_id"), "left_semi")
      .repartition(newSets.sparkSession.sessionState.conf
        .numShufflePartitions, col("doc_id"))
    verifyPairs(cands, sets)
  }

  /** Batch-id residue selecting the q96 "today's batch" leg: documents
    * with doc_id ≡ 0 (mod 10) arrive today; the rest are the signed
    * corpus. Deterministic and oracle-portable (both engines agree on
    * `%` for non-negative ids). */
  private[operators] val BatchMod = 10

  /** q96: the daily-ingest near-dup flow as an ORACLE query — the shape
    * a 100 TB pipeline actually runs every day, not just the full-corpus
    * pass (VERDICT r4 "What's missing" #2 / "Next round" #5). The corpus
    * leg (doc_id % 10 ≠ 0) is signed via [[signatureTables]] — the
    * tables a real pipeline persists once; the batch leg (doc_id % 10
    * = 0) flows through [[incrementalNearDups]], so candidate pairs
    * REQUIRE a batch-side endpoint and corpus-only buckets never
    * enumerate. Daily cost is O(batch), not O(corpus).
    *
    * Oracle: band keys, shingle sets, and Jaccard are pure per-document
    * functions, so the incremental result equals the FULL q64 pair pass
    * restricted to pairs touching ≥1 batch doc — the invariant
    * LLMQueriesSpec asserts, here hash-checked end to end by DuckDB.
    */
  def incrementalNearDupsDaily(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val corpus = d.filter(col("doc_id") % BatchMod =!= 0)
    val batch = d.filter(col("doc_id") % BatchMod === 0)
    val (corpusBands, corpusSets) = signatureTables(corpus)
    incrementalNearDups(corpusBands, corpusSets, batch)
  }

  /** L92/q192: the persisted verified text PAIR-TABLE lifecycle as an
    * ORACLE query — the q186 collapsed-pair move in Jaccard flavor
    * (VERDICT r12 "Next round" #3): a 100 TB pipeline persists every
    * q64-verified pair the night it appears (IndexStore family
    * `text_near_dup_pairs`) and serves the pair graph from the table,
    * so corpus-corpus pairs are verified once, ever — text is the one
    * modality whose replicas are perturbed real near-dups (no exact
    * canonical collapse), so the persisted artifact is the member-level
    * pair set itself. Rendered here by the oracle-rebuild convention
    * (q103/q104): corpus pairs built in-query, unioned with the q96
    * increment; the real daily path reads the persisted table through
    * [[graft.operators.IndexStore.dailyTextPairs]]. Additivity — pure
    * per-doc signatures make corpus-corpus pairs come only from the
    * persisted side and batch-touching pairs only from the increment —
    * means the union EQUALS the full q64 pass over corpus ∪ batch,
    * which is exactly what the oracle hash-checks. */
  def incrementalTextPairsDaily(spark: SparkSession,
      dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val corpus = d.filter(col("doc_id") % BatchMod =!= 0)
    val batch = d.filter(col("doc_id") % BatchMod === 0)
    val (corpusBands, corpusSets) = signatureTables(corpus)
    minhashPairsOf(corpus)
      .unionByName(incrementalNearDups(corpusBands, corpusSets, batch))
      .orderBy(col("doc_a"), col("doc_b"))
  }

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

  /** L2: MinHash + LSH banding + exact Jaccard on the surviving candidate
    * pairs only. Signature h_j = min over shingles of a seeded md5 prefix;
    * band key = 2 consecutive signature slots; pairs sharing ≥1 band are
    * candidates; Jaccard is then computed exactly from the shingle sets of
    * those pairs alone.
    *
    * Shape: the shingle SET stays a per-row array column — it is computed
    * from `text` alone, so exploding it to rows and re-aggregating (the
    * previous formulation) bought nothing and cost two corpus-wide
    * explode+groupBy shuffles plus two shingle-ROW join shuffles keyed on
    * (doc_id, shingle-string). Per-row arrays make the signature a narrow
    * projection (array_min over a transform — no aggregation at all), the
    * band self-join the ONLY corpus shuffle (tiny (doc_id, band, key)
    * rows; its two legs collapse to one ReusedExchange), and verification
    * two joins against compact per-doc arrays with `array_intersect` —
    * at sf0.1 both verify joins broadcast (candidate side ≪ corpus); at
    * 100 TB they degrade gracefully to doc_id-keyed shuffles of one array
    * row per doc instead of ~250 shingle rows per doc.
    */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    minhashPairsOf(Tables(spark, dir, "documents"))

  private[operators] def minhashPairsOf(docsDf: DataFrame,
      cap: Option[Int] = None): DataFrame = {
    val base = shingledOf(docsDf)
    // the shared-shingle filter inside verifyPairs keeps the exploded
    // formulation's contract (pairs must share ≥1 shingle)
    verifyPairs(minhashCandidatesOf(base, cap), setsOf(base))
  }

  /** MinHash-banded candidate pairs (doc_a < doc_b, distinct) over a
    * [[shingledOf]] frame — the shared candidate-generation stage of
    * q64 (Jaccard verification) and q166 (edit-distance verification).
    * `cap` applies the q191 per-bucket occupancy cap (the admission
    * rule the curve prices — BandCapSpec pins each swept cap's
    * candidate set equal to the curve's admitted set); None = today's
    * exact join, byte-identical plan. */
  private[operators] def minhashCandidatesOf(base: DataFrame,
      cap: Option[Int] = None): DataFrame = {
    // repartition on the join key: both self-join legs then read ONE
    // materialized exchange (ReusedExchange), so the 8-hash signature
    // computation runs once per query instead of once per leg
    val bands0 = bandsOf(base)
      .repartition(base.sparkSession.sessionState.conf.numShufflePartitions,
        col("band"), col("key"))
    val bands = cap.fold(bands0)(
      graft.multimodal.Multimodal.capBands(bands0, "doc_id", _))

    // Pair generation stays a self-join (not groupBy+collect_list pair
    // expansion): a pathological mega-bucket — e.g. thousands of copies of
    // one boilerplate text — would materialize O(bucket²) pairs inside a
    // single collected row, where the join spreads the same pairs across
    // shuffle partitions (and AQE skew-split can cut the hot bucket).
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Text prefix length and acceptance threshold (millis of 1 − the
    * normalized edit distance) for [[editVerifiedDups]]. */
  private val EditPrefChars = 160
  private val EditSimMilli = 550

  /** L47/q166: edit-distance-VERIFIED near-dups — the verification rung
    * the LSH ladder is usually deployed with: MinHash banding proposes
    * candidate pairs (recall stage), and each candidate is CONFIRMED by
    * true normalized edit similarity 1 − lev/max(len) over a bounded
    * text prefix, rather than by the Jaccard estimate q64 reports.
    * Jaccard is order-blind (bag-of-shingles); edit distance is the
    * sequence-aware measure, so the two stages disagree exactly on
    * reordered/shuffled text — which is why production dedup verifies.
    *
    * Determinism: lev and lengths are exact integers; the similarity is
    * an exact integer floor-division in millis (non-negative, so
    * Spark's truncating `div` equals DuckDB's floor `//`).
    *
    * Scale shape: cost is O(candidate pairs × prefix²) — the prefix cap
    * bounds the per-pair DP at 160², and pairs only exist where banding
    * collided (the q64 contract); the prefix join ships ≤160 chars per
    * doc, never full text. */
  def editVerifiedDups(spark: SparkSession, dir: String): DataFrame =
    editVerifiedDupsOf(Tables(spark, dir, "documents"))

  private[operators] def editVerifiedDupsOf(docsDf: DataFrame): DataFrame = {
    val cands = minhashCandidatesOf(shingledOf(docsDf))
    val prefs = docsDf.select(col("doc_id"),
      expr(s"substring(text, 1, $EditPrefChars)").as("pref"))
    cands
      .join(prefs.select(col("doc_id").as("doc_a"), col("pref").as("pa")),
        Seq("doc_a"))
      .join(prefs.select(col("doc_id").as("doc_b"), col("pref").as("pb")),
        Seq("doc_b"))
      .withColumn("lev", levenshtein(col("pa"), col("pb")).cast("long"))
      // lev ≤ max(len) always, so sim ∈ [0, 1000]; the lit(1) floor
      // guards the empty-vs-empty pair (ANSI div-by-zero)
      .withColumn("glen",
        greatest(length(col("pa")), length(col("pb")), lit(1)).cast("long"))
      .withColumn("sim_milli", expr("((glen - lev) * 1000) div glen"))
      .filter(col("sim_milli") >= EditSimMilli)
      .select(col("doc_a"), col("doc_b"), col("lev"), col("sim_milli"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q125 sample stride and ground-truth Jaccard threshold. */
  val MhSampleMod = 10L
  val MhRecallThreshold = 0.5

  /** L37/q125: MinHash-LSH RECALL gate — the dedup-family mirror of the
    * q110 ANN gate: banded candidate generation is probabilistic (a true
    * near-dup pair missing every band is silently lost forever), so a
    * production dedup pipeline audits banding recall against exact
    * Jaccard ground truth on a deterministic sample. Every doc with
    * doc_id % [[MhSampleMod]] == 0 enters the sample; ground truth is
    * the brute-force pair set at Jaccard ≥ [[MhRecallThreshold]];
    * banding is the UNCHANGED q64 band join restricted to the sample.
    * Reported per Jaccard decile — the LSH S-curve made visible: recall
    * must rise toward 1 as similarity rises, and a banding-parameter
    * regression (fewer bands, wider rows) shows up as a dented decile
    * row in CORRECTNESS, not in a lost-forever pair a year later.
    *
    * Scale shape: the ground truth is EXACT without the (n/mod)²/2
    * brute force — a pair at Jaccard ≥ 0.5 must share ≥ 1 shingle, so
    * the pair set comes from the shingle inverted-index equi-join
    * (O(Σ posting²) over the sample; measured 712 → 22 s CPU at the
    * 10× soak vs the broadcast-nested-loop first cut). The sample
    * stride is the audit-cost knob; the banded leg is the production
    * path at sample scale. */
  def minhashRecall(spark: SparkSession, dir: String): DataFrame =
    minhashRecallOf(Tables(spark, dir, "documents"))

  private[operators] def minhashRecallOf(docsDf: DataFrame): DataFrame = {
    val sample = docsDf.filter(col("doc_id") % MhSampleMod === 0)
    val sh = shingledOf(sample)
      .localCheckpoint(eager = false) // feeds srows (×2), sizes, bands
    val sets = setsOf(sh)
    val srows = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val inter = srows.as("a")
      .join(srows.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("ni"))
    val exact = inter
      .join(sets.select(col("doc_id").as("doc_a"), col("n_sh").as("na")),
        Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")),
        Seq("doc_b"))
      .withColumn("j", round(col("ni").cast("double") /
        (col("na") + col("nb") - col("ni")), 6))
      .filter(col("j") >= MhRecallThreshold)
      .select(col("doc_a"), col("doc_b"),
        expr("cast(floor(j * 10) as bigint)").as("jdecile"))
    val bands = bandsOf(sh)
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    exact.join(cands.withColumn("hit", lit(1)), Seq("doc_a", "doc_b"), "left")
      .groupBy(col("jdecile"))
      .agg(count(lit(1)).as("n_true"), count(col("hit")).as("n_hit"))
      .withColumn("recall_micro", expr("n_hit * 1000000L div n_true"))
      .orderBy(col("jdecile"))
  }

  /** L37b/q127: the PRECISION half of the banding audit — q125 measures
    * what banding LOSES (recall of true pairs), this measures what it
    * WASTES: the fraction of banded candidates that survive exact
    * verification at the threshold. Verification cost is proportional
    * to candidates, so a banding-parameter change that floods the
    * verify stage (precision collapse) is a real cluster-cost
    * regression even when recall holds — with both gates in
    * CORRECTNESS, the classic LSH tuning trade (bands↑ ⇒ recall↑,
    * precision↓) is pinned from both sides on the same sample. */
  def minhashPrecision(spark: SparkSession, dir: String): DataFrame =
    minhashPrecisionOf(Tables(spark, dir, "documents"))

  private[operators] def minhashPrecisionOf(docsDf: DataFrame): DataFrame = {
    val sample = docsDf.filter(col("doc_id") % MhSampleMod === 0)
    val base = shingledOf(sample)
      .localCheckpoint(eager = false) // feeds bands and sets
    val bands = bandsOf(base)
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .localCheckpoint(eager = false) // feeds the count and the verify
    val nVerified = verifyPairs(cands, setsOf(base))
      .filter(col("jaccard") >= MhRecallThreshold)
      .agg(count(lit(1)).as("n_verified"))
    cands.agg(count(lit(1)).as("n_cands"))
      .crossJoin(broadcast(nVerified))
      .withColumn("precision_micro",
        when(col("n_cands") === 0, lit(0L))
          .otherwise(expr("n_verified * 1000000L div n_cands")))
  }

  /** L2 (SimHash): 16-bit signature — bit i is the sign of the vote
    * Σ(±1) over distinct tokens, where a token votes +1 on bit i iff the
    * i-th hex digit of its md5 has its high nibble-bit set (digit ≥ '8').
    *
    * Per-row formulation (same idiom as [[shingledDocs]]): the token
    * hashes bind once via a transform, each bit counts its positive
    * votes with `filter`, and sign(Σ±1) ≥ 0 ⟺ 2·(positive votes) ≥ n.
    * No explode, no token-row shuffle, md5 runs once per token instead
    * of once per (token, bit).
    */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val bits = (1 to 16).map { i =>
      expr(s"if(2 * size(filter(hs, h -> substring(h, $i, 1) >= '8'))" +
        " >= size(hs), '1', '0')")
    }
    docs(spark, dir)
      .select(col("doc_id"), expr(
        "transform(array_distinct(split(text, '\\\\s+')), t -> md5(t))")
        .as("hs"))
      .select(col("doc_id"), concat(bits: _*).as("simhash"))
      .orderBy(col("doc_id"))
  }

  private val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is")

  /** L5: per-document text statistics — word/BPE-ish token counts, lexical
    * diversity, stopword ratio, a composite quality score, and an n-gram
    * language-ID heuristic (stopword-density-based).
    */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    docs(spark, dir)
      .withColumn("w", split(col("text"), "\\s+"))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("n_tokens",
        size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0)))
          .cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("w"))).cast("long"))
      .withColumn("n_stop",
        expr(s"size(filter(w, x -> x IN ($stopList)))").cast("long"))
      .withColumn("distinct_ratio",
        round(col("n_distinct").cast("double") / col("n_words"), 6))
      .withColumn("stop_ratio",
        round(col("n_stop").cast("double") / col("n_words"), 6))
      .withColumn("quality",
        round(least(lit(1.0), col("n_words").cast("double") / 120.0) *
          (col("n_distinct").cast("double") / col("n_words")), 6))
      .withColumn("lang_guess",
        when(col("n_stop").cast("double") / col("n_words") >= 0.12, "en")
          .otherwise("other"))
      .select(col("doc_id"), col("lang"), col("n_words"), col("n_tokens"),
        col("n_distinct"), col("n_stop"), col("distinct_ratio"),
        col("stop_ratio"), col("quality"), col("lang_guess"))
      .orderBy(col("doc_id"))
  }

  /** L5/L7: per-language rollup of the text statistics — the
    * language-partitioned pipeline shape (partition key = lang).
    */
  def langRollup(spark: SparkSession, dir: String): DataFrame =
    textStats(spark, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        // integer milli-average: (sum*1000) div n is exact in both engines,
        // where round(sum/n, 6) on doubles is last-ulp unstable across
        // comparators (ADVICE r2 — q62 hash_match=false)
        expr("(sum(n_words) * 1000) div count(*)").as("avg_words_milli"),
        count(when(col("lang_guess") === "en", 1)).as("n_guessed_en"),
        // exact integer micro-units: quality is already rounded to 6 dp,
        // so round(q*1e6) is an exact long in both engines and the sum is
        // order-independent. Integers also dodge comparator dtype traps
        // (decimal→float64 coercion differs between pandas bridges); the
        // mean stays derivable as total_quality_micros / n_docs / 1e6
        sum(round(col("quality") * 1e6).cast("long"))
          .as("total_quality_micros"))
      .orderBy(col("lang"))

  /** L6: TF-IDF-lite — term frequency per doc × ln(N/df), top-3 terms per
    * document (df computed over the full corpus; output limited to
    * doc_id < 50 to keep the verify frame small).
    *
    * `df` is VOCABULARY-sized, so its join strategy is left to AQE (no
    * explicit broadcast hint): testdata vocabularies broadcast; at
    * web-corpus vocabulary size a forced broadcast would OOM the driver
    * and the join degrades gracefully to a t-keyed shuffle — the same
    * caveat [[bm25Topk]] documents for its df table.
    */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val words = docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("t"))
    val tf = words.groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("tf"))
    // df derived FROM tf (one row per (doc,t) already) — shares tf's
    // (doc_id,t) shuffle via exchange reuse instead of a second
    // explode+distinct pass over the corpus
    val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val n = docs(spark, dir).select(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("t"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("t"))
    scored.filter(col("doc_id") < 50)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("t").as("term"),
        col("tf"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  private val Bm25K1 = 1.2
  private val Bm25B = 0.75
  private val Bm25NumQueries = 5
  private val Bm25TopK = 3
  /** Dirichlet prior μ for q163 query-likelihood smoothing. */
  private val QlMu = 300.0
  /** RRF fusion (q164): per-ranker depth, rank constant, fused top-k. */
  private val RrfDepth = 10
  private val RrfKConst = 60
  private val RrfTopK = 5

  /** The per-(doc, term) Okapi contribution in integer micro-units,
    * over columns (tf, df, dl, n_docs, avgdl) — ONE definition shared
    * by q93/q144's batch tail and the streaming search twin, so the
    * three paths can never score differently. */
  private[graft] val Bm25ScoreSql: String =
    s"cast(round(ln((n_docs - df + 0.5d) / (df + 0.5d) + 1.0d)" +
      s" * (tf * ${Bm25K1 + 1}d)" +
      s" / (tf + $Bm25K1 * (1.0d - $Bm25B + $Bm25B * dl / avgdl))" +
      " * 1e6) as bigint)"

  /** Query-independent IMPACT-SCORED postings (the Lucene-impacts /
    * learned-sparse serving trick): a term's BM25 contribution to a
    * document depends only on (tf, df, dl, collection stats) — not on
    * the query — so the whole scoring computation can be baked into the
    * postings once per snapshot. A search then reduces to joining query
    * terms against pre-scored rows and summing. Stats are driver-side
    * literals (one bounded row) so the frame is fully static — what the
    * streaming twin requires for a stateless stream-static join. */
  def bm25ScoredPostings(corpusTf: DataFrame,
      corpusDl: DataFrame): DataFrame = {
    val stats = corpusDl
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")).head()
    val dfT = corpusTf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    corpusTf
      .join(dfT, Seq("t"))
      .join(corpusDl, Seq("doc_id"))
      .withColumn("n_docs", lit(stats.getLong(0)))
      .withColumn("avgdl", lit(stats.getDouble(1)))
      .withColumn("s_micro", expr(Bm25ScoreSql))
      .select(col("t"), col("doc_id"), col("s_micro"))
  }

  /** Lexical top-k retrieval via Okapi BM25 — the standard keyword-search
    * scorer, complementing the embedding-cosine family (q67/q69): the
    * first [[Bm25NumQueries]] documents act as queries (their distinct
    * terms are the query terms) and every other document is ranked by
    *   Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf = ln((N−df+0.5)/(df+0.5)+1).
    *
    * Determinism: each term's contribution is rounded to integer
    * micro-units BEFORE the per-(query, doc) sum — exact integer
    * aggregation, order/partition-independent (the q92 NLL pattern);
    * ln() exposure is the same as q63's TF-IDF.
    *
    * Scale shape: tf is the one corpus-wide shuffle; doc lengths derive
    * from tf (ReusedExchange) rather than a second corpus pass; the
    * query-term set is broadcast (queries are few); df is
    * vocabulary-sized — broadcast here, a t-keyed shuffle join at
    * web-corpus vocab sizes; scoring joins touch only docs sharing a
    * query term; final ranking is per-query top-k (O3 window).
    */
  def bm25Topk(spark: SparkSession, dir: String): DataFrame =
    bm25TopkOf(docs(spark, dir))

  private[operators] def bm25TopkOf(docsDf: DataFrame): DataFrame = {
    val (tf, dl) = bm25Index(docsDf)
    bm25Rank(tf, dl)
  }

  /** The corpus-side BM25 INDEX tables (IndexStore family `bm25`):
    * postings (doc_id, t, tf) and doc lengths (doc_id, dl) — the two
    * artifacts a lexical search engine persists (plus, since round 12,
    * the [[bm25StatsTables]] df/stats pair, so the daily leg merges
    * vocabulary-sized statistics instead of re-counting df over the
    * postings union). The expensive, text-touching step (tokenize +
    * tf) happens exactly once per document here. */
  def bm25Index(docsDf: DataFrame): (DataFrame, DataFrame) = {
    val tf = docsDf
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("t"))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("tf"))
    (tf, tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))
  }

  /** L19b/q144: incremental BM25 — a daily batch becomes searchable by
    * MERGING its postings into the persisted corpus index: tf/dl union,
    * df and collection stats recomputed over the union (they shift with
    * every batch by definition — no frozen-idf drift). Corpus TEXT is
    * never re-tokenized; the recurring cost is the batch tokenize plus
    * slim-row aggregations over the postings table. The ranking tail is
    * [[bm25Rank]] — the SAME definition q93 runs, so the incremental
    * path can never drift from the full pass. */
  def incrementalBm25(corpusTf: DataFrame, corpusDl: DataFrame,
      newDocs: DataFrame): DataFrame = {
    val (btf, bdl) = bm25Index(newDocs)
    bm25Rank(corpusTf.unionByName(btf), corpusDl.unionByName(bdl))
  }

  /** The slim corpus-side BM25 STATISTICS tables (round 12 — the
    * "df/N re-derive per batch" term the 10×/100× lifecycle soaks
    * priced as the family's dominant recurring cost): document
    * frequencies (t, df) — vocabulary-sized — and the 1-row collection
    * stats (n_docs, sum_dl). Both are ADDITIVE over disjoint doc sets
    * (postings hold one row per (doc, t), and corpus/batch doc ids are
    * disjoint by the residue rule), so a daily batch merges them with
    * a vocabulary-sized aggregation instead of re-counting df over the
    * corpus-sized postings union every run. `sum_dl` is an exact long;
    * avgdl derives as sum_dl/n_docs — bit-identical to `avg(dl)`
    * because both are one exact integer sum (≪ 2⁵³) under one IEEE
    * division. */
  def bm25StatsTables(corpusTf: DataFrame,
      corpusDl: DataFrame): (DataFrame, DataFrame) =
    (corpusTf.groupBy(col("t")).agg(count(lit(1)).as("df")),
      corpusDl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("sum_dl")))

  /** Incremental BM25 off the FULL persisted family (postings, doc
    * lengths, df, stats): batch tokenizes once, df/stats merge at
    * vocabulary/1-row size, and the ranking tail scores exactly as
    * [[bm25Rank]] would over the union — the IndexStoreSpec family pin
    * (daily == the q144 twin, which derives df/stats from the postings
    * union) is the equality proof that the merged statistics are the
    * derived ones. */
  def incrementalBm25With(corpusTf: DataFrame, corpusDl: DataFrame,
      corpusDf: DataFrame, corpusStats: DataFrame,
      newDocs: DataFrame): DataFrame = {
    val (btf, bdl) = bm25Index(newDocs)
    val btfc = btf.localCheckpoint(eager = false) // union leg + df leg
    val (bdf, bstats) = bm25StatsTables(btfc, bdl)
    val dfMerged = corpusDf.unionByName(bdf)
      .groupBy(col("t")).agg(sum(col("df")).as("df"))
    val statsMerged = corpusStats.unionByName(bstats)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    bm25RankWith(corpusTf.unionByName(btfc), corpusDl.unionByName(bdl),
      dfMerged, statsMerged)
  }

  /** q144 as an oracle query: corpus index built in-query (as the
    * oracle must), batch merged against it. The union is the whole
    * documents table, so the result IS q93's — one shared oracle. */
  def incrementalBm25Daily(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val (ctf, cdl) = bm25Index(d.filter(col("doc_id") % BatchMod =!= 0))
    incrementalBm25(ctf, cdl, d.filter(col("doc_id") % BatchMod === 0))
  }

  /** The BM25 scoring+ranking tail shared by q93 (full pass) and q144
    * (incremental): expects postings (doc_id, t, tf) and doc lengths
    * (doc_id, dl); derives df and collection stats from them (one slim
    * aggregation — every doc has ≥ 1 posting, so counting dl rows IS
    * counting docs, saving the second corpus scan q93 first carried). */
  private[operators] def bm25Rank(tf: DataFrame, dl: DataFrame,
      k: Int = Bm25TopK): DataFrame =
    bm25RankWith(tf, dl,
      tf.groupBy(col("t")).agg(count(lit(1)).as("df")),
      dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")), k)

  /** The scoring/ranking tail with df and collection stats SUPPLIED —
    * [[bm25Rank]] derives them from the postings (the oracle/full-pass
    * path); the incremental daily leg passes the persisted, merged
    * tables instead (round 12). One scoring definition either way. */
  private[operators] def bm25RankWith(tf: DataFrame, dl: DataFrame,
      df: DataFrame, stats: DataFrame, k: Int = Bm25TopK): DataFrame = {
    val qterms = tf.filter(col("doc_id") < Bm25NumQueries)
      .select(col("doc_id").as("qid"), col("t"))
    val termScores = tf.filter(col("doc_id") >= Bm25NumQueries)
      .join(broadcast(qterms), Seq("t"))
      .join(broadcast(df), Seq("t"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("s_micro", expr(Bm25ScoreSql))
    val perDoc = termScores.groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("s_micro")).as("score_micro"),
        count(lit(1)).as("n_terms"))
    // two-level top-k (the q107/q67 pattern): qid is a constant-
    // cardinality key, and on a common-term query the per-query posting
    // union is corpus-sized — rank within (qid, doc_id-range shard)
    // first so the final qid rank sees shards×K survivor rows
    rankRetrieved(perDoc, k)
  }

  /** The shared two-level per-query top-k tail of the retrieval family
    * (q93/q144 BM25, q163 QL, q164 RRF reuses its rankings): expects
    * (qid, doc_id, score_micro, n_terms). */
  private def rankRetrieved(perDoc: DataFrame, k: Int): DataFrame = {
    val local = Window.partitionBy(col("qid"), col("bshard"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    val survivors = perDoc
      .withColumn("bshard", expr("doc_id div 64"))
      .withColumn("lrk", row_number().over(local))
      .filter(col("lrk") <= k)
      .drop("lrk", "bshard")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    survivors.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("score_micro"), col("n_terms"))
      .orderBy(col("qid"), col("rk"))
  }

  /** The per-(doc, matched-term) query-likelihood contribution in
    * integer micro-units over columns (tf, cf, tot) — the match term of
    * the Dirichlet-smoothed score in its rank-equivalent rewritten form
    * ln(1 + tf·|C| / (μ·cf)). */
  private val QlMatchSql: String =
    // `d` suffixes keep the whole chain in IEEE double (an unsuffixed
    // literal is DECIMAL in Spark SQL; DuckDB divisions are DOUBLE)
    s"cast(round(ln(1.0d + (tf * tot) / (${QlMu}d * cf)) * 1e6) as bigint)"

  /** The per-doc length-normalizer term |q|·ln(μ/(dl+μ)), with the ln
    * rounded to micro-units BEFORE the |q| multiply so the sum stays
    * exact-integer (the q92 NLL pattern). */
  /** The per-doc length term ln(μ/(dl+μ)) alone, micro-rounded — what
    * [[qlScoredPostings]] bakes per doc so the streaming twin only
    * multiplies by the integer query length. */
  private[graft] val QlDnormSql: String =
    s"cast(round(ln(${QlMu}d / (dl + ${QlMu}d)) * 1e6) as bigint)"

  private val QlNormSql: String = s"qlen * $QlDnormSql"

  /** Query-independent IMPACT-SCORED postings for the QL scorer — the
    * same serving trick as [[bm25ScoredPostings]]: the match term
    * depends only on (tf, cf, |C|) and the length normalizer only on
    * dl, so BOTH bake into the postings once per snapshot; a search
    * reduces to joining query terms, summing m_micro, and adding
    * |q| × dnorm_micro. Stats are driver-side literals (one bounded
    * row) so the frame is fully static — what the streaming twin's
    * stateless stream-static join requires. */
  def qlScoredPostings(corpusTf: DataFrame,
      corpusDl: DataFrame): DataFrame = {
    val tot = corpusDl.agg(sum(col("dl"))).head().getLong(0)
    val cf = corpusTf.groupBy(col("t")).agg(sum(col("tf")).as("cf"))
    corpusTf
      .join(cf, Seq("t"))
      .join(corpusDl, Seq("doc_id"))
      .withColumn("tot", lit(tot))
      .withColumn("m_micro", expr(QlMatchSql))
      .withColumn("dnorm_micro", expr(QlDnormSql))
      .select(col("t"), col("doc_id"), col("m_micro"), col("dnorm_micro"))
  }

  /** L19c/q163: query-likelihood retrieval with Dirichlet smoothing —
    * the probabilistic-LM alternative to Okapi BM25 over the SAME
    * postings artifacts:
    *   score(q,d) = Σ_{t∈q∩d} ln(1 + tf·|C|/(μ·cf(t)))
    *                + |q|·ln(μ/(dl+μ)),
    * the standard rewrite of Σ_{t∈q} ln((tf + μ·cf/|C|)/(dl+μ)) that
    * drops the doc-independent Σ ln(μ·cf/|C|) (rank-equivalent) so
    * scoring touches ONLY postings matching a query term — the same
    * candidate contract as BM25, and the reason the persisted `bm25`
    * index family (tf/dl) serves this scorer with zero new artifacts:
    * cf and |C| derive from tf/dl exactly as df/avgdl do.
    *
    * Determinism: per-term micro-unit rounding before the sum; the
    * per-doc normalizer's ln is rounded before the integer |q| multiply.
    * Scale shape: identical to q93 — one corpus tf shuffle (ReusedExchange
    * feeds dl), broadcast query terms, vocabulary-sized cf broadcast
    * (a t-keyed shuffle join at web-corpus vocab), two-level top-k. */
  def qlTopk(spark: SparkSession, dir: String): DataFrame = {
    val (tf, dl) = bm25Index(docs(spark, dir))
    qlRank(tf, dl, Bm25TopK)
  }

  private[operators] def qlRank(tf: DataFrame, dl: DataFrame, k: Int): DataFrame = {
    val cf = tf.groupBy(col("t")).agg(sum(col("tf")).as("cf"))
    val stats = dl.agg(sum(col("dl")).as("tot"))
    val qterms = tf.filter(col("doc_id") < Bm25NumQueries)
      .select(col("doc_id").as("qid"), col("t"))
    val qlen = qterms.groupBy(col("qid")).agg(count(lit(1)).as("qlen"))
    val perDoc = tf.filter(col("doc_id") >= Bm25NumQueries)
      .join(broadcast(qterms), Seq("t"))
      .join(broadcast(cf), Seq("t"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("m_micro", expr(QlMatchSql))
      .groupBy(col("qid"), col("doc_id"), col("dl"))
      .agg(sum(col("m_micro")).as("mm"), count(lit(1)).as("n_terms"))
      .join(broadcast(qlen), Seq("qid"))
      .withColumn("score_micro", col("mm") + expr(QlNormSql))
    rankRetrieved(perDoc, k)
  }

  /** L19d/q164: hybrid-retrieval fusion via Reciprocal Rank Fusion —
    * rrf(d) = Σ_rankers 1/(K + rank_r(d)), the standard score-free way
    * to combine retrieval systems (Cormack et al., SIGIR'09). Fuses the
    * q93 BM25 and q163 QL rankings to depth [[RrfDepth]]; in a hybrid
    * search deployment one leg swaps for the dense ANN tier
    * (q69/q106/q112) — RRF needs only ranks, which is exactly why it is
    * the fusion rule of choice when scores live on different scales.
    *
    * Determinism: contributions are exact integers (1e6 div (K+rank)).
    * Scale shape: both legs share one postings build (identical tf
    * subplans → one exchange); the fused frame is ≤ |queries|·2·depth
    * rows BY CONSTRUCTION at any corpus size, so the final qid window
    * ranks a bounded frame — no shard level needed. */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val (tf, dl) = bm25Index(docs(spark, dir))
    rrfFuse(bm25Rank(tf, dl, RrfDepth).unionByName(qlRank(tf, dl, RrfDepth)))
  }

  /** The exact-integer RRF fusion tail shared by q164 (two lexical
    * legs) and q170 (dense+lexical): expects ranked legs (qid, doc_id,
    * rk, ...) already truncated to depth [[RrfDepth]] each; fuses with
    * 1e6 div (K+rk) contributions and ranks the bounded fused frame. */
  private def rrfFuse(legs: DataFrame): DataFrame = {
    val fused = legs
      .withColumn("contrib",
        expr(s"cast(1000000 div ($RrfKConst + rk) as bigint)"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("contrib")).as("rrf_micro"), count(lit(1)).as("n_sys"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
    fused.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= RrfTopK)
      .select(col("qid"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("rrf_micro"), col("n_sys"))
      .orderBy(col("qid"), col("rk"))
  }

  /** L72/q170: dense+lexical HYBRID retrieval — the deployment q164's
    * RRF exists for (VERDICT r9 "Next round" #1): one leg is the q93
    * BM25 lexical ranking, the other a DENSE embedding leg — per-query
    * cosine ranking over the `embeddings` table (documents↔embeddings
    * share the id space, so vec_id IS the doc_id) through the q69/q87
    * IVF multi-probe tier ([[VectorQueries.denseRankedLeg]]) — fused by
    * the SAME exact-integer RRF rule ([[rrfFuse]], one definition with
    * q164).
    *
    * Why this matters: a synonym page sharing ZERO terms with the query
    * scores nothing under BM25 — no posting matches — but its embedding
    * is close, so the dense leg ranks it and RRF surfaces it
    * (spec-pinned on a synonym-style fixture in LLMQueriesSpec). RRF
    * needs only ranks, which is exactly why hybrid search standardized
    * on it: BM25 micro-units and cosine never need a shared scale.
    *
    * Scale shape: the lexical leg is q93's (one corpus tf shuffle,
    * broadcast query terms, two-level top-k); the dense leg is the IVF
    * cell-pruned scan (partition-pruned at 100 TB) with the same
    * two-level rank; both legs arrive as ≤ |queries|·depth-row frames,
    * so the fused frame is ≤ |queries|·2·depth rows BY CONSTRUCTION at
    * any corpus size. */
  def hybridDenseRrf(spark: SparkSession, dir: String): DataFrame =
    hybridDenseRrfOf(docs(spark, dir), Tables(spark, dir, "embeddings"))

  private[operators] def hybridDenseRrfOf(docsDf: DataFrame,
      emb: DataFrame): DataFrame = {
    val (tf, dl) = bm25Index(docsDf)
    val lex = bm25Rank(tf, dl, RrfDepth)
      .select(col("qid"), col("doc_id"), col("rk"))
    val dense = VectorQueries.denseRankedLeg(emb, Bm25NumQueries, RrfDepth)
      .select(col("qid"), col("doc_id"), col("rk"))
    rrfFuse(lex.unionByName(dense))
  }

  /** L79/q179: RETRIEVAL-QUALITY gate — the q110 pattern applied to the
    * retrieval family (VERDICT r10 "Next round" #2): per variant (q93
    * BM25, q163 QL, q164 lexical-RRF, q170 dense-hybrid, plus the raw
    * q87-tier dense leg for context), exact-integer
    * overlap@[[Bm25TopK]] against a pinned SEMANTIC ground truth — the
    * exact dense scan under the retrieval family's query/corpus split
    * ([[VectorQueries.denseExactLeg]]). A lexical scorer is blind to a
    * synonym page by construction (zero shared terms = zero postings);
    * the hybrid's dense leg is exactly the published fix, and this gate
    * turns that benefit into a MEASURED correctness output the way q110
    * did for ANN recall and q125/q127 for LSH banding, instead of a
    * one-off CI fixture (the synonym fixture in LLMQueriesSpec stays as
    * the qualitative pin, now asserted through this gate too).
    *
    * Scale shape: every variant is its existing proven scan; the
    * overlap join keys on (qid, doc_id) — |queries| × k rows per
    * variant, broadcast-sized by construction (the q110 argument
    * verbatim). Oracle NESTS the five variant oracles and the exact
    * dense fragment, so the gate can never drift from what ships. */
  def retrievalQuality(spark: SparkSession, dir: String): DataFrame =
    retrievalQualityOf(docs(spark, dir), Tables(spark, dir, "embeddings"))

  private[operators] def retrievalQualityOf(docsDf: DataFrame,
      emb: DataFrame): DataFrame = {
    val k = Bm25TopK
    val (tf, dl) = bm25Index(docsDf)
    val truth = VectorQueries.denseExactLeg(emb, Bm25NumQueries, k)
      .select(col("qid"), col("doc_id"))
      .localCheckpoint(eager = false) // feeds the join and the total
    val variants: Seq[(String, DataFrame)] = Seq(
      "bm25" -> bm25Rank(tf, dl, k),
      "dense_ivf" -> VectorQueries.denseRankedLeg(emb, Bm25NumQueries, k),
      "hybrid_dense" ->
        hybridDenseRrfOf(docsDf, emb).filter(col("rk") <= k),
      "ql" -> qlRank(tf, dl, k),
      "rrf" -> rrfFuse(bm25Rank(tf, dl, RrfDepth)
        .unionByName(qlRank(tf, dl, RrfDepth))).filter(col("rk") <= k))
    val union = variants.map { case (name, df) =>
      df.select(lit(name).as("variant"), col("qid"), col("doc_id"))
    }.reduce(_.unionByName(_))
      .localCheckpoint(eager = false) // feeds the hit join + truth mass
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    // CONTINUOUS companion metric (VERDICT r11 "Next round" #4, the
    // q110 truth-mass move): overlap@3 over 10 queries is 30 indicator
    // draws; the exact micro-integer sum of the TRUE dense cosines of
    // each variant's returned docs moves whenever the returned sets
    // differ at all. Variant outputs are queries×k rows, so both
    // vector joins are broadcast-sized.
    val ev = VectorQueries.vecsOf(emb)
    val truthMass = ev
      .select(col("vec_id").as("doc_id"), col("v").as("nv"))
      .join(broadcast(union), Seq("doc_id"))
      .join(broadcast(ev.filter(col("vec_id") < Bm25NumQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv"))), Seq("qid"))
      .withColumn("cos_micro",
        round(round(graft.functions.CosineSimilarity.cosineSim(
          col("nv"), col("qv")), 6) * 1e6).cast("long"))
      .groupBy(col("variant"))
      .agg(sum(col("cos_micro")).as("truth_mass_micro"))
    union
      .join(truth.withColumn("hit", lit(1)), Seq("qid", "doc_id"), "left")
      .groupBy(col("variant"))
      .agg(count(col("hit")).as("hits"))
      .crossJoin(broadcast(nTruth))
      .join(truthMass, Seq("variant"))
      .select(col("variant"), col("hits"), col("n_truth"),
        // both operands non-negative: Spark div ≡ DuckDB //
        expr("hits * 1000000L div n_truth").as("overlap_micro"),
        col("truth_mass_micro"))
      .orderBy(col("variant"))
  }

  /** Top pair count for [[bpePairCounts]]. */
  private val BpeTopPairs = 20

  /** BPE tokenizer training, step one: corpus-wide adjacent character-pair
    * frequencies (each pair weighted by its word's corpus frequency) —
    * the statistic the first BPE merge maximizes. At round 0 every
    * symbol is a single char, so an adjacent SYMBOL pair coincides with
    * a 2-char substring, which both engines slice identically — no
    * engine-specific char-split is needed for this first-round
    * statistic. The actual training loop ([[bpeMergeLoop]], q108) is
    * full symbol-level BPE over symbol ARRAYS: later rounds recount
    * pairs over merged symbols, so merge №2 can consume merge №1's
    * output symbol (cascading-merge fixture pinned in LLMQueriesSpec).
    *
    * Scale shape: the word-frequency aggregation is the only corpus-wide
    * shuffle (vocabulary-sized output); pair counting then runs over the
    * VOCABULARY (times ~word-length pairs each), not the corpus — the
    * same collapse a real BPE trainer relies on. Top pairs via
    * TakeOrderedAndProject (deterministic total+pair tie-break), never a
    * global-window single reducer.
    */
  def bpePairCounts(spark: SparkSession, dir: String): DataFrame =
    bpePairCountsOf(docs(spark, dir))

  private[operators] def bpePairCountsOf(docsDf: DataFrame): DataFrame = {
    val wc = docsDf
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
    wc.filter(length(col("t")) >= 2)
      .select(col("n"), explode(expr(
        "transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("n")).as("total"))
      .orderBy(col("total").desc, col("pair"))
      .limit(BpeTopPairs)
  }

  /** Merge rounds for the BPE training loop (q108). */
  private[operators] val BpeMergeRounds = 4

  /** L20b: the BPE tokenizer-training LOOP — q94 stops at the statistic
    * the first merge maximizes; this runs the actual training iteration
    * (pick best pair → apply the merge to every vocabulary word →
    * recount → repeat) for [[BpeMergeRounds]] rounds and emits the merge
    * table, the artifact a tokenizer trainer persists (VERDICT r8 "Next
    * round" #2).
    *
    * Greedy left-to-right merge without a sequential fold: a position i
    * is marked iff (s[i], s[i+1]) is the best pair; marked positions are
    * only ever ADJACENT when pa = pb (runs of a repeated symbol), and
    * greedy scanning keeps exactly the even-offset marks of each maximal
    * marked run. That turns the merge into three pure array lambdas
    * (marks → kept → rebuild), identical in Spark and DuckDB — no UDF,
    * no explode, no per-word recursion. The kept lambda's run-start
    * search is O(word²) worst case, on vocabulary words (≤ ~20 chars),
    * not corpus text.
    *
    * Scale shape, per round: pair recount = one vocabulary-sized groupBy
    * (map-side combined); best pair = TakeOrderedAndProject(1); merge =
    * a broadcast single-row cross join + narrow projection. Rounds are
    * driver-side plan iterations with lineage truncated per round (the
    * star-CC pattern); at a real tokenizer's 50k merges the same loop
    * runs with the vocabulary cached — nothing here is corpus-sized
    * after the initial word count.
    */
  def bpeMergeLoop(spark: SparkSession, dir: String): DataFrame =
    bpeMergeLoopOf(docs(spark, dir), BpeMergeRounds)

  private[operators] def bpeMergeLoopOf(
      docsDf: DataFrame, rounds: Int): DataFrame =
    bpeLoop(docsDf, rounds)._1.get.orderBy(col("round"))

  /** The trained vocabulary after `rounds` merges: (t, s, n) with `s`
    * the word's final symbol sequence — what [[bpeTokenize]] applies.
    * private[graft] so [[graft.BpeSoak]] can price realistic merge
    * counts. */
  private[graft] def bpeVocabAfter(
      docsDf: DataFrame, rounds: Int): DataFrame =
    bpeLoop(docsDf, rounds)._2

  private def bpeLoop(
      docsDf: DataFrame, rounds: Int): (Option[DataFrame], DataFrame) = {
    // initial vocabulary: word → corpus frequency, word as char symbols.
    // Single-char words can never merge nor contribute pairs — dropped,
    // matching q94's pair universe (length >= 2). The original word `t`
    // rides along so the trained vocabulary can be joined back to text.
    var vocab = docsDf
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .filter(length(col("t")) >= 2)
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
      .select(col("t"), expr(
        "transform(sequence(1, length(t)), i -> substring(t, i, 1))")
        .as("s"), col("n"))
      .localCheckpoint(eager = false)
    var out: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      // recount adjacent pairs over the CURRENT vocabulary (weighted by
      // word frequency), then take the single best (total desc, then
      // lexicographic pair — the portable tie-break)
      val best = vocab
        .filter(size(col("s")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(s) - 1)," +
            " i -> struct(element_at(s, i) AS pa," +
            " element_at(s, i + 1) AS pb))")).as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum(col("n")).as("total"))
        .orderBy(col("total").desc, col("pa"), col("pb"))
        .limit(1)
        .localCheckpoint(eager = false) // feeds output row + merge join
      val row = best.select(lit(r).cast("long").as("round"),
        col("pa"), col("pb"), col("total"))
      out = Some(out.map(_.unionByName(row)).getOrElse(row))
      // LEFT join on the 1-row best pair, not a cross join: once the
      // pair space is EXHAUSTED (every word fully merged — reachable at
      // realistic merge counts, see BpeSoak) `best` is empty, and a
      // cross join would silently erase the vocabulary; under the left
      // join pa/pb are null, no position marks, and every word passes
      // through unchanged — training becomes a fixed point, which is
      // what a real trainer's early-stop produces. Identical output
      // whenever a best pair exists (the q108 oracle regime).
      vocab = vocab.join(broadcast(best.select(col("pa"), col("pb"))),
          lit(true), "left")
        // marks[i] ⟺ (s[i], s[i+1]) is the best pair (1-based, empty
        // for 1-symbol words — sequence(1, 0) DESCENDS in Spark, guard)
        .withColumn("marks", expr(
          "if(size(s) >= 2, transform(sequence(1, size(s) - 1)," +
            " i -> element_at(s, i) = pa AND element_at(s, i + 1) = pb)," +
            " cast(array() as array<boolean>))"))
        // greedy keep: within each maximal run of marks keep even
        // offsets from the run start (runs only exist when pa = pb)
        .withColumn("kept", expr(
          "if(size(marks) = 0, cast(array() as array<boolean>)," +
            " transform(sequence(1, size(marks))," +
            " i -> element_at(marks, i) AND (i - 1 -" +
            " coalesce(array_max(filter(sequence(1, size(marks))," +
            " j -> j < i AND NOT element_at(marks, j))), 0)) % 2 = 0))"))
        // rebuild: kept position emits the merged symbol, the position
        // after a kept one is consumed, everything else passes through
        .select(col("t"), expr(
          "if(size(kept) = 0, s, flatten(transform(sequence(1, size(s))," +
            " i -> CASE WHEN i < size(s) AND element_at(kept, i)" +
            " THEN array(concat(element_at(s, i), element_at(s, i + 1)))" +
            " WHEN i > 1 AND element_at(kept, i - 1)" +
            " THEN cast(array() as array<string>)" +
            " ELSE array(element_at(s, i)) END)))").as("s"), col("n"))
        // truncate per-round lineage; EAGERLY every 16 rounds — a lazy
        // checkpoint only truncates after its first action, so a long
        // training run (BpeSoak at 256 merges) otherwise serializes the
        // whole multi-hundred-round RDD chain into each task and dies
        // in a deserialization StackOverflowError (~round 200,
        // measured). Eager every 16 bounds the chain at 16 rounds and
        // changes nothing at the shipped 4-round queries.
        .localCheckpoint(eager = r % 16 == 0)
    }
    (out, vocab)
  }

  /** L20c: tokenize the corpus with the TRAINED tokenizer — apply the
    * q108 merge table and count per-document tokens, the statistic every
    * training-data budget is denominated in (q61's whitespace/regex
    * counts approximate it; this is the real number under the learned
    * vocabulary). Scale shape: the merges run over the VOCABULARY
    * (q108's loop, unchanged); the corpus-sized work is one word explode
    * joined to the broadcast-sized vocabulary and a doc_id-keyed sum —
    * exactly how a production tokenizer amortizes (encode each distinct
    * word once, not each occurrence). Words under 2 chars are single
    * tokens by construction (never merge), covered by the coalesce. */
  def bpeTokenize(spark: SparkSession, dir: String): DataFrame =
    bpeTokenizeOf(docs(spark, dir), BpeMergeRounds)

  /** The trained vocabulary as the PERSISTABLE artifact (t, n_tok) —
    * what a production pipeline writes once per tokenizer release
    * (IndexStore family `bpe_vocab`). */
  private[operators] def bpeVocabOf(d: DataFrame, rounds: Int): DataFrame =
    bpeVocabAfter(d, rounds)
      .select(col("t"), size(col("s")).cast("long").as("n_tok"))

  /** Apply a (possibly disk-read) trained vocabulary to a document
    * frame — the daily leg of the tokenizer lifecycle. */
  private[operators] def tokenizeWithVocab(tokens: DataFrame,
      d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("t"))
      .filter(length(col("t")) >= 1)
      .join(broadcast(tokens), Seq("t"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_tok"), lit(1L))).as("n_tokens"))
      .orderBy(col("doc_id"))

  private[operators] def bpeTokenizeOf(d: DataFrame, rounds: Int): DataFrame =
    tokenizeWithVocab(bpeVocabOf(d, rounds), d)

  /** L20d/q134: tokenizer FERTILITY by language — the per-release
    * evaluation every multilingual tokenizer gets: tokens-per-word
    * (fertility) and chars-per-token under the trained vocabulary,
    * aggregated per language. A language with outlier fertility is
    * under-served by the merge table (its words shatter into chars),
    * which silently taxes its effective context window and its share
    * of a token-denominated training budget — the number a mixture
    * designer reads next to q90/q133.
    *
    * Scale shape: q113's tokenize (merges run over the VOCABULARY, the
    * corpus-sized work is one explode + broadcast join + doc_id sum)
    * followed by one |languages|-row aggregate; ratios are exact
    * integer micro-units (non-negative, so Spark `div` == DuckDB
    * `//`). */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    bpeTokenizeOf(d, BpeMergeRounds)
      .join(d.select(col("doc_id"), col("lang"), col("n_chars")), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .withColumn("fertility_micro",
        expr("n_tokens * 1000000L div n_words"))
      .withColumn("chars_per_token_micro",
        expr("n_chars * 1000000L div n_tokens"))
      .orderBy(col("lang"))
  }

  /** Chunk window and stride (words) for q123; stride < window, so
    * consecutive chunks overlap by ChunkTokens − ChunkStride words — the
    * standard RAG/embedding chunker contract (boundary-straddling
    * content appears intact in at least one chunk). */
  val ChunkTokens = 64
  val ChunkStride = 48

  /** L35/q123: overlapping token-window CHUNKING — the primitive between
    * curation and embedding in every retrieval/embedding pipeline: each
    * document becomes ceil-covering [[ChunkTokens]]-word windows at
    * [[ChunkStride]] word steps with stable (doc_id, chunk_idx) keys, so
    * chunk embeddings stay joinable back to their documents across
    * reruns and appends. Short docs yield exactly one (possibly short)
    * chunk; the final window may be a partial tail.
    *
    * Scale shape: a pure per-row lambda (the word array binds once — the
    * [[fingerprintExpr]] idiom) into ONE posexplode; no join, no
    * aggregation, no shuffle beyond the output's ORDER BY. Chunk count
    * is 1 + ceil((n − window)/stride) — identical integer arithmetic in
    * both engines. */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame =
    chunkDocsOf(docs(spark, dir))

  private[operators] def chunkDocsOf(d: DataFrame): DataFrame = {
    val chunksExpr = expr(
      "transform(array(split(text, '\\\\s+')), w -> " +
        s"transform(sequence(0, greatest(1, cast(ceil((size(w) - " +
        s"$ChunkTokens) / ${ChunkStride}.0d) as int) + 1) - 1), " +
        s"i -> concat_ws(' ', slice(w, i * $ChunkStride + 1, " +
        s"$ChunkTokens))))[0]")
    d.select(col("doc_id"), chunksExpr.as("cl"))
      .select(col("doc_id"), posexplode(col("cl")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        size(split(col("col"), "\\s+")).cast("long").as("n_tokens"),
        col("col").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Rolling-hash winnowing fingerprint as ONE narrow per-row expression:
    * min seeded-md5 prefix over the 5-word shingles (docs under 5 words
    * fall back to hashing the whole text). The same lambda-bind idiom as
    * [[shingledDocs]] — the word array binds once, so the regex split
    * runs once per document, and there is no explode, no gram-row
    * shuffle, and no aggregation at all (a 10× corpus soak measured the
    * exploded formulation superlinear: 12.5M gram rows through a groupBy
    * vs a pure projection here).
    */
  private val fingerprintExpr = expr(
    "array_min(transform(" +
      "transform(array(split(text, '\\\\s+'))," +
      " w -> if(size(w) >= 5," +
      " transform(sequence(0, size(w)-5)," +
      " i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))," +
      " array(text)))[0]," +
      " g -> substring(md5(g), 1, 12)))")

  /** q61's composite quality score as a per-row expression (same
    * lambda-bind idiom). */
  private[graft] val qualityExpr = expr(
    "round(transform(array(split(text, '\\\\s+'))," +
      " w -> least(1.0d, size(w) / 120.0d)" +
      " * (size(array_distinct(w)) / cast(size(w) as double)))[0], 6)")

  /** Rolling-hash document fingerprint (winnowing-lite): the minimum seeded
    * md5 prefix over 5-word shingles is a locality-sensitive fingerprint;
    * docs sharing one are near-dup cluster mates.
    *
    * `cluster_size` comes from a partial-aggregating groupBy + join-back,
    * NOT a fingerprint-partitioned window: a boilerplate fingerprint
    * shared by millions of docs would funnel every copy through ONE
    * window reducer, where the aggregate map-side-combines it and the
    * join-back is AQE-skew-splittable (the q89 segment-keeper argument,
    * backported — VERDICT r4 "What's wrong" #2).
    */
  def docFingerprints(spark: SparkSession, dir: String): DataFrame = {
    // materialized: fps feeds BOTH the sizes aggregate and the join-back
    // leg, and the md5-per-5-gram fingerprint is the query's entire CPU —
    // without the checkpoint each consumer re-evaluates the fingerprint
    // subtree (~2× avoidable CPU; the q96 newBands pattern, VERDICT r5/r6
    // "What's wrong" #2). eager=false so merely CONSTRUCTING the frame
    // (plan audits, .explain) costs nothing — the scan+md5 job runs on
    // first action only (ADVICE r7 #3). Executor-local like
    // connectedComponents' truncation: on a real cluster with executor
    // loss, swap for reliable checkpoint() on a configured checkpoint dir.
    val fps = docs(spark, dir)
      .select(col("doc_id"), fingerprintExpr.as("fingerprint"))
      .localCheckpoint(eager = false)
    val sizes = fps.groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("cluster_size"))
    fps.join(sizes, Seq("fingerprint"))
      .select(col("doc_id"), col("fingerprint"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  /** L1b: dedup-keep-best — the corpus-curation policy: within each
    * fingerprint cluster (q70's winnowing key) keep the document with the
    * highest quality score (q61's metric), tie-broken by doc_id. The
    * survivors frame is what a training pipeline feeds downstream.
    *
    * Fingerprint and quality are both per-row expressions over the same
    * document row, so the former fps⋈quality self-join is gone — one
    * projection feeds the per-cluster election directly.
    *
    * Election is ONE partial-aggregating groupBy (`max(struct(quality,
    * -doc_id))` ⟺ max quality, min doc_id tie-break), NOT a
    * fingerprint-partitioned `row_number` window — the same hot-key
    * argument as [[docFingerprints]]: a mega-cluster map-side-combines
    * under the aggregate where a window would single-reduce it.
    */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), fingerprintExpr.as("fingerprint"),
        qualityExpr.as("quality"))
      .groupBy(col("fingerprint"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("nid"))).as("best"),
        count(lit(1)).as("cluster_size"))
      .select(col("fingerprint"), (-col("best.nid")).as("kept_id"),
        col("best.quality").as("quality"), col("cluster_size"))
      .orderBy(col("kept_id"))

  /** Character-n-gram profiles per language (public-linguistics common
    * trigram sets; the synthetic corpus is same-vocab across langs, so
    * this exercises the MECHANISM — profile-count scoring with a
    * deterministic argmax — not real-world accuracy). */
  private val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("sch", "ein", "der"),
    "en" -> Seq("the", "ing", "and"),
    "es" -> Seq("los", "que", "cio"),
    "fr" -> Seq("les", "ent", "des"),
    "zh" -> Seq("zh", "ng", "sh"))

  /** Occurrence count of a literal substring via the replace trick —
    * identical semantics in Spark and DuckDB. */
  private def occSql(colName: String, g: String): String =
    s"(length($colName) - length(replace($colName, '$g', ''))) / ${g.length}"

  /** L5 (n-gram lang-ID): score each language's trigram profile against
    * the text, predict the argmax (ties break alphabetically via the CASE
    * order). One narrow projection pass — no explode, no shuffle except
    * the final rollup.
    */
  /** The q73 scorer, factored so the doc-level classifier (q73) and the
    * segment-level code-switch scan (q162) share ONE definition: per
    * language, the profile-trigram occurrence sum over a column named
    * `t`, and the argmax CASE (ties break by profile order). */
  private val langScoreCols = LangProfiles.map { case (lang, grams) =>
    expr(grams.map(g => occSql("t", g)).mkString(" + ")).as(s"s_$lang")
  }
  private val langPredSql = {
    val langs = LangProfiles.map(_._1)
    langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"s_$l >= s_$o")
        .mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString("CASE ", " ", " END")
  }

  def langIdNgram(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("lang"), lower(col("text")).as("t"))
      .select(Seq(col("doc_id"), col("lang")) ++ langScoreCols: _*)
      .withColumn("pred_lang", expr(langPredSql))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))

  /** Segment width (words) for q162's code-switch scan — short enough
    * that a half-and-half bilingual page yields several segments of
    * each kind at every sf. */
  private[operators] val MixSegWords = 20

  /** Minority share above which a doc is flagged mixed (30%). */
  private[operators] val MixedThresholdMicro = 300000L

  /** L65/q162: CODE-SWITCHING / language-MIX detection — the curation
    * gap a per-doc classifier cannot see: q73's argmax happily labels a
    * half-German page "en", and a monolingual training mix silently
    * ingests the German half. Per doc: segment the lowercased word
    * array into [[MixSegWords]]-word chunks, lang-ID each segment with
    * the SAME trigram profiles and argmax CASE as q73 (one definition —
    * the two scorers cannot drift), majority-vote the primary language
    * (ties: fewer-segments loses, then profile order), and report the
    * minority share in micro units plus the `is_mixed` flag a routing
    * gate consumes (mixed docs go to splitting or exclusion, not to a
    * monolingual shard — the q62 partitioned pipeline upstream).
    *
    * Scale shape: one projection explodes each doc into O(words /
    * [[MixSegWords]]) slim (doc_id, segment-scores) rows — text dies at
    * the scan; the shuffles carry (doc_id, pred) counts only, two
    * partial-aggregating groupBys, no window (the majority vote is a
    * min(struct) aggregate — a mega-doc map-side-combines). */
  def langMixReport(spark: SparkSession, dir: String): DataFrame =
    langMixReportDocs(docs(spark, dir))

  private[graft] def langMixReportDocs(docsDf: DataFrame): DataFrame = {
    val segs = docsDf
      .select(col("doc_id"), col("lang"), expr(
        s"""transform(array(split(lower(text), '\\\\s+')), w ->
           |  transform(sequence(0,
           |      cast(ceil(size(w) / ${MixSegWords}.0) as int) - 1),
           |    i -> array_join(
           |      slice(w, i * $MixSegWords + 1, $MixSegWords), ' ')))[0]
           |""".stripMargin).as("segarr"))
      .select(col("doc_id"), col("lang"), explode(col("segarr")).as("t"))
    val perPred = segs
      .select(Seq(col("doc_id"), col("lang")) ++ langScoreCols: _*)
      .withColumn("pred", expr(langPredSql))
      .groupBy(col("doc_id"), col("lang"), col("pred"))
      .agg(count(lit(1)).as("cnt"))
    perPred.groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("cnt")).as("n_segments"),
        min(struct((-col("cnt")).as("nc"), col("pred"))).as("best"))
      .select(col("doc_id"), col("lang"),
        col("best.pred").as("primary_lang"), col("n_segments"),
        (-col("best.nc")).as("n_primary"),
        expr("(n_segments - (-best.nc)) * 1000000L div n_segments")
          .as("mix_micro"))
      .withColumn("is_mixed", col("mix_micro") >= MixedThresholdMicro)
      .orderBy(col("doc_id"))
  }

  val queries: ListMap[String, graft.Q] = ListMap(
    "q60_exact_dedup" -> (exactDedup _),
    "q136_normalized_dedup" -> (normalizedDedup _),
    "q139_incremental_normalized_dedup" -> (incrementalNormalizedDedupDaily _),
    "q144_incremental_bm25" -> (incrementalBm25Daily _),
    "q71_dedup_keep_best" -> (dedupKeepBest _),
    "q73_langid_ngram" -> (langIdNgram _),
    "q162_lang_mix" -> (langMixReport _),
    "q61_text_stats" -> (textStats _),
    "q62_lang_rollup" -> (langRollup _),
    "q63_tfidf_top_terms" -> (tfidfTopTerms _),
    "q93_bm25_topk" -> (bm25Topk _),
    "q163_ql_topk" -> (qlTopk _),
    "q164_rrf_fusion" -> (rrfFusion _),
    "q170_hybrid_dense_rrf" -> (hybridDenseRrf _),
    "q179_retrieval_quality" -> (retrievalQuality _),
    "q94_bpe_pairs" -> (bpePairCounts _),
    "q108_bpe_merge_loop" -> (bpeMergeLoop _),
    "q113_bpe_tokenize" -> (bpeTokenize _),
    "q134_tokenizer_fertility" -> (tokenizerFertility _),
    "q123_chunk_docs" -> (chunkDocs _),
    "q64_minhash_pairs" -> (minhashPairs _),
    "q189_text_band_occupancy" -> (textBandOccupancy _),
    "q191_text_band_cap_curve" -> (textBandCapCurve _),
    "q166_edit_verified_dups" -> (editVerifiedDups _),
    "q125_minhash_recall" -> (minhashRecall _),
    "q127_minhash_precision" -> (minhashPrecision _),
    "q96_incremental_near_dups" -> (incrementalNearDupsDaily _),
    "q192_incremental_text_pairs" -> (incrementalTextPairsDaily _),
    "q97_incremental_exact_dedup" -> (incrementalExactDedupDaily _),
    "q66_simhash_signatures" -> (simhashSignatures _),
    "q70_doc_fingerprints" -> (docFingerprints _))

  // ---- oracle SQL -----------------------------------------------------

  /** Unrolled BPE-training CTEs (the q100 kmeans pattern): `v0` is the
    * char-split vocabulary with the original word `t` carried through;
    * per round r, `b{r}` picks the best pair and `v{r}` applies the
    * SAME positional greedy-merge lambdas as the engine (micro-tested
    * equivalent). Shared by q108 (merge table) and q113 (tokenize), so
    * the training oracle and the application oracle cannot drift. */
  private def bpeCtes(rounds: Int): String = {
    def bestCte(r: Int) =
      s"""b$r AS (
         |  SELECT pa, pb, CAST(sum(n) AS BIGINT) AS total
         |  FROM (SELECT s[i] AS pa, s[i + 1] AS pb, n
         |        FROM v${r - 1}, LATERAL unnest(range(1, len(s))) AS x(i))
         |  GROUP BY pa, pb ORDER BY total DESC, pa, pb LIMIT 1)""".stripMargin
    def mergeCte(r: Int) =
      s"""v$r AS (
         |  SELECT t, CASE WHEN len(kept) = 0 THEN s
         |    ELSE flatten(list_transform(range(1, len(s) + 1),
         |      i -> CASE WHEN i < len(s) AND kept[i] THEN [s[i] || s[i + 1]]
         |                WHEN i > 1 AND kept[i - 1] THEN []::VARCHAR[]
         |                ELSE [s[i]] END)) END AS s, n
         |  FROM (
         |    SELECT t, s, n, CASE WHEN len(marks) = 0 THEN []::BOOLEAN[]
         |      ELSE list_transform(range(1, len(marks) + 1),
         |        i -> marks[i] AND (i - 1 - coalesce(list_max(list_filter(
         |          range(1, len(marks) + 1), j -> j < i AND NOT marks[j])),
         |          0)) % 2 = 0) END AS kept
         |    FROM (
         |      SELECT t, s, n, CASE WHEN len(s) >= 2
         |        THEN list_transform(range(1, len(s)),
         |               i -> s[i] = b.pa AND s[i + 1] = b.pb)
         |        ELSE []::BOOLEAN[] END AS marks
         |      FROM v${r - 1}, b$r AS b)))""".stripMargin
    s"""v0 AS (
       |  SELECT t, list_transform(range(1, length(t) + 1),
       |           i -> substr(t, i, 1)) AS s, n
       |  FROM (SELECT t, count(*) AS n
       |        FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS t
       |              FROM documents)
       |        WHERE length(t) >= 2 GROUP BY t)),
       |""".stripMargin +
      (1 to rounds).map(r => s"${bestCte(r)},\n${mergeCte(r)}")
        .mkString(",\n")
  }

  private def shingleCteOf(where: String) =
    s"""sh AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
      |    THEN list_transform(range(1, len(w)-1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      |    ELSE [] END) AS sh
      |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS w
      |        FROM documents $where)),
      |srows AS (SELECT doc_id, unnest(sh) AS s FROM sh),
      |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh)
      |""".stripMargin

  private val shingleCte = shingleCteOf("")

  /** The shingle → signature → band-key CTE prefix (ends in
    * `bands(doc_id, band, key)`) — shared by the pair CTEs below and
    * the q189 band-occupancy oracle so the audited banding is exactly
    * the pair join's. */
  private[operators] def minhashBandCtesOf(where: String): String =
    (s"${shingleCteOf(where)}," +
    s"""sigs AS (
       |  SELECT doc_id,
       |    ${(0 until NumHashes).map(j =>
            s"min(substr(md5('$j:' || s), 1, 16)) AS h$j").mkString(",\n    ")}
       |  FROM srows GROUP BY doc_id),
       |bands AS (
       |  ${(0 until NumHashes / RowsPerBand).map(b =>
            s"SELECT doc_id, $b AS band, h${2 * b} || h${2 * b + 1} AS key FROM sigs")
            .mkString("\n  UNION ALL ")})""".stripMargin)

  /** The full q64 pipeline as composable CTEs ending in `pairs_all`
    * (doc_a, doc_b, n_inter, jaccard) — shared with q77's cluster
    * formation so the two oracles can't drift apart. */
  private[operators] def minhashPairsCtesOf(where: String): String =
    (s"${minhashBandCtesOf(where)}," +
    s"""
       |cands AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |inter AS (
       |  SELECT doc_a, doc_b, count(*) AS n_inter
       |  FROM cands
       |  JOIN srows sa ON sa.doc_id = doc_a
       |  JOIN srows sb ON sb.doc_id = doc_b AND sa.s = sb.s
       |  GROUP BY doc_a, doc_b),
       |pairs_all AS (
       |  SELECT doc_a, doc_b, n_inter,
       |    round(CAST(n_inter AS DOUBLE) /
       |          (za.n_sh + zb.n_sh - n_inter), 6) AS jaccard
       |  FROM inter
       |  JOIN sizes za ON za.doc_id = doc_a
       |  JOIN sizes zb ON zb.doc_id = doc_b)
       |""".stripMargin)

  private[operators] val minhashPairsCtes: String = minhashPairsCtesOf("")

  private val simhashVotes = (1 to 16).map(i =>
    s"sum(CASE WHEN substr(md5(t), $i, 1) >= '8' THEN 1 ELSE -1 END) AS v$i")
    .mkString(",\n    ")
  private val simhashBits = (1 to 16).map(i =>
    s"CASE WHEN v$i >= 0 THEN '1' ELSE '0' END").mkString(" || ")

  private val statsCte =
    """stats AS (
      |  SELECT doc_id, lang,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
      |    CAST(len(list_filter(w,
      |      x -> x IN ('the','a','and','of','to','in','is'))) AS BIGINT) AS n_stop
      |  FROM (SELECT doc_id, lang, text,
      |          string_split_regex(text, '\s+') AS w FROM documents))
      |""".stripMargin

  /** q113's oracle SQL, shared with the q134 fertility composition. */
  private def bpeTokenizeSql: String =
    s"""WITH ${bpeCtes(BpeMergeRounds)},
       |tok AS (SELECT t, CAST(len(s) AS BIGINT) AS n_tok
       |        FROM v$BpeMergeRounds),
       |words AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS t
       |  FROM documents),
       |ws AS (SELECT doc_id, t FROM words WHERE length(t) >= 1)
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(coalesce(n_tok, 1)) AS BIGINT) AS n_tokens
       |FROM ws LEFT JOIN tok USING (t)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Shared corpus-side CTEs of the retrieval family (word stream,
    * postings, doc lengths, query terms) — the q93/q144 BM25, q163 QL,
    * and q164 RRF oracles all rank over exactly these. */
  private val retrievalCtes: String =
    s"""words AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS t
       |  FROM documents),
       |tf AS (SELECT doc_id, t, count(*) AS tf FROM words GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
       |       FROM tf GROUP BY doc_id),
       |qterms AS (SELECT doc_id AS qid, t FROM tf
       |           WHERE doc_id < $Bm25NumQueries)""".stripMargin

  /** BM25 CTE block → per-(query, doc) relation `perdoc`. */
  private val bm25Block: String =
    s"""df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
       |stats AS (
       |  SELECT (SELECT count(*) FROM documents) AS n_docs,
       |         (SELECT avg(dl) FROM dl) AS avgdl),
       |ts AS (
       |  SELECT qid, tf.doc_id,
       |    CAST(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
       |      * (tf * ${Bm25K1 + 1})
       |      / (tf + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * dl / avgdl))
       |      * 1e6) AS BIGINT) AS s_micro
       |  FROM tf
       |  JOIN qterms USING (t)
       |  JOIN df USING (t)
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats
       |  WHERE tf.doc_id >= $Bm25NumQueries),
       |perdoc AS (
       |  SELECT qid, doc_id, CAST(sum(s_micro) AS BIGINT) AS score_micro,
       |         count(*) AS n_terms
       |  FROM ts GROUP BY 1, 2)""".stripMargin

  /** QL CTE block → per-(query, doc) relation `qscored` (same formula
    * text as [[QlMatchSql]]/[[QlNormSql]] modulo double-literal suffix,
    * so both engines evaluate the identical double expression). */
  private val qlBlock: String =
    s"""cf AS (SELECT t, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY t),
       |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS tot FROM dl),
       |qlen AS (SELECT qid, count(*) AS qlen FROM qterms GROUP BY qid),
       |qts AS (
       |  SELECT qid, tf.doc_id, dl,
       |    CAST(round(ln(1.0 + (tf * tot) / ($QlMu * cf)) * 1e6)
       |      AS BIGINT) AS m_micro
       |  FROM tf
       |  JOIN qterms USING (t)
       |  JOIN cf USING (t)
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN tot
       |  WHERE tf.doc_id >= $Bm25NumQueries),
       |qperdoc AS (
       |  SELECT qid, doc_id, dl, CAST(sum(m_micro) AS BIGINT) AS mm,
       |         count(*) AS n_terms
       |  FROM qts GROUP BY 1, 2, 3),
       |qscored AS (
       |  SELECT qid, doc_id,
       |    mm + qlen * CAST(round(ln($QlMu / (dl + $QlMu)) * 1e6) AS BIGINT)
       |      AS score_micro,
       |    n_terms
       |  FROM qperdoc JOIN qlen USING (qid))""".stripMargin

  /** Shared by q93 (full pass) and q144 (incremental merge): the
    * incremental union covers the whole table, so both must produce
    * exactly this answer. */
  private val bm25Oracle: String =
    s"""WITH $retrievalCtes,
       |$bm25Block
       |SELECT qid, rk, doc_id, score_micro, n_terms FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY score_micro DESC, doc_id) AS rk
       |  FROM perdoc)
       |WHERE rk <= $Bm25TopK ORDER BY qid, rk""".stripMargin

  private val qlOracle: String =
    s"""WITH $retrievalCtes,
       |$qlBlock
       |SELECT qid, rk, doc_id, score_micro, n_terms FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY score_micro DESC, doc_id) AS rk
       |  FROM qscored)
       |WHERE rk <= $Bm25TopK ORDER BY qid, rk""".stripMargin

  private val rrfOracle: String =
    s"""WITH $retrievalCtes,
       |$bm25Block,
       |$qlBlock,
       |brank AS (
       |  SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
       |    ORDER BY score_micro DESC, doc_id) AS rk FROM perdoc),
       |qrank AS (
       |  SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
       |    ORDER BY score_micro DESC, doc_id) AS rk FROM qscored),
       |fused AS (
       |  SELECT qid, doc_id,
       |    CAST(sum(1000000 // ($RrfKConst + rk)) AS BIGINT) AS rrf_micro,
       |    count(*) AS n_sys
       |  FROM (SELECT * FROM brank WHERE rk <= $RrfDepth
       |        UNION ALL SELECT * FROM qrank WHERE rk <= $RrfDepth)
       |  GROUP BY 1, 2)
       |SELECT qid, rk, doc_id, rrf_micro, n_sys FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY rrf_micro DESC, doc_id) AS rk
       |  FROM fused)
       |WHERE rk <= $RrfTopK ORDER BY qid, rk""".stripMargin

  /** q170's oracle: NESTS the proven fragments — the q93 BM25 block
    * (retrievalCtes + bm25Block + brank) and the q69/q87 IVF dense leg
    * (VectorQueries.denseLegOracleCtes → drank) — and fuses with the
    * exact q164 integer RRF rule, so the hybrid cannot drift from its
    * legs. */
  private def hybridOracle: String =
    s"""WITH $retrievalCtes,
       |$bm25Block,
       |brank AS (
       |  SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
       |    ORDER BY score_micro DESC, doc_id) AS rk FROM perdoc),
       |${VectorQueries.denseLegOracleCtes(Bm25NumQueries)},
       |fused AS (
       |  SELECT qid, doc_id,
       |    CAST(sum(1000000 // ($RrfKConst + rk)) AS BIGINT) AS rrf_micro,
       |    count(*) AS n_sys
       |  FROM (SELECT qid, doc_id, rk FROM brank WHERE rk <= $RrfDepth
       |        UNION ALL
       |        SELECT qid, doc_id, rk FROM drank WHERE rk <= $RrfDepth)
       |  GROUP BY 1, 2)
       |SELECT qid, rk, doc_id, rrf_micro, n_sys FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY rrf_micro DESC, doc_id) AS rk
       |  FROM fused)
       |WHERE rk <= $RrfTopK ORDER BY qid, rk""".stripMargin

  /** q179's oracle nests the five shipped variant oracles verbatim (the
    * q110 composition rule) against the exact dense fragment; the LEFT
    * join keeps a zero-overlap variant's row alive. */
  private def retrievalQualityOracle: String = {
    val k = Bm25TopK
    s"""WITH truth AS (
       |  SELECT qid, doc_id FROM (
       |${VectorQueries.denseExactOracleSql(Bm25NumQueries, k)})),
       |v AS (
       |  SELECT 'bm25' AS variant, qid, doc_id FROM (
       |$bm25Oracle)
       |  UNION ALL
       |  SELECT 'dense_ivf', qid, doc_id FROM (
       |    WITH ${VectorQueries.denseLegOracleCtes(Bm25NumQueries)}
       |    SELECT qid, doc_id FROM drank WHERE rk <= $k)
       |  UNION ALL
       |  SELECT 'hybrid_dense', qid, doc_id FROM (
       |$hybridOracle) WHERE rk <= $k
       |  UNION ALL
       |  SELECT 'ql', qid, doc_id FROM (
       |$qlOracle)
       |  UNION ALL
       |  SELECT 'rrf', qid, doc_id FROM (
       |$rrfOracle) WHERE rk <= $k),
       |hits AS (
       |  SELECT variant, count(truth.qid) AS hits
       |  FROM v LEFT JOIN truth
       |    ON v.qid = truth.qid AND v.doc_id = truth.doc_id
       |  GROUP BY variant),
       |ev AS (SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings),
       |mass AS (
       |  SELECT variant,
       |    CAST(sum(CAST(round(round(
       |      list_cosine_similarity(ne.vv, qe.vv), 6) * 1e6) AS BIGINT))
       |      AS BIGINT) AS truth_mass_micro
       |  FROM v JOIN ev ne ON ne.vec_id = v.doc_id
       |         JOIN ev qe ON qe.vec_id = v.qid
       |  GROUP BY variant),
       |tot AS (SELECT count(*) AS n_truth FROM truth)
       |SELECT variant, CAST(hits AS BIGINT) AS hits,
       |  CAST(n_truth AS BIGINT) AS n_truth,
       |  CAST(hits * 1000000 // n_truth AS BIGINT) AS overlap_micro,
       |  truth_mass_micro
       |FROM hits JOIN mass USING (variant), tot
       |ORDER BY variant""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q170_hybrid_dense_rrf" -> hybridOracle,
    "q179_retrieval_quality" -> retrievalQualityOracle,
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
         |ORDER BY keep_id""".stripMargin,
    "q61_text_stats" -> (s"WITH $statsCte" +
      """SELECT doc_id, lang, n_words, n_tokens, n_distinct, n_stop,
        |  round(CAST(n_distinct AS DOUBLE) / n_words, 6) AS distinct_ratio,
        |  round(CAST(n_stop AS DOUBLE) / n_words, 6) AS stop_ratio,
        |  round(least(1.0, CAST(n_words AS DOUBLE) / 120.0) *
        |        (CAST(n_distinct AS DOUBLE) / n_words), 6) AS quality,
        |  CASE WHEN CAST(n_stop AS DOUBLE) / n_words >= 0.12
        |       THEN 'en' ELSE 'other' END AS lang_guess
        |FROM stats ORDER BY doc_id""".stripMargin),
    "q62_lang_rollup" -> (s"WITH $statsCte" +
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS total_words,
        |  CAST((sum(n_words) * 1000) // count(*) AS BIGINT) AS avg_words_milli,
        |  count(*) FILTER (CAST(n_stop AS DOUBLE) / n_words >= 0.12)
        |    AS n_guessed_en,
        |  CAST(sum(CAST(round(round(least(1.0, CAST(n_words AS DOUBLE) / 120.0) *
        |        (CAST(n_distinct AS DOUBLE) / n_words), 6) * 1000000) AS BIGINT))
        |      AS BIGINT) AS total_quality_micros
        |FROM stats GROUP BY lang ORDER BY lang""".stripMargin),
    "q63_tfidf_top_terms" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM words GROUP BY doc_id, t),
        |df AS (SELECT t, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, t FROM words) GROUP BY t),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, t, tf,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
        |  FROM tf JOIN df USING (t) CROSS JOIN n)
        |SELECT doc_id, rk, t AS term, tf, score FROM (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY doc_id ORDER BY score DESC, t) AS rk
        |  FROM scored WHERE doc_id < 50)
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "q93_bm25_topk" -> bm25Oracle,
    "q163_ql_topk" -> qlOracle,
    "q164_rrf_fusion" -> rrfOracle,
    // q144: the (corpus ∪ batch) postings union is the whole documents
    // table, so the incremental answer IS the full q93 answer — one
    // shared oracle, zero drift by construction
    "q144_incremental_bm25" -> bm25Oracle,
    "q108_bpe_merge_loop" -> {
      val unioned = (1 to BpeMergeRounds).map(r =>
        s"SELECT CAST($r AS BIGINT) AS round, pa, pb, total FROM b$r")
        .mkString("\n  UNION ALL ")
      s"""WITH ${bpeCtes(BpeMergeRounds)}
         |SELECT round, pa, pb, total FROM (
         |  $unioned) ORDER BY round""".stripMargin
    },
    // q113: per-doc token counts under the TRAINED vocabulary — the
    // final merged vocab v{N} joined back to the corpus word stream;
    // sub-2-char words are single tokens (never in the vocab → coalesce)
    "q113_bpe_tokenize" -> bpeTokenizeSql,
    // q134 NESTS the q113 oracle (the q115/q110 composition pattern) so
    // fertility and the tokenizer cannot drift apart
    "q134_tokenizer_fertility" ->
      s"""WITH pd AS (SELECT doc_id, n_words, n_tokens FROM (
         |$bpeTokenizeSql)),
         |j AS (
         |  SELECT pd.doc_id, pd.n_words, pd.n_tokens, d.lang, d.n_chars
         |  FROM pd JOIN documents d USING (doc_id))
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |  CAST(sum(n_tokens) * 1000000 // sum(n_words) AS BIGINT)
         |    AS fertility_micro,
         |  CAST(sum(n_chars) * 1000000 // sum(n_tokens) AS BIGINT)
         |    AS chars_per_token_micro
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    // q123: same ceil-covering chunk-count arithmetic, DuckDB list_slice
    // is end-inclusive where Spark slice takes a length
    "q123_chunk_docs" ->
      s"""WITH wa AS (
         |  SELECT doc_id, string_split_regex(text, '\\s+') AS w
         |  FROM documents),
         |ch AS (
         |  SELECT doc_id, i AS chunk_idx,
         |    array_to_string(list_slice(w, i * $ChunkStride + 1,
         |      i * $ChunkStride + $ChunkTokens), ' ') AS chunk_text
         |  FROM wa, LATERAL unnest(range(0, greatest(1,
         |    CAST(ceil((len(w) - $ChunkTokens) / ${ChunkStride}.0)
         |      AS INT) + 1))) AS t(i))
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  CAST(len(string_split_regex(chunk_text, '\\s+')) AS BIGINT)
         |    AS n_tokens,
         |  chunk_text
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
    "q94_bpe_pairs" ->
      s"""WITH words AS (
         |  SELECT unnest(string_split_regex(text, '\\s+')) AS t
         |  FROM documents),
         |wc AS (SELECT t, count(*) AS n FROM words GROUP BY t),
         |pairs AS (
         |  SELECT substr(t, i, 2) AS pair, n
         |  FROM wc, LATERAL unnest(range(1, length(t))) AS x(i)
         |  WHERE length(t) >= 2)
         |SELECT pair, CAST(sum(n) AS BIGINT) AS total
         |FROM pairs GROUP BY pair
         |ORDER BY total DESC, pair LIMIT $BpeTopPairs""".stripMargin,
    // q125: the same shingle/band CTEs restricted to the sample; exact
    // ground truth via brute-force list_intersect over the sample pairs
    "q125_minhash_recall" ->
      (s"WITH ${minhashPairsCtesOf(s"WHERE doc_id % $MhSampleMod = 0")}," +
      s"""inter2 AS (
         |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS ni
         |  FROM srows sa JOIN srows sb
         |    ON sa.s = sb.s AND sa.doc_id < sb.doc_id
         |  GROUP BY 1, 2),
         |tp AS (
         |  SELECT doc_a, doc_b, CAST(floor(j * 10) AS BIGINT) AS jdecile
         |  FROM (SELECT doc_a, doc_b,
         |          round(CAST(ni AS DOUBLE) / (za.n_sh + zb.n_sh - ni), 6)
         |            AS j
         |        FROM inter2
         |        JOIN sizes za ON za.doc_id = doc_a
         |        JOIN sizes zb ON zb.doc_id = doc_b)
         |  WHERE j >= $MhRecallThreshold),
         |hits AS (
         |  SELECT jdecile, count(*) AS n_true, count(c.doc_a) AS n_hit
         |  FROM tp LEFT JOIN cands c
         |    ON c.doc_a = tp.doc_a AND c.doc_b = tp.doc_b
         |  GROUP BY jdecile)
         |SELECT jdecile, CAST(n_true AS BIGINT) AS n_true,
         |  CAST(n_hit AS BIGINT) AS n_hit,
         |  CAST(n_hit * 1000000 // n_true AS BIGINT) AS recall_micro
         |FROM hits ORDER BY jdecile""".stripMargin),
    // q127: same restricted CTEs; candidates from cands, survivors from
    // pairs_all (shared-shingle contract — a zero-overlap candidate
    // cannot reach the threshold, so counting from pairs_all is exact)
    "q127_minhash_precision" ->
      (s"WITH ${minhashPairsCtesOf(s"WHERE doc_id % $MhSampleMod = 0")}," +
      s"""nc AS (SELECT count(*) AS n_cands FROM cands),
         |nv AS (SELECT count(*) AS n_verified FROM pairs_all
         |       WHERE jaccard >= $MhRecallThreshold)
         |SELECT CAST(n_cands AS BIGINT) AS n_cands,
         |  CAST(n_verified AS BIGINT) AS n_verified,
         |  CAST(CASE WHEN n_cands = 0 THEN 0
         |    ELSE n_verified * 1000000 // n_cands END AS BIGINT)
         |    AS precision_micro
         |FROM nc, nv""".stripMargin),
    // q189: the shared minhash band CTE prefix, the shared occupancy
    // rollup tail — the audited banding IS the q64 pair join's
    "q189_text_band_occupancy" -> graft.multimodal.Multimodal
      .bandOccupancySql(minhashBandCtesOf("")),
    // q191: the q64 pair CTEs (bands + verified pairs_all) with the
    // shared per-bucket rank CTEs and curve tail — truth is exactly
    // the q64 output, so the priced recall is against what capless
    // banding emits today
    "q191_text_band_cap_curve" ->
      (s"WITH ${minhashPairsCtesOf("")}," +
      s"""
         |${graft.multimodal.Multimodal.bandCapRankSql("doc_id")},
         |truth AS (SELECT doc_a AS ida, doc_b AS idb FROM pairs_all),
         |${graft.multimodal.Multimodal.bandCapCurveSqlTail}""".stripMargin),
    "q64_minhash_pairs" -> (s"WITH $minhashPairsCtes " +
      """SELECT doc_a, doc_b, n_inter, jaccard FROM pairs_all
        |ORDER BY doc_a, doc_b""".stripMargin),
    // q192: the compacted pair table must equal the full q64 pass over
    // corpus ∪ batch — the additivity invariant IS the oracle, so the
    // SQL is q64's own pair pipeline verbatim
    "q192_incremental_text_pairs" -> (s"WITH $minhashPairsCtes " +
      """SELECT doc_a, doc_b, n_inter, jaccard FROM pairs_all
        |ORDER BY doc_a, doc_b""".stripMargin),
    // q166 shares q64's banding CTEs but verifies by edit distance over
    // a bounded prefix instead of shingle-set Jaccard
    "q166_edit_verified_dups" -> (s"WITH $minhashPairsCtes, " +
      s"""prefs AS (
         |  SELECT doc_id, substring(text, 1, $EditPrefChars) AS pref
         |  FROM documents),
         |verified AS (
         |  SELECT doc_a, doc_b,
         |    CAST(levenshtein(pa.pref, pb.pref) AS BIGINT) AS lev,
         |    CAST(greatest(len(pa.pref), len(pb.pref), 1) AS BIGINT) AS glen
         |  FROM cands
         |  JOIN prefs pa ON pa.doc_id = doc_a
         |  JOIN prefs pb ON pb.doc_id = doc_b)
         |SELECT doc_a, doc_b, lev,
         |  ((glen - lev) * 1000) // glen AS sim_milli
         |FROM verified
         |WHERE ((glen - lev) * 1000) // glen >= $EditSimMilli
         |ORDER BY doc_a, doc_b""".stripMargin),
    // the incremental pass = the full pair pass restricted to pairs with
    // ≥1 batch-side endpoint (signatures are per-document functions)
    "q96_incremental_near_dups" -> (s"WITH $minhashPairsCtes " +
      s"""SELECT doc_a, doc_b, n_inter, jaccard FROM pairs_all
         |WHERE doc_a % $BatchMod = 0 OR doc_b % $BatchMod = 0
         |ORDER BY doc_a, doc_b""".stripMargin),
    "q73_langid_ngram" -> {
      val scoreSelects = LangProfiles.map { case (lang, grams) =>
        grams.map(g => occSql("t", g)).mkString(" + ") + s" AS s_$lang"
      }.mkString(",\n    ")
      val langs = LangProfiles.map(_._1)
      val predSql = langs.map { l =>
        val geAll = langs.filter(_ != l).map(o => s"s_$l >= s_$o")
          .mkString(" AND ")
        s"WHEN $geAll THEN '$l'"
      }.mkString("CASE ", " ", " END")
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    $scoreSelects
         |  FROM (SELECT doc_id, lang, lower(text) AS t FROM documents))
         |SELECT lang, $predSql AS pred_lang, count(*) AS n
         |FROM scored GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin
    },
    // q162 reuses q73's exact score/argmax fragments over SEGMENTS; the
    // majority vote is the row_number twin of Spark's min(struct(-cnt,
    // pred)) — (cnt DESC, pred) — so both engines elect identically.
    "q162_lang_mix" -> {
      val scoreSelects = LangProfiles.map { case (lang, grams) =>
        grams.map(g => occSql("t", g)).mkString(" + ") + s" AS s_$lang"
      }.mkString(",\n    ")
      val langs = LangProfiles.map(_._1)
      val predSql = langs.map { l =>
        val geAll = langs.filter(_ != l).map(o => s"s_$l >= s_$o")
          .mkString(" AND ")
        s"WHEN $geAll THEN '$l'"
      }.mkString("CASE ", " ", " END")
      s"""WITH segs AS (
         |  SELECT doc_id, lang, unnest(list_transform(
         |    range(0, CAST(ceil(len(w) / ${MixSegWords}.0) AS INT)),
         |    i -> array_to_string(list_slice(w,
         |      i * $MixSegWords + 1, i * $MixSegWords + $MixSegWords),
         |      ' '))) AS t
         |  FROM (SELECT doc_id, lang,
         |          string_split_regex(lower(text), '\\s+') AS w
         |        FROM documents)),
         |scored AS (
         |  SELECT doc_id, lang,
         |    $scoreSelects
         |  FROM segs),
         |pp AS (
         |  SELECT doc_id, lang, $predSql AS pred, count(*) AS cnt
         |  FROM scored GROUP BY 1, 2, 3),
         |pd AS (
         |  SELECT doc_id, lang, pred AS primary_lang, cnt AS n_primary
         |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
         |          ORDER BY cnt DESC, pred) AS rn FROM pp)
         |  WHERE rn = 1),
         |tot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_segments
         |        FROM pp GROUP BY doc_id)
         |SELECT pd.doc_id, pd.lang, pd.primary_lang, tot.n_segments,
         |  CAST(pd.n_primary AS BIGINT) AS n_primary,
         |  CAST((tot.n_segments - pd.n_primary) * 1000000
         |    // tot.n_segments AS BIGINT) AS mix_micro,
         |  (tot.n_segments - pd.n_primary) * 1000000
         |    // tot.n_segments >= $MixedThresholdMicro AS is_mixed
         |FROM pd JOIN tot USING (doc_id)
         |ORDER BY pd.doc_id""".stripMargin
    },
    "q71_dedup_keep_best" ->
      """WITH grams AS (
        |  SELECT doc_id, unnest(CASE WHEN len(w) >= 5
        |    THEN list_transform(range(1, len(w)-3),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |           w[i+3] || ' ' || w[i+4])
        |    ELSE [text] END) AS g
        |  FROM (SELECT doc_id, text, string_split_regex(text, '\s+') AS w
        |        FROM documents)),
        |fps AS (
        |  SELECT doc_id, min(substr(md5(g), 1, 12)) AS fingerprint
        |  FROM grams GROUP BY doc_id),
        |quality AS (
        |  SELECT doc_id,
        |    round(least(1.0, CAST(len(w) AS DOUBLE) / 120.0) *
        |          (CAST(len(list_distinct(w)) AS DOUBLE) / len(w)), 6)
        |      AS quality
        |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w
        |        FROM documents)),
        |ranked AS (
        |  SELECT fingerprint, doc_id, quality,
        |    row_number() OVER (PARTITION BY fingerprint
        |      ORDER BY quality DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY fingerprint) AS cluster_size
        |  FROM fps JOIN quality USING (doc_id))
        |SELECT fingerprint, doc_id AS kept_id, quality, cluster_size
        |FROM ranked WHERE rn = 1 ORDER BY kept_id""".stripMargin,
    "q66_simhash_signatures" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(list_distinct(string_split_regex(text, '\\s+'))) AS t
         |  FROM documents),
         |votes AS (
         |  SELECT doc_id,
         |    $simhashVotes
         |  FROM toks GROUP BY doc_id)
         |SELECT doc_id, $simhashBits AS simhash
         |FROM votes ORDER BY doc_id""".stripMargin,
    "q70_doc_fingerprints" ->
      """WITH grams AS (
        |  SELECT doc_id, unnest(CASE WHEN len(w) >= 5
        |    THEN list_transform(range(1, len(w)-3),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |           w[i+3] || ' ' || w[i+4])
        |    ELSE [text] END) AS g
        |  FROM (SELECT doc_id, text, string_split_regex(text, '\s+') AS w
        |        FROM documents)),
        |fps AS (
        |  SELECT doc_id, min(substr(md5(g), 1, 12)) AS fingerprint
        |  FROM grams GROUP BY doc_id)
        |SELECT doc_id, fingerprint,
        |  count(*) OVER (PARTITION BY fingerprint) AS cluster_size
        |FROM fps ORDER BY doc_id""".stripMargin)
}
