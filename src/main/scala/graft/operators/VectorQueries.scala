package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.CentroidAggregator
import graft.functions.CosineSimilarity.cosineSim
import graft.functions.L2Distance.l2Sq
import scala.collection.immutable.ListMap

/** Vector/similarity-search operators over `embeddings` (SURVEY.md §2.9):
  * brute-force top-k cosine against a broadcast query set (L3), the A9
  * custom-Aggregator centroid + nearest-centroid classifier (L4), and an
  * IVF-style ANN variant that probes only the query's coarse cell — the
  * 100 TB scale path where the brute-force scan is replaced by a
  * cell-pruned search.
  *
  * Scoring runs through the native codegen'd expressions
  * ([[graft.functions.CosineSimilarity]], [[graft.functions.L2Distance]])
  * — fused loops in the whole-stage-codegen body, bit-identical to the
  * `zip_with` + `aggregate` higher-order formulation they replaced
  * (SURVEY.md §2.8 F9, §2.11; parity asserted in CosineSimilaritySpec).
  * The sign-LSH band keys likewise run through the native
  * [[graft.functions.SignLshKeys]] expression (exact fixed-point longs,
  * one fused loop for all 24 bits; parity vs the HOF formulation in
  * VectorQueriesSpec); the only other per-row JVM code is the centroid
  * UDAF, whose long[] buffer is exact and order-independent.
  */
object VectorQueries extends VectorAnnTiers
    with VectorDedup
    with VectorSemantic
    with VectorIngest
    with VectorPq
    with VectorClusters
    with VectorReports {

  private[operators] final val NumQueries = 10
  private[operators] final val TopK = 3

  /** vec_id, label, v (double), nrm — from any (vec_id, embedding, label)
    * frame. Repartitioned up front: the sf parquet is ONE file → a
    * one-partition scan, and the vector math otherwise runs single-task
    * all the way to the first shuffle — including broadcast-side builds
    * (same lesson as SpecPipeline.base). Width is AQE-sized
    * ([[graft.Scale.byKey]], round 16): the old `numShufflePartitions`
    * pin made every vector stage 32 tasks wide at bench scale.
    */
  private[operators] def vecsOf(emb: DataFrame): DataFrame =
    graft.Scale.byKey(emb, col("vec_id"))
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))

  private[operators] def vecs(spark: SparkSession, dir: String): DataFrame =
    vecsOf(Tables(spark, dir, "embeddings"))


  /** L3: brute-force top-k cosine — the small query set is broadcast
    * against the full table (one scan, no self-join), ranked per query.
    * Scoring uses the native [[graft.functions.CosineSimilarity]]
    * expression: one fused codegen loop per pair (bit-identical to the
    * zip_with/aggregate formulation — CosineSimilaritySpec). Ranking uses
    * the 6-dp-rounded score so ties break identically in every engine;
    * vec_id is the total-order tie-break.
    */
  def topkCosine(spark: SparkSession, dir: String): DataFrame =
    topkCosineOf(vecs(spark, dir))

  /** Hard negatives returned per query (L42/q135). */
  val HardNegK = 5

  /** Width of a top-k shard in vec_id space for the two-level rank —
    * the [[CurationQueries.SourceCapShardDocs]] rationale: small so the
    * smallest sf already crosses shards; production sizes it so a
    * (query, shard) bucket ≈ one task's rows. */
  private[operators] val TopkShardVecs = 64L

  /** Two-level per-query top-k — the q107 pattern, ANN flavor. A
    * qid-keyed rank alone funnels every scored corpus row through
    * |queries| reducers (constant-cardinality key — the q76 hot-key
    * lesson, which r5-r7 flagged for packing and source caps). Ranking
    * first within (qid, vec_id-range shard) keeps ≤ k rows per shard —
    * shard cardinality GROWS with the corpus — so the final qid-keyed
    * rank sees shards×k survivor rows, never the corpus. Equivalent to
    * the direct rank because a global top-k row has fewer than k rows
    * ordered above it anywhere, a fortiori within its own shard (the
    * q107 argument verbatim). Expects (qid, vec_id, <score>); returns
    * the frame with `rk` attached, ≤ k rows per query, all other
    * columns carried through. */
  private[operators] def rankTopKPerQuery(scored: DataFrame, k: Int,
      score: Column = col("cos")): DataFrame = {
    val local = Window.partitionBy(col("qid"), col("tkshard"))
      .orderBy(score.desc, col("vec_id"))
    val survivors = scored
      .withColumn("tkshard", expr(s"vec_id div $TopkShardVecs"))
      .withColumn("lrk", row_number().over(local))
      .filter(col("lrk") <= k)
      .drop("lrk", "tkshard")
    val global = Window.partitionBy(col("qid"))
      .orderBy(score.desc, col("vec_id"))
    survivors.withColumn("rk", row_number().over(global))
      .filter(col("rk") <= k)
  }

  /** Per-label centroids via the A9 `Aggregator` (fixed-point long sums →
    * exact, order-independent double means).
    */
  private[graft] def centroidsOf(emb: DataFrame): DataFrame = {
    val centroid = udaf(CentroidAggregator)
    emb.groupBy(col("label").as("clabel"))
      .agg(centroid(col("embedding")).as("c"))
  }

  private[operators] def centroids(spark: SparkSession, dir: String): DataFrame =
    centroidsOf(Tables(spark, dir, "embeddings"))

  /** Per-vector nearest-cell assignment against a SUPPLIED frozen
    * quantizer, exchange-free: the ≤|labels|-row centroid table
    * collapses to ONE array row, and the argmin is a pure array lambda —
    * `array_sort`'s struct ordering is exactly the q68 (d2, cell)
    * tie-break — so a scan assigns cells without a window or a
    * per-vector groupBy; the only shuffle in any consumer is its own
    * ≤|cells|-row rollup. Attaches (cell, d2micro) to the input rows —
    * d2micro the 6-dp-rounded squared distance to the winning centroid
    * as an exact micro-unit long (the q149 double-rounding rule —
    * engine-identical); being a pure stateless projection it also
    * serves the STREAMING drift twin unchanged. */
  private[graft] def cellAssign(vecsDf: DataFrame,
      cents: DataFrame): DataFrame = {
    val centArr = cents.agg(
      collect_list(struct(col("clabel"), col("c"))).as("cents"))
    vecsDf.crossJoin(broadcast(centArr))
      .withColumn("best", element_at(array_sort(transform(col("cents"),
        ct => struct(round(l2Sq(col("v"), ct.getField("c")), 6).as("d2"),
          ct.getField("clabel").as("cell")))), 1))
      .withColumn("cell", col("best.cell"))
      .withColumn("d2micro", round(col("best.d2") * 1e6).cast("bigint"))
      .drop("cents", "best")
  }

  /** Top-`probes` nearest cells per vector, exchange-free: the SAME
    * sorted (d2, cell) struct array as [[cellAssign]] — identical
    * rounded distances, identical tie-break — sliced to `probes`
    * entries and exploded. This is the multi-probe QUERY-side
    * assignment without a window: the old shape ranked
    * `row_number() over (partition by vec_id)` on corpus × |cells|
    * rows EACH CARRYING the 64-float vector (the round-10 verdict's
    * one avoidable exchange); queries are broadcast-sized, so even
    * their ranking needs no shuffle at all. */
  private[graft] def probeAssign(vecsDf: DataFrame, cents: DataFrame,
      probes: Int): DataFrame = {
    val centArr = cents.agg(
      collect_list(struct(col("clabel"), col("c"))).as("cents"))
    vecsDf.crossJoin(broadcast(centArr))
      .withColumn("probe", explode(slice(array_sort(transform(col("cents"),
        ct => struct(round(l2Sq(col("v"), ct.getField("c")), 6).as("d2"),
          ct.getField("clabel").as("cell")))), 1, probes)))
      .withColumn("cell", col("probe.cell"))
      .drop("cents", "probe")
  }

  /** Per-cell population + exact d2micro sum of a [[cellAssign]] frame —
    * the quantizer-stats artifact an ANN serving tier persists beside
    * its centroids (IndexStore `ivf_cell_stats`); q160's in-query corpus
    * leg and the disk-read daily leg share this one definition. */
  private[graft] def cellStatsOf(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("d2micro")).as("s"))

  /** Shared input frames for the ANN variant family — ONE definition of
    * every derived artifact (coarse quantizers, residual frames, trained
    * codebooks, the incremental code union), so the standalone variant
    * queries and the q110 recall gate can never drift. Every member is
    * lazy: a variant's plan touches only the frames it reads.
    *
    * `seal` post-processes the three Lloyd-trained codebooks. It
    * defaults to an EAGER 1-row localCheckpoint because a lazily
    * checkpointed trainer output feeding several broadcast exchanges can
    * be recomputed CONCURRENTLY — broadcast builds run on parallel
    * threads, and jobs racing over a not-yet-materialized checkpoint
    * each re-run the trainer rounds (VERDICT r11 "What's wrong" #2: q110
    * paid k× training). Materializing the 1-row frame once at plan
    * construction makes every downstream broadcast a checkpoint read. */
  private[operators] final class AnnFrames(emb: DataFrame,
      seal: DataFrame => DataFrame = _.transform(graft.Materialize.now),
      shareScan: Boolean = false) {
    /** Corpus (vec_id, label, v) — q110 checkpoints it once for its
      * twelve legs; a standalone variant keeps the pushdown-friendly
      * parquet scan. */
    lazy val e: DataFrame = {
      val v = vecsOf(emb)
      if (shareScan) v.transform(graft.Materialize.shared) else v
    }
    lazy val corpusEmb: DataFrame =
      emb.filter(col("vec_id") % VecBatchMod =!= 0)
    lazy val centsFull: DataFrame =
      centroidsOf(emb).transform(graft.Materialize.shared)
    lazy val centsCorpus: DataFrame = // the q105/q182 frozen quantizer
      centroidsOf(corpusEmb).transform(graft.Materialize.shared)
    /** q177's raw-domain trained codebook. */
    lazy val cbTrained: DataFrame = seal(pqTrainedCodebookOf(e))
    /** q181's residual domain: full-corpus residuals vs [[centsFull]]. */
    lazy val resFull: DataFrame =
      ivfPqResiduals(e, centsFull).transform(graft.Materialize.shared)
    lazy val rcbFull: DataFrame = seal(pqTrainedCodebookOfMicro(
      resFull.select(col("vec_id"), col("rv").as("mv"))))
    /** q182's frozen residual domain: corpus-only rows vs the frozen
      * [[centsCorpus]] quantizer. */
    lazy val corpusRes: DataFrame =
      ivfPqResiduals(vecsOf(corpusEmb), centsCorpus)
        .transform(graft.Materialize.shared)
    lazy val rcbCorpus: DataFrame = seal(pqTrainedCodebookOfMicro(
      corpusRes.select(col("vec_id"), col("rv").as("mv"))))
    lazy val batchRes: DataFrame = ivfPqResiduals(
      vecsOf(emb.filter(col("vec_id") % VecBatchMod === 0)), centsCorpus)
    /** Frozen-corpus codes ∪ batch codes — q182's searchable index. */
    lazy val codedIncr: DataFrame =
      ivfPqEncode(corpusRes, centsCorpus, rcbCorpus)
        .unionByName(ivfPqEncode(batchRes, centsCorpus, rcbCorpus))
  }

  /** The ANN variants whose serving quality the q110/q197 gates track,
    * with the exact q67 scan as ground truth. One place — each
    * standalone query AND each gate leg is this one lambda over an
    * [[AnnFrames]] — so the recall queries and their oracles can never
    * cover different variants. Split by TRAINING COST (VERDICT r14
    * "Next round" #5: one gate carrying all ten variants was 45% of the
    * driver bench): the untrained tier needs no Lloyd run — q110 stays
    * the cheap always-on gate — while the trained tier (every variant
    * that runs k-means codebook training) moves to its own q197 gate,
    * so the expensive legs are priced separately and the two gates'
    * union is exactly the old ten-variant table. */
  private[operators] val annVariantsUntrained: Seq[(String, AnnFrames => DataFrame)] = Seq(
    "ivf" -> ((f: AnnFrames) => ivfTopkCosineOf(f.e, f.centsFull)),
    "ivf_incremental" ->
      ((f: AnnFrames) => ivfTopkCosineOf(f.e, f.centsCorpus)),
    "ivf_sq8" -> ((f: AnnFrames) => ivfSq8TopkCosineOf(f.e, f.centsFull)),
    "multiprobe" ->
      ((f: AnnFrames) => ivfTopkCosineOf(f.e, f.centsFull, NumProbes)),
    "pq" -> ((f: AnnFrames) => pqTopkCosineOf(f.e)),
    "rp" -> ((f: AnnFrames) => rpTopkCosineOf(f.e)),
    "sq8" -> ((f: AnnFrames) => quantizedTopkCosineOf(f.e)))

  /** The trained-codebook tier: each leg pays ≥ 1 Lloyd training. */
  private[operators] val annVariantsTrained: Seq[(String, AnnFrames => DataFrame)] = Seq(
    "ivfpq" -> ((f: AnnFrames) => ivfPqSearch(
      ivfPqEncode(f.resFull, f.centsFull, f.rcbFull),
      f.e, f.centsFull, f.rcbFull)),
    "ivfpq_incremental" -> ((f: AnnFrames) =>
      ivfPqSearch(f.codedIncr, f.e, f.centsCorpus, f.rcbCorpus)),
    "pq_trained" ->
      ((f: AnnFrames) => pqTopkCosineOf(f.e, _ => f.cbTrained)))

  private[operators] val annVariants: Seq[(String, AnnFrames => DataFrame)] =
    annVariantsUntrained ++ annVariantsTrained

  /** A standalone variant query: fresh [[AnnFrames]] per run. */
  private[operators] def annVariant(name: String)(
      spark: SparkSession, dir: String): DataFrame =
    annVariants.toMap.apply(name)(
      new AnnFrames(Tables(spark, dir, "embeddings")))

  /** q110: ANN serving quality as an ORACLE-GATED output (VERDICT r8
    * "Next round" #8) — recall@[[TopK]] of every ANN variant against the
    * exact q67 baseline on the fixed query set, so quantization/probe
    * drift shows up in CORRECTNESS, not only in CI assertions. Integer
    * micro-unit recall (hits·1e6 div |exact|) keeps the output
    * hash-portable; both operands are non-negative so Spark `div` and
    * DuckDB `//` agree. Scale shape: the variants and the baseline are
    * the existing scans over ONE shared [[AnnFrames]] — the corpus scan
    * checkpointed once, each trained codebook materialized once and
    * threaded through its legs (VERDICT r11 #2) — and the recall join
    * keys on (qid, nid): queries × k rows, broadcast-sized by
    * construction. */
  def annRecallSummary(spark: SparkSession, dir: String): DataFrame =
    annRecallSummaryOf(spark, dir, annVariantsUntrained)

  /** q197: the q110 gate over the TRAINED-codebook tier — identical
    * recall/truth-mass machinery, but only the legs that pay Lloyd
    * trainings, so the audit-tier cost is priced on its own row map
    * and the cheap gate stays cheap (VERDICT r14 "Next round" #5).
    * q110 ∪ q197 rows == the old ten-variant q110 table (per-variant
    * rows depend only on that variant's scan and the shared exact
    * baseline, never on which other variants share the query). */
  def annRecallTrained(spark: SparkSession, dir: String): DataFrame =
    annRecallSummaryOf(spark, dir, annVariantsTrained)

  private def annRecallSummaryOf(spark: SparkSession, dir: String,
      variants: Seq[(String, AnnFrames => DataFrame)]): DataFrame = {
    val f = new AnnFrames(Tables(spark, dir, "embeddings"),
      shareScan = true)
    val exact = topkCosineOf(f.e).select(col("qid"), col("nid"))
      .transform(graft.Materialize.shared) // feeds the join and the total
    val union = variants.map { case (name, mk) =>
      mk(f).select(lit(name).as("variant"), col("qid"), col("nid"))
    }.reduce(_.unionByName(_))
      .transform(graft.Materialize.shared) // feeds the hit join + truth mass
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    // CONTINUOUS companion metric (VERDICT r11 "Next round" #4):
    // recall@3 over 10 queries is 30 indicator draws and cannot rank
    // two close variants; the TRUE-cosine mass of each variant's
    // returned set (exact micro-integer sum of the 6-dp ground-truth
    // cosines, the quantity the scan *should* maximize) moves whenever
    // the returned sets differ at all — the q178 distortion move
    // applied to serving. Variant outputs are queries×k rows, so both
    // vector joins are broadcast-sized.
    val truthMass = f.e.select(col("vec_id").as("nid"), col("v").as("nv"))
      .join(broadcast(union), Seq("nid"))
      .join(broadcast(f.e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv"))), Seq("qid"))
      .withColumn("cos_micro",
        round(round(cosineSim(col("nv"), col("qv")), 6) * 1e6)
          .cast("long"))
      .groupBy(col("variant"))
      .agg(sum(col("cos_micro")).as("truth_mass_micro"))
    union
      .join(exact.withColumn("hit", lit(1)), Seq("qid", "nid"), "left")
      .groupBy(col("variant"))
      .agg(count(col("hit")).as("hits"))
      .crossJoin(broadcast(nExact))
      .join(truthMass, Seq("variant"))
      .select(col("variant"), col("hits"), col("n_exact"),
        expr("hits * 1000000L div n_exact").as("recall_micro"),
        col("truth_mass_micro"))
      .orderBy(col("variant"))
  }

  val queries: ListMap[String, graft.Q] = ListMap(
    "q65_cosine_near_dups" -> (cosineNearDups _),
    "q91_semantic_dedup" -> (semanticDedup _),
    "q95_vector_exact_dedup" -> (vectorExactDedup _),
    "q67_topk_cosine" -> (topkCosine _),
    "q68_centroid_classify" -> (centroidClassify _),
    "q69_ivf_topk_cosine" -> (ivfTopkCosine _),
    "q87_ivf_multiprobe" -> (ivfMultiprobeTopkCosine _),
    "q100_kmeans" -> (kmeansClusters _),
    "q101_cell_near_dups" -> (kmeansCellNearDups _),
    "q102_incremental_vector_exact_dedup" -> (incrementalVectorExactDedupDaily _),
    "q103_incremental_vector_near_dups" -> (incrementalVectorNearDupsDaily _),
    "q104_incremental_semantic_dedup" -> (incrementalSemanticDedupDaily _),
    "q105_incremental_ivf_topk" -> (incrementalIvfTopkCosine _),
    "q106_sq8_topk_cosine" -> (quantizedTopkCosine _),
    "q110_ann_recall" -> (annRecallSummary _),
    "q112_ivf_sq8_topk" -> (ivfSq8TopkCosine _),
    "q117_pq_topk" -> (pqTopkCosine _),
    "q121_rp_topk" -> (rpTopkCosine _),
    "q124_mmr_topk" -> (mmrTopk _),
    "q135_hard_negatives" -> (hardNegatives _),
    "q140_positive_pairs" -> (positivePairs _),
    "q149_embedding_report" -> (embeddingReport _),
    "q152_ivf_cell_balance" -> (ivfCellBalance _),
    "q160_quantizer_drift" -> (quantizerDrift _),
    "q177_pq_trained_topk" -> (pqTrainedTopkCosine _),
    "q178_pq_distortion" -> (pqDistortion _),
    "q181_ivfpq_topk" -> (ivfPqTopkCosine _),
    "q182_incremental_ivfpq" -> (incrementalIvfPqTopk _),
    "q185_vec_band_occupancy" -> (vecBandOccupancy _),
    "q186_canonical_near_dup_pairs" -> (canonicalNearDupPairsDaily _),
    "q188_vec_band_cap_curve" -> (vecBandCapCurve _),
    "q194_vector_ingest_disposition" -> (vectorIngestDisposition _),
    "q196_doc_vector_disposition" -> (docVectorDisposition _),
    "q197_ann_recall_trained" -> (annRecallTrained _))

  /** Assembled from the family traits so each oracle lives beside the
    * operator it checks (the LLMQueries/CurationQueries convention;
    * pure moves, round 14 — entries byte-identical). */
  private[operators] val oracleMain: Map[String, String] =
    dedupVecOracleMain ++ semanticVecOracleMain ++ annVecOracleMain ++
      reportsVecOracleMain ++ clustersVecOracleMain ++ pqVecOracleMain

  /** q110's oracle COMPOSES the existing variant oracles as nested
    * subqueries (each carries its own WITH scope), so the recall oracle
    * and the per-variant oracles can never drift apart. The LEFT join
    * keeps a zero-hit variant's row alive (count of the right side's
    * key counts matches only).
    *
    * DEF, not a val (the Multimodal.oracle rule): q196 nests the q157
    * funnel oracle, and LLMQueries' own init reaches this object
    * (TextRetrieval.hybridOracle), so an eager val here closed the
    * LLMQueries → VectorQueries → CurationQueries → LLMQueries init
    * cycle into a mid-init null. As a def, this object's initializer
    * has no edge into CurationQueries; the map is assembled at call
    * time (SparkEntry.oracleSql, a def), when every init has settled. */
  def oracle: Map[String, String] = oracleMain +
    ("q110_ann_recall" -> annRecallOracleSqlOf(annVariantsUntrained)) +
    ("q197_ann_recall_trained" ->
      annRecallOracleSqlOf(annVariantsTrained)) +
    ("q194_vector_ingest_disposition" ->
      vectorIngestDispositionOracleSql) +
    ("q196_doc_vector_disposition" -> docVectorDispositionOracleSql)

  /** The recall-gate oracle over an explicit variant tier — shared by
    * q110 (untrained) and q197 (trained) so the split gates price the
    * SAME per-variant oracles their standalone queries run. */
  private def annRecallOracleSqlOf(
      variants: Seq[(String, AnnFrames => DataFrame)]): String = {
    val variantSelects = variants.map { case (name, _) =>
      val twin = name match {
        case "ivf" => "q69_ivf_topk_cosine"
        case "ivf_incremental" => "q105_incremental_ivf_topk"
        case "ivf_sq8" => "q112_ivf_sq8_topk"
        case "ivfpq" => "q181_ivfpq_topk"
        case "ivfpq_incremental" => "q182_incremental_ivfpq"
        case "multiprobe" => "q87_ivf_multiprobe"
        case "pq" => "q117_pq_topk"
        case "pq_trained" => "q177_pq_trained_topk"
        case "rp" => "q121_rp_topk"
        case "sq8" => "q106_sq8_topk_cosine"
      }
      s"SELECT '$name' AS variant, qid, nid FROM (\n${oracleMain(twin)})"
    }.mkString("\n  UNION ALL ")
    s"""WITH exact AS (
       |  SELECT qid, nid FROM (
       |${oracleMain("q67_topk_cosine")})),
       |v AS (
       |  $variantSelects),
       |hits AS (
       |  SELECT variant, count(exact.qid) AS hits
       |  FROM v LEFT JOIN exact
       |    ON v.qid = exact.qid AND v.nid = exact.nid
       |  GROUP BY variant),
       |ev AS (SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings),
       |mass AS (
       |  SELECT variant,
       |    CAST(sum(CAST(round(round(
       |      list_cosine_similarity(ne.vv, qe.vv), 6) * 1e6) AS BIGINT))
       |      AS BIGINT) AS truth_mass_micro
       |  FROM v JOIN ev ne ON ne.vec_id = v.nid
       |         JOIN ev qe ON qe.vec_id = v.qid
       |  GROUP BY variant),
       |tot AS (SELECT count(*) AS n_exact FROM exact)
       |SELECT variant, CAST(hits AS BIGINT) AS hits,
       |  CAST(n_exact AS BIGINT) AS n_exact,
       |  CAST(hits * 1000000 // n_exact AS BIGINT) AS recall_micro,
       |  truth_mass_micro
       |FROM hits JOIN mass USING (variant), tot
       |ORDER BY variant""".stripMargin
  }
}
