package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.CentroidAggregator
import graft.functions.CosineSimilarity.cosineSim
import graft.functions.L2Distance.l2Sq

/** Embedding-space reports (L4/L52/L55/L63): nearest-centroid
  * classification, IVF cell balance, quantizer drift (the retrain
  * trigger) and the embedding health report — q68/q149/q152/q160.
  *
  * Split out of VectorQueries by family (round 12, pure moves) — see
  * [[VectorAnnTiers]].
  */
private[operators] trait VectorReports {
  this: VectorQueries.type =>

  /** L4 + A9: nearest-centroid classification — every vector is assigned
    * the label of its closest centroid (squared L2, label tie-break), and
    * the result is reported as a confusion matrix. Centroids are a
    * |labels|-row broadcast; the scan is a single pass.
    */
  def centroidClassify(spark: SparkSession, dir: String): DataFrame =
    assignedToCentroid(spark, dir)
      .groupBy(col("label"), col("clabel").as("pred_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("pred_label"))

  /** Every vector with its nearest q68 centroid attached — shared by
    * the classifier (q68) and the cell-balance report (q152) so they
    * can never disagree about the quantizer's Voronoi layout. */
  private def assignedToCentroid(spark: SparkSession,
      dir: String): DataFrame = {
    val scored = vecs(spark, dir)
      .crossJoin(broadcast(centroids(spark, dir)))
      // native fused loop; 6-dp rounded so a near-tie collapses
      // identically in every engine and the portable clabel tie-break
      // decides (ADVICE r6 #4 — sqrt/summation-order parity)
      .withColumn("d2", round(l2Sq(col("v"), col("c")), 6))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2"), col("clabel"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
  }

  /** L55/q152: IVF CELL-BALANCE report — ANN index health for the
    * q68/q69 coarse quantizer: per Voronoi cell, population and corpus
    * share. IVF probe latency is bounded by the hottest cell a query
    * lands in, so a skewed layout (one cell holding half the corpus)
    * is a serving regression even at held recall — the number to watch
    * when deciding a quantizer retrain (q105 documents the frozen-
    * quantizer trade this report polices). Same assignment as q68,
    * one definition. */
  def ivfCellBalance(spark: SparkSession, dir: String): DataFrame = {
    val counts = assignedToCentroid(spark, dir)
      .groupBy(col("clabel").as("cell"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("n_total"))
    counts.crossJoin(broadcast(tot))
      .select(col("cell"), col("n"),
        expr("n * 1000000L div n_total").as("share_micro"))
      .orderBy(col("cell"))
  }

  /** L63/q160: QUANTIZER-DRIFT report — the RETRAIN TRIGGER for the
    * frozen coarse quantizer the ANN tiers serve off (q105/q112 freeze
    * it per corpus snapshot; q152 reports its balance). A frozen
    * quantizer degrades silently as the data distribution shifts: new
    * mass lands ever further from the nearest centroid, cell residuals
    * grow, and recall@probes decays even though the index "works". Per
    * cell this reports resident vs arriving mass side by side —
    * `n_corpus`/`n_batch` population, `growth_micro` (batch arrivals per
    * million residents — a cell growing far above its corpus share is a
    * distribution shift), and the mean squared distance to the frozen
    * centroid of residents (`corpus_d2_micro`) vs arrivals
    * (`batch_d2_micro`), with `drift_micro` their gap: positive drift =
    * arriving vectors fit the frozen cells worse = quantization error
    * creep, the number that schedules a retrain.
    *
    * Scale shape: the corpus side is a PERSISTED ≤|cells|-row artifact
    * (IndexStore `ivf_cell_stats`, written once per snapshot beside the
    * centroids); the daily leg assigns ONLY the batch — one broadcast-
    * centroid scan with the exchange-free [[cellAssign]] lambda argmin —
    * then joins two ≤|cells|-row frames. All distances are exact
    * micro-unit longs; means are integer divisions (the q149 rule), so
    * the report is bit-portable and order-independent. */
  def quantizerDriftOf(cents: DataFrame, corpusStats: DataFrame,
      batch: DataFrame): DataFrame = {
    val b = cellStatsOf(cellAssign(batch, cents))
      .select(col("cell"), col("n").as("n_batch"), col("s").as("s_b"))
    corpusStats
      .select(col("cell"), col("n").as("n_corpus"), col("s").as("s_c"))
      .join(b, Seq("cell"), "full_outer")
      .na.fill(0L, Seq("n_corpus", "n_batch"))
      .select(col("cell"), col("n_corpus"), col("n_batch"),
        when(col("n_corpus") === 0, lit(null).cast("bigint"))
          .otherwise(expr("n_batch * 1000000L div n_corpus"))
          .as("growth_micro"),
        when(col("n_corpus") === 0, lit(null).cast("bigint"))
          .otherwise(expr("s_c div n_corpus")).as("corpus_d2_micro"),
        when(col("n_batch") === 0, lit(null).cast("bigint"))
          .otherwise(expr("s_b div n_batch")).as("batch_d2_micro"),
        when(col("n_batch") === 0 || col("n_corpus") === 0,
            lit(null).cast("bigint"))
          .otherwise(expr("s_b div n_batch - s_c div n_corpus"))
          .as("drift_micro"))
      .orderBy(col("cell"))
  }

  /** q160 as an oracle query: quantizer frozen on the corpus residue
    * (the q105 rule), corpus stats computed in-query (the production
    * pipeline reads them persisted — IndexStore `quantizer_drift`
    * family, disk==memory spec-pinned). */
  def quantizerDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val corpus = e.filter(col("vec_id") % VecBatchMod =!= 0)
    val batch = e.filter(col("vec_id") % VecBatchMod === 0)
      .select(col("vec_id"), col("v"))
    val cents = centroidsOf(
        Tables(spark, dir, "embeddings")
          .filter(col("vec_id") % VecBatchMod =!= 0))
      .transform(graft.Materialize.shared) // feeds corpus AND batch assignment
    quantizerDriftOf(cents, cellStatsOf(cellAssign(corpus, cents)), batch)
  }

  /** L52/q149: embedding-space HEALTH report — the per-label diagnostic
    * read before trusting an embedding table for ANN serving or
    * hard-negative mining: population, COMPACTNESS (exact integer mean
    * of squared distance to the label's own centroid — the cluster
    * radius), and SEPARATION (the nearest other centroid and its gap).
    * Embedding collapse shows as every gap → 0; label bleed shows as
    * gap ≪ radius. Same A9 fixed-point centroids as q68, so the report
    * and the classifier can never disagree about where a label sits.
    *
    * Scale shape: one broadcast-centroids scan for compactness (the q68
    * plan without the argmin) + a |labels|² broadcast self-join for
    * gaps — bounded by the label vocabulary, never the corpus. */
  def embeddingReport(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val cents = centroids(spark, dir)
    // double-rounding is engine-identical: l2Sq is 6-dp rounded first,
    // then the micro cast is exact (the q138 qmicro argument)
    val compact = e.join(broadcast(cents), col("label") === col("clabel"))
      .withColumn("d2micro",
        round(round(l2Sq(col("v"), col("c")), 6) * 1e6).cast("bigint"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        expr("sum(d2micro) div count(*)").as("mean_d2_micro"))
    val gaps = cents.as("a")
      .crossJoin(broadcast(cents.select(col("clabel").as("blabel"),
        col("c").as("bc"))))
      .filter(col("clabel") =!= col("blabel"))
      .withColumn("g", round(l2Sq(col("c"), col("bc")), 6))
    val nearest = gaps.groupBy(col("clabel").as("label"))
      .agg(min(struct(col("g"), col("blabel"))).as("best"))
      .select(col("label"), col("best.blabel").as("nearest_label"),
        col("best.g").as("centroid_gap"))
    compact.join(nearest, Seq("label"))
      .select(col("label"), col("n"), col("mean_d2_micro"),
        col("nearest_label"), col("centroid_gap"))
      .orderBy(col("label"))
  }


  /** Oracle SQL of this family — merged into
    * [[VectorQueries.oracleMain]] (pure move, round 14). */
  private[operators] def reportsVecOracleMain: Map[String, String] = Map(
    // q160 NESTS q105's frozen-quantizer CTE (centroids from the corpus
    // residue, assignment over every vector) and re-derives the winning
    // distance exactly as Spark does: round(l2sq, 6) then micro cast.
    // The corpus stats are in-query here; the pipeline reads them
    // persisted (IndexStore quantizer_drift family, spec-pinned equal).
    "q160_quantizer_drift" ->
      (s"WITH ${centroidCteFrom(s"WHERE e.vec_id % $VecBatchMod <> 0")}," +
      s"""d AS (
         |  SELECT a.vec_id, a.pred_label AS cell,
         |    CAST(round(${oracleL2Sq("a.v", "cent.c")} * 1e6) AS BIGINT)
         |      AS d2micro,
         |    a.vec_id % $VecBatchMod = 0 AS is_batch
         |  FROM assigned a JOIN cent ON cent.clabel = a.pred_label),
         |stats AS (
         |  SELECT cell,
         |    count(*) FILTER (WHERE NOT is_batch) AS n_corpus,
         |    count(*) FILTER (WHERE is_batch) AS n_batch,
         |    sum(d2micro) FILTER (WHERE NOT is_batch) AS s_c,
         |    sum(d2micro) FILTER (WHERE is_batch) AS s_b
         |  FROM d GROUP BY cell)
         |SELECT cell, n_corpus, n_batch,
         |  CASE WHEN n_corpus = 0 THEN NULL
         |    ELSE CAST(n_batch * 1000000 // n_corpus AS BIGINT)
         |  END AS growth_micro,
         |  CASE WHEN n_corpus = 0 THEN NULL
         |    ELSE CAST(s_c // n_corpus AS BIGINT) END AS corpus_d2_micro,
         |  CASE WHEN n_batch = 0 THEN NULL
         |    ELSE CAST(s_b // n_batch AS BIGINT) END AS batch_d2_micro,
         |  CASE WHEN n_batch = 0 OR n_corpus = 0 THEN NULL
         |    ELSE CAST(s_b // n_batch - s_c // n_corpus AS BIGINT)
         |  END AS drift_micro
         |FROM stats ORDER BY cell""".stripMargin),
    "q68_centroid_classify" -> (s"WITH $centroidCte" +
      """SELECT label, pred_label, count(*) AS n
        |FROM assigned GROUP BY label, pred_label
        |ORDER BY label, pred_label""".stripMargin),
    // q152 NESTS the q68 assigned CTE: cell balance IS the quantizer's
    // real layout, not a re-derivation
    "q152_ivf_cell_balance" -> (s"WITH $centroidCte," +
      """cells AS (
        |  SELECT pred_label AS cell, count(*) AS n
        |  FROM assigned GROUP BY pred_label),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM cells)
        |SELECT cell, n, CAST(n * 1000000 // n_total AS BIGINT)
        |  AS share_micro
        |FROM cells, tot ORDER BY cell""".stripMargin),
    // q149 NESTS the q68 centroid CTE (same fixed-point rule) — the
    // report and the classifier cannot disagree about label geometry
    "q149_embedding_report" -> (s"WITH $centroidCte," +
      s"""own AS (
         |  SELECT e.label,
         |    CAST(round(${oracleL2Sq("e.v", "cent.c")} * 1e6) AS BIGINT)
         |      AS d2micro
         |  FROM e JOIN cent ON cent.clabel = e.label),
         |comp AS (
         |  SELECT label, count(*) AS n,
         |    CAST(sum(d2micro) // count(*) AS BIGINT) AS mean_d2_micro
         |  FROM own GROUP BY label),
         |gaps AS (
         |  SELECT a.clabel AS label, b.clabel AS nl,
         |    ${oracleL2Sq("a.c", "b.c")} AS g
         |  FROM cent a JOIN cent b ON a.clabel <> b.clabel),
         |near AS (
         |  SELECT label, nl AS nearest_label, g AS centroid_gap FROM (
         |    SELECT *, row_number() OVER (PARTITION BY label
         |      ORDER BY g, nl) AS rn FROM gaps) WHERE rn = 1)
         |SELECT label, n, mean_d2_micro, nearest_label, centroid_gap
         |FROM comp JOIN near USING (label) ORDER BY label""".stripMargin))
}
