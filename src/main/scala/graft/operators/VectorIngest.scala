package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-ingest composition (L95/L96): the per-batch-vector
  * first-failing-gate disposition (q194) composing the three proven
  * vector dedup verdicts, and the release kept-vectors keep-list — the
  * q157/q159/q193 provenance convention extended to the third data
  * type (VERDICT r13 "Next round" #1: embeddings were the one data
  * type without a disposition or kept_* artifact).
  */
private[operators] trait VectorIngest {
  this: VectorQueries.type =>

  /** Per-batch-VECTOR ingest disposition given the three verdict
    * frames — ONE definition for the pipeline (disk-read index frames
    * through [[graft.operators.DailyIngest.runVectors]]) and the q194
    * oracle rendering. Gate order (first failing, the q157 rule):
    *   1. exact dup — the vector's fixed-point rendering is corpus-
    *      known, or a batch twin with a smaller id exists (it is not a
    *      keep row of the q102 flow);
    *   2. near dup — a VERIFIED cosine ≥ [[NearDupThreshold]] pair
    *      against a smaller id (q103 pairs are (vec_a < vec_b); only
    *      vec_b drops — the q88 rule);
    *   3. cluster election — its merged semantic cluster elects a
    *      different survivor (max norm², min-id tie-break — the q104
    *      election). NOT subsumed by gates 1–2: the election key is
    *      norm-first, so a higher-norm LARGER id can outrank a batch
    *      vector that survived both dedup gates;
    *   4. kept.
    * Every verdict frame is the proven incremental operator's output —
    * this composes, it never re-decides. */
  def vectorDispositionOf(batch: DataFrame, exactKeep: DataFrame,
      nearPairs: DataFrame, members: DataFrame): DataFrame = {
    val fExact = exactKeep
      .select(col("keep_id").as("vec_id"), lit(true).as("f_exact"))
    val fNear = nearPairs.select(col("vec_b").as("vec_id")).distinct()
      .withColumn("f_near", lit(true))
    val fElect = members.filter(col("kept_id") =!= col("vec_id"))
      .select(col("vec_id"), lit(true).as("f_elect"))
    batch.select(col("vec_id"))
      .join(fExact, Seq("vec_id"), "left")
      .join(fNear, Seq("vec_id"), "left")
      .join(fElect, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("f_exact").isNull, "dropped_exact_dup")
          .when(col("f_near").isNotNull, "dropped_near_dup")
          .when(col("f_elect").isNotNull, "dropped_cluster_election")
          .otherwise("kept").as("disposition"))
  }

  /** L95/q194: the per-vector ingest disposition as an ORACLE query —
    * index frames built in-query over the corpus residue (the
    * q159/q193 convention; the pipeline reads the same frames from
    * parquet, parity spec-pinned in DailyIngestSpec). */
  def vectorIngestDisposition(spark: SparkSession,
      dir: String): DataFrame = {
    val e = vecs(spark, dir).select(col("vec_id"), col("v"))
    val corpus = e.filter(col("vec_id") % VecBatchMod =!= 0)
      .transform(graft.Materialize.shared) // hash index + trio + sem tables
    val batch = e.filter(col("vec_id") % VecBatchMod === 0)
      .transform(graft.Materialize.shared) // 3 gates + the batch universe
    // ONE family core beneath all three gates (round 16, VERDICT r15
    // #2): the md5 keying, family aggregate and canonical banding used
    // to run once per index family — 2× keying + 2× banding per query —
    // and the hash index re-keyed the corpus a third time (famsFull has
    // exactly one row per distinct vkey, so its projection IS
    // vectorHashIndex's distinct-key table).
    val core = vecFamilyCore(corpus)
    val (famsC, membersC, bandsC, canonVecs) =
      vecNearDupIndexTablesFrom(core)
    val (sFams, sVecC, sBandsC, sCcC, sStatsC) =
      semanticIndexTablesFrom(core)
    vectorDispositionOf(batch,
      incrementalVectorExactDedup(core.famsFull.select(col("vkey")), batch),
      incrementalVectorNearDupsCanonical(famsC, membersC, bandsC,
        canonVecs, batch),
      incrementalSemanticMembers(sFams, sVecC, sBandsC, sCcC, sStatsC,
        batch))
      .orderBy(col("vec_id"))
  }

  /** Release-side KEPT-VECTORS keep-list — the q91/q104 election
    * applied over an explicit embeddings universe: every unclustered
    * vector ships, every semantic cluster ships exactly its elected
    * survivor (max norm², min-id tie-break). Clusters are connected
    * components of the VERIFIED pair graph, so no two shipped vectors
    * carry a verified cosine ≥ [[NearDupThreshold]] pair — the
    * kept_assets pin, vector flavor (ReleaseBuildSpec asserts it).
    * Shares [[semanticCanonCore]] with the full q91 pass, so the
    * keep-list and the cluster accounting can never disagree about
    * membership; a member is clustered iff its family canonical is
    * (identical fixed-point vectors are cliques — the whole family
    * rides its canonical's component). */
  def keptVectorsOf(emb: DataFrame): DataFrame = {
    val e = vecsOf(emb).select(col("vec_id"), col("v"))
      .transform(graft.Materialize.shared) // core + member expansion
    val (famsK, canon, canonMembers0) = semanticCanonCore(e)
    val canonMembers = canonMembers0
      .transform(graft.Materialize.shared) // election leg + clustered semi
    val elected = canonMembers
      .join(canon.select(col("vec_id"), norm2Expr.as("norm2")),
        Seq("vec_id"))
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("norm2"), (-col("vec_id")).as("nid"))).as("best"))
      .select((-col("best.nid")).as("vec_id"))
    val clustered = e.select(col("vec_id"), vKeyExpr.as("vkey"))
      .join(famsK.select(col("vkey"), col("vec_id").as("canon")),
        Seq("vkey"))
      .join(canonMembers.select(col("vec_id").as("canon")),
        Seq("canon"), "left_semi")
      .select(col("vec_id"))
    val keptIds = e.select(col("vec_id"))
      .join(clustered, Seq("vec_id"), "left_anti")
      .unionByName(elected)
    emb.join(keptIds, Seq("vec_id"), "left_semi").orderBy(col("vec_id"))
  }

  /** The ELECTION-CHURN surface between two kept-vector lists — which
    * shipped vectors flip when the semantic clusters refresh (VERDICT
    * r14 "Next round" #2: the q155 longitudinal-stability story, keep-
    * list flavor — a scheduled [[DailyIngest.rebuildSemantic]] changes
    * cluster membership, and the retrain trigger's cost is exactly the
    * set of previously-shipped vectors it dethrones). Restricted to
    * `commonIds` (ids present in BOTH universes) so a growing corpus
    * does not report every new arrival as churn: `flipped_out` rows
    * shipped under the old clusters but not the new; `flipped_in` the
    * reverse. Under a purely GROWING universe flipped_in is empty by
    * the norm-first election's monotonicity — a cluster only gains
    * members, so a loser can never start winning (spec-pinned). */
  def keptChurnOf(keptBefore: DataFrame, keptAfter: DataFrame,
      commonIds: DataFrame): DataFrame = {
    val ids = commonIds.select(col("vec_id"))
      .transform(graft.Materialize.shared) // both semi joins
    val b = keptBefore.select(col("vec_id"))
      .join(ids, Seq("vec_id"), "left_semi")
      .transform(graft.Materialize.shared) // anti both ways
    val a = keptAfter.select(col("vec_id"))
      .join(ids, Seq("vec_id"), "left_semi")
      .transform(graft.Materialize.shared) // anti both ways
    b.join(a, Seq("vec_id"), "left_anti")
      .withColumn("churn", lit("flipped_out"))
      .unionByName(a.join(b, Seq("vec_id"), "left_anti")
        .withColumn("churn", lit("flipped_in")))
      .orderBy(col("churn"), col("vec_id"))
  }

  /** L99/q196: the doc↔VECTOR paired-curation classification — the
    * third and last pairing of the release's keep-lists (VERDICT r14
    * "Next round" #1: q195 joined the text funnel to the ASSET
    * keep-list, but kept_docs ↔ kept_vectors never met, so a kept
    * document whose embedding lost the q104 election silently vanished
    * from ANN/retrieval serving, and a dropped document whose vector
    * shipped kept polluting q135/q140 mining). documents and embeddings
    * share the id space (SURVEY L72), so this is the q195 classifier,
    * vector flavor: per document, its q157 funnel disposition, its
    * vector's keep status under the q91 election, and the 4-way pair
    * status. ONE definition for the q196 oracle rendering and the
    * ReleaseBuild `paired_vector_curation` artifact.
    *
    * Scale shape: both inputs are slim id-keyed frames (disposition
    * strings, kept ids) — the join shuffles ids and enums only, never
    * text or vectors. */
  def pairedVectorCurationOf(textDisp: DataFrame,
      keptVectors: DataFrame): DataFrame =
    textDisp.select(col("doc_id"),
        col("disposition").as("text_disposition"))
      .join(keptVectors.select(col("vec_id").as("doc_id"),
          lit(true).as("vk")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("text_disposition"),
        when(col("vk").isNotNull, "kept").otherwise("dropped")
          .as("vector_status"),
        when(col("text_disposition") === "kept" && col("vk").isNotNull,
          "kept_kept")
          .when(col("text_disposition") === "kept",
            "vector_dropped_doc_kept")
          .when(col("vk").isNotNull, "doc_dropped_vector_kept")
          .otherwise("both_dropped").as("pair_status"))
      .orderBy(col("doc_id"))

  /** q196 as an ORACLE query: the q157 disposition over every document
    * joined to the full-universe vector keep-list (the pipeline runs
    * the same [[pairedVectorCurationOf]] over the release funnel's
    * frames — ReleaseBuildSpec pins the reconciliation). */
  def docVectorDisposition(spark: SparkSession, dir: String): DataFrame =
    pairedVectorCurationOf(
      CurationQueries.funnelDisposition(spark, dir),
      keptVectorsOf(graft.Tables(spark, dir, "embeddings")))

  /** q196's oracle: the q157 funnel oracle nested verbatim (the
    * q115/q193 composition rule) + the kept-vector list off the SAME
    * closure chain the q91/q104/q194 oracles price
    * ([[semanticClosureCtes]]): a vector ships iff it is unclustered
    * (no verified pair reaches it) or it is its cluster's rn=1
    * election survivor — exactly [[keptVectorsOf]]'s rule (raw-vector
    * closure == canonical-family closure because identical fixed-point
    * vectors are cliques in `vpairs`; the q91 equivalence argument). */
  private[operators] def docVectorDispositionOracleSql: String =
    s"""WITH RECURSIVE $semanticClosureCtes,
       |dd AS (SELECT * FROM (
       |${CurationQueries.oracle("q157_funnel_disposition")})),
       |clustered AS (SELECT vec_id FROM comp),
       |kv AS (
       |  SELECT vec_id FROM embeddings
       |  WHERE vec_id NOT IN (SELECT vec_id FROM clustered)
       |  UNION ALL
       |  SELECT vec_id FROM ranked WHERE rn = 1)
       |SELECT d.doc_id, dd.disposition AS text_disposition,
       |  CASE WHEN d.doc_id IN (SELECT vec_id FROM kv)
       |       THEN 'kept' ELSE 'dropped' END AS vector_status,
       |  CASE
       |    WHEN dd.disposition = 'kept'
       |     AND d.doc_id IN (SELECT vec_id FROM kv) THEN 'kept_kept'
       |    WHEN dd.disposition = 'kept' THEN 'vector_dropped_doc_kept'
       |    WHEN d.doc_id IN (SELECT vec_id FROM kv)
       |      THEN 'doc_dropped_vector_kept'
       |    ELSE 'both_dropped' END AS pair_status
       |FROM documents d JOIN dd ON dd.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** q194's oracle: the first-failing CASE in the engine's gate order
    * over the batch residue (the q193 nested-oracle rule) — exact =
    * NOT a q102 keep row (that oracle nested verbatim), near = a
    * batch-side vec_b of the shared `vpairs` CTE (q103's oracle IS
    * vpairs restricted to batch-touching pairs, and only vec_b — the
    * larger id — drops), election = the closure chain's ranked rn=1
    * survivor differs (restricting comp to batch members is implicit:
    * any cluster holding one is batch-touched, the q104 rule). */
  private[operators] def vectorIngestDispositionOracleSql: String =
    s"""WITH RECURSIVE $semanticClosureCtes,
       |exact_keep AS (SELECT keep_id AS vec_id FROM (
       |${oracleMain("q102_incremental_vector_exact_dedup")})),
       |near_loser AS (
       |  SELECT DISTINCT vec_b AS vec_id FROM vpairs
       |  WHERE vec_b % $VecBatchMod = 0),
       |kept_of AS (
       |  SELECT cluster_id, vec_id AS kept_id FROM ranked WHERE rn = 1),
       |elect_loser AS (
       |  SELECT c.vec_id FROM comp c JOIN kept_of k USING (cluster_id)
       |  WHERE k.kept_id <> c.vec_id)
       |SELECT vec_id,
       |  CASE
       |    WHEN vec_id NOT IN (SELECT vec_id FROM exact_keep)
       |      THEN 'dropped_exact_dup'
       |    WHEN vec_id IN (SELECT vec_id FROM near_loser)
       |      THEN 'dropped_near_dup'
       |    WHEN vec_id IN (SELECT vec_id FROM elect_loser)
       |      THEN 'dropped_cluster_election'
       |    ELSE 'kept' END AS disposition
       |FROM embeddings WHERE vec_id % $VecBatchMod = 0
       |ORDER BY vec_id""".stripMargin
}
