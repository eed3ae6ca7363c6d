package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Dedup cluster/segment/substring family (L11/L15a-c/L22/L32/
  * L47/L70/L51/L59/L60/L76): connected components, survivor election,
  * segment & substring dedup, window indexes and their incremental
  * legs — q77/q85/q88/q89/q98/q114/q119/q120/q129/q143/q148/q156/
  * q158/q168/q175.
  *
  * Split out of CurationQueries by family (round 11, pure moves) —
  * the object mixes every family trait back in, so call sites and
  * behavior are unchanged; shared constants/oracles stay on the
  * object, reachable through the self-type.
  */
private[operators] trait CurationClusters {
  this: CurationQueries.type =>

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
      .transform(graft.Materialize.now)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).transform(graft.Materialize.now)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val neighborMin = sym.join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("label"))
      val next = labels.select(col("id"), col("label"))
        .union(neighborMin)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .transform(graft.Materialize.now)
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
  private[operators] def withClusterSizes(members: DataFrame): DataFrame = {
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
      .filter(col("u") =!= col("v")).distinct().transform(graft.Materialize.now)
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
        .distinct().transform(graft.Materialize.now)
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
      setsC: DataFrame, ccC: DataFrame, newDocs: DataFrame): DataFrame =
    incrementalClusterMembersFromPairs(
      LLMQueries.incrementalNearDups(bandsC, setsC, newDocs), ccC)

  /** The contracted merge CONSUMING precomputed verified daily pairs
    * (the q96 increment: batch-touching pairs with exact `jaccard`) —
    * the q186 move's Jaccard flavor (VERDICT r12 "Next round" #3): the
    * expensive stage of the nightly text_cc merge is per-pair Jaccard
    * verification over the candidate graph, and with the pair table
    * persisted as an IndexStore family (`text_near_dup_pairs`) a
    * composed pipeline verifies tonight's candidates ONCE and feeds
    * the increment to the pair-table compaction AND this merge —
    * corpus-corpus pairs were verified the night they entered and are
    * never re-verified. */
  private[operators] def incrementalClusterMembersFromPairs(
      dailyPairs: DataFrame, ccC: DataFrame): DataFrame = {
    val pairs = dailyPairs
      .filter(col("jaccard") >= ClusterThreshold)
      .select(col("doc_a"), col("doc_b"))
      .transform(graft.Materialize.shared) // feeds endpoint ids + contraction
    // contraction labels via ONE broadcast-semi probe of the label
    // table by the batch-bounded endpoint set, broadcast back into the
    // edge list — the direct pairs-LEFT-JOIN-ccC shape planned a
    // sort-merge that re-shuffled the corpus label table per day (the
    // round-11 media_cc lesson, applied back to the text side)
    val endpointIds = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
    val labels = ccC
      .join(broadcast(endpointIds), Seq("doc_id"), "left_semi")
      .transform(graft.Materialize.shared) // batch-bounded label subset
    val edges = pairs
      .join(broadcast(labels.select(col("doc_id").as("doc_a"),
        col("cluster_id").as("la"))), Seq("doc_a"), "left")
      .join(broadcast(labels.select(col("doc_id").as("doc_b"),
        col("cluster_id").as("lb"))), Seq("doc_b"), "left")
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
      .transform(graft.Materialize.shared) // feeds member + anti join-backs
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
      .transform(graft.Materialize.shared) // feeds members + touched labels
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

  /** Oracle SQL of the cluster-maintenance family — merged into
    * [[CurationQueries.oracleMain]] (pure moves, rounds 14-15). */
  private[operators] def clustersOracleMain: Map[String, String] = Map(
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
    "q129_cluster_split" -> clusterSplitOracle,
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
         |ORDER BY cluster_id, rk""".stripMargin)

  /** Shared CTE prefix for q77/q85/q88: the recursive-CTE transitive
    * closure over the q64 pair graph, ending in `comp(doc_id,
    * cluster_id)`. */
  private[operators] def clustersCtes: String =
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
  private[operators] def clustersOracle: String =
    s"""$clustersCtes
       |SELECT doc_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM comp ORDER BY doc_id""".stripMargin

  /** q129 oracle: the q77/q85 recursive closure for the cluster map,
    * singletons defaulting to their own id, q75's threshold rule keyed
    * by the cluster id. */
  private[operators] def clusterSplitOracle: String =
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
}
