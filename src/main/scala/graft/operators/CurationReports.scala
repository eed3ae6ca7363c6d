package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Report / funnel / release family (L28/L40/L43/L46/L50/
  * L54/L57/L58/L61): the shared disposition frame, funnel charts,
  * snapshot diffs/drift/trends, source report cards and overlap —
  * q115/q132/q138/q142/q147/q151/q154/q155/q157.
  *
  * Split out of CurationQueries by family (round 11, pure moves) —
  * the object mixes every family trait back in, so call sites and
  * behavior are unchanged; shared constants/oracles stay on the
  * object, reachable through the self-type.
  */
private[operators] trait CurationReports {
  this: CurationQueries.type =>

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
  private[operators] def dispositionFrame(spark: SparkSession,
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
      .transform(graft.Materialize.shared)
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

  /** Oracle SQL of the report family — merged into
    * [[CurationQueries.oracleMain]] (pure move, round 14). */
  private[operators] def reportsOracleMain: Map[String, String] = Map(
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
         |FROM m GROUP BY lang ORDER BY lang""".stripMargin)
}
