package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Retrieval family (L19/L19b/L63/L72/L80): BM25 (full + incremental
  * with persisted df/stats), query-likelihood, RRF fusion, hybrid
  * dense+lexical, and the retrieval-quality gate —
  * q93/q144/q163/q164/q170/q179 + their shared oracle CTE blocks.
  *
  * Split out of LLMQueries by family (round 13, pure moves).
  */
private[operators] trait TextRetrieval {
  this: LLMQueries.type =>

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
    * Scale shape: tf is the one corpus-wide shuffle, materialized once
    * per query ([[bm25IndexShared]]); doc lengths aggregate the
    * materialized postings rather than a second corpus pass; the
    * query-term set is broadcast (queries are few); df is
    * vocabulary-sized — broadcast here, a t-keyed shuffle join at
    * web-corpus vocab sizes; scoring joins touch only docs sharing a
    * query term; final ranking is per-query top-k (O3 window).
    */
  def bm25Topk(spark: SparkSession, dir: String): DataFrame =
    bm25TopkOf(docs(spark, dir))

  private[operators] def bm25TopkOf(docsDf: DataFrame): DataFrame = {
    val (tf, dl) = bm25IndexShared(docsDf)
    bm25Rank(tf, dl)
  }

  /** [[bm25Index]] with the postings table materialized ONCE per query
    * (localCheckpoint) and doc lengths derived from the materialized
    * rows. Catalyst cannot share the tokenize+aggregate subtree across
    * the ranking tail's consumers — qterms/df/dl/stats each push a
    * different doc_id filter, so the canonicalized subplans differ and
    * q93's physical plan rebuilt the scan+split+explode+TF chain FIVE
    * times (round-15 plan audit; guide §2.4 "remove shuffles
    * outright"). Eager: the postings feed several broadcast builds on
    * concurrent threads, and jobs racing a lazy checkpoint each
    * recompute it (the AnnFrames seal rationale, VERDICT r11 #2).
    * Query-path only — builders that PERSIST tf/dl (IndexStore) keep
    * the raw [[bm25Index]] so their write plans stay scan-shaped.
    *
    * Two deliberate trades (ADVICE r15): construction is EFFECTFUL (the
    * checkpoint runs a Spark job and pins the postings in executor
    * storage until RDD GC — acceptable for query paths the bench/verify
    * mains construct-and-run once); and localCheckpoint truncates
    * lineage into UNREPLICATED executor blocks, so on a multi-executor
    * deployment an executor loss mid-query fails the query instead of
    * recomputing — see [[graft.Materialize]] for the cluster-mode
    * policy (persist keeps the recompute path). */
  private def bm25IndexShared(docsDf: DataFrame): (DataFrame, DataFrame) = {
    val tf = bm25Index(docsDf)._1.transform(graft.Materialize.now)
    (tf, tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))
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
    val btfc = btf.transform(graft.Materialize.shared) // union leg + df leg
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
    val (tf, dl) = bm25IndexShared(docs(spark, dir))
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
    val (tf, dl) = bm25IndexShared(docs(spark, dir))
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
    val (tf, dl) = bm25IndexShared(docsDf)
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
    val (tf, dl) = bm25IndexShared(docsDf)
    // Each ranking chain runs ONCE at the deepest depth any variant
    // needs (RrfDepth ⊇ k) and is materialized (queries×depth rows):
    // a two-level top-k at depth 10 filtered to rk ≤ 3 IS the depth-3
    // ranking (identical (score desc, doc_id) order, and the depth-10
    // shard survivors are a superset of the depth-3 ones — the q107
    // argument), so the bm25/ql/dense chains stop being rebuilt per
    // variant: bm25 ran 3× (k, rrf leg, hybrid leg), ql 2×, dense 2×
    // before (guide §1.2 "don't compute things you throw away").
    val lex10 = bm25Rank(tf, dl, RrfDepth)
      .transform(graft.Materialize.shared) // bm25 variant + rrf + hybrid legs
    val ql10 = qlRank(tf, dl, RrfDepth)
      .transform(graft.Materialize.shared) // ql variant + rrf leg
    val dense10 = VectorQueries.denseRankedLeg(emb, Bm25NumQueries, RrfDepth)
      .transform(graft.Materialize.shared) // dense variant + hybrid leg
    val truth = VectorQueries.denseExactLeg(emb, Bm25NumQueries, k)
      .select(col("qid"), col("doc_id"))
      .transform(graft.Materialize.shared) // feeds the join and the total
    val variants: Seq[(String, DataFrame)] = Seq(
      "bm25" -> lex10.filter(col("rk") <= k),
      "dense_ivf" -> dense10.filter(col("rk") <= k),
      "hybrid_dense" -> rrfFuse(
        lex10.select(col("qid"), col("doc_id"), col("rk"))
          .unionByName(
            dense10.select(col("qid"), col("doc_id"), col("rk"))))
        .filter(col("rk") <= k),
      "ql" -> ql10.filter(col("rk") <= k),
      "rrf" -> rrfFuse(lex10.unionByName(ql10)).filter(col("rk") <= k))
    val union = variants.map { case (name, df) =>
      df.select(lit(name).as("variant"), col("qid"), col("doc_id"))
    }.reduce(_.unionByName(_))
      .transform(graft.Materialize.shared) // feeds the hit join + truth mass
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


  /** Oracle SQL of the retrieval family — merged into [[LLMQueries.oracle]]. */
  private[operators] def retrievalOracle: Map[String, String] = Map(
    "q170_hybrid_dense_rrf" -> hybridOracle,
    "q179_retrieval_quality" -> retrievalQualityOracle,
    "q93_bm25_topk" -> bm25Oracle,
    "q163_ql_topk" -> qlOracle,
    "q164_rrf_fusion" -> rrfOracle,
    // q144: the (corpus ∪ batch) postings union is the whole documents
    // table, so the incremental answer IS the full q93 answer — one
    // shared oracle, zero drift by construction
    "q144_incremental_bm25" -> bm25Oracle)
}
