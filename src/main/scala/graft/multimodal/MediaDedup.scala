package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Perceptual-hash (image-style) dedup family (L27/L38b/L81/L90):
  * banded Hamming pairs (q109), the cluster election (q130), the
  * canonical hash-family index trio + member-exact incremental flow
  * (q111) + collapsed pair table (q190), the shift-aware compaction,
  * and the media_cc contracted cluster merge (q180).
  *
  * Split out of Multimodal by family (round 13, pure moves).
  */
private[multimodal] trait MediaDedup {
  this: Multimodal.type =>

  /** Bits per LSH band over the 63-bit hash: 7 bands × 9 bits. With
    * [[MediaHammingMax]] = 6 < 7 bands, the pigeonhole principle makes
    * banding EXACT — any pair within the Hamming threshold agrees on at
    * least one full band — so the banded search equals the quadratic
    * scan it replaces, and the oracle can verify via the latter. */
  private[multimodal] val BandBits = 9
  private[multimodal] val NumBands = 7

  /** Max Hamming distance for a perceptual near-dup pair. */
  val MediaHammingMax = 6

  /** Image/media near-dup pairs via perceptual-hash banding — the q64
    * MinHash shape over media bytes (VERDICT r8 "Next round" #4: image
    * dedup as first-class as text/vector dedup). Scale shape: hashes are
    * 8 bytes per asset (the payload never leaves the decode stage); the
    * band self-join is the only shuffle, O(Σ bucket²) candidates, and
    * both legs read ONE (band, key) exchange (ReusedExchange). Each band
    * row carries the 8-byte hash, so verification is an inline
    * bit_count(xor) — no join-back. At 100 TB the standard exact-dedup
    * pre-pass (q60/q95 shape, here trivially phash-equality) bounds
    * identical-asset families before the quadratic stage. */
  def mediaNearDups(spark: SparkSession, dir: String,
      cap: Option[Int] = None): DataFrame =
    mediaPairFrame(spark, dir, cap).orderBy(col("doc_a"), col("doc_b"))

  /** The q109 pair set WITHOUT the presentation sort — the edge input
    * q130's cluster formation consumes (a global order would cost a
    * range exchange the CC immediately re-shuffles away). */
  private def mediaPairFrame(spark: SparkSession, dir: String,
      cap: Option[Int] = None): DataFrame =
    pairFrameOf(assetHashes(spark, dir), cap)

  /** The banded Hamming pair query over ANY hash frame — shared by the
    * full pass (q109/q130) and the corpus-side media_cc build (q180).
    * `cap` applies the per-bucket occupancy cap (the q187 admission
    * rule — BandCapSpec pins each swept cap equal to the curve's
    * kept/admitted sets); None = today's pigeonhole-exact join,
    * byte-identical plan. */
  private[multimodal] def pairFrameOf(h: DataFrame,
      cap: Option[Int] = None): DataFrame = {
    val bands0 = graft.Scale.byKey(phashBands(h), col("band"), col("key"))
    val bands = cap.fold(bands0)(capBands(bands0, "doc_id", _))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= MediaHammingMax)
      .distinct()
  }

  /** q130: media-CLUSTER survivor election — the end of the media dedup
    * pipeline, the way q88 ends the text pipeline: perceptual-hash pairs
    * (q109) → connected components (q85's O(log n) large-star/small-star
    * rounds — near-dup similarity is not transitive, so election must be
    * per component) → one kept asset per cluster, electing the
    * max-caption-quality member with min doc_id as the tie-break. This
    * is the LAION-style move: a crop/re-encode family collapses to one
    * asset, and the surviving row keeps the best associated text — on
    * the equal-quality families the variants create, the ORIGINAL wins
    * by tie-break, exactly what a curation pass wants.
    *
    * Scale shape: everything downstream of the (already-banded) pair
    * query is the q85/q88 machinery — key-partitioned joins and
    * partial-aggregating groupBys over (id, label) longs; election is
    * ONE `max(struct)` aggregate per cluster, never a cluster-keyed
    * window (a mega-cluster of re-encodes map-side-combines instead of
    * single-reducing). */
  def mediaClusterSurvivors(spark: SparkSession, dir: String): DataFrame = {
    val (clusters, _) = graft.operators.CurationQueries
      .connectedComponentsStar(
        mediaPairFrame(spark, dir).select(col("doc_a"), col("doc_b")))
    graft.operators.CurationQueries
      .electSurvivors(clusters, scoredAssets(spark, dir))
  }

  /** Per-asset caption quality over the q109 asset universe — ONE
    * definition shared by q130's election, the media_cc label table and
    * the q180 daily election, so the three can never score a caption
    * differently. */
  private[graft] def scoredAssets(spark: SparkSession,
      dir: String): DataFrame =
    assetDocs(spark, dir)
      .select(col("doc_id"),
        graft.operators.LLMQueries.qualityExpr.as("quality"))

  /** Hashes of the full q109 asset universe, CPU spread before decode. */
  private[multimodal] def assetHashes(spark: SparkSession,
      dir: String): DataFrame =
    perceptualHashes(graft.Scale.byKey(assetTable(spark, dir),
      col("doc_id"))).toDF()

  /** (doc_id, phash, band, key) band rows of a hash frame — the table a
    * daily pipeline PERSISTS (IndexStore `media_bands`): 7 rows × ~32
    * bytes per asset, the payloads never reappear. Each row carries the
    * full hash so candidate verification is an inline bit_count — no
    * join-back. */
  def phashBands(h: DataFrame): DataFrame =
    h.select(h.columns.map(col) :+
        posexplode(expr(
          s"transform(sequence(0, ${NumBands - 1})," +
            s" b -> (phash div shiftleft(1L, b * $BandBits))" +
            s" % shiftleft(1L, $BandBits))")).as(Seq("band", "key")): _*)

  /** Incremental media near-dup: Hamming pairs of an incoming asset
    * batch against an already-banded corpus (plus batch-internal pairs)
    * WITHOUT re-pairing the corpus — the q96/q103 probe shape, media
    * flavor, completing the incremental daily-ingest family across all
    * modalities (text q96/q97/q98, vector q102/q103/q104, media here).
    * (corpus ∪ batch) bands join against BATCH bands only, so a
    * corpus-only bucket has no probe key and never enumerates; hashes
    * ride in the band rows, so verification never touches a corpus
    * table at all — the daily leg's only corpus-sized work is the
    * band-index scan. Pigeonhole exactness carries over: the result
    * provably equals the full q109 pass restricted to pairs touching
    * ≥ 1 batch asset, which is what the oracle checks. */
  def incrementalMediaNearDups(corpusBands: DataFrame,
      newHashes: DataFrame, cap: Option[Int] = None): DataFrame =
    incrementalMediaPairFrame(corpusBands, newHashes, cap)
      .orderBy(col("doc_a"), col("doc_b"))

  /** The q111 pair set WITHOUT the presentation sort — the edge input
    * the q180 contracted merge consumes. `cap` = the opt-in per-bucket
    * occupancy cap via [[cappedProbeSides]] (ranks over the probed
    * buckets' full corpus∪batch membership, so admission equals the
    * capped FULL join restricted to batch-touching pairs —
    * BandCapSpec); None = today's exact probe join, byte-identical. */
  private[multimodal] def incrementalMediaPairFrame(corpusBands: DataFrame,
      newHashes: DataFrame, cap: Option[Int] = None): DataFrame = {
    // lazy-materialized: feeds both the union leg and the probe leg
    val newBands = phashBands(newHashes).transform(graft.Materialize.shared)
    val (aSide, nSide) = cap match {
      case None => (corpusBands.unionByName(newBands), newBands)
      case Some(c) => cappedProbeSides(
        corpusBands.unionByName(newBands), newBands, "doc_id", c)
    }
    aSide.as("a")
      .join(nSide.as("n"),
        col("a.band") === col("n.band") && col("a.key") === col("n.key") &&
          col("a.doc_id") =!= col("n.doc_id"))
      .select(least(col("a.doc_id"), col("n.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("n.doc_id")).as("doc_b"),
        bit_count(col("a.phash").bitwiseXOR(col("n.phash")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= MediaHammingMax)
      .distinct()
  }

  // ---- canonical (hash-family-collapsed) incremental media near-dup ---

  /** Canonical media near-dup index tables — the q186 move, media
    * flavor: a FAMILY is an identical-phash group (the exact-dup
    * pre-pass the q109 scaladoc promises at 100 TB, now a persisted
    * artifact rather than a remark):
    *  - `fams(phash, canon)`: one row per distinct 63-bit hash,
    *    canon = min member doc_id;
    *  - `members(doc_id, canon)`: every corpus asset's family;
    *  - `bandsC`: band rows of CANONICAL hashes only — a canonical's
    *    bands equal every member's (same hash, same keys), so
    *    pigeonhole EXACTNESS survives canonicalization and bucket
    *    occupancy counts families, never re-encode replicas (what the
    *    q184 audit flags as hot is exactly what collapses here).
    */
  def mediaNearDupIndexTables(corpusHashes0: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    // the hash frame sits above the DECODE mapPartitions and feeds the
    // family aggregation AND the member join — checkpoint or every
    // consumer re-decodes the corpus
    val corpusHashes = corpusHashes0.transform(graft.Materialize.shared)
    val fams = corpusHashes.groupBy(col("phash"))
      .agg(min(col("doc_id")).as("canon"))
      .transform(graft.Materialize.shared) // members join + canonical bands
    val members = corpusHashes.join(fams, Seq("phash"))
      .select(col("doc_id"), col("canon"))
    val bandsC = phashBands(
      fams.select(col("canon").as("doc_id"), col("phash")))
    (fams, members, bandsC)
  }

  /** Family-level candidate generation + inline Hamming verification —
    * shared by the member-exact expansion (the q111 disk leg) and the
    * collapsed pair table (q190). Returns (famPairs(fid_a, fid_b,
    * hamming), reps(fid, is_new, nb), batchMembers(doc_id, fid),
    * corpusMembers(doc_id, fid) restricted to endpoint ∪ touched
    * families). Verification stays INLINE (hashes ride the band rows,
    * the q109 contract) — the win over the member-level flow is pure
    * candidate volume: O(Σ bucket-families²), not O(Σ bucket-members²).
    */
  private def canonMediaCore(famsC: DataFrame, bandsC: DataFrame,
      newHashes: DataFrame, cap: Option[Int] = None)
      : (DataFrame, DataFrame, DataFrame) = {
    val batchK = newHashes.select(col("doc_id"), col("phash"))
      .transform(graft.Materialize.shared) // reps + batch members
    val reps = batchK.groupBy(col("phash"))
      .agg(min(col("doc_id")).as("bmin"), count(lit(1)).as("nb"))
      .join(famsC, Seq("phash"), "left")
      .select(col("phash"),
        coalesce(col("canon"), col("bmin")).as("fid"),
        col("canon").isNull.as("is_new"), col("nb"))
      .transform(graft.Materialize.shared) // bands + members + within legs
    val repBands = phashBands(reps
        .select(col("fid").as("doc_id"), col("phash"), col("is_new")))
      .transform(graft.Materialize.shared) // probe leg + new-family union leg
    val probe0 = repBands.drop("is_new")
    val full0 = bandsC.unionByName(repBands.filter(col("is_new"))
      .drop("is_new"))
    // capped: occupancy counts FAMILIES (post-canonicalization), so a
    // hot bucket here is genuinely-similar distinct hashes — exactly
    // the mass the q184 audit flags and the q187 curve prices. An
    // existing touched family's probe rows equal its bandsC rows
    // (identical hash ⟹ identical band keys), so probe ⊆ full holds.
    val (full, probe) = cap match {
      case None => (full0, probe0)
      case Some(c) => cappedProbeSides(full0, probe0, "doc_id", c)
    }
    val famPairs = full.as("a")
      .join(probe.as("n"),
        col("a.band") === col("n.band") && col("a.key") === col("n.key") &&
          col("a.doc_id") =!= col("n.doc_id"))
      .select(least(col("a.doc_id"), col("n.doc_id")).as("fid_a"),
        greatest(col("a.doc_id"), col("n.doc_id")).as("fid_b"),
        bit_count(col("a.phash").bitwiseXOR(col("n.phash")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= MediaHammingMax)
      .distinct()
      .transform(graft.Materialize.shared) // expansion/count legs + fid set
    val batchMembers = batchK
      .join(reps.select(col("phash"), col("fid")), Seq("phash"))
      .select(col("doc_id"), col("fid"))
    (famPairs, reps, batchMembers)
  }

  /** Corpus member rows restricted to pair-endpoint ∪ batch-touched
    * families — the expansion input (separate from [[canonMediaCore]]
    * because the q180 contracted merge needs NO member table at all:
    * its corpus nodes are the canonicals themselves). */
  private def canonCorpusMembersOf(membersC: DataFrame,
      famPairs: DataFrame, reps: DataFrame): DataFrame = {
    val needFids = famPairs
      .select(explode(array(col("fid_a"), col("fid_b"))).as("canon"))
      .unionByName(reps.select(col("fid").as("canon")))
      .distinct()
    membersC
      .join(broadcast(needFids), Seq("canon"), "left_semi")
      .select(col("doc_id"), col("canon").as("fid"))
  }

  /** Member-exact canonical rendering of the incremental media
    * near-dup output — row-identical to [[incrementalMediaNearDups]]
    * (identical hashes share every band key, so a member pair is a
    * candidate iff its family pair is; the Hamming distance is a pure
    * function of the two hashes, so every cross-family member pair
    * carries its family pair's distance and every within-family pair
    * carries 0). The q111 oracle hash-checks the equality end to end;
    * [[graft.operators.IndexStore.dailyMedia]] runs THIS flow off the
    * persisted canonical tables. */
  def incrementalMediaNearDupsCanonical(famsC: DataFrame,
      membersC: DataFrame, bandsC: DataFrame,
      newHashes: DataFrame, cap: Option[Int] = None): DataFrame = {
    val (famPairs, reps, batchMembers) =
      canonMediaCore(famsC, bandsC, newHashes, cap)
    val corpusMembers = canonCorpusMembersOf(membersC, famPairs, reps)
    val membersAll = corpusMembers.withColumn("is_b", lit(false))
      .unionByName(batchMembers.withColumn("is_b", lit(true)))
      .transform(graft.Materialize.shared) // two cross legs + within leg
    val cross = famPairs.filter(col("fid_a") =!= col("fid_b"))
      .join(membersAll.select(col("fid").as("fid_a"),
        col("doc_id").as("a_id"), col("is_b").as("a_b")), Seq("fid_a"))
      .join(membersAll.select(col("fid").as("fid_b"),
        col("doc_id").as("b_id"), col("is_b").as("b_b")), Seq("fid_b"))
      .filter(col("a_b") || col("b_b"))
      .select(least(col("a_id"), col("b_id")).as("doc_a"),
        greatest(col("a_id"), col("b_id")).as("doc_b"), col("hamming"))
    val within = batchMembers.select(col("fid"), col("doc_id").as("a_id"))
      .join(membersAll.select(col("fid"), col("doc_id").as("b_id"),
        col("is_b").as("b_b")), Seq("fid"))
      .filter((!col("b_b") && col("a_id") =!= col("b_id")) ||
        (col("b_b") && col("a_id") < col("b_id")))
      .select(least(col("a_id"), col("b_id")).as("doc_a"),
        greatest(col("a_id"), col("b_id")).as("doc_b"),
        lit(0L).as("hamming"))
    cross.unionByName(within)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** L90/q190: the COLLAPSED media near-dup pair table — one row per
    * verified hash-FAMILY pair with the exact count of batch-touching
    * member pairs it implies (the q186 artifact, media flavor): what a
    * pipeline persists instead of materializing the expansion, whose
    * row count on a re-encode-heavy corpus is the 100× soak's 8.19M
    * daily rows. Within-family rows are the identical-hash re-encode
    * families themselves (hamming 0). Σ n_pairs == the q111 row count,
    * spec-pinned. */
  def canonicalMediaPairs(famsC: DataFrame, membersC: DataFrame,
      bandsC: DataFrame, newHashes: DataFrame,
      cap: Option[Int] = None): DataFrame = {
    val (famPairs, reps, _) =
      canonMediaCore(famsC, bandsC, newHashes, cap)
    val corpusMembers = canonCorpusMembersOf(membersC, famPairs, reps)
    val tcs = corpusMembers.groupBy(col("fid"))
      .agg(count(lit(1)).as("tc"))
    val counts = tcs
      .join(reps.select(col("fid"), col("nb").as("tb")), Seq("fid"), "full")
      .select(col("fid"), coalesce(col("tb"), lit(0L)).as("tb"),
        coalesce(col("tc"), lit(0L)).as("tc"))
      .transform(graft.Materialize.shared) // both cross legs + within leg
    val cross = famPairs
      .join(counts.select(col("fid").as("fid_a"), col("tb").as("tba"),
        col("tc").as("tca")), Seq("fid_a"))
      .join(counts.select(col("fid").as("fid_b"), col("tb").as("tbb"),
        col("tc").as("tcb")), Seq("fid_b"))
      .select(col("fid_a"), col("fid_b"), col("hamming"),
        (col("tba") * (col("tbb") + col("tcb")) +
          col("tca") * col("tbb")).as("n_pairs"))
    val within = reps.join(counts, Seq("fid"))
      .withColumn("n_pairs", expr("tb * (tb - 1) div 2 + tb * tc"))
      .filter(col("n_pairs") > 0)
      .select(col("fid").as("fid_a"), col("fid").as("fid_b"),
        lit(0L).as("hamming"), col("n_pairs"))
    cross.unionByName(within)
      .select(col("fid_a"), col("fid_b"), col("hamming"),
        col("n_pairs").cast("long").as("n_pairs"))
      .orderBy(col("fid_a"), col("fid_b"))
  }

  /** q190 as an ORACLE query: canonical tables built in-query over the
    * corpus residue (the q111 convention; the real daily path reads
    * the persisted tables through IndexStore). */
  def canonicalMediaPairsDaily(spark: SparkSession,
      dir: String): DataFrame = {
    val (corpus, batch) = mediaSplit(spark, dir)
    val (famsC, membersC, bandsC) = mediaNearDupIndexTables(corpus)
    canonicalMediaPairs(famsC, membersC, bandsC, batch)
  }

  /** Compacted canonical tables over (persisted index, batch) — equals
    * [[mediaNearDupIndexTables]] over corpus ∪ batch, spec-pinned; the
    * canonical SHIFT (a batch member with a smaller id) relabels the
    * family's member and band rows, band keys unchanged (same hash). */
  def compactMediaNearDupTables(famsC: DataFrame, membersC: DataFrame,
      bandsC: DataFrame, batch: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val batchFams = batch.groupBy(col("phash"))
      .agg(min(col("doc_id")).as("bmin"))
      .join(famsC, Seq("phash"), "left")
      .withColumn("new_canon",
        least(coalesce(col("canon"), col("bmin")), col("bmin")))
      .transform(graft.Materialize.shared) // fams/members/bands legs
    val famsOut = famsC
      .join(batchFams.select(col("phash")), Seq("phash"), "left_anti")
      .unionByName(
        batchFams.select(col("phash"), col("new_canon").as("canon")))
    val shifts = batchFams
      .filter(col("canon").isNotNull && col("new_canon") =!= col("canon"))
      .select(col("canon"), col("new_canon"))
    val membersOut = membersC
      .join(broadcast(shifts), Seq("canon"), "left")
      .select(col("doc_id"),
        coalesce(col("new_canon"), col("canon")).as("canon"))
      .unionByName(batch
        .join(batchFams.select(col("phash"),
          col("new_canon").as("canon")), Seq("phash"))
        .select(col("doc_id"), col("canon")))
    val newFamBands = phashBands(batchFams.filter(col("canon").isNull)
      .select(col("new_canon").as("doc_id"), col("phash")))
    val bandsOut = bandsC
      .join(broadcast(shifts.withColumnRenamed("canon", "doc_id")),
        Seq("doc_id"), "left")
      .select(coalesce(col("new_canon"), col("doc_id")).as("doc_id"),
        col("phash"), col("band"), col("key"))
      .unionByName(newFamBands)
    (famsOut, membersOut, bandsOut)
  }

  /** The media cluster LABEL+QUALITY table — IndexStore family
    * `media_cc`, the persisted artifact that closes the MEDIA dedup
    * lifecycle the way `text_cc` closed text (VERDICT r10 "Next round"
    * #4: media had daily pairs q111 and a full-pass election q130, but
    * survivor elections still implied a nightly corpus re-cluster):
    * q85's star CC over the q109 corpus pair graph, EVERY corpus asset
    * labeled (singletons carry their own id — the q143 whole-corpus
    * partition convention, which is what lets the daily contraction
    * treat every corpus endpoint uniformly), with the q130 caption
    * quality riding in the row. Persisting quality is what keeps the
    * daily election O(touched members): corpus captions never re-read,
    * never re-score. ~24 bytes per asset. */
  def mediaCcOf(corpusHashes: DataFrame,
      corpusScored: DataFrame): DataFrame = {
    val cc = graft.operators.CurationQueries.connectedComponentsStar(
        pairFrameOf(corpusHashes).select(col("doc_a"), col("doc_b")))._1
    corpusScored.join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        col("quality"))
  }

  /** Membership rows (doc_id, cluster_id, quality) of every cluster the
    * FULL q130 pass over corpus ∪ batch would form that contains ≥ 1
    * batch asset — without re-pairing or re-clustering the corpus (the
    * q175 contracted merge, media flavor). Shared by the q180 election
    * and the `media_cc` compaction.
    *
    * Mechanics: (1) q111's incremental pairs (every pair has a batch
    * endpoint by construction — pigeonhole-exact banding); (2) corpus
    * endpoints CONTRACT to their persisted label — sound because
    * banding is per-asset, so corpus-corpus connectivity is
    * batch-independent and fully inside the label table; the label
    * lookup is ONE broadcast-semi probe of `media_cc` by the
    * batch-bounded endpoint set, broadcast back into the edge list, so
    * the corpus label table is scanned once and NEVER shuffled (the
    * q96 endpoint contract, label flavor — q175's text version joins
    * the label table directly and pays a corpus exchange the text side
    * tolerates because `text_cc` holds only paired docs; media_cc holds
    * every asset, so the probe shape is load-bearing here); (3) star-CC
    * over the contracted BATCH-SIZED graph — a batch asset bridging two
    * corpus clusters merges them as single nodes (bridge fixture
    * spec-pinned); (4) members re-enumerate only for touched clusters,
    * via one broadcast-probed label scan. Daily cost O(batch +
    * candidate pairs + touched members). */
  def incrementalMediaClusterMembers(ccC: DataFrame, famsC: DataFrame,
      bandsC: DataFrame, newHashes: DataFrame,
      newScored: DataFrame): DataFrame = {
    // Edges come from the CANONICAL pair graph (round 12): identical
    // hashes always pair at Hamming 0, so a hash family is
    // intra-cluster in media_cc and ONE canonical node stands in for
    // every corpus member under the label contraction — the
    // member-level expansion the previous formulation enumerated
    // contracted to the same (batch, label) edges family-size times
    // over. Batch members stay individual nodes (each is new to the
    // graph); a family's batch members interconnect via their
    // Hamming-0 within edges exactly as the member-level pairs did.
    val (famPairs, reps, batchFamMembers) =
      canonMediaCore(famsC, bandsC, newHashes)
    val bm = batchFamMembers.transform(graft.Materialize.shared) // nodes+within
    val newFids = reps.filter(col("is_new")).select(col("fid"))
    // corpus-canonical node universe: every family a pair touches PLUS
    // every batch-touched existing family (its batch members connect
    // to the family's corpus part even when no cross pair exists)
    val corpusFids = famPairs
      .select(explode(array(col("fid_a"), col("fid_b"))).as("fid"))
      .unionByName(reps.filter(!col("is_new")).select(col("fid")))
      .distinct()
      .join(broadcast(newFids), Seq("fid"), "left_anti")
    val nodes = corpusFids
      .select(col("fid").as("node"), col("fid"), lit(false).as("isb"))
      .unionByName(bm
        .select(col("doc_id").as("node"), col("fid"), lit(true).as("isb")))
      .transform(graft.Materialize.shared) // two cross legs + within leg
    val cross = famPairs.select(col("fid_a"), col("fid_b"))
      .join(nodes.select(col("fid").as("fid_a"), col("node").as("na"),
        col("isb").as("ba")), Seq("fid_a"))
      .join(nodes.select(col("fid").as("fid_b"), col("node").as("nb"),
        col("isb").as("bb")), Seq("fid_b"))
      .filter(col("ba") || col("bb"))
      .select(col("na").as("doc_a"), col("nb").as("doc_b"))
    val within = bm.select(col("fid"), col("doc_id").as("a"))
      .join(nodes.select(col("fid"), col("node").as("b")), Seq("fid"))
      .filter(col("a") =!= col("b"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
    val pairs = cross.unionByName(within)
      .transform(graft.Materialize.shared) // feeds endpoint ids + contraction
    val endpointIds = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
    val labels = ccC
      .join(broadcast(endpointIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("cluster_id"))
      .transform(graft.Materialize.shared) // batch-bounded label subset
    val edges = pairs
      .join(broadcast(labels.select(col("doc_id").as("doc_a"),
        col("cluster_id").as("la"))), Seq("doc_a"), "left")
      .join(broadcast(labels.select(col("doc_id").as("doc_b"),
        col("cluster_id").as("lb"))), Seq("doc_b"), "left")
      .select(coalesce(col("la"), col("doc_a")).as("doc_a"),
        coalesce(col("lb"), col("doc_b")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
    // contracted CC: nodes are corpus labels and batch ids — batch-sized
    val comps = graft.operators.CurationQueries
      .connectedComponentsStar(edges)._1
      .select(col("doc_id").as("node"), col("cluster_id").as("tmp"))
    // merged cluster id = min(node): every label IS its cluster's min
    // member id (star-CC invariant; a singleton label its own id), so
    // min over nodes = the full pass's least member id
    val nodeMap = comps
      .join(comps.groupBy(col("tmp")).agg(min(col("node")).as("new_id")),
        Seq("tmp"))
      .select(col("node"), col("new_id"))
      .transform(graft.Materialize.shared) // feeds members + anti join-backs
    // ONE broadcast-probed corpus scan enumerates touched-cluster
    // members WITH their persisted quality (the q175 plan-read rule:
    // the daily path never shuffles the corpus label table)
    val labelHits = ccC
      .join(broadcast(nodeMap.withColumnRenamed("node", "cluster_id")),
        Seq("cluster_id"))
      .transform(graft.Materialize.shared) // feeds members + touched labels
    val corpusMembers = labelHits
      .select(col("doc_id"), col("new_id"), col("quality"))
    val touchedLabels = labelHits
      .select(col("cluster_id").as("node")).distinct()
    // every corpus endpoint has a label row (media_cc partitions the
    // corpus), so the anti leg leaves exactly the batch nodes — scored
    // from the batch's own captions, a batch-sized join
    val batchMembers = nodeMap
      .join(touchedLabels, Seq("node"), "left_anti")
      .select(col("node").as("doc_id"), col("new_id"))
      .join(newScored, Seq("doc_id"))
    corpusMembers
      .unionByName(
        batchMembers.select(col("doc_id"), col("new_id"), col("quality")))
      .select(col("doc_id"), col("new_id").as("cluster_id"),
        col("quality"))
  }

  /** L80/q180: incremental media CLUSTER maintenance + survivor
    * election — the daily operator that closes the media dedup
    * lifecycle: [[incrementalMediaClusterMembers]]' batch-touched
    * membership, elected per q130's rule (max caption quality, min
    * doc_id tie-break) as ONE max(struct) aggregate per cluster with
    * the member count riding along — never a cluster-keyed window, so a
    * mega-family of re-encodes map-side-combines. Provably equals the
    * full q130 pass over corpus ∪ batch restricted to clusters holding
    * ≥ 1 batch asset — exactly what the oracle checks via the recursive
    * closure. */
  def incrementalMediaClusters(ccC: DataFrame, famsC: DataFrame,
      bandsC: DataFrame, newHashes: DataFrame,
      newScored: DataFrame): DataFrame =
    incrementalMediaClusterMembers(ccC, famsC, bandsC, newHashes,
      newScored)
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("nid")))
        .as("best"),
        count(lit(1)).as("cluster_size"))
      .select(col("cluster_id"), (-col("best.nid")).as("kept_id"),
        col("best.quality").as("quality"), col("cluster_size"))
      .orderBy(col("kept_id"))

  /** q180 as an oracle query: corpus-side label table built in-query
    * over the q111 universe (corpus = id % 10 ≠ 0, batch = the rest —
    * the q104/q159/q175 convention; the production pipeline reads
    * IndexStore `media_cc`, disk==memory spec-pinned). */
  def incrementalMediaClustersDaily(spark: SparkSession,
      dir: String): DataFrame = {
    val (corpusH0, batchH) = mediaSplit(spark, dir)
    // the in-query rendering builds BOTH the label table and the
    // canonical tables from the corpus hashes — decode once
    val corpusH = corpusH0.transform(graft.Materialize.shared)
    val scored = scoredAssets(spark, dir)
      .transform(graft.Materialize.shared) // feeds corpus AND batch scoring
    val ccC = mediaCcOf(corpusH, scored.filter(col("doc_id") % 10 =!= 0))
    val (famsC, _, bandsC) = mediaNearDupIndexTables(corpusH)
    incrementalMediaClusters(ccC, famsC, bandsC, batchH,
      scored.filter(col("doc_id") % 10 === 0))
  }
}
