package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.CentroidAggregator
import graft.functions.CosineSimilarity.cosineSim
import graft.functions.L2Distance.l2Sq

/** Embedding dedup family (L2c/L17/L21/L24): sign-LSH cosine near-dups,
  * semantic dedup end-to-end, exact vector dedup, and the incremental
  * (daily-ingest) legs over the persisted vec_hash/vec_bands/sem_*
  * index families — q65/q91/q95/q102/q103/q104.
  *
  * Split out of VectorQueries by family (round 12, pure moves) — see
  * [[VectorAnnTiers]].
  */
private[operators] trait VectorDedup {
  this: VectorQueries.type =>

  // ---- sign-LSH near-dup ---------------------------------------------

  // 4 bands × 6 bits: 64 distinct keys per band, so random data spreads
  // into buckets of ~n/64 and candidate volume is Σ bucket² ≈ n²/64 per
  // band — with 4-bit bands (16 keys) buckets held n/16 and the "pruned"
  // search was only a 4× reduction. Recall stays the sign-LSH curve:
  // ≈86% for true near-dups (cos 0.9), deliberately low at the 0.4
  // boundary where similarity is semantically weak anyway.
  private[operators] val NumPlanes = 24
  private[operators] val PlanesPerBand = 6
  private[operators] final val Dim = 64
  private[graft] final val NearDupThreshold = 0.4

  /** Deterministic ±1 random hyperplanes, shared verbatim with the oracle
    * SQL (seeded PRNG, generated once at class init). */
  private[operators] val planes: Seq[Seq[Int]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(NumPlanes)(Seq.fill(Dim)(if (rnd.nextBoolean()) 1 else -1))
  }

  /** Sign of ⟨v, w_p⟩ in exact fixed-point (round(x*1e9) longs), so both
    * engines compute identical bits — a double dot product could flip a
    * boundary sign between engines. This HOF formulation is kept as the
    * in-engine reference the native [[graft.functions.SignLshKeys]]
    * expression is parity-tested against (VectorQueriesSpec). */
  private[operators] def signBitSql(w: Seq[Int]): String =
    s"aggregate(zip_with(v, array(${w.mkString(",")}), " +
      "(x, wd) -> cast(round(x * 1e9) as bigint) * wd), 0L, (s, e) -> s + e) >= 0L"

  /** L2 (embedding flavor): cosine near-dup pairs via sign-LSH banding —
    * vectors agreeing on all 6 bits of any band become candidates; exact
    * cosine (native expression) then keeps pairs ≥ 0.4. Candidate volume
    * is O(Σ bucket²), never the O(n²) cross join; recall is the standard
    * sign-LSH curve (≈1 for true near-dups, ~50% at the 0.4 boundary).
    *
    * All 24 sign bits come from ONE native
    * [[graft.functions.SignLshKeys]] evaluation per row (fused
    * multiply-accumulate, components rounded once) instead of 24
    * interpreted `aggregate(zip_with(...))` expressions.
    */
  def cosineNearDups(spark: SparkSession, dir: String): DataFrame =
    cosineNearDupsOf(vecs(spark, dir))

  /** Sign-LSH band keys of a (vec_id, v) frame — the q65 projection,
    * shared by the full self-join pair flow and the incremental
    * (daily-ingest) probe flow so the two can never drift apart. */
  /** L86/q185: VECTOR band-occupancy audit — the q184 report over the
    * q65/q103 sign-LSH bands, prompted by a measurement: the round-12
    * 100× composed-lifecycle soak showed `vec_near_dup`'s daily leg at
    * 558 s wall / 8,577 s CPU (1.5M verified pairs) on the
    * adversarially replica-dense corpus — pair volume quadratic per
    * bucket, exactly the hot-bucket failure mode the media audit
    * watches for, and the vector bands (4 bands × 64 keys) likewise
    * carry no occupancy cap because capping trades recall. Per band:
    * populated keys, max occupancy, implied candidate-pair volume
    * Σ n·(n−1)/2 (spec-reconciled EXACTLY against the band self-join's
    * pre-dedup row count), and the bucket/pair mass above the shared
    * hot threshold. Audits the RAW per-vector banding — the hazard
    * measure that motivated the canonical fix
    * ([[vecNearDupIndexTables]]/q186), which collapses replica-driven
    * hot buckets by construction; residual occupancy here is
    * genuinely-similar distinct vectors. */
  def vecBandOccupancy(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.bandOccupancyOf(
      lshBandsOf(vecs(spark, dir)))

  private[operators] def lshBandsOf(e: DataFrame): DataFrame =
    e.select(col("vec_id"), posexplode(
        graft.functions.SignLshKeys.signLshKeys(
          col("v"), planes, PlanesPerBand)))
      .toDF("vec_id", "band", "key")

  /** [[lshBandsOf]] retaining every input column — the streaming twin
    * carries (ts, v) through the band explode for the stream-static
    * probe + inline verification. Same native expression, same planes:
    * one banding definition across batch and stream. */
  private[graft] def lshBandsKeeping(e: DataFrame): DataFrame =
    e.select(e.columns.map(col) :+ posexplode(
        graft.functions.SignLshKeys.signLshKeys(
          col("v"), planes, PlanesPerBand)): _*)
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "key")

  private[operators] def cosineNearDupsOf(e: DataFrame,
      cap: Option[Int] = None): DataFrame = {
    // repartition on the join key: both self-join legs then read ONE
    // materialized exchange (ReusedExchange), so the fixed-point
    // sign-bit dot products run once per query instead of once per leg
    // (without it AQE broadcasts one leg, and a broadcast exchange can
    // never reuse a shuffle exchange — same lesson as q64); width
    // AQE-sized (Scale.byKey, round 16)
    val bands0 = graft.Scale.byKey(lshBandsOf(e), col("band"), col("key"))
    // cap: the q188 admission rule applied (BandCapSpec pins the capped
    // output equal to the curve's kept set per swept cap); None =
    // today's exact join, byte-identical plan
    val bands = cap.fold(bands0)(
      graft.multimodal.Multimodal.capBands(bands0, "vec_id", _))
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cands
      .join(e.select(col("vec_id").as("vec_a"), col("v").as("va")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb")), Seq("vec_b"))
      .withColumn("cos", round(cosineSim(col("va"), col("vb")), 6))
      .filter(col("cos") >= NearDupThreshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Exact fixed-point squared norm — the election key for semantic
    * dedup. round(x·1e6)² longs sum exactly (64 dims × 1e12 ≪ 2⁶³) and
    * identically in both engines, where a double Σx² could differ in the
    * last ulp between summation orders. */
  private[operators] val norm2Expr = expr(
    "aggregate(v, 0L, (s, x) -> s + cast(round(x * 1e6) as bigint)" +
      " * cast(round(x * 1e6) as bigint))")

  /** q95's portable exact-vector key over the double-array column `v`
    * (same fixed-point rule as [[vecKeyExpr]], which reads the raw
    * float `embedding`). */
  private[operators] val vKeyExpr = expr(
    "md5(concat_ws(',', transform(v," +
      " x -> cast(cast(round(x * 1e9) as bigint) as string))))")

  /** Portable exact-vector key: md5 over the comma-joined fixed-point
    * components — identical strings (and so identical keys) in Spark and
    * DuckDB, where hashing raw doubles would not be portable. Shared
    * with the streaming twin (StreamingOps) so batch and stream dedup
    * key identically. */
  private[graft] val vecKeyExpr = expr(
    "md5(concat_ws(',', transform(embedding," +
      " x -> cast(cast(round(cast(x as double) * 1e9) as bigint) as string))))")

  /** Exact embedding dedup — the mandatory PRE-PASS before semantic
    * dedup on real corpora (SemDeDup's own recipe): byte-identical
    * vectors collapse to one canonical (min vec_id) through a single
    * hash-keyed aggregation, so identical-vector mega-families never
    * reach the quadratic LSH pair stage. The 30× soak makes the cost
    * concrete: q91 alone on a corpus of 30-member identical families is
    * ~210 s; this pass collapses those families at a q60-like ~2 s, and
    * semantic dedup then runs on canonicals at 1× cost. At 100 TB the
    * shuffle carries a 32-hex key per vector, never the vector itself.
    */
  def vectorExactDedup(spark: SparkSession, dir: String): DataFrame =
    graft.Scale.byKey(Tables(spark, dir, "embeddings"), col("vec_id"))
      .groupBy(vecKeyExpr.as("vkey"))
      .agg(min(col("vec_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  // ---- incremental (daily-ingest) vector dedup ------------------------

  /** Batch-id residue selecting the "today's batch" leg: vectors with
    * vec_id ≡ 0 (mod 10) arrive today, the rest are the signed corpus —
    * the q96/q97 split, embedding flavor (VERDICT r6/r7 gap: the
    * daily-ingest pattern had no vector-side counterpart). */
  private[graft] val VecBatchMod = 10

  /** The persisted corpus-side key index a daily pipeline writes once:
    * one distinct q95 canonical key per known vector (32-hex md5 of the
    * fixed-point components — never the vector itself). */
  def vectorHashIndex(corpus: DataFrame): DataFrame =
    corpus.select(vKeyExpr.as("vkey")).distinct()

  /** Incremental exact vector dedup: survivors of an incoming batch
    * against the persisted [[vectorHashIndex]]. Batch vectors whose
    * canonical key exists in the corpus are dups; within the batch the
    * min vec_id wins, as in the full q95 pass. The anti-join shuffles
    * 32-hex keys only: daily cost is O(batch), not O(corpus). */
  def incrementalVectorExactDedup(corpusKeys: DataFrame,
      newVecs: DataFrame): DataFrame =
    newVecs
      .select(col("vec_id"), vKeyExpr.as("vkey"))
      .groupBy(col("vkey"))
      .agg(min(col("vec_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .join(corpusKeys, Seq("vkey"), "left_anti")
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** Incremental near-dup, MEMBER-LEVEL reference formulation: cosine
    * pairs of an incoming batch against an already-banded corpus (plus
    * batch-internal pairs) WITHOUT re-pairing the corpus with itself —
    * [[graft.operators.LLMQueries.incrementalNearDups]]'s probe shape,
    * embedding flavor. Band keys and cosine are pure per-vector/per-pair
    * functions, so the result equals the FULL q65 pair pass restricted
    * to pairs touching ≥1 batch vector.
    *
    * Kept as the formulation the CANONICAL flow
    * ([[incrementalVectorNearDupsCanonical]]) is parity-pinned against:
    * this version bands and verifies per MEMBER, so a replica-dense
    * corpus pays O(Σ bucket-members²) candidates and one cosine per
    * member pair — the round-12 100× soak measured it at 558 s wall /
    * 8,577 s CPU; the canonical flow is what q103 and the persisted
    * family run. */
  def incrementalVectorNearDups(corpusBands: DataFrame, corpusVecs: DataFrame,
      newVecs: DataFrame): DataFrame = {
    // materialized lazily: newBands feeds BOTH the union leg and the
    // probe leg — without the checkpoint each consumer re-runs the
    // fixed-point sign-bit projection (2× the band math per daily run).
    // The batch is the small side by definition, so this is cheap;
    // eager=false keeps plan construction/audit free (the q70 lesson).
    val newBands = lshBandsOf(newVecs).transform(graft.Materialize.shared)
    // cands feeds the verify joins AND the endpoint filter — the lazy
    // checkpoint keeps the band-probe join from running twice
    val cands = corpusBands.unionByName(newBands).as("a")
      .join(newBands.as("n"),
        col("a.band") === col("n.band") && col("a.key") === col("n.key") &&
          col("a.vec_id") =!= col("n.vec_id"))
      .select(least(col("a.vec_id"), col("n.vec_id")).as("vec_a"),
        greatest(col("a.vec_id"), col("n.vec_id")).as("vec_b"))
      .distinct()
      .transform(graft.Materialize.shared)
    // cosine verification only needs the vectors of candidate ENDPOINTS
    // (batch-bounded — every pair has a batch side): the semi-join
    // filter keeps the daily pass from shuffling every corpus VECTOR
    // for a handful of pairs (q96's endpoint lesson, vector flavor —
    // vectors are 64 doubles each, the most expensive rows in the
    // pipeline to move). The endpoint set broadcasts under AQE.
    val ends = cands
      .select(explode(array(col("vec_a"), col("vec_b"))).as("vec_id"))
      .distinct()
    // one explicit vec_id exchange for the union of verify vectors, for
    // the same reason as q96's sets union: identically-partitioned union
    // children otherwise let Spark 4.1 zip a 2N-partition union leg
    // against an N-partition candidates leg; post-filter it moves
    // candidate-sized rows, not the corpus
    val all = graft.Scale.byKey(
      corpusVecs.unionByName(newVecs)
        .join(broadcast(ends), Seq("vec_id"), "left_semi"),
      col("vec_id"))
    cands
      .join(all.select(col("vec_id").as("vec_a"), col("v").as("va")),
        Seq("vec_a"))
      .join(all.select(col("vec_id").as("vec_b"), col("v").as("vb")),
        Seq("vec_b"))
      .withColumn("cos", round(cosineSim(col("va"), col("vb")), 6))
      .filter(col("cos") >= NearDupThreshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // ---- canonical (family-collapsed) incremental near-dup ---------------

  /** The canonical vec_near_dup index trio a daily pipeline persists —
    * the q95/SemDeDup exact pre-pass applied to the NEAR-DUP family
    * (round 12), after the 100× composed-lifecycle soak measured the
    * member-level daily leg at 558 s wall / 8,577 s CPU on the
    * replica-dense corpus (PLANS.md): with bands keyed per VECTOR, a
    * 100-replica family makes every one of its buckets 100 deep and the
    * candidate join quadratic per bucket; with bands keyed per FAMILY
    * the same corpus bands once per distinct rendering and candidate
    * volume falls from O(Σ members²) to O(Σ families²).
    *
    *  - `fams(vkey, canon)`: one row per distinct fixed-point vector
    *    rendering, canon = min member vec_id (the q95 canonical);
    *  - `members(vec_id, canon)`: every corpus vector's family — 16
    *    bytes/row, what the pair EXPANSION reads (semi-joined to the
    *    families a day actually touches, never shuffled whole);
    *  - `bandsC(vec_id, band, key)`: sign-LSH band keys of CANONICAL
    *    vectors only;
    *  - `canonVecs(vec_id, v)`: the canonical vectors themselves — one
    *    64-double row per distinct rendering, so the daily leg's cosine
    *    verification reads the (replica-factor-smaller) index instead
    *    of scanning the data-lake embeddings, and the family is
    *    self-contained (the text_cc convention).
    */
  def vecNearDupIndexTables(corpus: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    vecNearDupIndexTablesFrom(vecFamilyCore(corpus))

  /** The shared family core beneath BOTH corpus-side vector index
    * families (round 16, VERDICT r15 "Next round" #2): the fixed-point
    * keying, the per-vkey family aggregate and the canonical-vector
    * table are ONE subtree each, so a composition that builds the
    * near-dup trio AND the semantic tables over the same corpus (q194,
    * IndexStore.writeVectorIndexes) keys/aggregates/bands the corpus
    * once instead of once per family. Members:
    *  - keyed(vec_id, v, vkey) — the md5 projection;
    *  - famsFull(vkey, canon, fam_size) — superset of both families'
    *    fams tables (each projects the columns its contract persists);
    *  - canonVecs(vkey, canon, fam_size, v) — canonical vectors;
    *  - bandsC(vec_id, band, key) — sign-LSH bands of the canonicals
    *    (identical in both families: same vectors, same planes). */
  private[operators] final class VecFamilyCore(corpus: DataFrame) {
    val keyed: DataFrame =
      corpus.select(col("vec_id"), col("v"), vKeyExpr.as("vkey"))
        .transform(graft.Materialize.shared)
    val famsFull: DataFrame = keyed.groupBy(col("vkey"))
      .agg(min(col("vec_id")).as("canon"), count(lit(1)).as("fam_size"))
      .transform(graft.Materialize.shared) // feeds members join + canon vecs
    val canonVecs: DataFrame = famsFull
      .join(keyed.select(col("vec_id").as("canon"), col("v")),
        Seq("canon"))
      // column order = the semantic family's persisted vecC layout
      .select(col("canon"), col("vkey"), col("fam_size"), col("v"))
      .transform(graft.Materialize.shared) // band leg + verify legs + writes
    val bandsC: DataFrame = lshBandsOf(
        canonVecs.select(col("canon").as("vec_id"), col("v")))
      .transform(graft.Materialize.shared) // near-dup probe + semantic probe
  }

  private[operators] def vecFamilyCore(corpus: DataFrame): VecFamilyCore =
    new VecFamilyCore(corpus)

  /** [[vecNearDupIndexTables]] over an already-built [[VecFamilyCore]] —
    * same four frames, shared subtrees. */
  private[operators] def vecNearDupIndexTablesFrom(core: VecFamilyCore)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val fams = core.famsFull.select(col("vkey"), col("canon"))
    val members = core.keyed.select(col("vec_id"), col("vkey"))
      .join(fams, Seq("vkey"))
      .select(col("vec_id"), col("canon"))
    val canonVecs = core.canonVecs
      .select(col("canon").as("vec_id"), col("v"))
    (fams, members, core.bandsC, canonVecs)
  }

  /** Family-level candidate generation + cosine verification — the core
    * shared by the member-exact expansion (q103's canonical rendering)
    * and the collapsed pair table (q186), so the two can never drift.
    * Returns (famPairs(fid_a, fid_b, cos), reps(vkey, fid, v, is_new,
    * nb), batchMembers(vec_id, fid), corpusMembers(vec_id, fid) —
    * corpus member rows restricted to pair-endpoint ∪ batch-touched
    * families).
    *
    * A family is identified by `fid`: its persisted corpus canonical if
    * known, else the min batch member id (corpus and batch ids are
    * disjoint by the residue rule, so fids never collide). Probe-side
    * band keys are computed on BATCH representatives — safe even when
    * same-vkey members are NOT byte-identical doubles, because
    * [[graft.functions.SignLshKeys]] computes its bits from the
    * round(v·1e9) fixed-point rendering, i.e. exactly the quantity
    * vkey keys the family by: equal vkey ⟹ equal fixed-point vector ⟹
    * equal band keys, so an existing touched family's probe rows equal
    * its persisted canonical band rows and the corpus is never
    * re-banded. (Cosine VERIFICATION, by contrast, runs on raw doubles
    * — which is why it always reads the canonical member's vector, in
    * both the engine and the q186 oracle.) Every candidate has a
    * batch-touched side, so corpus-only family buckets never enumerate
    * (the q96 probe contract, family granularity); cosine verification
    * runs ONCE per family pair instead of once per member pair — on a
    * replica-dense corpus the 100× soak's 1.5M verified member pairs
    * collapse to the few thousand distinct family pairs beneath them.
    */
  private def canonNearDupCore(famsC: DataFrame, membersC: DataFrame,
      bandsC: DataFrame, canonVecsC: DataFrame, newVecs: DataFrame,
      cap: Option[Int] = None)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val batchK = newVecs.select(col("vec_id"), col("v"), vKeyExpr.as("vkey"))
      .transform(graft.Materialize.shared) // feeds reps + batch members
    // one representative per batch-touched family: the min batch row
    val reps = batchK.groupBy(col("vkey"))
      .agg(min(struct(col("vec_id"), col("v"))).as("m"),
        count(lit(1)).as("nb"))
      .join(famsC, Seq("vkey"), "left")
      .select(col("vkey"),
        coalesce(col("canon"), col("m.vec_id")).as("fid"),
        col("m.v").as("v"), col("canon").isNull.as("is_new"), col("nb"))
      .transform(graft.Materialize.shared) // bands + vecs + members + within
    val repBands = reps.select(col("fid"), col("is_new"),
        posexplode(graft.functions.SignLshKeys.signLshKeys(
          col("v"), planes, PlanesPerBand)))
      .toDF("fid", "is_new", "band", "key")
      .transform(graft.Materialize.shared) // probe leg + new-family union leg
    val probe0 = repBands
      .select(col("fid").as("vec_id"), col("band"), col("key"))
    val full0 = bandsC.unionByName(repBands.filter(col("is_new"))
      .select(col("fid").as("vec_id"), col("band"), col("key")))
    // capped: occupancy counts FAMILIES (the q186 property), so a hot
    // bucket here is genuinely-similar distinct renderings and the cap
    // trades exactly what the q188 curve prices. Probe ⊆ full holds:
    // an existing family's probe rows equal its bandsC rows (same
    // fixed-point rendering ⟹ same sign bits, the vkey argument).
    val (full, probe) = cap match {
      case None => (full0, probe0)
      case Some(c) => graft.multimodal.Multimodal
        .cappedProbeSides(full0, probe0, "vec_id", c)
    }
    val cands = full.as("a")
      .join(probe.as("n"),
        col("a.band") === col("n.band") && col("a.key") === col("n.key") &&
          col("a.vec_id") =!= col("n.vec_id"))
      .select(least(col("a.vec_id"), col("n.vec_id")).as("fid_a"),
        greatest(col("a.vec_id"), col("n.vec_id")).as("fid_b"))
      .distinct()
      .transform(graft.Materialize.shared) // verify joins + endpoint filter
    val ends = cands
      .select(explode(array(col("fid_a"), col("fid_b"))).as("vec_id"))
      .distinct()
    // canonical vectors of candidate endpoints only: corpus canonicals
    // come off the persisted canonical-vector table (replica-factor
    // smaller than the lake), new-family reps off the batch — the
    // broadcast semi keeps the verify legs from shuffling every
    // canonical (the q96 endpoint lesson, family flavor)
    val repVecs = graft.Scale.byKey(
      canonVecsC.select(col("vec_id"), col("v"))
        .unionByName(reps.filter(col("is_new"))
          .select(col("fid").as("vec_id"), col("v")))
        .join(broadcast(ends), Seq("vec_id"), "left_semi"),
      col("vec_id"))
    val famPairs = cands
      .join(repVecs.select(col("vec_id").as("fid_a"), col("v").as("va")),
        Seq("fid_a"))
      .join(repVecs.select(col("vec_id").as("fid_b"), col("v").as("vb")),
        Seq("fid_b"))
      .withColumn("cos", round(cosineSim(col("va"), col("vb")), 6))
      .filter(col("cos") >= NearDupThreshold)
      .select(col("fid_a"), col("fid_b"), col("cos"))
      .transform(graft.Materialize.shared) // expansion/count legs + fid set
    val batchMembers = batchK
      .join(reps.select(col("vkey"), col("fid")), Seq("vkey"))
      .select(col("vec_id"), col("fid"))
    // member rows are needed only for pair-endpoint and batch-touched
    // families — the broadcast semi keeps the corpus-sized member
    // table from shuffling for a handful of pairs
    val needFids = famPairs
      .select(explode(array(col("fid_a"), col("fid_b"))).as("canon"))
      .unionByName(reps.select(col("fid").as("canon")))
      .distinct()
    val corpusMembers = membersC
      .join(broadcast(needFids), Seq("canon"), "left_semi")
      .select(col("vec_id"), col("canon").as("fid"))
    (famPairs, reps, batchMembers, corpusMembers)
  }

  /** Member-exact canonical rendering of the incremental near-dup
    * output — row-identical to [[incrementalVectorNearDups]] (the
    * member-level reference formulation, kept for the parity spec)
    * because: identical fixed-point vectors share every band key, so a
    * member pair is an LSH candidate iff its FAMILY pair is; both
    * engines verify with the same vectors (a member's vector is its
    * canonical's, byte for byte), so the 6-dp cosine is the same
    * number; and the expansion emits exactly the member pairs with a
    * batch endpoint — within-family via batch×members (batch-corpus
    * once by construction, batch-batch once via the id order), cross-
    * family via the batch-endpoint filter. The q103 oracle (full q65
    * pass restricted to batch-touching pairs) hash-checks all of it. */
  def incrementalVectorNearDupsCanonical(famsC: DataFrame,
      membersC: DataFrame, bandsC: DataFrame, canonVecsC: DataFrame,
      newVecs: DataFrame, cap: Option[Int] = None): DataFrame = {
    val (famPairs, reps, batchMembers, corpusMembers) =
      canonNearDupCore(famsC, membersC, bandsC, canonVecsC, newVecs, cap)
    val membersAll = corpusMembers.withColumn("is_b", lit(false))
      .unionByName(batchMembers.withColumn("is_b", lit(true)))
      .transform(graft.Materialize.shared) // two cross legs + within leg
    val cross = famPairs
      .join(membersAll.select(col("fid").as("fid_a"),
        col("vec_id").as("a_id"), col("is_b").as("a_b")), Seq("fid_a"))
      .join(membersAll.select(col("fid").as("fid_b"),
        col("vec_id").as("b_id"), col("is_b").as("b_b")), Seq("fid_b"))
      .filter(col("a_b") || col("b_b"))
      .select(least(col("a_id"), col("b_id")).as("vec_a"),
        greatest(col("a_id"), col("b_id")).as("vec_b"), col("cos"))
    // self-cosine through the SAME expression the member-level flow
    // would run on the identical member vectors (a zero vector's NaN
    // self-cosine must drop here exactly as it does there)
    val selfCos = reps
      .withColumn("cos", round(cosineSim(col("v"), col("v")), 6))
      .filter(col("cos") >= NearDupThreshold)
      .select(col("fid"), col("cos"))
    val within = batchMembers.select(col("fid"), col("vec_id").as("a_id"))
      .join(membersAll.select(col("fid"), col("vec_id").as("b_id"),
        col("is_b").as("b_b")), Seq("fid"))
      .filter((!col("b_b") && col("a_id") =!= col("b_id")) ||
        (col("b_b") && col("a_id") < col("b_id")))
      .join(selfCos, Seq("fid"))
      .select(least(col("a_id"), col("b_id")).as("vec_a"),
        greatest(col("a_id"), col("b_id")).as("vec_b"), col("cos"))
    cross.unionByName(within)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** L87/q186: the COLLAPSED near-dup pair table — what a 100 TB
    * pipeline persists instead of materializing the member expansion:
    * one row per verified FAMILY pair (fid_a, fid_b, cos) with
    * `n_pairs`, the exact count of batch-touching member pairs the row
    * implies (cross: tbA·(tbB+tcB) + tcA·tbB over batch/corpus member
    * counts; within: tb·(tb−1)/2 + tb·tc). On the round-12 100× soak
    * corpus the 1.5M expanded member pairs collapse to the distinct
    * family pairs beneath them — the expansion is recoverable exactly
    * (Σ n_pairs equals the q103 row count, spec-pinned) but never has
    * to be shuffled, verified, or stored pairwise. */
  def canonicalNearDupPairs(famsC: DataFrame, membersC: DataFrame,
      bandsC: DataFrame, canonVecsC: DataFrame,
      newVecs: DataFrame, cap: Option[Int] = None): DataFrame = {
    val (famPairs, reps, _, corpusMembers) =
      canonNearDupCore(famsC, membersC, bandsC, canonVecsC, newVecs, cap)
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
      .select(col("fid_a"), col("fid_b"), col("cos"),
        (col("tba") * (col("tbb") + col("tcb")) +
          col("tca") * col("tbb")).as("n_pairs"))
    val within = reps
      .withColumn("cos", round(cosineSim(col("v"), col("v")), 6))
      .filter(col("cos") >= NearDupThreshold)
      .join(counts, Seq("fid"))
      .withColumn("n_pairs", expr("tb * (tb - 1) div 2 + tb * tc"))
      .filter(col("n_pairs") > 0)
      .select(col("fid").as("fid_a"), col("fid").as("fid_b"),
        col("cos"), col("n_pairs"))
    cross.unionByName(within)
      .select(col("fid_a"), col("fid_b"), col("cos"),
        col("n_pairs").cast("long").as("n_pairs"))
      .orderBy(col("fid_a"), col("fid_b"))
  }

  /** q186: the daily-ingest collapsed pair table as an ORACLE query —
    * index tables built in-query over the corpus residue (the q103
    * convention; the real daily path reads the persisted trio through
    * [[graft.operators.IndexStore.dailyVecNearDup]]). */
  def canonicalNearDupPairsDaily(spark: SparkSession,
      dir: String): DataFrame = {
    val e = vecs(spark, dir).select(col("vec_id"), col("v"))
    val corpus = e.filter(col("vec_id") % VecBatchMod =!= 0)
    val batch = e.filter(col("vec_id") % VecBatchMod === 0)
    val (famsC, membersC, bandsC, canonVecs) =
      vecNearDupIndexTables(corpus)
    canonicalNearDupPairs(famsC, membersC, bandsC, canonVecs, batch)
  }

  /** L88/q188: the vector band-cap operating curve — the q187 report
    * over the CANONICAL sign-LSH bands: after the q186 fix the
    * persisted band table holds one row per distinct vector rendering,
    * so any residual hot bucket is genuinely-similar DISTINCT vectors
    * and capping it trades real recall; this measures exactly how much,
    * per cap, against the verified canonical pair set (the full-corpus
    * q65 pass over family representatives). Shares
    * [[graft.multimodal.Multimodal.bandCapCurveOf]] and the cap sweep
    * with the media flavor so the two curves can never price caps
    * differently. */
  def vecBandCapCurve(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir).select(col("vec_id"), col("v"))
    val (_, _, bandsC, canonVecs0) = vecNearDupIndexTables(e)
    val canonVecs = canonVecs0.transform(graft.Materialize.shared) // 2 legs
    graft.multimodal.Multimodal.bandCapCurveOf(bandsC, "vec_id",
      pairs => pairs
        .join(canonVecs.select(col("vec_id").as("ida"),
          col("v").as("va")), Seq("ida"))
        .join(canonVecs.select(col("vec_id").as("idb"),
          col("v").as("vb")), Seq("idb"))
        .filter(round(cosineSim(col("va"), col("vb")), 6) >=
          NearDupThreshold)
        .select(col("ida"), col("idb")))
  }

  /** Compacted canonical trio over (persisted index, batch) — equals
    * [[vecNearDupIndexTables]] over corpus ∪ batch (IndexStoreSpec pins
    * it). The one non-pointwise effect is the CANONICAL SHIFT: a batch
    * member with a smaller id than its family's corpus canonical
    * becomes the new canonical (rebuild semantics: canon = min member),
    * relabeling the family's member and band rows — band KEYS never
    * change (identical vectors ⇒ identical fixed-point sign bits), so
    * shifted bands relabel in place and only NEW families band anew. */
  def compactVecNearDupTables(famsC: DataFrame, membersC: DataFrame,
      bandsC: DataFrame, canonVecsC: DataFrame, batch: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val batchK = batch.select(col("vec_id"), col("v"), vKeyExpr.as("vkey"))
      .transform(graft.Materialize.shared) // feeds fams + member append
    val batchFams = batchK.groupBy(col("vkey"))
      .agg(min(struct(col("vec_id"), col("v"))).as("m"))
      .select(col("vkey"), col("m.vec_id").as("bmin"), col("m.v").as("v"))
      .join(famsC, Seq("vkey"), "left")
      .withColumn("new_canon",
        least(coalesce(col("canon"), col("bmin")), col("bmin")))
      .transform(graft.Materialize.shared) // fams/members/bands legs
    val famsOut = famsC
      .join(batchFams.select(col("vkey")), Seq("vkey"), "left_anti")
      .unionByName(
        batchFams.select(col("vkey"), col("new_canon").as("canon")))
    val shifts = batchFams
      .filter(col("canon").isNotNull && col("new_canon") =!= col("canon"))
      .select(col("canon"), col("new_canon"))
    val membersOut = membersC
      .join(broadcast(shifts), Seq("canon"), "left")
      .select(col("vec_id"),
        coalesce(col("new_canon"), col("canon")).as("canon"))
      .unionByName(batchK
        .join(batchFams.select(col("vkey"),
          col("new_canon").as("canon")), Seq("vkey"))
        .select(col("vec_id"), col("canon")))
    val newFamBands = lshBandsOf(batchFams.filter(col("canon").isNull)
      .select(col("new_canon").as("vec_id"), col("v")))
    val bandsOut = bandsC
      .join(broadcast(shifts.withColumnRenamed("canon", "vec_id")),
        Seq("vec_id"), "left")
      .select(coalesce(col("new_canon"), col("vec_id")).as("vec_id"),
        col("band"), col("key"))
      .unionByName(newFamBands)
    // canonical vectors: untouched/unshifted rows carry through; a
    // shifted family's row is REPLACED by the batch representative
    // (rebuild semantics — the new canonical IS the batch row); new
    // families append theirs
    val canonVecsOut = canonVecsC
      .join(broadcast(shifts.select(col("canon").as("vec_id"))),
        Seq("vec_id"), "left_anti")
      .unionByName(batchFams
        .filter(col("canon").isNull ||
          col("new_canon") =!= col("canon"))
        .select(col("new_canon").as("vec_id"), col("v")))
    (famsOut, membersOut, bandsOut, canonVecsOut)
  }

  /** q102: the daily-ingest exact vector dedup as an ORACLE query. */
  def incrementalVectorExactDedupDaily(spark: SparkSession,
      dir: String): DataFrame = {
    val e = vecs(spark, dir)
    incrementalVectorExactDedup(
      vectorHashIndex(e.filter(col("vec_id") % VecBatchMod =!= 0)),
      e.filter(col("vec_id") % VecBatchMod === 0))
  }

  /** q103: the daily-ingest vector near-dup flow as an ORACLE query —
    * the CANONICAL index trio built in-query over the corpus residue,
    * the batch merged through the family-collapsed core + member
    * expansion (round 12; output byte-identical to the member-level
    * [[incrementalVectorNearDups]] reference formulation, parity-pinned
    * in VectorQueriesSpec, and the unchanged q103 oracle hash-checks
    * the restricted-full invariant end to end). */
  def incrementalVectorNearDupsDaily(spark: SparkSession,
      dir: String): DataFrame = {
    val e = vecs(spark, dir).select(col("vec_id"), col("v"))
    val corpus = e.filter(col("vec_id") % VecBatchMod =!= 0)
    val batch = e.filter(col("vec_id") % VecBatchMod === 0)
    val (famsC, membersC, bandsC, canonVecs) =
      vecNearDupIndexTables(corpus)
    incrementalVectorNearDupsCanonical(famsC, membersC, bandsC,
      canonVecs, batch)
  }


  /** Oracle SQL of this family — merged into
    * [[VectorQueries.oracleMain]] (pure move, round 14). */
  private[operators] def dedupVecOracleMain: Map[String, String] = Map(
    "q95_vector_exact_dedup" ->
      """SELECT min(vec_id) AS keep_id, count(*) AS n_copies
        |FROM (SELECT vec_id,
        |        md5(array_to_string(list_transform(embedding::DOUBLE[],
        |          x -> CAST(CAST(round(x * 1e9) AS BIGINT) AS VARCHAR)),
        |          ',')) AS vkey
        |      FROM embeddings)
        |GROUP BY vkey ORDER BY keep_id""".stripMargin,
    "q65_cosine_near_dups" ->
      s"""WITH $cosinePairsCtes
         |SELECT vec_a, vec_b, cos FROM vpairs
         |ORDER BY vec_a, vec_b""".stripMargin,
    // q185: the q65 band CTEs, then the q184 occupancy rollup (same
    // hot threshold — one policy constant across both band audits)
    "q185_vec_band_occupancy" -> graft.multimodal.Multimodal
      .bandOccupancySql(
        s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |bands AS (
           |  $oracleBands)""".stripMargin),
    // q186: the family-collapsed pair table. Families group by the q95
    // fixed-point key; the canonical id is the min CORPUS member when
    // one exists, else the min batch member (the engine's fid rule);
    // frep verifies with the CANONICAL member's vector — the same row
    // the engine's persisted canonVecs table holds — so the oracle
    // never depends on same-vkey replicas being byte-identical at the
    // threshold boundary; `e` is SHADOWED with one representative row
    // per family so the shared band CTEs run verbatim at family
    // granularity; candidate family pairs need a batch-touched (tb > 0)
    // probe side; n_pairs is exact integer arithmetic over per-family
    // batch/corpus counts.
    "q186_canonical_near_dup_pairs" ->
      s"""WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |k AS (SELECT vec_id, v,
         |        md5(array_to_string(list_transform(v,
         |          x -> CAST(CAST(round(x * 1e9) AS BIGINT) AS VARCHAR)),
         |          ',')) AS vkey
         |      FROM raw),
         |fam AS (
         |  SELECT vkey,
         |    coalesce(min(vec_id) FILTER (WHERE vec_id % $VecBatchMod <> 0),
         |             min(vec_id)) AS fid,
         |    count(*) FILTER (WHERE vec_id % $VecBatchMod = 0) AS tb,
         |    count(*) FILTER (WHERE vec_id % $VecBatchMod <> 0) AS tc
         |  FROM k GROUP BY vkey),
         |frep AS (SELECT f.fid, f.tb, f.tc, k.v
         |         FROM fam f JOIN k ON k.vec_id = f.fid),
         |e AS (SELECT fid AS vec_id, v FROM frep),
         |bands AS (
         |  $oracleBands),
         |cands AS (
         |  SELECT DISTINCT least(a.vec_id, b.vec_id) AS fid_a,
         |    greatest(a.vec_id, b.vec_id) AS fid_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.key = b.key AND a.vec_id <> b.vec_id
         |  JOIN frep t ON t.fid = b.vec_id AND t.tb > 0),
         |fpairs AS (
         |  SELECT fid_a, fid_b,
         |    round(list_cosine_similarity(ea.v, eb.v), 6) AS cos
         |  FROM cands
         |  JOIN e ea ON ea.vec_id = fid_a
         |  JOIN e eb ON eb.vec_id = fid_b
         |  WHERE round(list_cosine_similarity(ea.v, eb.v), 6)
         |        >= $NearDupThreshold),
         |cross_rows AS (
         |  SELECT fid_a, fid_b, cos,
         |    fa.tb * (fb.tb + fb.tc) + fa.tc * fb.tb AS n_pairs
         |  FROM fpairs
         |  JOIN frep fa ON fa.fid = fid_a
         |  JOIN frep fb ON fb.fid = fid_b),
         |within_rows AS (
         |  SELECT fid AS fid_a, fid AS fid_b,
         |    round(list_cosine_similarity(v, v), 6) AS cos,
         |    tb * (tb - 1) // 2 + tb * tc AS n_pairs
         |  FROM frep
         |  WHERE tb > 0 AND tb * (tb - 1) // 2 + tb * tc > 0
         |    AND round(list_cosine_similarity(v, v), 6)
         |        >= $NearDupThreshold)
         |SELECT fid_a, fid_b, cos, CAST(n_pairs AS BIGINT) AS n_pairs
         |FROM (SELECT * FROM cross_rows UNION ALL SELECT * FROM within_rows)
         |ORDER BY fid_a, fid_b""".stripMargin,
    // q188: canonical families (full-corpus flavor — fid = min member
    // over ALL vectors), the shared band CTEs at family granularity
    // with per-bucket ranks, `need` = min-over-buckets of the larger
    // rank, truth = the verified canonical pair set; same tail as q187
    "q188_vec_band_cap_curve" ->
      s"""WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |k AS (SELECT vec_id, v,
         |        md5(array_to_string(list_transform(v,
         |          x -> CAST(CAST(round(x * 1e9) AS BIGINT) AS VARCHAR)),
         |          ',')) AS vkey
         |      FROM raw),
         |fam AS (SELECT vkey, min(vec_id) AS fid FROM k GROUP BY vkey),
         |frep AS (SELECT f.fid, k.v FROM fam f JOIN k ON k.vec_id = f.fid),
         |e AS (SELECT fid AS vec_id, v FROM frep),
         |bands AS (
         |  $oracleBands),
         |${graft.multimodal.Multimodal.bandCapRankSql("vec_id")},
         |truth AS (
         |  SELECT ida, idb FROM (
         |    SELECT c.ida, c.idb,
         |      round(list_cosine_similarity(ea.v, eb.v), 6) AS cos
         |    FROM (SELECT DISTINCT least(a.vec_id, b.vec_id) AS ida,
         |            greatest(a.vec_id, b.vec_id) AS idb
         |          FROM bands a JOIN bands b
         |            ON a.band = b.band AND a.key = b.key
         |              AND a.vec_id <> b.vec_id) c
         |    JOIN e ea ON ea.vec_id = c.ida
         |    JOIN e eb ON eb.vec_id = c.idb)
         |  WHERE cos >= $NearDupThreshold),
         |${graft.multimodal.Multimodal.bandCapCurveSqlTail}""".stripMargin,
    // q102: batch-internal exact-dup winners whose canonical key is
    // unseen in the corpus — the q97 oracle shape, embedding flavor.
    "q102_incremental_vector_exact_dedup" ->
      s"""WITH e AS (
         |  SELECT vec_id,
         |    md5(array_to_string(list_transform(embedding::DOUBLE[],
         |      x -> CAST(CAST(round(x * 1e9) AS BIGINT) AS VARCHAR)),
         |      ',')) AS vkey
         |  FROM embeddings),
         |corpus AS (SELECT DISTINCT vkey FROM e WHERE vec_id % $VecBatchMod <> 0),
         |batch AS (
         |  SELECT vkey, min(vec_id) AS keep_id, count(*) AS n_copies
         |  FROM e WHERE vec_id % $VecBatchMod = 0 GROUP BY vkey)
         |SELECT keep_id, n_copies FROM batch
         |WHERE vkey NOT IN (SELECT vkey FROM corpus)
         |ORDER BY keep_id""".stripMargin,
    // q103: band keys and cosine are pure per-vector functions, so the
    // incremental flow equals the FULL q65 pair pass restricted to pairs
    // touching >= 1 batch vector — the q96 oracle invariant.
    "q103_incremental_vector_near_dups" ->
      s"""WITH $cosinePairsCtes
         |SELECT vec_a, vec_b, cos FROM vpairs
         |WHERE vec_a % $VecBatchMod = 0 OR vec_b % $VecBatchMod = 0
         |ORDER BY vec_a, vec_b""".stripMargin)

  /** Oracle-side mirror of the Spark assignment ordering: the SAME
    * quantity `round(l2Sq, 6)` — squared L2 summed left-to-right over the
    * dims, rounded to 6 dp — so a near-equidistant boundary vector ties in
    * BOTH engines and the portable cid/label tie-break decides identically
    * (ADVICE r7 #1: ordering by unrounded `list_distance` let the oracle
    * split ties Spark had collapsed). */
  private[operators] def oracleL2Sq(v: String, c: String): String =
    s"round(list_sum(list_transform(range(1, ${Dim + 1}), " +
      s"d -> ($v[d] - $c[d]) * ($v[d] - $c[d]))), 6)"

  private[operators] def oracleSignBit(w: Seq[Int]): String =
    s"list_sum(list_transform(range(1, ${Dim + 1}), " +
      s"d -> CAST(round(v[d] * 1e9) AS BIGINT) * ([${w.mkString(",")}])[d])) >= 0"

  private[operators] def oracleBands = (0 until NumPlanes / PlanesPerBand).map { b =>
    val bits = (0 until PlanesPerBand).map { i =>
      s"CASE WHEN ${oracleSignBit(planes(b * PlanesPerBand + i))} " +
        "THEN '1' ELSE '0' END"
    }
    s"SELECT vec_id, $b AS band, concat(${bits.mkString(", ")}) AS key FROM e"
  }.mkString("\n  UNION ALL ")

  /** The full q65 pipeline as composable CTEs ending in `vpairs(vec_a,
    * vec_b, cos)` — shared with q91's semantic dedup so the two oracles
    * can't drift apart (same pattern as LLMQueries.minhashPairsCtes). */
  private[operators] def cosinePairsCtes: String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |bands AS (
       |  $oracleBands),
       |cands AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
       |vpairs AS (
       |  SELECT vec_a, vec_b,
       |    round(list_cosine_similarity(ea.v, eb.v), 6) AS cos
       |  FROM cands
       |  JOIN e ea ON ea.vec_id = vec_a
       |  JOIN e eb ON eb.vec_id = vec_b
       |  WHERE round(list_cosine_similarity(ea.v, eb.v), 6)
       |        >= $NearDupThreshold)""".stripMargin

}
