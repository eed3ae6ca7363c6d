package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.CentroidAggregator
import graft.functions.CosineSimilarity.cosineSim
import graft.functions.L2Distance.l2Sq

/** K-means clustering family (L23): the Lloyd iteration with the packed
  * long argmin, cluster accounting, and SemDeDup's cell-bounded
  * near-dup pairing — q100/q101.
  *
  * Split out of VectorQueries by family (round 12, pure moves) — see
  * [[VectorAnnTiers]].
  */
private[operators] trait VectorClusters {
  this: VectorQueries.type =>

  private[operators] val KmeansK = 8
  private[operators] val KmeansRounds = 2

  /** L23: k-means Lloyd clustering over the embedding corpus — the
    * clustering stage real SemDeDup runs before within-cluster pairing
    * (our q91 uses LSH for that stage; k-means is the other standard
    * route and the general-purpose corpus-organization primitive).
    * Seeds = the [[KmeansK]] lowest vec_ids; each round assigns every
    * vector to its nearest centroid (squared L2 via the native fused
    * expression, centroid-id tie-break) and recomputes centroids with
    * the A9 fixed-point Aggregator — exact long sums make every
    * centroid, and so the whole iteration, reproducible in DuckDB.
    *
    * Scale shape, per round: ONE corpus scan against a broadcast k-row
    * centroid table; the assignment window partitions by the UNIQUE
    * vec_id over rows already hash-partitioned on vec_id (no extra
    * exchange, no hot key); centroid recomputation map-side-combines to
    * k×dim longs per task. Rounds are driver-side iterations exactly
    * like star-CC — at 100 TB each round is a linear pass, nothing
    * quadratic anywhere. Output is exact-integer accounting (member
    * count + fixed-point coordinate checksum per cluster), so the
    * 2-round iteration hash-compares against the unrolled oracle.
    */
  def kmeansClusters(spark: SparkSession, dir: String): DataFrame =
    kmeansOf(Tables(spark, dir, "embeddings"), KmeansK, KmeansRounds)

  /** The Lloyd iteration itself: final assignment frame
    * (vec_id, embedding, v, cid) after `rounds` assignment passes with
    * `rounds - 1` centroid updates between them. */
  /** Low bits of the packed argmin key reserved for the centroid id.
    * Seeds are the k LOWEST vec_ids of the corpus (k ≤ 64 here), so for
    * any 0-based id space cid ≪ 2^20; an id scheme violating that would
    * need a dense k-row remap before packing. */
  private val KmeansCidBits = 20

  private[operators] def kmeansAssignOf(
      emb: DataFrame, k: Int, rounds: Int): DataFrame = {
    val e = emb.repartition(
        emb.sparkSession.sessionState.conf.numShufflePartitions,
        col("vec_id"))
      .select(col("vec_id"), col("embedding"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      // pre-sorted within partitions so every round's assignment
      // join-back reads e with its ordering already satisfied (the SMJ
      // elides the array-laden side's sort; only the slim leg sorts)
      .sortWithinPartitions(col("vec_id"))
    val centroid = udaf(CentroidAggregator)
    var cents = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    var assigned = e.withColumn("cid", lit(0L))
    for (r <- 1 to rounds) {
      // assignment = argmin over ONE packed long — round(d2·1e6) in the
      // high bits, cid in the low KmeansCidBits — so `min(akey)` is a
      // genuine HASH aggregate (primitive buffer) on the vec_id-
      // partitioned rows: no exchange, no window, and no SortAggregate
      // dragging the two 64-double arrays through a n·k-row sort (the
      // previous min(struct(d2, cid, embedding, v)) shape — ADVICE r7
      // #2). Lexicographic long order ≡ (rounded d2, cid) order, the
      // same quantity the ORACLE sorts by (kmeansCtes), so near-ties
      // collapse identically in both engines and the cid tie-break
      // decides. Arrays are re-attached by a co-partitioned join-back
      // (no exchange; e's side is pre-sorted).
      // fail-fast packing guard (ADVICE r8 #2): a sparse id space
      // (seed vec_id ≥ 2^KmeansCidBits) or a distance too large for the
      // high bits would OVERFLOW the packed long into wrong-but-
      // plausible cluster ids; the comparisons are two long compares on
      // an already-computed value inside codegen — effectively free.
      // the range check runs in DOUBLE space so the long cast itself only
      // executes on the already-validated branch (ANSI cast overflow
      // would otherwise fire before the guard and mask its message)
      val d2Rounded = round(l2Sq(col("v"), col("c")) * 1e6, 0)
      val packable =
        col("cid") >= 0 && col("cid") < (1L << KmeansCidBits) &&
          d2Rounded >= 0 &&
          d2Rounded < lit((Long.MaxValue >> KmeansCidBits).toDouble)
      val slim = e.select(col("vec_id"), col("v"))
        .crossJoin(broadcast(cents))
        .withColumn("akey",
          when(packable,
            d2Rounded.cast("long") * (1L << KmeansCidBits) + col("cid"))
            .otherwise(raise_error(format_string(
              "kmeans packed argmin out of packing range: cid=%d, " +
                "d2_micro=%s (need cid < 2^" + KmeansCidBits +
                ", d2_micro < 2^" + (63 - KmeansCidBits) + ")",
              col("cid"), d2Rounded)).cast("long")))
        .groupBy(col("vec_id"))
        .agg(min(col("akey")).as("akey"))
        .select(col("vec_id"),
          (col("akey") % (1L << KmeansCidBits)).as("cid"))
      assigned = slim.join(e, Seq("vec_id"))
        .select(col("vec_id"), col("embedding"), col("v"), col("cid"))
      if (r < rounds)
        cents = assigned.groupBy(col("cid"))
          .agg(centroid(col("embedding")).as("c"))
    }
    assigned
  }

  private[operators] def kmeansOf(
      emb: DataFrame, k: Int, rounds: Int): DataFrame =
    kmeansAssignOf(emb, k, rounds)
      .select(col("cid"), expr(
        "aggregate(transform(v, x -> cast(round(x * 1e9) AS bigint)), " +
          "cast(0 AS bigint), (a, x) -> a + x)").as("rowsum_nano"))
      .groupBy(col("cid").as("cluster_id"))
      .agg(count(lit(1)).as("n"), sum(col("rowsum_nano")).as("checksum_nano"))
      .orderBy(col("cluster_id"))

  /** Cell granularity for q101 — much finer than [[KmeansK]], because the
    * cells exist to BOUND the quadratic pair search (SemDeDup sizes k so
    * cells stay small; pair cost is Σ cell², so finer cells = linear-ish
    * total). */
  private[operators] val CellK = 64

  /** L23b: SemDeDup as the paper actually runs it — k-means cells bound
    * the pairwise cosine search, replacing q65's sign-LSH banding as the
    * candidate generator. Every pair inside a cell is scored; pairs
    * crossing cells are never enumerated. Scale shape: both self-join
    * legs read ONE cid-keyed exchange (ReusedExchange via the explicit
    * repartition), cells are the parallelism unit, and per-cell work is
    * cell² — bounded by choosing [[CellK]] ∝ corpus size, the paper's
    * own knob. Recall tradeoff vs LSH is real (near-dups straddling a
    * Voronoi boundary are missed — same boundary effect q87's
    * multi-probe addresses for search); the q65/q91 LSH path remains the
    * recall-favoring alternative.
    */
  def kmeansCellNearDups(spark: SparkSession, dir: String): DataFrame =
    kmeansCellNearDupsOf(Tables(spark, dir, "embeddings"))

  private[operators] def kmeansCellNearDupsOf(emb: DataFrame): DataFrame = {
    val byCell = kmeansAssignOf(emb, CellK, KmeansRounds)
      .select(col("cid"), col("vec_id"), col("v"))
      .repartition(emb.sparkSession.sessionState.conf.numShufflePartitions,
        col("cid"))
    byCell.as("x")
      .join(byCell.as("y"),
        col("x.cid") === col("y.cid") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos", round(cosineSim(col("x.v"), col("y.v")), 6))
      .filter(col("cos") >= NearDupThreshold)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

}
