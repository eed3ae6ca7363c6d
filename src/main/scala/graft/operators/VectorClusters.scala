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
    val e = graft.Scale.byKey(emb, col("vec_id"))
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
    val byCell = graft.Scale.byKey(
      kmeansAssignOf(emb, CellK, KmeansRounds)
        .select(col("cid"), col("vec_id"), col("v")),
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


  /** Oracle SQL of this family — merged into
    * [[VectorQueries.oracleMain]] (pure move, round 14). */
  private[operators] def clustersVecOracleMain: Map[String, String] = Map(
    // q100: the 2-round Lloyd iteration unrolled — seeds c0, assignment
    // a1, fixed-point means c1 (the centroidCte rule), assignment a2;
    // output is exact-integer accounting of a2. list_sum over BIGINTs
    // widens to HUGEINT → cast back (verify-skill gotcha).
    "q100_kmeans" ->
      s"""WITH ${kmeansCtes(KmeansK)}
         |SELECT cid AS cluster_id, count(*) AS n,
         |  CAST(sum(list_sum(list_transform(v,
         |    x -> CAST(round(x * 1e9) AS BIGINT)))) AS BIGINT) AS checksum_nano
         |FROM a2 GROUP BY cid ORDER BY cluster_id""".stripMargin,
    // q101: same unrolled iteration at cell granularity, then every
    // within-cell pair scored — the SemDeDup candidate structure.
    "q101_cell_near_dups" ->
      s"""WITH ${kmeansCtes(CellK)}
         |SELECT vec_a, vec_b, cos FROM (
         |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         |    round(list_cosine_similarity(x.v, y.v), 6) AS cos
         |  FROM a2 x JOIN a2 y
         |    ON x.cid = y.cid AND x.vec_id < y.vec_id)
         |WHERE cos >= $NearDupThreshold
         |ORDER BY vec_a, vec_b""".stripMargin)

  /** Shared oracle fragment: per-label centroids with the same fixed-point
    * rule as the Aggregator (sum of round(x*1e9) longs / 1e9 / n).
    * `sumsPred` restricts the rows the centroids are computed FROM
    * (q105 freezes the quantizer to corpus rows); assignment always
    * covers every vector. */
  private[operators] def centroidCteFrom(sumsPred: String): String =
    s"""e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |dims AS (SELECT unnest(range(1, 65)) AS i),
      |sums AS (
      |  SELECT label, i, sum(CAST(round(v[i] * 1e9) AS BIGINT)) AS s,
      |         count(*) AS n
      |  FROM e, dims $sumsPred GROUP BY label, i),
      |cent AS (
      |  SELECT label AS clabel,
      |         array_agg(CAST(s AS DOUBLE) / 1e9 / n ORDER BY i) AS c
      |  FROM sums GROUP BY label),
      |assigned AS (
      |  SELECT vec_id, label, v, pred_label FROM (
      |    SELECT e.vec_id, e.label, e.v, cent.clabel AS pred_label,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${oracleL2Sq("e.v", "cent.c")}, cent.clabel) AS rn
      |    FROM e, cent) WHERE rn = 1)
      |""".stripMargin

  private[operators] val centroidCte = centroidCteFrom("")

  /** Oracle mirror of the kmeans packed argmin ordering: CAST(round(
    * d2·1e6) AS BIGINT) then cid — the identical doubles (same
    * left-to-right squared-diff sum), the identical half-up rounding at
    * the identical scale, so the assignment argmin agrees with Spark's
    * packed-long min bit for bit. */
  private[operators] def oracleL2SqMicro(v: String, c: String): String =
    s"CAST(round(list_sum(list_transform(range(1, ${Dim + 1}), " +
      s"d -> ($v[d] - $c[d]) * ($v[d] - $c[d]))) * 1e6) AS BIGINT)"

  /** The 2-round Lloyd iteration as DuckDB CTEs, parameterized by k —
    * shared by q100 (cluster accounting) and q101 (within-cell pairs) so
    * the two oracles cannot drift apart (the minhashPairsCtes pattern).
    * Ends in `a2(vec_id, v, cid)`, the final assignment. */
  private[operators] def kmeansCtes(k: Int): String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |dims AS (SELECT unnest(range(1, ${Dim + 1})) AS i),
       |c0 AS (SELECT vec_id AS cid, v AS c FROM e ORDER BY vec_id LIMIT $k),
       |a1 AS (SELECT vec_id, v, cid FROM (
       |    SELECT e.vec_id, e.v, c0.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${oracleL2SqMicro("e.v", "c0.c")}, c0.cid) AS rn
       |    FROM e, c0) WHERE rn = 1),
       |s1 AS (SELECT cid, i, sum(CAST(round(v[i] * 1e9) AS BIGINT)) AS s,
       |         count(*) AS n
       |  FROM a1, dims GROUP BY cid, i),
       |c1 AS (SELECT cid, array_agg(CAST(s AS DOUBLE) / 1e9 / n ORDER BY i) AS c
       |  FROM s1 GROUP BY cid),
       |a2 AS (SELECT vec_id, v, cid FROM (
       |    SELECT e.vec_id, e.v, c1.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${oracleL2SqMicro("e.v", "c1.c")}, c1.cid) AS rn
       |    FROM e, c1) WHERE rn = 1)""".stripMargin
}
