package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Band audit + cap machinery shared by ALL THREE banded modalities
  * (L84/L86/L88/L89/L91/L94): the one-definition occupancy rollup and
  * its oracle tail (q184/q185/q189), the bucket-rank definition shared
  * by the operating curves and the appliable cap (`capBands` /
  * `cappedProbeSides` — the need ≤ cap admission rule), the cap curve
  * core + its shared oracle rank/tail SQL (q187/q188/q191), and the
  * media flavor of both instruments.
  *
  * Split out of Multimodal by family (round 13, pure moves) — the
  * VectorQueries/LLMQueries treatment.
  */
private[multimodal] trait MediaBands {
  this: Multimodal.type =>

  /** Occupancy threshold above which a band bucket counts as HOT in the
    * q184 report — [[AudioDocCap]]'s value: the audio family already
    * treats >16 docs behind one fingerprint as a stop-candidate, and a
    * 9-bit media band bucket past the same population implies ≥120
    * candidate pairs from that one key. */
  val MediaBandHotOcc = 16

  /** q184: media BAND-OCCUPANCY audit — the q152 cell-balance pattern
    * for the q109/q111 pigeonhole bands (VERDICT r11 "Missing" #3 /
    * "Next round" #5): image banding has no hot-bucket cap the way
    * frames ([[FrameDocCap]]) and audio ([[AudioDocCap]]) do, because a
    * cap would break the pigeonhole EXACTNESS guarantee — so this report
    * is the number that says when that trade should flip. Per band:
    * populated keys, the largest bucket, the implied candidate-pair
    * volume Σ n·(n−1)/2 (exactly the band join's pre-dedup row count —
    * MultimodalSpec reconciles it against the actual q109 join), and
    * the bucket/pair mass sitting above [[MediaBandHotOcc]] — the share
    * a cap at that occupancy would trade for losing exactness on those
    * keys. A viral re-encode family shows up here as one hot bucket per
    * band going quadratic (the 100× media_cc soak's pair-volume
    * finding), BEFORE it shows up as a blown daily-leg budget.
    *
    * Scale shape: one scan of the persisted band table (the daily leg
    * reads IndexStore `media_bands`; this oracle rendering re-decodes
    * in-query as all media oracles must), partial-aggregating to
    * ≤ bands×2^[[BandBits]] groups map-side, then a ≤[[NumBands]]-row
    * rollup. All outputs exact integers. */
  def mediaBandOccupancy(spark: SparkSession, dir: String): DataFrame =
    bandOccupancyOf(phashBands(assetHashes(spark, dir)))

  /** The occupancy rollup over ANY (band, key) table — shared by q184's
    * in-query rendering, q185's vector-band flavor (which reuses the
    * same hot-occupancy policy) and any disk-band audit so they can
    * never aggregate differently. */
  def bandOccupancyOf(bands: DataFrame,
      hotOcc: Int = MediaBandHotOcc): DataFrame =
    bands.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_keys"),
        max(col("n")).as("max_occ"),
        sum(expr("n * (n - 1) div 2")).as("pairs_implied"),
        sum(when(col("n") > hotOcc, 1L).otherwise(0L))
          .as("hot_buckets"),
        sum(when(col("n") > hotOcc, expr("n * (n - 1) div 2"))
          .otherwise(0L)).as("hot_pairs_implied"))
      .orderBy(col("band"))

  /** The occupancy-rollup oracle tail over a CTE prefix ending in
    * `bands(id, band, key)` — ONE SQL text for the q184/q185/q189 band
    * audits, as [[bandOccupancyOf]] is one engine definition. */
  def bandOccupancySql(bandsCtePrefix: String): String =
    s"""WITH $bandsCtePrefix,
       |occ AS (
       |  SELECT band, key, count(*) AS n FROM bands GROUP BY 1, 2)
       |SELECT band, CAST(count(*) AS BIGINT) AS n_keys,
       |  CAST(max(n) AS BIGINT) AS max_occ,
       |  CAST(sum(n * (n - 1) // 2) AS BIGINT) AS pairs_implied,
       |  CAST(sum(CASE WHEN n > $MediaBandHotOcc THEN 1 ELSE 0 END)
       |    AS BIGINT) AS hot_buckets,
       |  CAST(sum(CASE WHEN n > $MediaBandHotOcc
       |    THEN n * (n - 1) // 2 ELSE 0 END) AS BIGINT)
       |    AS hot_pairs_implied
       |FROM occ GROUP BY band ORDER BY band""".stripMargin

  /** Bucket caps priced by the q187/q188 operating curves — includes
    * [[MediaBandHotOcc]] itself, so the audits' hot threshold has a
    * measured recall number attached. */
  val BandCapSweep: Seq[Int] = Seq(2, 8, MediaBandHotOcc, 64)

  /** q187/q188 core: the CAP OPERATING CURVE over ANY (id, band, key)
    * table + its verified truth pairs — the follow-through on the
    * q184/q185 audits, which report hot-bucket pair mass but not what a
    * cap would actually COST. For every candidate pair, `need` = the
    * smallest per-bucket occupancy cap that still admits it (the min,
    * over shared buckets, of the larger of the two members' bucket
    * ranks — rank by id, engine-portable), so ONE band self-join prices
    * EVERY cap at once: a pair survives cap C iff need ≤ C. Per cap:
    * candidate pairs admitted, truth pairs kept, and exact-integer
    * recall. `verify` maps the candidate (ida, idb) pairs to the
    * verified subset (Hamming for media, cosine for vectors) — truth
    * is computed ON the curve's own candidate set, so the band
    * self-join runs ONCE (for media the banded-verified set equals the
    * quadratic scan by the pigeonhole guarantee, which the
    * independent-formulation DuckDB oracle re-derives).
    *
    * Scale shape: the self-join is the SAME O(Σ bucket²) band join the
    * audit reconciles against (this is an audit-tier query, run beside
    * q184/q185, not in the daily path); the curve tail is one groupBy
    * over `need` buckets against a broadcast ≤4-row cap table. */
  /** Per-bucket id ranks over any (…, band, key) table — THE rank the
    * operating curves price and the capped joins admit by, one
    * definition so the two can never order a bucket differently. */
  private def withBucketRank(bands: DataFrame, idCol: String): DataFrame =
    bands.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("key")).orderBy(col(idCol))))

  /** The q187/q188/q191 admission rule made APPLIABLE (VERDICT r12
    * "Next round" #1): keep only a bucket's first `cap` members by id
    * rank. A pair survives the capped band join iff some shared bucket
    * ranks BOTH its ends ≤ cap — i.e. iff the operating curve's `need`
    * ≤ cap — so the curve IS the capped join's parity oracle
    * (BandCapSpec pins capped joins equal to the curve's admitted set
    * at every swept cap, per modality).
    *
    * Scale shape: the window partitions by the same (band, key) the
    * candidate join shuffles on, so on a join-keyed layout capping
    * adds a per-bucket sort and no new exchange — and the join it
    * feeds enumerates O(cap·occ) per bucket instead of O(occ²), which
    * is the entire point when the q184/q185/q189 audits flag a viral
    * bucket. */
  def capBands(bands: DataFrame, idCol: String, cap: Int): DataFrame =
    withBucketRank(bands, idCol).filter(col("rk") <= cap).drop("rk")

  /** The (scan side, probe side) of a CAPPED probe-shaped band join —
    * the incremental daily legs' flavor of [[capBands]]. Ranks are
    * computed over each probed bucket's FULL membership (corpus ∪
    * batch — the same ranks the full curve assigns that bucket), but
    * only buckets the probe touches are ranked at all: corpus-only
    * buckets never sort, never enumerate, so the capped daily leg
    * stays O(touched-bucket mass), and after the rank filter the
    * candidate expansion is O(cap · probe rows) per bucket. Both
    * returned sides carry `full`'s full column set (hashes riding band
    * rows ride through). Requires probe's rows ⊆ full's rows set-wise
    * — true at every call site (probe = the batch/rep band rows, which
    * the scan side unions in). */
  def cappedProbeSides(full: DataFrame, probe: DataFrame, idCol: String,
      cap: Int): (DataFrame, DataFrame) = {
    val touched = full.join(
      broadcast(probe.select(col("band"), col("key")).distinct()),
      Seq("band", "key"), "left_semi")
    val capped = capBands(touched, idCol, cap)
      .transform(graft.Materialize.shared) // scan leg + probe restriction
    val cappedProbe = capped.join(
      broadcast(probe.select(col(idCol)).distinct()), Seq(idCol),
      "left_semi")
    (capped, cappedProbe)
  }

  def bandCapCurveOf(bands: DataFrame, idCol: String,
      verify: DataFrame => DataFrame,
      caps: Seq[Int] = BandCapSweep): DataFrame = {
    val spark = bands.sparkSession
    import spark.implicits._
    val ranked = graft.Scale.byKey(
      withBucketRank(
        bands.select(col(idCol).as("id"), col("band"), col("key")), "id"),
      col("band"), col("key"))
    val pairNeed = ranked.as("a")
      .join(ranked.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("ida"), col("b.id").as("idb"))
      .agg(min(greatest(col("a.rk"), col("b.rk"))).as("need"))
      .transform(graft.Materialize.shared) // verify leg + flag join
    val truth = verify(pairNeed.select(col("ida"), col("idb")))
      .transform(graft.Materialize.shared) // flag join + count
    val flagged = pairNeed
      .join(truth.toDF("ida", "idb").withColumn("hit", lit(1L)),
        Seq("ida", "idb"), "left")
      .transform(graft.Materialize.shared) // one scan per cap bucket join
    val tn = truth.agg(count(lit(1)).as("truth_pairs"))
    caps.toDF("cap")
      .join(flagged, col("need") <= col("cap"), "left")
      .groupBy(col("cap"))
      .agg(count(col("ida")).as("cand_pairs"),
        sum(coalesce(col("hit"), lit(0L))).as("kept_pairs"))
      .crossJoin(broadcast(tn))
      .select(col("cap"), col("cand_pairs"), col("kept_pairs"),
        col("truth_pairs"),
        // zero-guarded symmetrically with the oracle tail: a corpus with
        // no verified pairs reads recall 0 in both engines instead of
        // NULL here vs a division-by-zero error in DuckDB
        expr("CASE WHEN truth_pairs = 0 THEN 0" +
          " ELSE kept_pairs * 1000000 div truth_pairs END")
          .as("recall_micro"))
      .orderBy(col("cap"))
  }

  /** The shared curve-oracle CTE pair over a prefix ending in
    * `bands(<idCol>, band, key)`: per-bucket id ranks, then `need` =
    * min-over-shared-buckets of the larger rank — ONE SQL text for the
    * q187/q188/q191 cap curves, as [[bandCapCurveOf]] is one engine
    * definition. */
  def bandCapRankSql(idCol: String): String =
    s"""ranked AS (
       |  SELECT $idCol, band, key, row_number() OVER
       |    (PARTITION BY band, key ORDER BY $idCol) AS rk
       |  FROM bands),
       |pneed AS (
       |  SELECT a.$idCol AS ida, b.$idCol AS idb,
       |    min(greatest(a.rk, b.rk)) AS need
       |  FROM ranked a JOIN ranked b
       |    ON a.band = b.band AND a.key = b.key AND a.$idCol < b.$idCol
       |  GROUP BY 1, 2)""".stripMargin

  /** The shared curve-oracle tail over CTEs `pneed(ida, idb, need)` and
    * `truth(ida, idb)` — flags, the cap sweep, and the zero-guarded
    * exact-integer recall, one text for every modality's curve. */
  def bandCapCurveSqlTail: String =
    s"""tn AS (SELECT count(*) AS truth_pairs FROM truth),
       |flagged AS (
       |  SELECT p.ida, p.need,
       |    CASE WHEN t.ida IS NULL THEN 0 ELSE 1 END AS hit
       |  FROM pneed p LEFT JOIN truth t
       |    ON t.ida = p.ida AND t.idb = p.idb),
       |caps AS (SELECT unnest([${BandCapSweep.mkString(", ")}]) AS cap)
       |SELECT cap, CAST(count(f.ida) AS BIGINT) AS cand_pairs,
       |  CAST(coalesce(sum(f.hit), 0) AS BIGINT) AS kept_pairs,
       |  CAST(tn.truth_pairs AS BIGINT) AS truth_pairs,
       |  CAST(CASE WHEN tn.truth_pairs = 0 THEN 0
       |    ELSE coalesce(sum(f.hit), 0) * 1000000 // tn.truth_pairs END
       |    AS BIGINT) AS recall_micro
       |FROM caps LEFT JOIN flagged f ON f.need <= caps.cap, tn
       |GROUP BY cap, tn.truth_pairs ORDER BY cap""".stripMargin

  /** L88/q187: the media band-cap operating curve — q184 says how much
    * pair mass sits above the hot threshold; this says what a cap at
    * each occupancy would TRADE: capless banding is pigeonhole-EXACT
    * (recall 1000000 at cap ≥ max occupancy), and every smaller cap's
    * recall against the true q109 pair set is an exact integer output.
    * The number that decides the q184 trade, measured instead of
    * argued. */
  def mediaBandCapCurve(spark: SparkSession, dir: String): DataFrame = {
    val h = assetHashes(spark, dir).transform(graft.Materialize.shared)
    bandCapCurveOf(phashBands(h), "doc_id", pairs => pairs
      .join(h.select(col("doc_id").as("ida"), col("phash").as("ha")),
        Seq("ida"))
      .join(h.select(col("doc_id").as("idb"), col("phash").as("hb")),
        Seq("idb"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <=
        MediaHammingMax)
      .select(col("ida"), col("idb")))
  }
}
