package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The APPLIABLE band cap (VERDICT r12 "Next round" #1): every capped
  * banded candidate join must admit exactly the operating curve's
  * admitted set at each swept cap — the q187/q188/q191 curves ARE the
  * parity oracles — and the capless default must stay identical to the
  * exact join it guards.
  */
class BandCapSpec extends SparkSpec {

  private val m = graft.multimodal.Multimodal

  /** (cap → (cand_pairs, kept_pairs)) of a curve frame. */
  private def curveMap(df: DataFrame): Map[Int, (Long, Long)] =
    df.collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(df.columns(0), df.columns(1)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  // ---- text ------------------------------------------------------------

  test("text: capped joins equal the q191 curve at every swept cap") {
    val docsDf = Tables(spark, sfDir, "documents")
    val curve = curveMap(LLMQueries.textBandCapCurve(spark, sfDir))
    assert(curve.keySet == m.BandCapSweep.toSet)
    val base = LLMQueries.shingledOf(docsDf)
    curve.foreach { case (cap, (cand, kept)) =>
      assert(LLMQueries.minhashCandidatesOf(base, Some(cap)).count() == cand,
        s"cap=$cap candidate count")
      assert(LLMQueries.minhashPairsOf(docsDf, Some(cap)).count() == kept,
        s"cap=$cap verified count")
    }
  }

  test("text: capped candidate SET is the need<=cap admitted set") {
    // independent re-derivation of the admission rule (the curve's
    // `need` definition, spelled out here rather than shared)
    val base = LLMQueries.shingledOf(Tables(spark, sfDir, "documents"))
    val ranked = LLMQueries.bandsOf(base)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("band"), col("key")).orderBy(col("doc_id"))))
    val admitted = ranked.as("a")
      .join(ranked.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(min(greatest(col("a.rk"), col("b.rk"))).as("need"))
      .filter(col("need") <= 8)
      .select(col("doc_a"), col("doc_b"))
    assert(pairSet(LLMQueries.minhashCandidatesOf(base, Some(8))) ==
      pairSet(admitted))
  }

  test("text: a cap at max occupancy admits the full q64 output") {
    val docsDf = Tables(spark, sfDir, "documents")
    val maxOcc = m.bandOccupancyOf(LLMQueries.signatureTables(docsDf)._1)
      .agg(max(col("max_occ"))).collect().head.getLong(0).toInt
    val capless = LLMQueries.minhashPairsOf(docsDf).collect().toSeq
    val atMax = LLMQueries.minhashPairsOf(docsDf, Some(maxOcc))
      .collect().toSeq
    assert(atMax == capless)
  }

  test("text: capped incremental equals capped full restricted to batch") {
    val d = Tables(spark, sfDir, "documents")
    val corpus = d.filter(col("doc_id") % 10 =!= 0)
    val batch = d.filter(col("doc_id") % 10 === 0)
    val (cb, cs) = LLMQueries.signatureTables(corpus)
    Seq(2, 16).foreach { cap =>
      val inc = LLMQueries.incrementalNearDups(cb, cs, batch, Some(cap))
        .collect().toSet
      val full = LLMQueries.minhashPairsOf(d, Some(cap))
        .filter(col("doc_a") % 10 === 0 || col("doc_b") % 10 === 0)
        .collect().toSet
      assert(inc == full, s"cap=$cap incremental-vs-restricted-full")
    }
  }

  test("text_cc: the cap composes through the contracted cluster merge") {
    val d = Tables(spark, sfDir, "documents")
    val corpus = d.filter(col("doc_id") % 10 =!= 0)
    val batch = d.filter(col("doc_id") % 10 === 0)
    val (cb, cs) = LLMQueries.signatureTables(corpus)
    val ccC = CurationQueries.connectedComponentsStar(
      LLMQueries.minhashPairsOf(corpus)
        .filter(col("jaccard") >= CurationQueries.ClusterThreshold)
        .select(col("doc_a"), col("doc_b")))._1
      .select(col("doc_id"), col("cluster_id"))
      .localCheckpoint(eager = false)
    def capped(cap: Option[Int]) = CurationQueries.withClusterSizes(
      CurationQueries.incrementalClusterMembersFromPairs(
        LLMQueries.incrementalNearDups(cb, cs, batch, cap), ccC))
      .collect().toSeq
    val exact = CurationQueries
      .incrementalDedupClusters(cb, cs, ccC, batch).collect().toSeq
    // a cap above every bucket's occupancy is the exact merge
    assert(capped(Some(1000000)) == exact)
    // a tight cap still yields a well-formed clustering (the traded
    // recall is priced by q191 — here we only pin mechanics: every
    // member row carries its cluster's size, ids are batch-touched)
    val c2 = capped(Some(2))
    assert(c2.nonEmpty && c2.size <= exact.size)
  }

  // ---- vector ----------------------------------------------------------

  test("vector: capped canonical join equals the q188 kept set per cap") {
    val e = VectorQueries.vecs(spark, sfDir).select(col("vec_id"), col("v"))
    val (_, _, _, canonVecs) = VectorQueries.vecNearDupIndexTables(e)
    val curve = curveMap(VectorQueries.vecBandCapCurve(spark, sfDir))
    curve.foreach { case (cap, (_, kept)) =>
      assert(VectorQueries.cosineNearDupsOf(canonVecs, Some(cap))
        .count() == kept, s"cap=$cap kept count")
    }
  }

  test("vector: canonical incremental cap is identity at high cap," +
      " monotone below") {
    val e = VectorQueries.vecs(spark, sfDir).select(col("vec_id"), col("v"))
    val corpus = e.filter(col("vec_id") % 10 =!= 0)
    val batch = e.filter(col("vec_id") % 10 === 0)
    val (fams, members, bands, canon) =
      VectorQueries.vecNearDupIndexTables(corpus)
    def run(cap: Option[Int]) = VectorQueries
      .incrementalVectorNearDupsCanonical(fams, members, bands, canon,
        batch, cap).collect().toSet
    val exact = run(None)
    assert(run(Some(1000000)) == exact)
    val c16 = run(Some(16))
    val c2 = run(Some(2))
    assert(c16.subsetOf(exact) && c2.subsetOf(c16))
  }

  // ---- media -----------------------------------------------------------

  test("media: capped pair join equals the q187 kept set per cap") {
    val curve = curveMap(m.mediaBandCapCurve(spark, sfDir))
    curve.foreach { case (cap, (_, kept)) =>
      assert(m.mediaNearDups(spark, sfDir, Some(cap)).count() == kept,
        s"cap=$cap kept count")
    }
    // capless exactness survives: a cap at max occupancy admits every
    // bucket whole, so the capped join equals the exact one row for row
    val maxOcc = m.mediaBandOccupancy(spark, sfDir)
      .agg(max(col("max_occ"))).collect().head.getLong(0).toInt
    assert(m.mediaNearDups(spark, sfDir, Some(maxOcc)).collect().toSeq ==
      m.mediaNearDups(spark, sfDir).collect().toSeq)
  }

  test("media: canonical incremental cap is identity at high cap," +
      " monotone below") {
    val (corpus, batch) = m.mediaSplit(spark, sfDir)
    val (fams, members, bands) = m.mediaNearDupIndexTables(corpus)
    def run(cap: Option[Int]) = m
      .incrementalMediaNearDupsCanonical(fams, members, bands, batch, cap)
      .collect().toSet
    val exact = run(None)
    assert(run(Some(1000000)) == exact)
    val c16 = run(Some(16))
    val c2 = run(Some(2))
    assert(c16.subsetOf(exact) && c2.subsetOf(c16))
  }
}
