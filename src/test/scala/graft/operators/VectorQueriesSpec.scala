package graft.operators

import graft.SparkSpec
import graft.functions.CentroidAggregator
import org.apache.spark.sql.functions._

/** A9 Aggregator correctness (exactness, order-independence) and the ANN
  * scale path's recall against the brute-force baseline.
  */
class VectorQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("centroid aggregator computes the per-dimension mean") {
    val df = Seq(
      (0, Array(1.0f, 2.0f)),
      (0, Array(3.0f, 4.0f))).toDF("label", "embedding")
    val centroid = udaf(CentroidAggregator)
    val c = df.groupBy("label").agg(centroid(col("embedding")))
      .as[(Int, Array[Double])].collect().head._2
    assert(c.toSeq == Seq(2.0, 3.0))
  }

  test("centroid aggregator is order- and partitioning-independent") {
    val vals = (0 until 100).map(i =>
      (i % 3, Array((i * 0.137f) % 1.0f, (i * 0.291f) % 1.0f, -i * 0.043f)))
    val a = vals.toDF("label", "embedding").repartition(7)
    val b = scala.util.Random.shuffle(vals).toDF("label", "embedding")
      .repartition(2)
    val agg = udaf(CentroidAggregator)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("label").agg(agg(col("embedding")).as("c"))
        .as[(Int, Array[Double])].collect()
        .map(r => r._1 -> r._2.toSeq).toMap
    assert(run(a) == run(b)) // exact equality, not approximate
  }

  test("incrementalSemanticMembers agrees with the cluster accounting") {
    val e = VectorQueries.vecsOf(graft.Tables(spark, sfDir, "embeddings"))
      .select(col("vec_id"), col("v"))
    val corpus = e.filter(col("vec_id") % 10 =!= 0)
    val batch = e.filter(col("vec_id") % 10 === 0)
    val (f, v, b, c, s) = VectorQueries.semanticIndexTables(corpus)
    val clusters = VectorQueries
      .incrementalSemanticDedup(f, v, b, c, s, batch)
      .select(col("cluster_id"), col("kept_id"))
      .as[(Long, Long)].collect().toMap
    val members = VectorQueries
      .incrementalSemanticMembers(f, v, b, c, s, batch)
      .as[(Long, Long, Long)].collect()
    // every batch vector gets exactly one row
    val batchIds = batch.select(col("vec_id")).as[Long].collect().toSet
    assert(members.map(_._1).toSet == batchIds)
    assert(members.length == batchIds.size)
    // a member's (cluster, kept) is the accounting's row for that
    // cluster; a vector outside every cluster maps to itself
    members.foreach { case (vid, cid, kid) =>
      clusters.get(cid) match {
        case Some(k) => assert(k == kid, s"vec $vid: kept $kid != $k")
        case None => assert(cid == vid && kid == vid,
          s"vec $vid points at unknown cluster $cid")
      }
    }
    // liveness on a crafted frame (sf0.001 has no election losers): a
    // batch vector that survives BOTH dedup gates — new rendering, and
    // its verified pair is against a LARGER id — still loses the
    // norm-first election to the higher-norm corpus vector
    val dim = 64
    val corpus2 = Seq((15L, Array.fill(dim)(2.0))).toDF("vec_id", "v")
    val batch2 = Seq((10L, Array.fill(dim)(1.0))).toDF("vec_id", "v")
    val t2 = VectorQueries.semanticIndexTables(corpus2)
    val m2 = VectorQueries
      .incrementalSemanticMembers(t2._1, t2._2, t2._3, t2._4, t2._5,
        batch2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(m2 == Seq((10L, 10L, 15L))) // cluster min-id 10, kept 15
  }

  test("top-k cosine returns k neighbors per query with cos in [-1,1]") {
    val rows = VectorQueries.topkCosine(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    val perQuery = rows.groupBy(_._1)
    assert(perQuery.size == 10 && perQuery.values.forall(_.length == 3))
    assert(rows.forall(r => r._4 >= -1.0001 && r._4 <= 1.0001))
    assert(rows.forall(r => r._3 != r._1)) // self excluded
  }

  test("IVF pruning never beats brute force at any rank") {
    // the driver embeddings are near-random (labels ≉ cosine cells), so
    // recall is not meaningful there; the invariant that IS data-free:
    // a cell-pruned search can only return scores ≤ the full search's.
    val brute = VectorQueries.topkCosine(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._4)).toMap
    val ivf = VectorQueries.ivfTopkCosine(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._4)).toMap
    ivf.foreach { case (q, scores) =>
      scores.zip(brute(q)).foreach { case (i, b) =>
        assert(i <= b + 1e-9, s"query $q: ivf score $i beat brute $b")
      }
    }
  }

  test("IVF ANN has perfect recall on genuinely clustered data") {
    // 3 tight clusters around orthogonal axes; queries 0..9 live in them.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 120).map { i =>
      val c = i % 3
      val base = Array.fill(8)(0.0f)
      base(c) = 1.0f
      val v = base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      (i.toLong, v, c)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val e = VectorQueries.vecsOf(emb)
    val cents = VectorQueries.centroidsOf(emb)
    val brute = VectorQueries.topkCosineOf(e)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val ivf = VectorQueries.ivfTopkCosineOf(e, cents)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = brute.keys.toSeq.map { q =>
      (ivf.getOrElse(q, Set.empty) intersect brute(q)).size.toDouble /
        brute(q).size
    }
    assert(recalls.sum / recalls.size == 1.0,
      s"recall ${recalls.sum / recalls.size} < 1 on clustered data")
  }

  test("multi-probe IVF recall dominates single-probe on boundary queries") {
    // two clusters plus queries placed BETWEEN them: single-probe sees
    // only one Voronoi cell, multi-probe (2) must recover at least as
    // many true neighbors for every query. Each query gets its own
    // heavy extra dimension so queries are mutually DISTANT (cos ≈ 0.3)
    // while members of both clusters score ≈ 0.39-0.40 — the true top-k
    // mixes both cells, which is exactly what single-probe can't see.
    val rnd = new scala.util.Random(11)
    val members = (0 until 100).map { i =>
      val c = i % 2
      val base = Array.fill(16)(0.0f)
      base(c) = 1.0f
      (i.toLong + 10L, base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f), c)
    }
    val boundary = (0 until 10).map { i =>
      val v = Array.fill(16)(0.0f)
      v(0) = 0.72f
      v(1) = 0.70f
      v(2 + i) = 1.5f
      (i.toLong, v, i % 2)
    }
    val emb = (boundary ++ members).toDF("vec_id", "embedding", "label")
    val e = VectorQueries.vecsOf(emb)
    val cents = VectorQueries.centroidsOf(emb)
    val brute = VectorQueries.topkCosineOf(e)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    def recallOf(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val single = recallOf(VectorQueries.ivfTopkCosineOf(e, cents))
    val multi = recallOf(VectorQueries.ivfTopkCosineOf(e, cents, 2))
    val (rs, rm) = brute.keys.toSeq.map { q =>
      def r(m: Map[Long, Set[Long]]) =
        (m.getOrElse(q, Set.empty) intersect brute(q)).size.toDouble /
          brute(q).size
      (r(single), r(multi))
    }.unzip
    assert(rm.zip(rs).forall { case (m, s) => m >= s },
      "multi-probe recall fell below single-probe for some query")
    assert(rm.sum / rm.size > rs.sum / rs.size,
      s"multi-probe ${rm.sum / rm.size} did not improve on " +
        s"single-probe ${rs.sum / rs.size} for boundary queries")
  }

  private lazy val realVecs = graft.Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("v"))

  /** The 4 band keys via the higher-order reference formulation. */
  private def hofKeys = {
    val nBands = VectorQueries.NumPlanes / VectorQueries.PlanesPerBand
    array((0 until nBands).map { b =>
      val bits = (0 until VectorQueries.PlanesPerBand).map { i =>
        s"if(${VectorQueries.signBitSql(
          VectorQueries.planes(b * VectorQueries.PlanesPerBand + i))}, '1', '0')"
      }
      expr(s"concat(${bits.mkString(", ")})")
    }: _*)
  }

  private def nativeKeys =
    graft.functions.SignLshKeys.signLshKeys(
      col("v"), VectorQueries.planes, VectorQueries.PlanesPerBand)

  test("native sign-LSH keys match the HOF formulation on every vector") {
    val diff = realVecs
      .select(nativeKeys.as("native"), hofKeys.as("hof"))
      .filter(not(col("native") <=> col("hof")))
    assert(diff.count() == 0)
  }

  test("sign-LSH interpreted mode agrees with codegen") {
    val before = spark.conf.getOption("spark.sql.codegen.wholeStage")
    try {
      val on = realVecs.orderBy("vec_id")
        .select(nativeKeys).as[Seq[String]].collect()
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = realVecs.orderBy("vec_id")
        .select(nativeKeys).as[Seq[String]].collect()
      assert(on.toSeq == off.toSeq)
    } finally {
      before.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
        spark.conf.set("spark.sql.codegen.wholeStage", _))
    }
  }

  test("semantic dedup elects the max-norm member of a colinear cluster") {
    // three colinear vectors (cos = 1 pairwise) form ONE cluster via CC
    // even though LSH pairs them pairwise; the scaled-up copy has the
    // largest norm and must win. An uncorrelated vector (cos ≈ -0.018
    // with u) is a singleton and must not be listed.
    val u = (0 until 64).map(i => math.sin(i + 1.0))
    val w = (0 until 64).map(i => math.cos(3.0 * i + 2.0))
    val e = Seq(
      (10L, "a", u.map(_ * 1.0)),
      (11L, "a", u.map(_ * 1.5)),
      (12L, "a", u.map(_ * 2.0)),
      (99L, "b", w))
      .toDF("vec_id", "label", "v")
    val out = VectorQueries.semanticDedupOf(e)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((10L, 12L, 3L, 2L))) // cluster_id=min, keeper=12
  }

  test("vector exact dedup partitions the corpus: copies sum to the row count") {
    val total = graft.Tables(spark, sfDir, "embeddings").count()
    val out = VectorQueries.vectorExactDedup(spark, sfDir)
      .as[(Long, Long)].collect()
    assert(out.map(_._2).sum == total)       // every vector accounted for
    assert(out.map(_._1).distinct.length == out.length) // keepers unique
    assert(out.forall(_._2 >= 1L))
  }

  test("incremental vector near-dups = full pair pass restricted to batch") {
    // the q96 invariant, embedding flavor: band keys and cosine are pure
    // per-vector functions, so probing corpus bands with batch bands must
    // reproduce exactly the full q65 pairs touching >= 1 batch vector
    val full = VectorQueries.cosineNearDups(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    val want = full.filter { case (a, b, _) =>
      a % VectorQueries.VecBatchMod == 0 || b % VectorQueries.VecBatchMod == 0
    }
    val got = VectorQueries.incrementalVectorNearDupsDaily(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("canonical near-dup flow == member-level reference on the sf tables") {
    // q103 renders through the family-collapsed core + expansion; the
    // member-level formulation is the reference it must equal byte for
    // byte (same band-key fixed point, same cosine expression on the
    // same vectors, same batch-endpoint restriction)
    val e = VectorQueries.vecs(spark, sfDir).select(col("vec_id"), col("v"))
    val corpus = e.filter(col("vec_id") % VectorQueries.VecBatchMod =!= 0)
    val batch = e.filter(col("vec_id") % VectorQueries.VecBatchMod === 0)
    val old = VectorQueries
      .incrementalVectorNearDups(VectorQueries.lshBandsOf(corpus),
        corpus, batch)
      .as[(Long, Long, Double)].collect().toSeq
    val canon = VectorQueries.incrementalVectorNearDupsDaily(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(canon.nonEmpty)
    assert(canon == old)
  }

  test("q186 collapsed pairs: Σ n_pairs == the q103 member-pair count") {
    val collapsed = VectorQueries.canonicalNearDupPairsDaily(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect()
    val members = VectorQueries
      .incrementalVectorNearDupsDaily(spark, sfDir).count()
    assert(collapsed.nonEmpty)
    assert(collapsed.map(_._4).sum == members,
      "collapsed table does not account for every expanded member pair")
    // family pairs are unique and normalized; within rows are self-keyed
    val keys = collapsed.map(r => (r._1, r._2))
    assert(keys.distinct.length == keys.length)
    assert(collapsed.forall(r => r._1 <= r._2))
    assert(collapsed.filter(r => r._1 == r._2).forall(_._3 == 1.0))
  }

  // The adversarial shape the round-12 100× soak measured: every vector
  // in a replica family, some spanning the corpus/batch split, one
  // family whose batch member has a SMALLER id than the corpus
  // canonical (the shift case), one new batch-only family, one corpus
  // family reachable only through a cross-family near-dup pair.
  private def replicaFixture = {
    val u = (0 until 64).map(i => math.sin(i + 1.0))
    val u2 = u.map(_ * 1.5) // cos(u, u2) = 1 exactly? no — colinear, = 1
    val w = (0 until 64).map(i => math.sin(i + 1.0) + 0.05 * math.cos(2.0 * i))
    val z = (0 until 64).map(i => math.cos(3.0 * i + 2.0))
    Seq(
      // family A (u): corpus 1, 2, 11; batch 20, 30 — touched-existing
      (1L, u), (2L, u), (11L, u), (20L, u), (30L, u),
      // family B (w, near-dup of u): corpus-only 3, 13 — reached via A
      (3L, w), (13L, w),
      // family C (z): batch-only 40, 50 — new family, within pairs
      (40L, z), (50L, z),
      // family D (u2): corpus 61, 71; batch 60 — canonical SHIFT
      (60L, u2), (61L, u2), (71L, u2),
      // corpus singleton family untouched by anything near it
      (5L, z.map(_ + 10.0)))
      .toDF("vec_id", "v")
  }

  test("canonical flow == member-level reference on the replica fixture") {
    val e = replicaFixture
    val corpus = e.filter(col("vec_id") % VectorQueries.VecBatchMod =!= 0)
    val batch = e.filter(col("vec_id") % VectorQueries.VecBatchMod === 0)
    val old = VectorQueries
      .incrementalVectorNearDups(VectorQueries.lshBandsOf(corpus),
        corpus, batch)
      .as[(Long, Long, Double)].collect().toSeq
    val (fams, members, bandsC, canonVecs) =
      VectorQueries.vecNearDupIndexTables(corpus)
    val canon = VectorQueries
      .incrementalVectorNearDupsCanonical(fams, members, bandsC,
        canonVecs, batch)
      .as[(Long, Long, Double)].collect().toSeq
    assert(canon == old)
    // the fixture exercises all three pair classes
    val set = canon.map(p => (p._1, p._2)).toSet
    assert(set.contains((2L, 20L)), "within-family batch-corpus pair")
    assert(set.contains((20L, 30L)), "within-family batch-batch pair")
    assert(set.contains((13L, 20L)), "cross-family pair to an " +
      "untouched corpus family")
    assert(set.contains((40L, 50L)), "new-family within pair")
    assert(set.contains((60L, 61L)), "shift-family pair")
    assert(!set.exists(p => p._1 % 10 != 0 && p._2 % 10 != 0),
      "corpus-corpus pair leaked into the incremental output")
    // collapsed table accounts for exactly the expanded pairs
    val collapsed = VectorQueries
      .canonicalNearDupPairs(fams, members, bandsC, canonVecs, batch)
      .as[(Long, Long, Double, Long)].collect()
    assert(collapsed.map(_._4).sum == old.length.toLong)
  }

  test("q188 vec cap curve: monotone, bounded, shares the media sweep") {
    val curve = VectorQueries.vecBandCapCurve(spark, sfDir)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(curve.map(_._1).toSeq ==
      graft.multimodal.Multimodal.BandCapSweep)
    val truthN = curve.head._4
    assert(truthN > 0)
    curve.foreach { case (_, cand, kept, tn, micro) =>
      assert(tn == truthN)
      assert(kept <= cand && kept <= tn)
      assert(micro == kept * 1000000L / tn && micro <= 1000000L)
    }
    curve.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 >= lo._2 && hi._3 >= lo._3)
    }
  }

  test("vec_near_dup compaction handles the canonical shift") {
    val e = replicaFixture
    val corpus = e.filter(col("vec_id") % VectorQueries.VecBatchMod =!= 0)
    val batch = e.filter(col("vec_id") % VectorQueries.VecBatchMod === 0)
    val (fams, members, bandsC, canonVecs) =
      VectorQueries.vecNearDupIndexTables(corpus)
    val (gf, gm, gb, gv) = VectorQueries.compactVecNearDupTables(
      fams, members, bandsC, canonVecs, batch)
    val (wf, wm, wb, wv) =
      VectorQueries.vecNearDupIndexTables(e) // rebuild over corpus ∪ batch
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(gf) == rows(wf))
    assert(rows(gm) == rows(wm))
    assert(rows(gb) == rows(wb))
    assert(rows(gv) == rows(wv))
    // family D's canonical really shifted: 60 (batch) replaced 61
    assert(gm.filter(col("canon") === 60L).count() == 3L)
    assert(gm.filter(col("canon") === 61L).count() == 0L)
  }

  test("incremental vector exact dedup drops corpus-known keys") {
    // batch survivors + corpus-known batch vectors account for the whole
    // batch; survivors' keys are disjoint from the corpus index
    val e = graft.Tables(spark, sfDir, "embeddings")
    val batchN = e.filter(col("vec_id") % VectorQueries.VecBatchMod === 0)
      .count()
    val out = VectorQueries.incrementalVectorExactDedupDaily(spark, sfDir)
      .as[(Long, Long)].collect()
    assert(out.forall(_._1 % VectorQueries.VecBatchMod == 0)) // batch-only
    assert(out.map(_._2).sum <= batchN) // corpus-dup batch vectors dropped
    assert(out.map(_._1).distinct.length == out.length)
  }

  test("incremental semantic dedup = full dedup restricted to batch clusters") {
    // membership of the raw pair graph (q65 pairs include family cliques:
    // identical vectors share every band key and have cosine 1), so the
    // batch-containing clusters are exactly the components with a
    // vec_id % 10 == 0 member
    val pairs = VectorQueries.cosineNearDups(spark, sfDir)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val members = CurationQueries.connectedComponentsStar(pairs)._1
      .select("doc_id", "cluster_id")
      .as[(Long, Long)].collect()
    val batchClusters = members
      .filter(_._1 % VectorQueries.VecBatchMod == 0).map(_._2).toSet
    val full = VectorQueries.semanticDedup(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    val want = full.filter(r => batchClusters.contains(r._1)).toSet
    val got = VectorQueries.incrementalSemanticDedupDaily(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("incremental semantic dedup: shift, family-merge and famOnly paths") {
    // hand-built scenario exercising every leg:
    //  corpus (ids % 10 != 0): 1,2 identical family A; 3 near-dup of 1
    //    (one LSH cluster {A,3}); 11,12 identical family B (famOnly, no
    //    cluster); 21 singleton far from everything; 5 singleton.
    //  batch (ids % 10 == 0): 0 identical to family A → canonical SHIFTS
    //    1→0 and the cluster gains a member; 30,40 identical new family
    //    (batch famOnly); 50 near-dup of 21 → merges a corpus singleton;
    //    60 isolated (no output).
    val base = Array.fill(64)(0.5)
    def v(seed: Int, eps: Double): Array[Double] = {
      val a = base.clone(); a(seed % 64) += eps; a
    }
    val vA = v(1, 0.001); val vB = v(7, 40.0); val v21 = v(13, -35.0)
    val v5 = v(20, 90.0); val v60 = v(31, -80.0)
    val rows = Seq(
      (1L, vA), (2L, vA), (3L, v(1, 0.0012)), (11L, vB), (12L, vB),
      (21L, v21), (5L, v5),
      (0L, vA), (30L, v(25, 70.0)), (40L, v(25, 70.0)),
      (50L, v(13, -35.002)), (60L, v60))
    val e = rows.toDF("vec_id", "v")
    val corpus = e.filter(col("vec_id") % 10 =!= 0)
    val batch = e.filter(col("vec_id") % 10 === 0)
    val (famsC, vecC, bandsC, ccC, statsC) =
      VectorQueries.semanticIndexTables(corpus)
    val got = VectorQueries.incrementalSemanticDedup(
        famsC, vecC, bandsC, ccC, statsC, batch)
      .as[(Long, Long, Long, Long)].collect().toSet
    // full pass over everything, restricted to batch-containing clusters
    val full = VectorQueries.semanticDedupOf(
        e.select(col("vec_id"), col("v")))
      .as[(Long, Long, Long, Long)].collect()
    val pairs = VectorQueries.cosineNearDupsOf(e)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val membership = CurationQueries.connectedComponentsStar(pairs)._1
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
    val batchClusters = membership.filter(_._1 % 10 == 0).map(_._2).toSet
    val want = full.filter(r => batchClusters.contains(r._1)).toSet
    assert(got == want)
    // the canonical shift is exercised: family A's cluster id is 0 now
    assert(got.exists(_._1 == 0L), s"expected a cluster relabeled to 0: $got")
    // the corpus famOnly {11,12} has no batch member -> absent
    assert(!got.exists(_._1 == 11L))
  }

  test("incremental semantic dedup equals full-restricted on random corpora") {
    // seeded random corpora biased toward the hard structures: exact
    // duplicates spanning the batch/corpus split (family merge +
    // canonical shift, since id 0 is always batch), near-dups chaining
    // several corpus clusters through one batch vector, and isolated
    // vectors. For each corpus the incremental merge must equal the
    // full pass restricted to batch-containing clusters.
    val baseDirs = Seq(0, 16, 32, 48).map { d =>
      val a = Array.fill(64)(0.01); a(d) = 1.0; a
    }
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val n = 24 + rnd.nextInt(16)
      val rows = (0L until n.toLong).map { id =>
        val v = baseDirs(rnd.nextInt(4)).clone()
        rnd.nextInt(3) match {
          case 0 => () // exact copy — cross-split families
          case 1 => v(rnd.nextInt(64)) += 0.002 + 0.001 * rnd.nextInt(3)
          case 2 => v(rnd.nextInt(64)) += 0.5
        }
        (id, v)
      }
      val e = rows.toDF("vec_id", "v")
      val corpus = e.filter(col("vec_id") % 10 =!= 0)
      val batch = e.filter(col("vec_id") % 10 === 0)
      val (famsC, vecC, bandsC, ccC, statsC) =
        VectorQueries.semanticIndexTables(corpus)
      val got = VectorQueries.incrementalSemanticDedup(
          famsC, vecC, bandsC, ccC, statsC, batch)
        .as[(Long, Long, Long, Long)].collect().toSet
      val full = VectorQueries.semanticDedupOf(e)
        .as[(Long, Long, Long, Long)].collect()
      val membership = CurationQueries.connectedComponentsStar(
          VectorQueries.cosineNearDupsOf(e)
            .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))._1
        .select("doc_id", "cluster_id").as[(Long, Long)].collect()
      val batchClusters = membership.filter(_._1 % 10 == 0).map(_._2).toSet
      val want = full.filter(r => batchClusters.contains(r._1)).toSet
      assert(got == want, s"trial $trial: got $got, want $want")
    }
  }

  test("SQ8 quantized top-k tracks the exact float baseline") {
    val exact = VectorQueries.topkCosine(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    val quant = VectorQueries.quantizedTopkCosine(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(quant.groupBy(_._1).keySet == exact.groupBy(_._1).keySet)
    // int8 max-abs quantization of 64-dim vectors perturbs cosine by
    // O(1/127); per query, the quantized and exact top-3 neighbor sets
    // must overlap substantially (SQ8's standard recall behavior)
    val overlap = exact.groupBy(_._1).map { case (qid, ex) =>
      val qn = quant.filter(_._1 == qid).map(_._3).toSet
      ex.map(_._3).count(qn.contains).toDouble / ex.length
    }
    assert(overlap.sum / overlap.size >= 0.6,
      s"mean SQ8 recall ${overlap.sum / overlap.size} below 0.6")
    // quantized scores stay within the SQ8 error envelope of exact
    val exMap = exact.map(r => (r._1, r._3) -> r._4).toMap
    quant.foreach { case (qid, _, nid, cq) =>
      exMap.get((qid, nid)).foreach { ce =>
        assert(math.abs(cq - ce) < 0.05,
          s"quantized cos $cq far from exact $ce for ($qid,$nid)")
      }
    }
  }

  test("PQ ADC keeps neighbors in-cluster on clustered data") {
    // 4 tight clusters on orthogonal 64-dim axes; the 16 lowest vec_ids
    // (the codebook seeds) cover every cluster, so each subspace's
    // codebook contains in-cluster entries and ADC scoring must rank
    // in-cluster members above everything else. Exact WITHIN-cluster
    // order may differ from float (many members share codes — the PQ
    // trade), so the assertion is cluster membership, not set equality.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 120).map { i =>
      val c = i % 4
      val base = Array.fill(64)(0.0f)
      base(c * 16) = 1.0f
      val v = base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
      (i.toLong, v, c)
    }
    val e = VectorQueries.vecsOf(rows.toDF("vec_id", "embedding", "label"))
    val out = VectorQueries.pqTopkCosineOf(e)
      .as[(Long, Long, Long, Double)].collect()
    val cluster = rows.map(r => (r._1, r._3)).toMap
    assert(out.groupBy(_._1).size == 10)
    out.foreach { case (qid, _, nid, cos) =>
      assert(cluster(nid) == cluster(qid.toInt),
        s"neighbor $nid outside query $qid's cluster")
      assert(cos > 0.5, s"in-cluster ADC cosine $cos unexpectedly low")
    }
  }

  test("incremental IVF searches batch vectors through frozen corpus cells") {
    val out = VectorQueries.incrementalIvfTopkCosine(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    val perQuery = out.groupBy(_._1)
    assert(perQuery.nonEmpty)
    // dense 1..k ranks per query, k <= TopK
    assert(perQuery.values.forall { rows =>
      rows.map(_._2).sorted.sameElements((1L to rows.length.toLong))
    })
    assert(out.forall(r => r._4 >= -1.0 && r._4 <= 1.0))
    // batch vectors (vec_id % 10 == 0) are genuinely searchable: they
    // appear among neighbors (the corpus is clustered, so each cell
    // holds ~10% batch rows and top-k over sf data surfaces some)
    assert(out.exists(_._3 % VectorQueries.VecBatchMod == 0),
      "no batch vector surfaced as a neighbor")
  }

  test("kmeans separates well-separated clusters and accounts exactly") {
    // Two tight groups; the two lowest vec_ids (the seeds) land one per
    // group, so 2-round Lloyd must recover the groups exactly. All
    // coordinates are exactly representable so the fixed-point checksums
    // are hand-computable.
    val df = Seq(
      (0L, Array(0.0f, 0.0f)), (2L, Array(0.25f, 0.0f)),
      (4L, Array(0.5f, 0.0f)),
      (1L, Array(10.0f, 10.0f)), (3L, Array(10.0f, 10.25f)),
      (5L, Array(10.0f, 10.5f))).toDF("vec_id", "embedding")
    val out = VectorQueries.kmeansOf(df, k = 2, rounds = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 750000000L),      // (0+0.25+0.5) * 1e9
      (1L, 3L, 60750000000L)))   // (3*10 + 10+10.25+10.5) * 1e9
  }

  test("RP projection keeps clustered neighbors and is partition-independent") {
    // 3 tight clusters on orthogonal 64-dim axes: within-cluster reduced
    // cosine stays ~1 under a ±1 sign projection while cross-cluster
    // columns of the sign matrix are uncorrelated — recall must be high
    val rnd = new scala.util.Random(7)
    val rows = (0 until 120).map { i =>
      val c = i % 3
      val base = Array.fill(64)(0.0f)
      base(c * 21) = 1.0f
      val v = base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
      (i.toLong, v, c)
    }
    val e = VectorQueries.vecsOf(rows.toDF("vec_id", "embedding", "label"))
    // within a cluster every reduced cosine ties at ~1, so exact top-3
    // identity is not preserved (any cluster-mate is as good); the JL
    // property under test is that every returned neighbor is a
    // CLUSTER-MATE — cross-cluster reduced cosines are far from 1
    val rp = VectorQueries.rpTopkCosineOf(e)
      .as[(Long, Long, Long, Double)].collect()
    assert(rp.nonEmpty)
    rp.foreach { case (qid, _, nid, cos) =>
      assert(nid % 3 == qid % 3,
        s"RP neighbor $nid of query $qid crossed clusters (cos $cos)")
    }
    val again = VectorQueries.rpTopkCosineOf(e.repartition(7)).collect().toSeq
    assert(again == VectorQueries.rpTopkCosineOf(e.repartition(1))
      .collect().toSeq)
  }

  test("MMR demotes the near-duplicate and promotes the diverse neighbor") {
    // candidates of query 0: a2 (rel .92), its near-dup a1 (rel .90,
    // sim(a1,a2) ≈ .999), and diverse b (rel .88, sim(b,a2) ≈ .62).
    // plain top-k returns [a2, a1, b]; MMR must return [a2, b, a1].
    def vec(x: Double, y: Double): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(0) = x.toFloat; a(1) = y.toFloat; a
    }
    val df = Seq(
      (0L, vec(1.0, 0.0), 0),                    // the query
      (10L, vec(0.9, math.sqrt(0.19)), 0),       // a1
      (11L, vec(0.92, math.sqrt(0.1536)), 0),    // a2
      (12L, vec(0.88, -math.sqrt(0.2256)), 0))   // b
      .toDF("vec_id", "embedding", "label")
    val out = VectorQueries.mmrTopkOf(VectorQueries.vecsOf(df))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(out.map(r => (r._2, r._3)).toSeq ==
      Seq((1L, 11L), (2L, 12L), (3L, 10L)))
    // the diversified pick's score is rel − redundancy, strictly above
    // the near-dup's
    assert(out(1)._4 > 0.2 && out(2)._4 < 0.0)
  }

  test("q185 band occupancy reconciles against the actual q65 band join") {
    import org.apache.spark.sql.functions.{col, sum}
    val occ = VectorQueries.vecBandOccupancy(spark, sfDir)
    // Σ_bands Σ_buckets n·(n−1)/2 IS the sign-LSH band self-join's
    // candidate row count before cosine verification and pair dedup —
    // the q184 reconciliation, vector flavor.
    val e = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.expr(
          "transform(embedding, x -> cast(x as double))").as("v"))
    val bands = VectorQueries.lshBandsOf(e)
    val raw = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .count()
    val implied = occ.agg(sum(col("pairs_implied"))).head().getLong(0)
    assert(implied == raw,
      s"implied=$implied raw=$raw — occupancy report drifted from the join")
  }

  test("ann recall summary: bounds hold, more probes never lose recall") {
    // the two gates' UNION is the old ten-variant table (the r14 #5
    // split contract): per-variant rows depend only on that variant's
    // scan and the shared exact baseline, never on gate membership
    val untrained = VectorQueries.annRecallSummary(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    val trained = VectorQueries.annRecallTrained(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(untrained.map(_._1).toSet ==
      Set("ivf", "ivf_incremental", "ivf_sq8", "multiprobe", "pq",
        "rp", "sq8"))
    assert(trained.map(_._1).toSet ==
      Set("ivfpq", "ivfpq_incremental", "pq_trained"))
    val rows = (untrained ++ trained)
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(rows.keySet ==
      Set("ivf", "ivf_incremental", "ivf_sq8", "ivfpq",
        "ivfpq_incremental", "multiprobe", "pq", "pq_trained", "rp",
        "sq8"))
    rows.values.foreach { case (hits, nExact, micro, mass) =>
      assert(nExact == 30L) // NumQueries × TopK
      assert(hits >= 0 && hits <= nExact)
      assert(micro == hits * 1000000L / nExact)
      // truth mass is bounded by ±|returned| in full cosine units
      assert(math.abs(mass) <= nExact * 1000000L)
    }
    // the continuous companion must not tie where it matters: the exact
    // scan's own returned set has the maximal possible truth mass, so
    // sq8 (near-exact) must dominate the coarsest compressed tier
    assert(rows("sq8")._4 > rows("ivfpq")._4)
    // multiprobe's candidate set is a superset of ivf's per query, and a
    // ground-truth member in the candidate set always ranks within the
    // variant's top-k (at most k-1 items beat it anywhere) — so hits are
    // monotone in the candidate set
    assert(rows("multiprobe")._1 >= rows("ivf")._1)
  }

  test("PQ training strictly reduces quantization distortion; " +
      "residual encoding reduces it further") {
    // the q178 gate: total squared reconstruction error is THE quantity
    // the Lloyd rounds descend — recall@3 over 10 queries is 30
    // indicator draws and cannot rank codebooks (PLANS.md r11). The
    // residual row is q181's full reconstruction error at identical
    // bytes, which must undercut both raw-domain codebooks.
    val d = VectorQueries.pqDistortion(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(d.keySet == Set("residual_trained", "seeded", "trained"))
    assert(d("trained") < d("seeded"),
      s"training did not reduce distortion: ${d("trained")} vs " +
        s"${d("seeded")}")
    assert(d("residual_trained") < d("trained"),
      s"residual encoding did not reduce distortion: " +
        s"${d("residual_trained")} vs ${d("trained")}")
  }

  test("IVF-PQ keeps neighbors in-cluster and residuals dominate on " +
      "clustered data") {
    // the q181 home turf: tight clusters → residuals are the tiny
    // within-cluster noise, so the residual codebook reconstructs far
    // better than any raw-domain codebook, and ADC over residuals must
    // keep every neighbor in the query's cluster (the flat-PQ test's
    // assertion, now through the composed index)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 120).map { i =>
      val c = i % 4
      val base = Array.fill(64)(0.0f)
      base(c * 16) = 1.0f
      val v = base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
      (i.toLong, v, c)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    // residual norms collapse vs raw norms on clustered data — the
    // premise of residual encoding, checked on the exact frames q181
    // builds
    val e = VectorQueries.vecsOf(df)
    val cents = VectorQueries.centroidsOf(df)
    val centsM = cents.selectExpr("clabel AS cell",
      "transform(c, x -> cast(round(x * 1e6) as bigint)) AS cm")
    val res = VectorQueries.cellAssign(e, cents)
      .join(org.apache.spark.sql.functions.broadcast(centsM), Seq("cell"))
      .selectExpr("vec_id",
        "zip_with(transform(v, x -> cast(round(x * 1e6) as bigint)), " +
          "cm, (a, b) -> a - b) AS mv")
    val resMass = res.selectExpr(
      "sum(aggregate(mv, 0L, (a, x) -> a + x * x)) AS m")
      .as[Long].head()
    val rawMass = e.selectExpr(
      "sum(aggregate(transform(v, x -> cast(round(x * 1e6) as bigint))," +
        " 0L, (a, x) -> a + x * x)) AS m")
      .as[Long].head()
    assert(resMass * 10 < rawMass,
      s"residual mass $resMass not ≪ raw mass $rawMass")
    // and the composed search keeps every neighbor in-cluster
    val out = VectorQueries.ivfPqTopkCosineOf(df)
      .as[(Long, Long, Long, Double)].collect()
    val cluster = rows.map(r => (r._1, r._3)).toMap
    assert(out.groupBy(_._1).size == 10)
    out.foreach { case (qid, _, nid, cos) =>
      assert(cluster(nid) == cluster(qid.toInt),
        s"neighbor $nid outside query $qid's cluster")
      assert(cos > 0.5, s"in-cluster residual-ADC cosine $cos low")
    }
  }

  test("trained PQ codebook keeps geometry and fills from assignments") {
    val row = VectorQueries.pqTrainedCodebookOf(
      graft.Tables(spark, sfDir, "embeddings")
        .selectExpr("vec_id",
          "transform(embedding, x -> cast(x as double)) AS v"))
      .selectExpr("size(cb) AS ns", "size(nb) AS nns",
        "forall(cb, sub -> size(sub) = 16 AND " +
          "forall(sub, cv -> size(cv) = 8)) AS shape_ok",
        // norms must equal the recomputed sum of squares of each entry
        "forall(sequence(0, 7), s -> forall(sequence(0, 15), c -> " +
          "nb[s][c] = aggregate(cb[s][c], 0L, (a, x) -> a + x * x))) " +
          "AS norms_ok")
      .head()
    assert(row.getInt(0) == 8 && row.getInt(1) == 8)
    assert(row.getBoolean(2), "codebook lost its 8x16x8 shape")
    assert(row.getBoolean(3), "nb norms disagree with cb entries")
  }

  test("kmeans packed argmin fails fast when preconditions break") {
    // seed vec_id >= 2^20 can't fit the packed key's low bits — the
    // guard must raise, not silently mis-cluster (ADVICE r8 #2)
    val sparseIds = Seq(
      ((1L << 20) + 1L, Array(0.0f, 0.0f)),
      ((1L << 20) + 2L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e1 = intercept[Exception] {
      VectorQueries.kmeansOf(sparseIds, k = 2, rounds = 1).collect()
    }
    assert(e1.getMessage.contains("packed argmin out of packing range") ||
      Option(e1.getCause).exists(
        _.getMessage.contains("packed argmin out of packing range")))
    // a distance whose micro-units overflow the high bits must also raise
    val hugeDist = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(1.0e7f, 1.0e7f))).toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      VectorQueries.kmeansOf(hugeDist, k = 2, rounds = 1).collect()
    }
    assert(e2.getMessage.contains("packed argmin out of packing range") ||
      Option(e2.getCause).exists(
        _.getMessage.contains("packed argmin out of packing range")))
  }

  test("kmeans output partitions the corpus; clusters keep seed ids") {
    val emb = graft.Tables(spark, sfDir, "embeddings")
    val total = emb.count()
    val seedIds = emb.orderBy("vec_id").limit(VectorQueries.KmeansK)
      .select("vec_id").as[Long].collect().toSet
    val out = VectorQueries.kmeansClusters(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._2).sum == total)          // every vector assigned once
    assert(out.map(_._1).toSet.subsetOf(seedIds)) // ids are seed vec_ids
  }

  test("cell near-dups = exactly the within-cell pairs above threshold") {
    // independent Scala brute force over the same final assignment
    val assigned = VectorQueries.kmeansAssignOf(
        graft.Tables(spark, sfDir, "embeddings"),
        VectorQueries.CellK, VectorQueries.KmeansRounds)
      .select("cid", "vec_id", "v")
      .as[(Long, Long, Array[Double])].collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = assigned.groupBy(_._1).values.flatMap { cell =>
      val m = cell.sortBy(_._2)
      for {
        i <- m.indices; j <- (i + 1) until m.length
        // skip the rounding boundary
        if cos(m(i)._3, m(j)._3) >= 0.4 + 1e-6
      } yield (m(i)._2, m(j)._2)
    }.toSet
    val got = VectorQueries.kmeansCellNearDups(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(got.forall(_._3 >= 0.4))
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    assert(expected.subsetOf(gotPairs))
    // anything reported but not in `expected` must sit on the boundary
    assert((gotPairs -- expected).forall { case (a, b) =>
      val va = assigned.find(_._2 == a).get._3
      val vb = assigned.find(_._2 == b).get._3
      math.abs(cos(va, vb) - 0.4) < 1e-6
    })
  }

  test("fixed-point rounding matches Spark round() on half boundaries") {
    // ±2.5 and ±3.5 in the 1e-9 domain hit exact .5 fixed-point values;
    // Math.round would give -2 / -3 where HALF_UP gives -3 / -4
    val xs = Seq(2.5e-9, -2.5e-9, 3.5e-9, -3.5e-9, 0.0, 1e-10, -1e-10,
      0.123456789, -0.987654321)
    val fromSpark = xs.toDF("x")
      .select(expr("cast(round(x * 1e9) as bigint)")).as[Long].collect()
    val fromNative = xs.map(graft.functions.SignLshKeys.halfUp)
    assert(fromSpark.toSeq == fromNative)
  }

  test("hard negatives = brute-force cross-label top-k per query") {
    val all = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x AS double))"))
      .as[(Long, Int, Array[Double])].collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = all.filter(_._1 < 10).flatMap { case (qid, ql, qv) =>
      all.filter(c => c._1 != qid && c._2 != ql)
        .map(c => (qid, c._1, c._2, r6(cos(c._3, qv))))
        .sortBy { case (_, nid, _, c) => (-c, nid) }
        .take(VectorQueries.HardNegK)
        .zipWithIndex
        .map { case ((q, nid, nl, c), i) => (q, i + 1L, nid, nl, c) }
    }.toSet
    val got = VectorQueries.hardNegatives(spark, sfDir)
      .as[(Long, Long, Long, Int, Double)].collect().toSet
    assert(got == expected)
    // and none of them carries the query's own label
    val labelOf = all.map(a => a._1 -> a._2).toMap
    assert(got.forall { case (qid, _, nid, nl, _) =>
      nl == labelOf(nid) && nl != labelOf(qid) })
  }

  test("embedding report: populations + driver-side centroid geometry") {
    val rows = VectorQueries.embeddingReport(spark, sfDir)
      .as[(Int, Long, Long, Int, Double)].collect().toSeq
    val labels = graft.Tables(spark, sfDir, "embeddings")
      .groupBy(col("label")).count().as[(Int, Long)].collect().toMap
    assert(rows.map(r => r._1 -> r._2).toMap == labels)
    rows.foreach { case (l, _, rad, nl, gap) =>
      assert(rad >= 0 && nl != l && gap > 0)
    }
    // nearest/gap recomputed from the same UDAF centroids
    val cs = VectorQueries.centroidsOf(
      graft.Tables(spark, sfDir, "embeddings"))
      .as[(Int, Array[Double])].collect()
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val expNear = cs.map { case (la, ca) =>
      la -> cs.filter(_._1 != la)
        .map { case (lb, cb) => (r6(l2(ca, cb)), lb) }.min
    }.toMap
    rows.foreach { case (l, _, _, nl, gap) =>
      assert(expNear(l) == ((gap, nl)), s"label $l nearest mismatch")
    }
  }

  test("ivf cell balance partitions the corpus and matches q68 totals") {
    val rows = VectorQueries.ivfCellBalance(spark, sfDir)
      .as[(Int, Long, Long)].collect().toSeq
    val nVecs = graft.Tables(spark, sfDir, "embeddings").count()
    assert(rows.map(_._2).sum == nVecs)
    rows.foreach { case (_, n, share) =>
      assert(n > 0 && share >= 0 && share <= 1000000L)
    }
    // per-cell totals equal the q68 confusion matrix's pred columns
    val conf = VectorQueries.centroidClassify(spark, sfDir)
      .as[(Int, Int, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == conf)
  }

  test("positive pairs = brute-force same-label top-k per query") {
    val all = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x AS double))"))
      .as[(Long, Int, Array[Double])].collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = all.filter(_._1 < 10).flatMap { case (qid, ql, qv) =>
      all.filter(c => c._1 != qid && c._2 == ql)
        .map(c => (qid, c._1, c._2, r6(cos(c._3, qv))))
        .sortBy { case (_, pid, _, c) => (-c, pid) }
        .take(VectorQueries.HardNegK)
        .zipWithIndex
        .map { case ((q, pid, pl, c), i) => (q, i + 1L, pid, pl, c) }
    }.toSet
    val got = VectorQueries.positivePairs(spark, sfDir)
      .as[(Long, Long, Long, Int, Double)].collect().toSet
    assert(got == expected)
    // every positive carries the query's own label, and (q140 ∪ q135)
    // rows compose into contrastive triples: same qid, disjoint ids
    val labelOf = all.map(a => a._1 -> a._2).toMap
    assert(got.forall { case (qid, _, pid, pl, _) =>
      pl == labelOf(pid) && pl == labelOf(qid) })
    val negIds = VectorQueries.hardNegatives(spark, sfDir)
      .select(col("qid"), col("nid")).as[(Long, Long)].collect().toSet
    assert(got.forall { case (qid, _, pid, _, _) =>
      !negIds.contains((qid, pid)) })
  }

  test("quantizer drift reconciles populations and its own arithmetic") {
    val e = graft.Tables(spark, sfDir, "embeddings")
    val nCorpus = e.filter(col("vec_id") % 10 =!= 0).count()
    val nBatch = e.filter(col("vec_id") % 10 === 0).count()
    val rows = VectorQueries.quantizerDrift(spark, sfDir)
      .select(col("cell"), col("n_corpus"), col("n_batch"),
        col("growth_micro"), col("corpus_d2_micro"),
        col("batch_d2_micro"), col("drift_micro"))
      .collect()
    // every vector lands in exactly one cell on exactly one side
    assert(rows.map(_.getLong(1)).sum == nCorpus)
    assert(rows.map(_.getLong(2)).sum == nBatch)
    // the report's own arithmetic: growth and drift derive from the
    // populations/means exactly as documented (integer division)
    rows.foreach { r =>
      val (nc, nb) = (r.getLong(1), r.getLong(2))
      if (nc > 0)
        assert(r.getLong(3) == nb * 1000000L / nc)
      else assert(r.isNullAt(3) && r.isNullAt(4))
      if (nb == 0) assert(r.isNullAt(5) && r.isNullAt(6))
      if (nc > 0 && nb > 0)
        assert(r.getLong(6) == r.getLong(5) - r.getLong(4))
    }
    // the batch-side assignment agrees with the q68 tie-break: cells
    // are drawn from the corpus label vocabulary
    val labels = e.select(col("label")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(rows.map(_.getInt(0)).toSet.subsetOf(labels))
  }
}
