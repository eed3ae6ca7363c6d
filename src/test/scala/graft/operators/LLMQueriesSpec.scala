package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Dedup/near-dup/text-analysis properties (SURVEY.md §5.2): idempotence
  * of L1 dedup, MinHash behavior on identical vs disjoint docs, text-stat
  * invariants. ScalaCheck is driven through its own runner (the
  * scalatest-scalacheck bridge isn't in the offline cache).
  */
class LLMQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def checkProp(prop: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private def dedup(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
      .select("doc_id", "text")

  test("exact dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val textGen = Gen.listOfN(6, Gen.oneOf("spark", "batch", "row", "agg"))
      .map(_.mkString(" "))
    checkProp(Prop.forAll(Gen.listOfN(12, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = dedup(df)
      val twice = dedup(once)
      once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty
    })
  }

  test("exact dedup keeps the minimum doc_id per text group") {
    val df = Seq((5L, "a b c"), (2L, "a b c"), (9L, "x y z"))
      .toDF("doc_id", "text")
    val kept = dedup(df).as[(Long, String)].collect().toMap
    assert(kept == Map(2L -> "a b c", 9L -> "x y z"))
  }

  test("minhash signatures are equal for identical texts") {
    // identical docs must share every band, hence be candidates with j=1
    val sigs = LLMQueries.minhashPairs(spark, sfDir)
    // sanity on real data: any reported pair has 0 < jaccard <= 1
    val jacs = sigs.select("jaccard").as[Double].collect()
    assert(jacs.forall(j => j > 0.0 && j <= 1.0))
  }

  test("text stats invariants: distinct <= words, stop <= words, quality in [0,1]") {
    val stats = LLMQueries.textStats(spark, sfDir)
      .select("n_words", "n_distinct", "n_stop", "quality")
      .as[(Long, Long, Long, Double)].collect()
    assert(stats.nonEmpty)
    stats.foreach { case (w, d, s, q) =>
      assert(d <= w && s <= w && q >= 0.0 && q <= 1.0)
    }
  }

  test("tf-idf: a corpus-universal term scores zero") {
    val words = Seq((0L, "common alpha"), (1L, "common beta"),
      (2L, "common gamma")).toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val tf = words.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val df = words.distinct().groupBy("t").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "t")
      .withColumn("score", col("tf") * log(lit(3.0) / col("df")))
      .filter(col("t") === "common")
      .select("score").as[Double].collect()
    assert(scored.forall(_ == 0.0))
  }

  // --- per-row rewrites cross-validated against their exploded
  //     reference formulations (the round-4 scale rewrites must never
  //     drift semantically from the aggregation they replaced) ---------

  test("per-row simhash equals the exploded token-vote formulation") {
    val d = LLMQueries.queries("q66_simhash_signatures")(spark, sfDir)
    val toks = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), "\\s+"))).as("t"))
    val votes = (1 to 16).map { i =>
      sum(when(substring(md5(col("t")), i, 1) >= "8", 1).otherwise(-1))
        .as(s"v$i")
    }
    val bits = (1 to 16).map { i =>
      when(col(s"v$i") >= 0, "1").otherwise("0")
    }
    val ref = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), concat(bits: _*).as("simhash"))
    assert(d.exceptAll(ref).isEmpty && ref.exceptAll(d.select(
      col("doc_id"), col("simhash"))).isEmpty)
  }

  test("per-row winnowing fingerprint equals the exploded min-gram") {
    val d = LLMQueries.queries("q70_doc_fingerprints")(spark, sfDir)
      .select("doc_id", "fingerprint")
    val ref = graft.Tables(spark, sfDir, "documents")
      .withColumn("w", split(col("text"), "\\s+"))
      .select(col("doc_id"),
        explode(when(size(col("w")) >= 5, expr(
          "transform(sequence(0, size(w)-5)," +
            " i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))"))
          .otherwise(array(col("text")))).as("g"))
      .groupBy(col("doc_id"))
      .agg(min(substring(md5(col("g")), 1, 12)).as("fingerprint"))
    assert(d.exceptAll(ref).isEmpty && ref.exceptAll(d).isEmpty)
  }

  test("per-row minhash pairs equal the exploded signature formulation") {
    val d = LLMQueries.queries("q64_minhash_pairs")(spark, sfDir)
    // round-3 formulation: explode shingle rows, groupBy-min signatures,
    // exact Jaccard via shingle-row join
    val rows = graft.Tables(spark, sfDir, "documents")
      .withColumn("w", split(col("text"), "\\s+"))
      .select(col("doc_id"),
        explode(when(size(col("w")) >= 3, array_distinct(expr(
          "transform(sequence(0, size(w)-3)," +
            " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")))
          .otherwise(array().cast("array<string>"))).as("s"))
    val sigCols = (0 until 8).map { j =>
      min(substring(md5(concat(lit(s"$j:"), col("s"))), 1, 16)).as(s"h$j")
    } :+ count(lit(1)).as("n_sh")
    val sigs = rows.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}")).as("key"))
    }
    val bands = sigs.select(col("doc_id"),
      explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"))
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sizes = sigs.select(col("doc_id"), col("n_sh"))
    val inter = cands
      .join(rows.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(rows.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    val ref = inter
      .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        round(col("n_inter").cast("double") /
          (col("za.n_sh") + col("zb.n_sh") - col("n_inter")), 6)
          .as("jaccard"))
    assert(d.exceptAll(ref).isEmpty && ref.exceptAll(d).isEmpty)
  }

  test("incremental exact dedup keeps only batch texts unseen in the corpus") {
    val corpus = Seq((1L, "known text one"), (2L, "known text two"))
      .toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "known text one"),   // exact dup of corpus → dropped
      (11L, "brand new text"),   // unseen → kept
      (12L, "brand new text"),   // batch-internal dup → 11 wins, n=2
      (13L, "another new one"))  // unseen → kept
      .toDF("doc_id", "text")
    val out = LLMQueries.incrementalExactDedup(
      LLMQueries.hashIndex(corpus), fresh)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((11L, 2L), (13L, 1L)))
  }

  test("incremental near-dup equals the full pass restricted to new docs") {
    def family(i: Long, tag: String) =
      s"alpha beta gamma delta epsilon zeta eta theta $tag$i"
    val corpus = ((0L until 6L).map(i => (i, family(i, "c"))) ++
      (6L until 10L).map(i => (i, s"u${i}a u${i}b u${i}c u${i}d u${i}e")))
      .toDF("doc_id", "text")
    val fresh = ((100L until 103L).map(i => (i, family(i, "n"))) ++
      Seq((103L, "x103a x103b x103c x103d x103e")))
      .toDF("doc_id", "text")
    val (bands, sets) = LLMQueries.signatureTables(corpus)
    val inc = LLMQueries.incrementalNearDups(bands, sets, fresh)
      .as[(Long, Long, Long, Double)].collect().toSet
    val full = LLMQueries.minhashPairsOf(corpus.unionByName(fresh))
      .as[(Long, Long, Long, Double)].collect()
    val isNew = (id: Long) => id >= 100L
    val restricted = full.filter(p => isNew(p._1) || isNew(p._2)).toSet
    assert(inc == restricted, s"inc=$inc\nfull-restricted=$restricted")
    // the batch did find corpus near-dups at all (non-vacuous) …
    assert(inc.exists { case (a, b, _, _) => !isNew(a) && isNew(b) })
    // … and corpus-internal pairs exist in full but are NOT recomputed
    assert(full.exists(p => !isNew(p._1) && !isNew(p._2)))
  }

  test("q189 band occupancy reconciles against the actual q64 band join") {
    // Σ pairs_implied IS the MinHash band self-join's candidate row
    // count before dedup/verification — the q184/q185 reconciliation,
    // text flavor
    val occ = LLMQueries.textBandOccupancy(spark, sfDir)
    val bands = LLMQueries
      .signatureTables(graft.Tables(spark, sfDir, "documents"))._1
    val raw = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .count()
    val implied = occ.agg(sum(col("pairs_implied"))).head().getLong(0)
    assert(implied == raw,
      s"implied=$implied raw=$raw — occupancy report drifted from the join")
  }

  test("bpe pair counts weight pairs by word frequency, in-word repeats count") {
    // "ab" ×3 → pair ab=3; "aaa" ×2 → pair aa twice per word = 4;
    // one-char words contribute nothing
    val corpus = Seq(
      (1L, "ab ab aaa x"),
      (2L, "ab aaa x"))
      .toDF("doc_id", "text")
    val out = LLMQueries.bpePairCountsOf(corpus)
      .as[(String, Long)].collect().toMap
    assert(out == Map("aa" -> 4L, "ab" -> 3L))
  }

  /** Straight-line greedy-scan reference BPE (the textbook loop) the
    * positional-lambda operator must reproduce exactly. */
  private def referenceBpe(words: Map[String, Long],
      rounds: Int): Seq[(Long, String, String, Long)] = {
    def mergeWord(s: Vector[String], pa: String, pb: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == pa && s(i + 1) == pb) {
          out += (pa + pb); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }
    var vocab: Map[Vector[String], Long] = words.toSeq
      .map { case (w, n) => w.map(_.toString).toVector -> n }
      .groupMapReduce(_._1)(_._2)(_ + _)
    (1 to rounds).flatMap { r =>
      val counts = vocab.toSeq.flatMap { case (s, n) =>
        s.zip(s.tail).map(p => (p._1, p._2) -> n)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) Seq.empty
      else {
        val ((pa, pb), total) = counts.minBy { case ((a, b), t) => (-t, a, b) }
        vocab = vocab.toSeq
          .map { case (s, n) => mergeWord(s, pa, pb) -> n }
          .groupMapReduce(_._1)(_._2)(_ + _)
        Seq((r.toLong, pa, pb, total))
      }
    }
  }

  test("bpe merge loop == greedy-scan reference on the real corpus") {
    val rounds = 6 // more than the q108 default, exercises deeper merges
    val docsDf = graft.Tables(spark, sfDir, "documents")
    val words = docsDf
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .filter(length(col("t")) >= 2)
      .groupBy("t").count()
      .as[(String, Long)].collect().toMap
    val expected = referenceBpe(words, rounds)
    val got = LLMQueries.bpeMergeLoopOf(docsDf, rounds)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == expected)
  }

  test("bpe merge loop handles repeated-symbol runs and crafted ties") {
    // 'aaaa': pair aa counted 3× per word; greedy merge → [aa, aa];
    // round 2 must then find (aa, aa). Also covers the even-offset rule
    // ('aaa' → [aa, a], leftover single 'a' never re-merges).
    val corpus = Seq(
      (1L, "aaaa aaaa aaa"),
      (2L, "aaaa bc bc bc bc bc bc bc")).toDF("doc_id", "text")
    val got = LLMQueries.bpeMergeLoopOf(corpus, 3)
      .as[(Long, String, String, Long)].collect().toSeq
    // round 1: aa total = 3×3 (aaaa) + 2 (aaa) = 11 vs bc = 7 → (a,a,11)
    // round 2 vocab: aaaa→[aa,aa]×3, aaa→[aa,a]×1, bc→[b,c]×7:
    //   (aa,aa)=3, (aa,a)=1, (b,c)=7 → (b,c,7)
    // round 3: (aa,aa)=3 vs (aa,a)=1 → (aa,aa,3)
    assert(got == Seq(
      (1L, "a", "a", 11L), (2L, "b", "c", 7L), (3L, "aa", "aa", 3L)))
    // and the VERDICT property: each round's reported count equals a
    // recount of the PREVIOUS round's merged vocabulary — checked here
    // against the straight-line reference for the same corpus
    val words = Map("aaaa" -> 3L, "aaa" -> 1L, "bc" -> 7L)
    assert(got == referenceBpe(words, 3))
  }

  test("bpe training past pair exhaustion is a fixed point, not erasure") {
    // a fully-mergeable corpus: after 3 effective merges ('ab', 'cd',
    // then 'abab' needs (ab,ab)) every word is ONE symbol and the pair
    // space is empty — further rounds must keep the trained vocabulary
    // intact (the round-11 left-join fix: the old cross join against an
    // empty best pair silently erased it), and emit no merge rows
    val corpus = Seq((1L, "abab abab cd"), (2L, "cd cd"))
      .toDF("doc_id", "text")
    val merges = LLMQueries.bpeMergeLoopOf(corpus, 8)
      .as[(Long, String, String, Long)].collect().toSeq
    // rounds beyond exhaustion produce no rows at all
    assert(merges.map(_._1) == Seq(1L, 2L, 3L))
    val vocab = LLMQueries.bpeVocabAfter(corpus, 8)
      .selectExpr("t", "size(s)", "n")
      .as[(String, Int, Long)].collect().toSet
    assert(vocab == Set(("abab", 1, 2L), ("cd", 1, 3L)))
    // and the fixed point tokenizes identically to stop-at-exhaustion
    val atExhaustion = LLMQueries.bpeTokenizeOf(corpus, 3)
      .as[(Long, Long, Long)].collect().toSeq
    val past = LLMQueries.bpeTokenizeOf(corpus, 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(past == atExhaustion)
  }

  test("bpe tokenize counts tokens under the trained vocabulary") {
    // vocab: aaaa×2, aaa×1, bc×1 (x is 1-char → never in the vocab).
    // r1 best (a,a,8) → aaaa=[aa,aa], aaa=[aa,a]; r2 (aa,aa,2) →
    // aaaa=[aaaa]; r3 tie (aa,a)=1 vs (b,c)=1 → pa tie-break picks
    // (aa,a) → aaa=[aaa]; r4 (b,c,1) → bc=[bc]. Every word is then ONE
    // token; x counts 1 via the coalesce.
    val corpus = Seq((1L, "aaaa aaa x"), (2L, "bc aaaa"))
      .toDF("doc_id", "text")
    val merges = LLMQueries.bpeMergeLoopOf(corpus, 4)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(merges == Seq((1L, "a", "a", 8L), (2L, "aa", "aa", 2L),
      (3L, "aa", "a", 1L), (4L, "b", "c", 1L)))
    val out = LLMQueries.bpeTokenizeOf(corpus, 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 3L), (2L, 2L, 2L)))
    // fewer merge rounds → an untrained vocab tokenizes to more tokens
    val untrained = LLMQueries.bpeTokenizeOf(corpus, 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(untrained.map(_._3).sum > out.map(_._3).sum)
  }

  test("bm25 ranks rare-term and higher-tf matches above common-term ones") {
    // query doc 0 = "rare common". 'rare' appears only in doc 10 (high
    // idf); 'common' is everywhere (low idf); doc 12 has it twice.
    val corpus = Seq(
      (0L, "rare common"),
      (10L, "rare filler1 filler2"),
      (11L, "common filler3 filler4"),
      (12L, "common common filler5"),
      (13L, "common filler6 filler7"),
      (14L, "common filler8 filler9"))
      .toDF("doc_id", "text")
    val out = LLMQueries.bm25TopkOf(corpus)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.forall(_._1 == 0L) && out.length == 3)
    assert(out.head._3 == 10L) // rare-term match wins
    val rankOf = out.map(r => r._3 -> r._2).toMap
    assert(rankOf(12L) < rankOf.getOrElse(11L, Long.MaxValue)) // tf=2 beats tf=1
    assert(out.forall(_._4 > 0L)) // all scores positive
  }

  test("chunking covers every word with stable overlap and one chunk for short docs") {
    val n = 150 // 3 chunks: starts 0, 48, 96 (96+54 tail)
    val words = (0 until n).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" ")), (2L, "a b c"))
      .toDF("doc_id", "text")
    val out = LLMQueries.chunkDocsOf(df)
      .as[(Long, Long, Long, String)].collect()
    val c1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(c1.length == 1 + math.ceil(
      (n - LLMQueries.ChunkTokens).toDouble / LLMQueries.ChunkStride).toInt)
    c1.foreach { case (_, idx, nTok, text) =>
      val start = idx.toInt * LLMQueries.ChunkStride
      val expect = words.slice(start,
        math.min(n, start + LLMQueries.ChunkTokens))
      assert(text == expect.mkString(" "))
      assert(nTok == expect.length)
    }
    // every word position is covered by at least one chunk
    val covered = c1.flatMap { case (_, idx, nTok, _) =>
      val s0 = idx.toInt * LLMQueries.ChunkStride
      s0 until (s0 + nTok.toInt)
    }.toSet
    assert(covered == (0 until n).toSet)
    // short doc: exactly one chunk, the doc itself
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 3L, "a b c")))
  }

  test("minhash recall gate: identical sampled docs land in decile 10 at full recall") {
    val t = (0 until 30).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (0L, t), (10L, t),                       // identical pair, both sampled
      (20L, (50 until 90).map(i => s"z$i").mkString(" ")), // sampled, unrelated
      (7L, t))                                 // identical but NOT sampled
      .toDF("doc_id", "text")
    val out = LLMQueries.minhashRecallOf(df)
      .as[(Long, Long, Long, Long)].collect()
    // the only ground-truth pair is (0,10): j = 1.0 → decile 10; an
    // identical pair shares every band, so the banded leg must hit it
    assert(out.toSeq == Seq((10L, 1L, 1L, 1000000L)))
  }

  test("normalized dedup collapses case/punct twins raw dedup keeps apart") {
    val rows = LLMQueries.normalizedDedup(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    // every seeded twin produces a cluster holding >= 2 distinct RAW
    // hashes — exactly the dups q60's raw key misses
    val twinned = rows.filter(_._3 >= 2)
    assert(twinned.nonEmpty)
    assert(rows.forall(r => r._2 >= r._3)) // copies >= raw variants
    // originals win their twins by min-id election
    assert(twinned.forall(_._1 < LLMQueries.NormVariantIdOffset))
    // normalization is idempotent: applying it to its own output is a no-op
    val once = graft.Tables(spark, sfDir, "documents")
      .select(LLMQueries.normTextExpr.as("text"))
    assert(once.filter(LLMQueries.normTextExpr =!= col("text")).isEmpty)
  }

  test("tokenizer fertility aggregates the q113 per-doc counts by language") {
    val perDoc = LLMQueries.bpeTokenize(spark, sfDir)
      .as[(Long, Long, Long)].collect() // doc_id, n_words, n_tokens
    val meta = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .as[(Long, String, Long)].collect()
      .map(m => m._1 -> (m._2, m._3)).toMap
    val expected = perDoc.groupBy(d => meta(d._1)._1).map { case (lang, ds) =>
      val (w, t) = (ds.map(_._2).sum, ds.map(_._3).sum)
      val c = ds.map(d => meta(d._1)._2).sum
      (lang, ds.length.toLong, w, t, c, t * 1000000L / w, c * 1000000L / t)
    }.toSet
    val got = LLMQueries.tokenizerFertility(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    // every word is at least one token → fertility ≥ 1.0
    assert(got.forall(_._6 >= 1000000L))
  }

  test("lang-mix flags a code-switched doc that per-doc lang-ID misses") {
    // 40 words each: the first half saturates the English profile
    // (the/ing/and trigrams), the second the German (sch/ein/der)
    val en = Seq.fill(10)("the thing and").mkString(" ")   // 30 words
    val de = Seq.fill(10)("schein der ein").mkString(" ")  // 30 words
    val docsDf = Seq(
      (1L, s"$en $de", "en"),       // half-and-half → mixed
      (2L, en, "en"),               // pure → not mixed
      (3L, de, "de"))               // pure → not mixed
      .toDF("doc_id", "text", "lang")
    val rows = LLMQueries.langMixReportDocs(docsDf)
      .as[(Long, String, String, Long, Long, Long, Boolean)]
      .collect().sortBy(_._1).toSeq
    // reconciliation: majority never exceeds the segment count
    assert(rows.forall(r => r._5 <= r._4 && r._4 > 0))
    assert(rows.forall(r =>
      r._6 == (r._4 - r._5) * 1000000L / r._4))
    val (mixed, pureEn, pureDe) = (rows(0), rows(1), rows(2))
    assert(mixed._7, s"code-switched doc not flagged: $mixed")
    // 3 segments: en, boundary (majority-absorbed), de → 1/3 minority
    assert(mixed._6 >= LLMQueries.MixedThresholdMicro)
    assert(!pureEn._7 && pureEn._3 == "en" && pureEn._6 == 0L)
    assert(!pureDe._7 && pureDe._3 == "de" && pureDe._6 == 0L)
  }

  // --- retrieval family: QL (q163) + RRF (q164) ------------------------

  test("QL ranking matches a driver-side brute-force Dirichlet scorer") {
    // docs 0-4 are queries (the Bm25NumQueries contract); 5+ are corpus
    val docsDf = Seq(
      (0L, "spark batch engine"),
      (1L, "stream state engine"),
      (2L, "join agg"), (3L, "scan filter"), (4L, "sort merge"),
      (5L, "spark spark batch engine row"),
      (6L, "batch engine state column spark"),
      (7L, "stream stream state engine engine"),
      (8L, "join agg scan filter sort merge"),
      (9L, "row column window nothing shared here"))
      .toDF("doc_id", "text")
    val (tf, dl) = LLMQueries.bm25Index(docsDf)
    val got = LLMQueries.qlRank(tf, dl, 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

    // brute force, mirroring the formula text exactly (Math.log is the
    // same intrinsic Spark's ln codegen calls)
    val postings = tf.as[(Long, String, Long)].collect()
    val dls = postings.groupBy(_._1).map { case (d, ps) =>
      d -> ps.map(_._3).sum }
    val cf = postings.groupBy(_._2).map { case (t, ps) =>
      t -> ps.map(_._3).sum }
    val tot = dls.values.sum
    val expected = (0L to 4L).flatMap { qid =>
      val qts = postings.filter(_._1 == qid).map(_._2).toSet
      val scored = dls.keys.filter(_ >= 5L).toSeq.flatMap { d =>
        val matched = postings.filter(p => p._1 == d && qts(p._2))
        if (matched.isEmpty) None
        else {
          val m = matched.map { p =>
            math.round(math.log(1.0 + (p._3 * tot) / (300.0 * cf(p._2)))
              * 1e6)
          }.sum
          val norm = qts.size *
            math.round(math.log(300.0 / (dls(d) + 300.0)) * 1e6)
          Some((d, m + norm, matched.size.toLong))
        }
      }
      scored.sortBy { case (d, s, _) => (-s, d) }.take(3).zipWithIndex
        .map { case ((d, s, n), i) => (qid, (i + 1).toLong, d, s, n) }
    }
    assert(got.sortBy(r => (r._1, r._2)) ==
      expected.sortBy(r => (r._1, r._2)))
  }

  test("RRF fusion is exactly the integer rank-sum of its two legs") {
    val (tf, dl) =
      LLMQueries.bm25Index(graft.Tables(spark, sfDir, "documents"))
    val legs =
      LLMQueries.bm25Rank(tf, dl, 10).unionByName(
        LLMQueries.qlRank(tf, dl, 10))
        .select("qid", "doc_id", "rk")
        .as[(Long, Long, Long)].collect().toSeq
    val expected = legs.groupBy(t => (t._1, t._2)).map {
      case ((qid, d), rs) =>
        (qid, d, rs.map(r => 1000000L / (60L + r._3)).sum, rs.size.toLong)
    }.toSeq
    val topExpected = expected.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(5).zipWithIndex
        .map { case ((qid, d, s, n), i) => (qid, (i + 1).toLong, d, s, n) }
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = LLMQueries.rrfFusion(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == topExpected)
    // a fused doc always comes from at least one leg, by construction;
    // n_sys counts the contributing rankers
    assert(got.forall(r => r._5 == 1L || r._5 == 2L))
  }

  test("hybrid RRF: the dense leg surfaces a synonym doc BM25 misses") {
    // query doc 0 and corpus doc 7 are synonym pages sharing ZERO terms,
    // so BM25 cannot score doc 7 at all (no posting matches a query
    // term); their embeddings are near-identical and share a label (the
    // IVF cell), so the dense leg ranks doc 7 first and RRF surfaces it.
    // doc 8 is the lexical hit; doc 9 is noise on both sides.
    val docsDf = Seq(
      (0L, "automobile insurance quote request"),
      (7L, "car coverage pricing enquiry"),
      (8L, "automobile insurance quote request form online"),
      (9L, "gardening tips for tomato seedlings")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.05f, 0.0f, 0.1f), 1),
      (7L, Array(0.99f, 0.04f, 0.01f, 0.1f), 1),
      (8L, Array(0.0f, 1.0f, 0.2f, 0.0f), 2),
      (9L, Array(0.1f, 0.0f, 1.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")

    // the lexical leg alone never sees doc 7
    val (tf, dl) = LLMQueries.bm25Index(docsDf)
    val lex = LLMQueries.bm25Rank(tf, dl, 10)
      .select("qid", "doc_id").as[(Long, Long)].collect().toSet
    assert(!lex.contains((0L, 7L)), s"BM25 unexpectedly scored doc 7: $lex")
    assert(lex.contains((0L, 8L)))

    // the fused hybrid surfaces it through the dense leg (n_sys = 1)
    val fused = LLMQueries.hybridDenseRrfOf(docsDf, emb)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val row7 = fused.find(r => r._1 == 0L && r._3 == 7L)
    assert(row7.nonEmpty, s"dense leg failed to surface doc 7: $fused")
    assert(row7.get._5 == 1L) // exactly one ranker (the dense leg)
    // the lexical hit also survives fusion
    assert(fused.exists(r => r._1 == 0L && r._3 == 8L))
  }

  test("retrieval-quality gate: hybrid beats the blind lexical leg") {
    // the q179 fixture: query doc 0; doc 7 is a synonym page (zero
    // shared terms, near-identical embedding), doc 8 the only lexical
    // hit (weak embedding), docs 9-11 lexical noise with embeddings
    // that outrank doc 8 semantically. Dense truth@3 = {7, 10, 11};
    // BM25 can only ever return doc 8 (the one posting match), so its
    // overlap is 0 — the hybrid's dense leg lifts it strictly above.
    val docsDf = Seq(
      (0L, "automobile insurance quote request"),
      (7L, "car coverage pricing enquiry"),
      (8L, "automobile insurance quote request form online"),
      (9L, "gardening tips for tomato seedlings"),
      (10L, "vehicle protection premium estimate"),
      (11L, "kitchen renovation budget planner")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.05f, 0.0f, 0.1f), 1),
      (7L, Array(0.99f, 0.04f, 0.01f, 0.1f), 1),
      (8L, Array(0.0f, 1.0f, 0.2f, 0.0f), 2),
      (9L, Array(0.1f, 0.0f, 1.0f, 0.0f), 2),
      (10L, Array(0.9f, 0.1f, 0.3f, 0.05f), 1),
      (11L, Array(0.0f, 0.2f, 0.1f, 1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = LLMQueries.retrievalQualityOf(docsDf, emb)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got.keySet ==
      Set("bm25", "dense_ivf", "hybrid_dense", "ql", "rrf"))
    // the gate's headline claim: fusion with a dense leg strictly
    // beats every lexical-only variant on semantic ground truth
    assert(got("hybrid_dense") > got("bm25"),
      s"hybrid ${got("hybrid_dense")} !> bm25 ${got("bm25")}: $got")
    assert(got("hybrid_dense") > got("ql"))
    assert(got("hybrid_dense") > got("rrf"))
    // and the pure dense tier bounds everything lexical from above here
    assert(got("dense_ivf") >= got("hybrid_dense"))
  }

  // --- edit-distance verification (q166) -------------------------------

  test("edit verification keeps copies and drops rotated text that " +
      "shingle-banding proposes") {
    val words = (0 until 30).map(i => f"w$i%02d")
    val a = words.mkString(" ")
    // rotation by half: the shingle BAG barely changes (2 of 28
    // 3-shingles differ) so banding still collides, but the SEQUENCE is
    // maximally displaced — the exact disagreement q166 exists to catch
    val rot = (words.drop(15) ++ words.take(15)).mkString(" ")
    val docsDf = Seq((1L, a), (2L, a), (3L, rot))
      .toDF("doc_id", "text")
    val cands = LLMQueries
      .minhashCandidatesOf(LLMQueries.shingledOf(docsDf))
      .as[(Long, Long)].collect().toSet
    // banding proposes BOTH the true copy and the rotation
    assert(cands.contains((1L, 2L)))
    assert(cands.contains((1L, 3L)) || cands.contains((2L, 3L)),
      s"rotation should band-collide: $cands")
    val verified = LLMQueries.editVerifiedDupsOf(docsDf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // the copy survives with lev 0 / sim 1000; the rotation is dropped
    assert(verified.contains((1L, 2L, 0L, 1000L)))
    assert(verified.forall(v => v._2 != 3L && v._4 >= 550L),
      s"rotated doc must fail edit verification: $verified")
  }

  test("edit similarity is the exact integer floor-division in millis") {
    val rows = LLMQueries.editVerifiedDups(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val prefs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), expr("substring(text, 1, 160)").as("p"))
      .as[(Long, String)].collect().toMap
    rows.foreach { case (da, db, lev, sim) =>
      val glen = math.max(1, math.max(prefs(da).length, prefs(db).length))
      assert(sim == (glen - lev) * 1000 / glen && sim >= 550L)
    }
  }
}
