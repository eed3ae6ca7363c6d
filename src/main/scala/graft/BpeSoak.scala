package graft

/** Prices the q108 BPE merge-training loop at REALISTIC merge counts
  * (VERDICT r10 "Next round" #6: the loop is proven at 4 merges and its
  * "nothing is corpus-sized after the word count" claim was an argument
  * — this measures it). For each requested round count R the full
  * training runs once and its wall/CPU line prints; differencing
  * consecutive lines gives the per-round cost, which must stay flat
  * (vocabulary-bounded) while only the round-0 word count scales with
  * the corpus. Run at two factors to see both axes.
  *
  * The loop's pair space can EXHAUST on a bounded-vocabulary corpus
  * (every word fully merged); training is then a fixed point (the left
  * join in bpeLoop) and the printed effective-merge count stops
  * growing — also a measurement, not an error.
  *
  * Usage: tools/run.sh graft.BpeSoak <sfDir> <workDir> <factor> [R...]
  * (default rounds 4 64 256). Corpus replica reused if present.
  */
object BpeSoak {
  def main(args: Array[String]): Unit = {
    val (fixed, rest) = args.splitAt(3)
    val Array(sfDir, workDir, factorS) = fixed
    val factor = factorS.toInt
    val rounds = if (rest.isEmpty) Seq(4, 64, 256) else rest.map(_.toInt).toSeq
    val spark = Soak.session()
    val parts = spark.sessionState.conf.numShufflePartitions

    val dataDir = s"$workDir/data"
    Soak.ensureCorpus(spark, sfDir, dataDir, factor, parts)
    // the synthetic testdata carries only ~30 distinct multi-char words
    // — its pair space exhausts after ~70 merges, long before a
    // realistic merge count. Widen the vocabulary adversarially (the
    // ensureCorpus convention): each word becomes an 8-hex-char token
    // salted by (word, doc_id % 997) — ~30k distinct words over a
    // 16-char alphabet, the shape real subword statistics have. The
    // corpus-side word count still scales with the corpus; only the
    // vocabulary the per-round cost is claimed to be bounded by grows
    // to a realistic size.
    val docs = Tables(spark, dataDir, "documents")
      .selectExpr("doc_id",
        "array_join(transform(split(text, '\\\\s+'), w -> " +
          "substring(md5(concat(w, '_', cast(doc_id % 997 as string)))," +
          " 1, 8)), ' ') AS text")

    val cpuNs = Timing.cpuCounter(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT warm
    for (r <- rounds)
      Timing.timedPasses(spark, cpuNs, s"[bpe-soak] rounds=$r",
        passes = 1) {
        // one action: train + the symbol/vocab sizes (symbol total
        // shrinking by ~1 per effective merge shows where/whether the
        // pair space exhausted)
        val m = operators.LLMQueries.bpeVocabAfter(docs, r)
          .selectExpr("sum(size(s)) AS symbols", "count(*) AS words")
          .head()
        println(s"[bpe-soak] rounds=$r symbols=${m.getLong(0)} " +
          s"vocab_words=${m.getLong(1)}")
        m.getLong(1)
      }
    spark.stop()
  }
}
