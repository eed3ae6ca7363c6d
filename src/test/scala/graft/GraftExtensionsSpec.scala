package graft

/** The extensions entry point must make cosine_sim callable from SQL. */
class GraftExtensionsSpec extends SparkSpec {

  test("cosine_sim registers as a SQL function on a live session") {
    GraftExtensions.registerAll(spark)
    val out = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(2.0D, 0.0D)) AS c")
      .collect().head.getDouble(0)
    assert(out == 1.0)
    // and through the full surface: against the real embeddings table
    Tables(spark, sfDir, "embeddings").limit(5)
      .createOrReplaceTempView("emb5")
    val self = spark.sql(
      """SELECT cosine_sim(transform(embedding, x -> cast(x AS double)),
        |                  transform(embedding, x -> cast(x AS double))) AS c
        |FROM emb5""".stripMargin).collect().map(_.getDouble(0))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-12)) // self-similarity
  }

  test("compression_ratio registers as a SQL function on a live session") {
    GraftExtensions.registerAll(spark)
    val out = spark.sql(
      "SELECT compression_ratio(repeat('abc ', 500)) AS r")
      .collect().head.getDouble(0)
    assert(out > 0.0 && out < 0.1, s"repeat-text ratio $out not << 1")
  }

  test("minhash_band_keys registers as a SQL function on a live session") {
    GraftExtensions.registerAll(spark)
    val keys = spark.sql(
      "SELECT minhash_band_keys(array('a b c', 'b c d'), 8, 2) AS k")
      .collect().head.getSeq[String](0)
    assert(keys.length == 4 &&
      keys.forall(k => k.length == 32 && k.matches("[0-9a-f]+")))
    // non-literal shape params are a clear error, not a mis-plan
    val err = intercept[Exception](spark.sql(
      "SELECT minhash_band_keys(array('a'), cast(rand()*8 AS int), 2)"))
    assert(err.getMessage.contains("minhash_band_keys"))
  }
}
