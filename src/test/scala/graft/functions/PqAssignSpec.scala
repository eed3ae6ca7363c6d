package graft.functions

import graft.SparkSpec
import graft.functions.PqAssign.pqAssign
import org.apache.spark.sql.functions._

/** The native fused PQ assignment must agree BIT-EXACTLY with the
  * higher-order-function formulation it replaced (the
  * `VectorQueries.pqCodesExpr` argmin and the q178 per-row min-error
  * sum), including under whole-stage codegen and in interpreted mode —
  * the oracle replays the HOF semantics, so any drift here is a
  * CORRECTNESS failure waiting at the next SF.
  */
class PqAssignSpec extends SparkSpec {
  import spark.implicits._

  private val S = 8  // subspaces
  private val D = 8  // sub-dimension
  private val K = 16 // codebook entries per subspace

  /** Micro-integer vectors from the testdata embeddings (the exact
    * domain the PQ family runs in), plus the seeded codebook built the
    * q117 way so ties and near-ties occur naturally. */
  private lazy val micro = graft.Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"),
      expr("transform(embedding, x -> cast(round(x * 1e6) as bigint))")
        .as("mv"))

  private lazy val cbRow = micro.orderBy(col("vec_id")).limit(K)
    .groupBy()
    .agg(sort_array(collect_list(struct(col("vec_id"), col("mv"))))
      .as("sa"))
    .select(expr(
      s"transform(sequence(0, ${S - 1}), s -> " +
        s"transform(sa, p -> slice(p.mv, s * $D + 1, $D)))").as("cb"))

  private lazy val joined = micro.crossJoin(broadcast(cbRow))

  private val hofCodes = {
    val dist =
      s"aggregate(sequence(0, ${D - 1}), 0L," +
        s" (a, j) -> a + (mv[s * $D + j] - cb[s][c][j])" +
        s" * (mv[s * $D + j] - cb[s][c][j]))"
    expr(
      s"transform(sequence(0, ${S - 1}), s -> " +
        s"array_min(transform(sequence(0, ${K - 1}), c -> " +
        s"named_struct('d', $dist, 'c', c))).c)")
  }

  private val hofSqerr = {
    val dist =
      s"aggregate(sequence(0, ${D - 1}), 0L," +
        s" (a, j) -> a + (mv[s * $D + j] - cb[s][c][j])" +
        s" * (mv[s * $D + j] - cb[s][c][j]))"
    expr(
      s"aggregate(transform(sequence(0, ${S - 1}), s -> " +
        s"array_min(transform(sequence(0, ${K - 1}), c -> $dist))" +
        "), 0L, (a, x) -> a + x)")
  }

  private def nativeCol = pqAssign(col("mv"), col("cb"), S, D, K)

  test("native codes match the HOF argmin (incl. lowest-code ties)") {
    val diff = joined
      .select(nativeCol.getField("codes").as("native"),
        hofCodes.as("hof"))
      .filter(expr("to_json(native) <> to_json(hof)"))
    assert(diff.count() == 0)
  }

  test("native sqerr matches the HOF min-distance sum") {
    val diff = joined
      .select(nativeCol.getField("sqerr").as("native"), hofSqerr.as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("tie-break keeps the LOWEST code: duplicate codebook entries") {
    // a codebook whose entries 0..K-1 are ALL identical → every subspace
    // distance ties → code 0 must win everywhere, sqerr = S × d(sub, e0)
    val dup = Seq((0L, (0 until S * D).map(_.toLong + 1).toArray))
      .toDF("vec_id", "mv")
      .withColumn("cb", expr(
        s"transform(sequence(0, ${S - 1}), s -> " +
          s"transform(sequence(0, ${K - 1}), c -> " +
          s"transform(sequence(0, ${D - 1}), j -> 0L)))"))
    val out = dup.select(nativeCol.as("a")).select(
      col("a.codes"), col("a.sqerr")).collect().head
    assert(out.getSeq[Int](0) == Seq.fill(S)(0))
    val expected = (0 until S * D).map(j => (j + 1L) * (j + 1L)).sum
    assert(out.getLong(1) == expected)
  }

  test("dot_long matches the HOF zip_with dot and the x*x norm") {
    import graft.functions.DotLong.dotLong
    val paired = micro.as("a")
      .join(micro.as("b"), col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.mv").as("x"), col("b.mv").as("y"))
    val hofDot = expr(
      "aggregate(zip_with(x, y, (p, q) -> p * q), 0L, (s, e) -> s + e)")
    val hofNorm = expr("aggregate(x, 0L, (a, e) -> a + e * e)")
    val diff = paired.select(
        dotLong(col("x"), col("y")).as("nd"), hofDot.as("hd"),
        dotLong(col("x"), col("x")).as("nn"), hofNorm.as("hn"))
      .filter(col("nd") =!= col("hd") || col("nn") =!= col("hn"))
    assert(diff.count() == 0)
  }

  test("dot_long interpreted mode agrees with codegen") {
    import graft.functions.DotLong.dotLong
    val before = spark.conf.getOption("spark.sql.codegen.wholeStage")
    try {
      val df = micro.select(col("vec_id"),
        dotLong(col("mv"), col("mv")).as("n"))
      val on = df.orderBy(col("vec_id")).as[(Long, Long)].collect().toSeq
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val off = df.orderBy(col("vec_id")).as[(Long, Long)].collect().toSeq
      assert(on == off)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage",
        before.getOrElse("true"))
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("interpreted mode (codegen off) agrees with codegen") {
    val before = spark.conf.getOption("spark.sql.codegen.wholeStage")
    try {
      val on = joined.select(col("vec_id"), nativeCol.as("a"))
        .select(col("vec_id"), col("a.codes"), col("a.sqerr"))
        .orderBy(col("vec_id")).collect().toSeq
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val off = joined.select(col("vec_id"), nativeCol.as("a"))
        .select(col("vec_id"), col("a.codes"), col("a.sqerr"))
        .orderBy(col("vec_id")).collect().toSeq
      assert(on.map(_.toString) == off.map(_.toString))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage",
        before.getOrElse("true"))
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
