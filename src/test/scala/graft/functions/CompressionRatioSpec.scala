package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import CompressionRatio.compressionRatio

/** The deflate-ratio quality signal: deterministic, separates repetitive
  * from high-entropy text, and identical with codegen on and off.
  */
class CompressionRatioSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, Seq.fill(200)("the same tokens again").mkString(" ")),
    (2L, new scala.util.Random(3).alphanumeric.take(4000).mkString),
    (3L, ""),
    (4L, graft.Tables(spark, sfDir, "documents")
      .select(col("text")).as[String].head()))
    .toDF("id", "text")

  test("repetitive text compresses far below high-entropy text") {
    val r = docs.select(col("id"), compressionRatio(col("text")))
      .as[(Long, Double)].collect().toMap
    assert(r(1L) < 0.1, s"repetitive doc ratio ${r(1L)} not << 1")
    assert(r(2L) > 0.6, s"random doc ratio ${r(2L)} unexpectedly low")
    assert(r(3L) == 1.0) // empty input: defined as 1.0 (no signal)
    assert(r(4L) > 0.0 && r(4L) < 1.5)
  }

  test("ratio is deterministic across repeated evaluation") {
    val a = docs.select(compressionRatio(col("text"))).as[Double].collect()
    val b = docs.select(compressionRatio(col("text"))).as[Double].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("interpreted mode (codegen off) agrees with codegen") {
    val before = spark.conf.getOption("spark.sql.codegen.wholeStage")
    try {
      val on = docs.select(compressionRatio(col("text"))).as[Double]
        .collect()
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val off = docs.select(compressionRatio(col("text"))).as[Double]
        .collect()
      assert(on.toSeq == off.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage",
        before.getOrElse("true"))
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
