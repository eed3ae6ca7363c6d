package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class LineNumbersSpec extends SparkSpec {
  import spark.implicits._

  test("numbers rows 1..n in key order across partitions") {
    val keys = Seq(42L, 7L, 1000L, 3L, 99L, 500L, 2L, 64L)
    val df = keys.toDF("k").repartition(5)
    val out = LineNumbers.byKey(df, "k", "line_no", numParts = 3)
      .orderBy("line_no").as[(Long, Long)].collect()
    assert(out.map(_._2).toSeq == (1L to keys.length).toSeq)
    assert(out.map(_._1).toSeq == keys.sorted)
  }

  test("matches a single-partition global row_number") {
    val df = spark.range(1, 1001).toDF("k")
      .withColumn("k", col("k") * 7 % 1009) // unique, shuffled order
      .repartition(8)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("k"))
    val expected = df.withColumn("rn", row_number().over(w).cast("long"))
      .orderBy("k").as[(Long, Long)].collect().toSeq
    val got = LineNumbers.byKey(df, "k", "rn", numParts = 4)
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("empty frame yields empty result, no failure") {
    val df = spark.range(0).toDF("k")
    assert(LineNumbers.byKey(df, "k", "line_no").count() == 0L)
  }

  test("property: numbering is the 1-based rank for any keys/partitioning") {
    val gen = for {
      keys <- Gen.nonEmptyListOf(Gen.chooseNum(-100000L, 100000L))
        .map(_.distinct)
      parts <- Gen.chooseNum(1, 7)
      inputParts <- Gen.chooseNum(1, 5)
    } yield (keys, parts, inputParts)
    val prop = Prop.forAll(gen) { case (keys, parts, inputParts) =>
      val df = keys.toDF("k").repartition(inputParts)
      val got = LineNumbers.byKey(df, "k", "n", parts)
        .as[(Long, Long)].collect().sortBy(_._1)
      val want = keys.sorted.zipWithIndex
        .map { case (k, i) => (k, i + 1L) }
      got.toSeq == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("runs with more partitions than rows") {
    val out = LineNumbers.byKey(Seq(5L, 1L).toDF("k"), "k", "n", numParts = 16)
      .orderBy("n").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L), (5L, 2L)))
  }
}
