package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType
import graft.functions.{CompressionRatio, CosineSimilarity, L2Distance, MinHashBandKeys}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions. Two attachment paths:
  *
  *  - build time: `SparkSession.builder.withExtensions(new GraftExtensions)`
  *    or `spark.sql.extensions=graft.GraftExtensions`;
  *  - live session: `GraftExtensions.registerAll(spark)` (extensions are
  *    consumed only at session build, so an already-running session needs
  *    direct registry registration).
  *
  * After either, `SELECT cosine_sim(a, b)`, `SELECT l2_sq(a, b)`, and
  * `SELECT compression_ratio(text)` work from plain SQL — the extension wiring of SURVEY.md §2.11; no custom
  * plan rules are injected (§4.2: Catalyst's built-ins cover every rewrite
  * this engine needs).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private val cosineSimFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    new FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => CosineSimilarity(a, b)
      case _ => throw new IllegalArgumentException(
        "cosine_sim expects exactly 2 arguments")
    })

  private val l2SqFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    new FunctionIdentifier("l2_sq"),
    new ExpressionInfo(classOf[L2Distance].getName, "l2_sq"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => L2Distance(a, b)
      case _ => throw new IllegalArgumentException(
        "l2_sq expects exactly 2 arguments")
    })

  private val compressionRatioFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    new FunctionIdentifier("compression_ratio"),
    new ExpressionInfo(classOf[CompressionRatio].getName,
      "compression_ratio"),
    (children: Seq[Expression]) => children match {
      case Seq(c) => CompressionRatio(c)
      case _ => throw new IllegalArgumentException(
        "compression_ratio expects exactly 1 argument")
    })

  private val minhashBandKeysFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    new FunctionIdentifier("minhash_band_keys"),
    new ExpressionInfo(classOf[MinHashBandKeys].getName,
      "minhash_band_keys"),
    (children: Seq[Expression]) => children match {
      case Seq(sh, Literal(n: Int, IntegerType), Literal(r: Int, IntegerType)) =>
        MinHashBandKeys(sh, n, r)
      case _ => throw new IllegalArgumentException(
        "minhash_band_keys expects (array<string>, int literal numHashes, " +
          "int literal rowsPerBand)")
    })

  private val functions =
    Seq(cosineSimFunction, l2SqFunction, compressionRatioFunction,
      minhashBandKeysFunction)

  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      ColumnShim.registerFunction(spark, ident, info, builder)
    }
}
