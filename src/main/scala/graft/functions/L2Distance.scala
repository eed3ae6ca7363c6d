package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression computing the SQUARED L2 distance of two
  * `array<double>` vectors in one fused loop — the centroid-assignment
  * kernel of the nearest-centroid classifier and the IVF coarse quantizer
  * (L4/L3b, SURVEY.md §2.9).
  *
  * Same custom-operator tier as [[CosineSimilarity]] (SURVEY.md §2.11):
  * the `aggregate(zip_with(...))` higher-order formulation allocates a
  * zipped array plus accumulator closures per row; this compiles into the
  * whole-stage-codegen loop body. Squared distance (no sqrt) keeps the
  * argmin ordering identical while saving the root — and matches the
  * accumulate-left-to-right double semantics of the HOF path bit-for-bit
  * (asserted in CosineSimilaritySpec).
  */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // Seq[ArrayType] <: Seq[AbstractDataType]; the supertype is private[sql]
  // in Spark 4 so the type is inferred rather than named
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Distance =
    copy(left = newLeft, right = newRight)
}

object L2Distance {
  /** Column-API entry point: `l2Sq($"v", $"c")`. */
  def l2Sq(a: Column, b: Column): Column =
    ColumnShim.column(
      L2Distance(ColumnShim.expression(a), ColumnShim.expression(b)))
}
