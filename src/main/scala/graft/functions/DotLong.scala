package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing the exact integer dot product of
  * two `array<bigint>` columns in one fused loop.
  *
  * Contract (shared bit-for-bit with the HOF formulation it replaces —
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, e) -> s + e)` on
  * equal-length arrays — parity-asserted in PqAssignSpec): an exact long
  * sum of element products over min(|a|, |b|) positions; every caller in
  * this codebase zips equal-length fixed-point arrays, where long
  * addition is associative and the two formulations are identical.
  * `dot_long(x, x)` is the exact squared norm — the other hot shape.
  *
  * Why native: the SQ8/RP/IVFPQ scoring scans evaluate a 64-element
  * zipped lambda per (query, doc) PAIR — interpreted lambda invocation
  * plus a zipped-array allocation per row was the quantized tiers'
  * dominant cost (the SignLshKeys rationale, dot flavor).
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

object DotLong {
  /** Column-API entry point: `dotLong($"qv", $"qq")`. */
  def dotLong(a: Column, b: Column): Column =
    ColumnShim.column(DotLong(ColumnShim.expression(a),
      ColumnShim.expression(b)))
}
