package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expression fusing product-quantization code
  * assignment: for each of `subspaces` sub-vectors of the micro-integer
  * vector `mv`, the index of the nearest codebook entry (exact integer
  * L2², lowest-code tie-break) and the total minimal squared error.
  *
  * Contract (shared bit-for-bit with the HOF formulation it replaces —
  * `VectorQueries.pqCodesExpr` / the q178 `rowErr` — and with the DuckDB
  * oracle, parity-asserted in PqAssignSpec): distances are exact longs
  * `Σ_j (mv[s·subDim+j] − cb[s][c][j])²`; ties keep the LOWEST code
  * (strict `<` comparison). Output is
  * `struct<codes: array<int>, sqerr: bigint>`.
  *
  * Why native: the HOF argmin ran subspaces × codes × subDim (= 1024 at
  * the 8×16×8 geometry) interpreted lambda invocations per row — the
  * single hottest expression in the PQ family (encoder, Lloyd trainer
  * rounds, distortion scans all pay it per corpus row). Here it is one
  * codegen loop with zero intermediate allocation; the codebook column
  * (a 1-row broadcast in every caller) is walked once per row via flat
  * ArrayData reads.
  */
case class PqAssign(
    left: Expression,
    right: Expression,
    subspaces: Int,
    subDim: Int,
    codes: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(ArrayType(ArrayType(LongType))))
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("sqerr", LongType, nullable = false)))
  override def prettyName: String = "pq_assign"

  override def nullSafeEval(mvAny: Any, cbAny: Any): Any = {
    val mv = mvAny.asInstanceOf[ArrayData]
    val cb = cbAny.asInstanceOf[ArrayData]
    val out = new Array[Int](subspaces)
    var total = 0L
    var s = 0
    while (s < subspaces) {
      val sub = cb.getArray(s)
      var bestD = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < codes) {
        val cv = sub.getArray(c)
        var d = 0L
        var j = 0
        while (j < subDim) {
          val diff = mv.getLong(s * subDim + j) - cv.getLong(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(s) = bestC
      total += bestD
      s += 1
    }
    InternalRow(new GenericArrayData(out), total)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (mv, cb) => {
      val out = ctx.freshName("out")
      val total = ctx.freshName("total")
      val sub = ctx.freshName("sub")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val cv = ctx.freshName("cv")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      s"""
         |int[] $out = new int[$subspaces];
         |long $total = 0L;
         |for (int $s = 0; $s < $subspaces; $s++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $sub = $cb.getArray($s);
         |  long $bestD = Long.MAX_VALUE;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $codes; $c++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv = $sub.getArray($c);
         |    long $d = 0L;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      long $diff = $mv.getLong($s * $subDim + $j) - $cv.getLong($j);
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $bestC = $c; }
         |  }
         |  $out[$s] = $bestC;
         |  $total += $bestD;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] {
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out),
         |    (Object) $total });
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAssign =
    copy(left = newLeft, right = newRight)
}

object PqAssign {
  /** Column-API entry point: `pqAssign($"mv", $"cb", 8, 8, 16)`. */
  def pqAssign(mv: Column, cb: Column,
      subspaces: Int, subDim: Int, codes: Int): Column =
    ColumnShim.column(PqAssign(ColumnShim.expression(mv),
      ColumnShim.expression(cb), subspaces, subDim, codes))
}
