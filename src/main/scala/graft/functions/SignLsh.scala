package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing ALL sign-LSH band keys of an
  * `array<double>` vector in one fused loop.
  *
  * Contract (shared bit-for-bit with the DuckDB oracle and the
  * higher-order formulation it replaces, see SignLshSpec): bit p is
  * `Σ_d round(v[d]·1e9)·w[p][d] ≥ 0` in exact fixed-point longs, where
  * `round` is HALF_UP (away from zero) — Spark's `round()` semantics,
  * NOT Java's `Math.round` (which rounds -2.5 to -2, HALF_UP to -3).
  * Consecutive groups of [[planesPerBand]] bits concatenate into one
  * '0'/'1' key string per band.
  *
  * Why native: the HOF formulation ran 24 `aggregate(zip_with(...))`
  * expressions per row — 24 zipped-array allocations + interpreted
  * lambda calls. Here the 24×64 multiply-accumulate runs as one codegen
  * loop with zero intermediate allocation, and the rounding of each
  * component happens ONCE instead of once per plane.
  */
case class SignLshKeys(
    child: Expression,
    planes: Seq[Seq[Int]],
    planesPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "sign_lsh_keys"

  // flat [planes × dim] matrix: cheap to address from generated code
  @transient private lazy val flat: Array[Long] = planes.flatten.map(_.toLong).toArray
  @transient private lazy val dim: Int = planes.head.length
  @transient private lazy val nBands: Int = planes.length / planesPerBand

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val fixed = new Array[Long](n)
    var d = 0
    while (d < n) { fixed(d) = SignLshKeys.halfUp(v.getDouble(d)); d += 1 }
    val keys = new Array[AnyRef](nBands)
    var b = 0
    while (b < nBands) {
      val bits = new Array[Char](planesPerBand)
      var i = 0
      while (i < planesPerBand) {
        val p = b * planesPerBand + i
        var s = 0L
        var d2 = 0
        while (d2 < n) { s += fixed(d2) * flat(p * dim + d2); d2 += 1 }
        bits(i) = if (s >= 0L) '1' else '0'
        i += 1
      }
      keys(b) = UTF8String.fromString(new String(bits))
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pl = ctx.addReferenceObj("signLshPlanes", flat, "long[]")
      val n = ctx.freshName("n")
      val fixed = ctx.freshName("fixed")
      val keys = ctx.freshName("keys")
      val bits = ctx.freshName("bits")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long[] $fixed = new long[$n];
         |for (int $d = 0; $d < $n; $d++) {
         |  $fixed[$d] = graft.functions.SignLshKeys.halfUp($v.getDouble($d));
         |}
         |Object[] $keys = new Object[$nBands];
         |for (int $b = 0; $b < $nBands; $b++) {
         |  char[] $bits = new char[$planesPerBand];
         |  for (int $i = 0; $i < $planesPerBand; $i++) {
         |    int $p = $b * $planesPerBand + $i;
         |    long $s = 0L;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $s += $fixed[$d] * $pl[$p * $dim + $d];
         |    }
         |    $bits[$i] = $s >= 0L ? '1' : '0';
         |  }
         |  $keys[$b] = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    new String($bits));
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignLshKeys =
    copy(child = newChild)
}

object SignLshKeys {
  /** `cast(round(x·1e9) as bigint)` with exactly Spark's `round()`
    * semantics: Spark's RoundBase goes through `BigDecimal.valueOf`
    * (the double's SHORTEST decimal form) with HALF_UP — a floor(|y|+0.5)
    * approximation can round up across a .5 boundary the decimal form
    * sits just below, and Java's `Math.round` rounds -2.5 to -2 where
    * HALF_UP gives -3. Bit-parity with the HOF formulation (and the
    * oracle) is the whole contract, so replicate the BigDecimal path. */
  def halfUp(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1e9)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Column-API entry point: `signLshKeys($"v", planes, 6)`. */
  def signLshKeys(v: Column, planes: Seq[Seq[Int]], planesPerBand: Int): Column =
    ColumnShim.column(
      SignLshKeys(ColumnShim.expression(v), planes, planesPerBand))
}
