package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the deflate compression ratio of
  * a string: `deflate(text).length / text.utf8Length`, level 6. Highly
  * repetitive text compresses far below ~0.4; near-random text sits close
  * to 1.0 — a standard cheap quality/repetition signal in public
  * training-corpus pipelines, complementary to the exact n-gram metrics
  * of q78 (it catches long-range and fuzzy repetition n-grams miss).
  *
  * No DuckDB twin exists, so the operator is ScalaTest-gated
  * (CompressionRatioSpec: interpreted↔codegen parity, monotonicity on
  * constructed repetitive/random pairs) rather than oracle-paired.
  *
  * Scale shape: per-row, shuffle-free, deterministic (Deflater with
  * fixed level and strategy is bit-stable for a given input). The
  * Deflater is allocated per evaluation — cheap relative to compressing
  * a document, and thread-safe without sharing.
  */
case class CompressionRatio(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "compression_ratio"

  override def nullSafeEval(s: Any): Any =
    CompressionRatio.ratio(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CompressionRatio.ratio($c)")

  override protected def withNewChildInternal(
      newChild: Expression): CompressionRatio = copy(child = newChild)
}

object CompressionRatio {
  /** Shared by interpreted eval and generated code — one implementation,
    * parity by construction (still asserted in the spec). */
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val deflater = new java.util.zip.Deflater(6)
    try {
      deflater.setInput(bytes)
      deflater.finish()
      val buf = new Array[Byte](256)
      var out = 0L
      while (!deflater.finished()) out += deflater.deflate(buf)
      out.toDouble / bytes.length
    } finally deflater.end()
  }

  /** Column-API entry point: `compressionRatio($"text")`. */
  def compressionRatio(c: Column): Column =
    ColumnShim.column(CompressionRatio(ColumnShim.expression(c)))
}
