package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing ALL MinHash LSH band keys of a
  * shingle-set `array<string>` in one fused pass.
  *
  * Contract (bit-identical to the HOF formulation it replaces, and to the
  * DuckDB oracle — asserted in MinHashSigSpec): signature slot j is
  * `min over shingles s of substring(md5(concat('j:', s)), 1, 16)` and
  * band b's key is the concatenation of slots `b·rowsPerBand ..
  * (b+1)·rowsPerBand - 1`. A 16-lowercase-hex-char prefix of an md5
  * compares lexicographically exactly like the UNSIGNED 64-bit integer
  * of the digest's first 8 bytes, so the fused loop keeps one long per
  * slot (`Long.compareUnsigned` min) and renders hex only once per
  * document at the end — no per-shingle concat / hex-string / substring
  * allocations, and one shared MessageDigest instead of one md5 call
  * object per (seed, shingle).
  *
  * Input rows whose shingle array is empty yield NULL (as `array_min`
  * over an empty transform does), keeping the "docs with < 3 words are
  * out of near-dup scope" contract of the caller.
  */
case class MinHashBandKeys(
    child: Expression,
    numHashes: Int,
    rowsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {

  // checked BEFORE the modulo: rowsPerBand=0 would otherwise surface as a
  // bare ArithmeticException instead of the intended argument error
  require(rowsPerBand > 0, s"rowsPerBand=$rowsPerBand must be positive")
  require(numHashes % rowsPerBand == 0,
    s"numHashes=$numHashes must be a multiple of rowsPerBand=$rowsPerBand")
  // the seed prefix is rendered as at most two decimal digits; a silent
  // wrong-prefix digest for j >= 100 would break the md5('j:'||s) contract
  require(numHashes <= 99, s"numHashes=$numHashes exceeds the supported 99")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"
  override def nullable: Boolean = true

  // empty shingle set → null result, so eval must see it (no nullSafeEval
  // shortcut semantics change; we just return null from the helper)
  override def nullSafeEval(input: Any): Any =
    MinHashBandKeys.kernel(
      input.asInstanceOf[ArrayData], numHashes, rowsPerBand)

  // the kernel must NOT be named `eval`: the class inherits
  // Expression.eval, which suppresses the Scala static forwarder for a
  // same-named companion method — Janino then resolves the call to the
  // inherited instance method, the whole-stage compile fails, and every
  // stage containing this expression silently falls back to the
  // non-codegen path (observed as ERROR CodeGenerator on q64/q127)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData)
         |  graft.functions.MinHashBandKeys.kernel($v, $numHashes, $rowsPerBand);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

object MinHashBandKeys {

  // MessageDigest is not thread-safe; tasks share the JVM in local mode
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Shared interpreted/codegen kernel. Returns null for an empty set —
    * and null ELEMENTS are skipped, matching the HOF formulation it
    * replaced (md5(concat('j:', null)) is null and array_min ignores
    * nulls), so an all-null set also returns null. */
  def kernel(v: ArrayData, numHashes: Int, rowsPerBand: Int): GenericArrayData = {
    val n = v.numElements()
    val digest = md5.get()
    // per-slot minima as unsigned longs of the digest's first 8 bytes
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, -1L) // 0xffff… = unsigned max
    var seen = 0
    var i = 0
    while (i < n) {
      val u = v.getUTF8String(i)
      if (u == null) { i += 1 }
      else {
      seen += 1
      val s = u.getBytes
      var j = 0
      while (j < numHashes) {
        digest.reset()
        // concat('j:', s) without building the string: seed digits + ':'
        if (j >= 10) digest.update(('0' + j / 10).toByte)
        digest.update(('0' + j % 10).toByte)
        digest.update(':'.toByte)
        digest.update(s)
        val d = digest.digest()
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        if (java.lang.Long.compareUnsigned(h, mins(j)) < 0) mins(j) = h
        j += 1
      }
      i += 1
      }
    }
    if (seen == 0) return null
    val nBands = numHashes / rowsPerBand
    val keys = new Array[AnyRef](nBands)
    val chars = new Array[Char](16 * rowsPerBand)
    var band = 0
    while (band < nBands) {
      var r = 0
      while (r < rowsPerBand) {
        val h = mins(band * rowsPerBand + r)
        var c = 0
        while (c < 16) {
          chars(r * 16 + c) = hexDigits(((h >>> ((15 - c) * 4)) & 0xfL).toInt)
          c += 1
        }
        r += 1
      }
      keys(band) = UTF8String.fromString(new String(chars))
      band += 1
    }
    new GenericArrayData(keys)
  }

  /** Column-API entry point: `minhashBandKeys($"sh", 8, 2)`. */
  def minhashBandKeys(sh: Column, numHashes: Int, rowsPerBand: Int): Column =
    ColumnShim.column(
      MinHashBandKeys(ColumnShim.expression(sh), numHashes, rowsPerBand))
}
