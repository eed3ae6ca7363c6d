package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-point partial sum for a float vector: per-dimension sums of
  * round(x * 1e9) as longs, plus the row count. Long addition is exact and
  * commutative, so the aggregation result is independent of partition
  * order — the property that makes a float-vector centroid reproducible
  * across engines and across runs (SURVEY.md §7.4 determinism).
  */
case class VecSum(sums: Array[Long], n: Long)

/** A9 (SURVEY.md §2.4): custom typed `Aggregator` computing the
  * per-dimension mean of an `array<float>` embedding column — the centroid
  * used by the nearest-centroid classifier (L4, §2.9).
  *
  * Scale posture: the buffer is one long[dim] per group per partition;
  * partial aggregation (map-side combine) applies exactly as for built-in
  * aggregates, so a 100 TB groupBy(label) shuffles only |labels| × dim
  * longs per map task.
  */
object CentroidAggregator extends Aggregator[Array[Float], VecSum, Array[Double]] {
  private val Scale = 1e9

  /** Round half away from zero — the same rule as SQL round() in Spark and
    * DuckDB, so the oracle can reproduce the fixed-point conversion.
    */
  private def halfUp(x: Double): Long =
    (math.signum(x) * math.floor(math.abs(x) + 0.5)).toLong

  override def zero: VecSum = VecSum(Array.emptyLongArray, 0L)

  override def reduce(b: VecSum, a: Array[Float]): VecSum = {
    val s = if (b.sums.isEmpty) new Array[Long](a.length) else b.sums
    var i = 0
    while (i < a.length) { s(i) += halfUp(a(i).toDouble * Scale); i += 1 }
    VecSum(s, b.n + 1)
  }

  override def merge(x: VecSum, y: VecSum): VecSum = {
    if (x.sums.isEmpty) y
    else if (y.sums.isEmpty) x
    else {
      val s = x.sums.clone()
      var i = 0
      while (i < s.length) { s(i) += y.sums(i); i += 1 }
      VecSum(s, x.n + y.n)
    }
  }

  override def finish(r: VecSum): Array[Double] =
    r.sums.map(s => s.toDouble / Scale / r.n)

  override def bufferEncoder: Encoder[VecSum] = Encoders.product[VecSum]
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
