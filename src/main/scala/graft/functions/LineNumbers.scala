package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global line numbering (S1, /root/reference/README.md:46,57-59:
  * per-line JSONL errors must be addressable by line number).
  *
  * `row_number()` over an un-partitioned window moves the whole dataset to
  * ONE task — the classic single-partition scale-killer (Spark itself warns
  * "No Partition Defined for Window operation"). This helper produces the
  * identical numbering with bounded parallelism:
  *
  *  1. split the key space into `numParts` equal-width buckets between
  *     the observed min/max, FROZEN as literals (one cheap min/max
  *     aggregate pass — cheaper than an approxQuantile summary, and any
  *     consistent cut points give a correct numbering; balance only
  *     affects parallelism, and numeric keys in practice — orderkeys,
  *     timestamps, ids — are uniform enough). Frozen bounds are what make
  *     the multi-pass plan consistent — `repartitionByRange` would
  *     re-SAMPLE its bounds per execution (the sampling seed involves the
  *     RDD id), so the counting pass and the numbering pass could
  *     disagree on partition membership;
  *  2. count rows per bucket — a tiny driver-side metadata action
  *     (`numParts` longs, not data rows);
  *  3. line_no = running offset of the preceding buckets + the
  *     within-bucket row_number, a parallel per-bucket window.
  *
  * Three passes over the (cheap, pruned) input replace one shuffle to a
  * single task: at 100 TB that is the difference between a working job and
  * a one-executor sort. The ordering key must be numeric, non-null, and
  * unique, otherwise the within-bucket tie-break (and so the numbering) is
  * nondeterministic.
  */
object LineNumbers {

  /** Add a 1-based `out` column numbering rows by ascending unique `key`. */
  def byKey(df: DataFrame, key: String, out: String,
      numParts: Int = 32): DataFrame = {
    // 1. frozen bucket boundaries: any consistent cut points work, so
    // equal-width cuts from one min/max aggregate are enough — the values
    // are captured once as literals and shared by every pass
    val bounds: Array[Double] =
      if (numParts <= 1) Array.empty[Double]
      else {
        val row = df.agg(min(col(key)).cast("double"),
          max(col(key)).cast("double")).head()
        if (row.isNullAt(0)) Array.empty[Double]
        else {
          val (lo, hi) = (row.getDouble(0), row.getDouble(1))
          (1 until numParts)
            .map(i => lo + (hi - lo) * i / numParts)
            .distinct.sorted.toArray
        }
      }
    val bucket = bounds.zipWithIndex.reverse.foldLeft(lit(bounds.length)) {
      case (e, (b, i)) => when(col(key) <= b, lit(i)).otherwise(e)
    }
    val withB = df.withColumn("__bucket", bucket)

    // 2. tiny metadata collect: one (bucket, count) row per bucket
    val counts = withB.groupBy(col("__bucket")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, n) =>
      val o = (b, acc); acc += n; o
    }
    // guard the empty-frame case: map() of zero args doesn't type-check
    val offsetMap =
      if (offsets.isEmpty) map(lit(0), lit(0L))
      else map(offsets.flatMap { case (b, off) =>
        Seq(lit(b), lit(off))
      }: _*)

    // 3. per-bucket window (hash-distributed by bucket) + offset
    val w = Window.partitionBy(col("__bucket")).orderBy(col(key))
    withB
      .withColumn(out,
        row_number().over(w).cast("long") +
          coalesce(element_at(offsetMap, col("__bucket")), lit(0L)))
      .drop("__bucket")
  }
}
