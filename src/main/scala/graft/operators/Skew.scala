package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4.3, builder prompt "salting for skew").
  *
  * AQE's skew-join splitting handles joins; for aggregations over hot
  * keys, the classic remedy is two-phase salting: phase 1 groups by
  * (key, salt) so a hot key's rows spread over `salts` reducers, phase 2
  * combines the per-salt partials. Correct for any algebraic aggregate;
  * here count + exact-decimal sum (so salting is result-invariant — a
  * double sum would change ulps with the grouping).
  */
object Skew {

  /** Two-phase salted count+sum. `saltSource` must be deterministic per
    * row (e.g. a unique id column) so replays produce identical plans.
    */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
      saltSource: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("pn"),
        sum(value.cast("decimal(18,2)")).as("ps"))
      .groupBy(col("key"))
      .agg(sum(col("pn")).as("n"),
        round(sum(col("ps")).cast("double"), 2).as("total"))
}
