package graft

import org.apache.spark.sql.{Column, Dataset}

/** Scale-adaptive exchange sizing (optimization round 16; guide §2.2 and
  * §2.5, VERDICT r15 "Next round" #7).
  *
  * Query paths used to pin their explicit repartitions to
  * `spark.sql.shuffle.partitions` (= `SPARK_GRAFT_CPUS` under the bench
  * harness): `repartition(numShufflePartitions, keys...)`. That constant
  * is a CLUSTER-width knob, and pinning it has two scale problems:
  *
  *  - an explicit count plans the exchange as `REPARTITION_BY_NUM`,
  *    which AQE partition coalescing must respect — so a 2 MB frame at
  *    bench scale runs 32-task stages from that exchange all the way to
  *    the next coalescable shuffle. Measured across the whole suite at
  *    sf0.1: 1221 executor-CPU-s at 32 cores vs 259 at 8 cores for the
  *    SAME work (BENCH_r15 vs BENCH_r15_c8) — i.e. ~85% of measured CPU
  *    was per-task fixed overhead proportional to the pinned width, and
  *    8 cores beat 32 on wall (165 s vs 224 s). Tiny partitions are pure
  *    scheduling overhead (guide §2.2).
  *  - at 100 TB the same constant is too SMALL unless the deployment
  *    remembers to raise `shuffle.partitions`; either way the data
  *    volume never participated in the choice.
  *
  * [[byKey]] keeps the exchange (consumers still rely on one
  * materialized, reusable hash exchange — the ReusedExchange sharing
  * the original repartitions were added for) but drops the pinned
  * width: a key-only repartition plans as `REPARTITION_BY_COL`, whose
  * width AQE sizes from the OBSERVED shuffle bytes
  * (`spark.sql.adaptive.coalescePartitions.*`: ~1 MB minimum partition
  * size with parallelism-first targeting). Bench scale coalesces to a
  * few right-sized tasks; a 100 TB shuffle keeps
  * `spark.sql.shuffle.partitions` worth of width because the bytes
  * demand it. Same rows, same results — only the task count adapts.
  *
  * Where a downstream stage is CPU-bound rather than byte-bound (heavy
  * per-row lambdas over few bytes), byte-driven coalescing can
  * under-parallelize; those sites may keep an explicit width and say
  * why. Every other query-path repartition routes through here.
  */
object Scale {
  /** Hash-partitioned exchange whose width AQE right-sizes from runtime
    * byte counts (REPARTITION_BY_COL — coalescable, reusable). Typed so
    * the media decode paths' Dataset[MediaRow] flows keep their type. */
  def byKey[T](ds: Dataset[T], keys: Column*): Dataset[T] =
    ds.repartition(keys: _*)
}
