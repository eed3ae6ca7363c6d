package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Shared-intermediate materialization policy (round 16, VERDICT r15
  * "Next round" #8 / "What's wrong" #2).
  *
  * Query paths materialize a subtree consumed by several legs so
  * Catalyst's inability to share differently-filtered consumers (and
  * concurrent broadcast builds racing over one lazy frame) never
  * re-runs it. The mechanism used everywhere was `localCheckpoint`,
  * which is the right LOCAL-mode tool (cheap, truncates the lineage so
  * plan audits stay readable) but is not scale-safe as a default: it
  * pins UNREPLICATED blocks on executors, so on a multi-executor
  * deployment losing one executor after the checkpoint fails the query
  * with no recompute path — a reliability cliff under spot/preemptible
  * capacity (guide §5).
  *
  * This helper is the ONE home for that policy:
  *  - default (`spark.graft.materialize` unset or `local`):
  *    `localCheckpoint`, exactly the previous behavior — plans, bench
  *    numbers and the driver contract are unchanged;
  *  - `spark.graft.materialize=persist`: `persist(MEMORY_AND_DISK)`,
  *    the recomputable form for cluster deployments — a lost block is
  *    recomputed from lineage instead of failing the query. The trade
  *    is that lineage is NOT truncated, so pathologically deep plans
  *    (the iterative loops cap their depth themselves) pay analysis
  *    cost, and a re-run subtree is recomputed, not read.
  *
  * [[shared]] is lazy (materializes at first action — construction and
  * explain-only plan audits stay free); [[now]] is eager, for frames
  * that feed several BROADCAST builds on concurrent threads, where jobs
  * racing over a lazy frame each recompute it (the AnnFrames seal
  * rationale, VERDICT r11 #2) — under `persist` the block manager's
  * per-partition locking already serializes racing computes, and the
  * count() just front-loads the work.
  */
object Materialize {
  private def reliable(ds: Dataset[_]): Boolean =
    ds.sparkSession.conf.getOption("spark.graft.materialize")
      .exists(_.equalsIgnoreCase("persist"))

  /** Lazily-materialized shared intermediate (one compute, N readers). */
  def shared[T](ds: Dataset[T]): Dataset[T] =
    if (reliable(ds)) ds.persist(StorageLevel.MEMORY_AND_DISK)
    else ds.localCheckpoint(eager = false)

  /** Eagerly-materialized shared intermediate — for frames feeding
    * concurrent broadcast builds (see scaladoc above). Runs a job at
    * construction time by design. */
  def now[T](ds: Dataset[T]): Dataset[T] =
    if (reliable(ds)) {
      val p = ds.persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    } else ds.localCheckpoint(eager = true)
}
