package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** T5 merge semantics: legal transitions, frozen terminal states, and the
  * at-least-once idempotence the spec's polling loop requires
  * (/root/reference/README.md:84,110 — a re-delivered delta must be a
  * no-op).
  */
class StateMachineSpec extends SparkSpec {
  import spark.implicits._

  private def ledgerOf(rows: (Long, String)*) =
    rows.toDF("job_id", "status")

  private def deltaOf(rows: (Long, String, String)*) =
    rows.toDF("job_id", "new_status", "openai_status")

  private def statusMap(df: org.apache.spark.sql.DataFrame) =
    df.select("job_id", "status").as[(Long, String)].collect().toMap

  test("merge applies a legal transition") {
    val merged = StateMachine.mergeLedger(
      ledgerOf(1L -> "submitted"),
      deltaOf((1L, "processing", "completed")))
    assert(statusMap(merged) == Map(1L -> "processing"))
  }

  test("merge leaves jobs without a delta untouched") {
    val merged = StateMachine.mergeLedger(
      ledgerOf(1L -> "submitted", 2L -> "processing"),
      deltaOf((1L, "failed", "failed")))
    assert(statusMap(merged) == Map(1L -> "failed", 2L -> "processing"))
  }

  test("terminal states are frozen") {
    val merged = StateMachine.mergeLedger(
      ledgerOf(1L -> "completed", 2L -> "failed", 3L -> "cancelled"),
      deltaOf((1L, "processing", "completed"), (2L, "processing", "completed"),
        (3L, "processing", "completed")))
    assert(statusMap(merged) ==
      Map(1L -> "completed", 2L -> "failed", 3L -> "cancelled"))
  }

  test("null new_status (wait branch) is a no-op") {
    val delta = Seq((1L, Option.empty[String], Option("in_progress")))
      .toDF("job_id", "new_status", "openai_status")
    val merged = StateMachine.mergeLedger(ledgerOf(1L -> "submitted"), delta)
    assert(statusMap(merged) == Map(1L -> "submitted"))
  }

  test("merge is idempotent: replaying the same delta changes nothing") {
    val ledger = StateMachine.ledger(spark, sfDir)
    val delta = StateMachine.pollDispatch(spark, sfDir)
    val once = StateMachine.mergeLedger(ledger, delta)
      .select("job_id", "status")
    val twice = StateMachine.mergeLedger(
      StateMachine.mergeLedger(ledger, delta)
        .drop("openai_status"), delta)
      .select("job_id", "status")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("dispatch covers the full openai_status vocabulary") {
    val decisions = StateMachine.pollDispatch(spark, sfDir)
      .select("openai_status", "action").distinct()
      .as[(String, String)].collect().toMap
    assert(decisions == Map(
      "completed" -> "process_results",
      "failed" -> "mark_docs_failed",
      "expired" -> "mark_docs_failed",
      "cancelling" -> "mirror_status",
      "cancelled" -> "mirror_status",
      "in_progress" -> "wait",
      "finalizing" -> "wait"))
  }
}
