package graft.operators

import graft.SparkSpec

/** Unit checks on the flagship result-processing and ingest-validation
  * pipelines (/root/reference/README.md:55-67, 93-102), driven through the
  * real query entry points on sf0.001.
  */
class SpecPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val flagship =
    SpecPipeline.flagshipResults(spark, sfDir)
      .as[(String, String, Long, Option[String], Option[Double])]
      .collect()
      .map(r => r._1 -> r).toMap

  private def key(k: Long) = s"order-$k"

  test("error lines mark the target failed and leave the array alone") {
    // k=13: error line (%13), no seed (%5)
    val (_, status, n, _, _) = flagship(key(13))
    assert(status == "failed" && n == 0)
  }

  test("schema-invalid content (missing category) fails without append") {
    // k=7: response, category omitted (%7), no seed
    val (_, status, n, _, _) = flagship(key(7))
    assert(status == "failed" && n == 0)
  }

  test("confidence out of [0,1] fails validation") {
    // k=999: %9==0 so confidence = 999/1000 + 0.5 > 1; not %13, not %7
    val (_, status, _, _, _) = flagship(key(999))
    assert(status == "failed")
  }

  test("valid content appends {event_response, updated} and completes") {
    // k=1: response, category present, confidence 0.001, no seed
    val (_, status, n, cat, conf) = flagship(key(1))
    assert(status == "completed" && n == 1)
    assert(cat.contains("not specified")) // o_orderkey 1 is '4-NOT SPECIFIED'
    assert(conf.contains(0.001))
  }

  test("append preserves pre-existing array entries") {
    // k=10: seed (%5) and error-free valid? 10%7=3 so category present,
    // 10%9=1 so confidence=0.01, 10%13=10 → valid ⇒ seed + new = 2
    val (_, status, n, _, _) = flagship(key(10))
    assert(status == "completed" && n == 2)
    // k=65: %5 seed, %13==0 error ⇒ failed, array stays at the seed
    val (_, s65, n65, cat65, _) = flagship(key(65))
    assert(s65 == "failed" && n65 == 1 && cat65.contains("seed"))
  }

  test("ingest validation applies one error per line with precedence") {
    val errs = SpecPipeline.ingestValidation(spark, sfDir)
      .as[(Long, String, Option[String])].collect()
    // no line is reported twice
    assert(errs.map(_._1).distinct.length == errs.length)
    val types = errs.groupBy(_._2).view.mapValues(_.length).toMap
    assert(types.keySet == Set(
      "jsonl_format_error", "model_mismatch", "custom_id_not_found"))
    // malformed lines (k % 101 == 0) never leak a custom_id
    assert(errs.filter(_._2 == "jsonl_format_error").forall(e =>
      e._3.isEmpty || e._3.exists(_.startsWith("order-"))))
  }

  test("observed ingest collects quality counters in the same pass") {
    val (out, obs) = SpecPipeline.observedIngest(spark, sfDir)
    val rows = out.collect() // one action drives both result and metrics
    val m = obs.get
    assert(m("n_error_lines") == rows.length.toLong)
    val byType = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(m("n_format_errors") == byType("jsonl_format_error").toLong)
    assert(m("n_model_mismatch") == byType("model_mismatch").toLong)
    assert(m("n_unknown_ids") == byType("custom_id_not_found").toLong)
  }
}
