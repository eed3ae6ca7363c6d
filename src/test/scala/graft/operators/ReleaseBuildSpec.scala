package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** End-to-end gate for the ReleaseBuild orchestration: artifacts land,
  * each one equals its component operator over the kept frame, the
  * summary reconciles, and a rerun overwrites byte-identically. */
class ReleaseBuildSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) = {
    val d = Files.createTempDirectory(s"graft_release_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("release build: artifacts, operator parity, idempotent rerun") {
    val outDir = tmp("out")
    val summary = ReleaseBuild.run(spark, sfDir, outDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // the kept set IS the funnel's kept disposition on the TRAIN side
    // (the eval holdout must never ship in a release — the q151 rule)
    val disp = CurationQueries.funnelDisposition(spark, sfDir)
      .filter($"doc_id" % 10 =!= 0)
    val wantKept = disp.filter($"disposition" === "kept")
      .select($"doc_id").as[Long].collect().toSet
    val kept = spark.read.parquet(s"$outDir/kept_docs.parquet")
    val keptIds = kept.select($"doc_id").as[Long].collect().toSet
    assert(keptIds == wantKept && keptIds.nonEmpty)
    assert(keptIds.forall(_ % 10 != 0), "an eval doc shipped")
    assert(summary("kept_docs") == wantKept.size.toLong)
    // provenance covers the whole train universe, not just survivors
    assert(summary("disposition") == disp.count())

    // every artifact equals its component operator over the kept frame
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    for ((name, want) <- Seq(
        "packing" -> CurationQueries.packSequencesDocs(kept),
        "manifest" -> CurationQueries.shardManifestDocs(kept),
        "mixture" -> CurationQueries.mixtureRecipeDocs(kept),
        "report_card" -> CurationQueries.sourceReportDocs(kept))) {
      val got = rows(spark.read.parquet(s"$outDir/$name.parquet"))
      assert(got.nonEmpty, s"$name is empty")
      assert(got == rows(want), s"$name diverges from its operator")
      assert(summary(name) == got.size.toLong)
    }

    // bookkeeping landed: one ledger row + one log line per artifact
    val ledger = spark.read.parquet(s"$outDir/ledger")
    assert(ledger.count() == summary.size.toLong)
    assert(ledger.select($"status").distinct().as[String].collect()
      .toSeq == Seq("completed"))
    assert(spark.read.json(s"$outDir/logs").count() == summary.size.toLong)

    // rerun: same inputs, same artifacts (overwrite semantics)
    val before = rows(spark.read.parquet(s"$outDir/manifest.parquet"))
    ReleaseBuild.run(spark, sfDir, outDir)
    assert(rows(spark.read.parquet(s"$outDir/manifest.parquet")) == before)
  }
}
