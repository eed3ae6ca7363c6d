package graft.operators

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}

/** The disk-read daily path must equal the in-memory oracle query for
  * every incremental family — the invariant that makes IndexSoak's
  * measured build/daily split trustworthy (VERDICT r8 "Next round" #1):
  * if a parquet round-trip changed a type or dropped rows, the measured
  * daily leg would be timing a different computation than the one the
  * 90-query oracle suite proves correct.
  */
class IndexStoreSpec extends SparkSpec {

  private lazy val indexDir = {
    val dir = Files.createTempDirectory("graft_index_spec").toFile
    dir.deleteOnExit()
    dir.getAbsolutePath
  }

  for ((family, twin, build, daily) <- IndexStore.families)
    test(s"$family: daily leg off the disk index == $twin") {
      build(spark, sfDir, indexDir)
      val fromDisk = daily(spark, indexDir, sfDir).collect().toSeq
      val inMemory = SparkEntry.queries(twin)(spark, sfDir).collect().toSeq
      assert(fromDisk.nonEmpty, s"$family daily leg returned no rows")
      assert(fromDisk == inMemory)
    }
}
