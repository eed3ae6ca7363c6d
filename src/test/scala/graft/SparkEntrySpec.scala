package graft

import graft.operators._

/** Driver-contract consistency: the query registry is assembled by
  * ListMap concatenation across ten modules, where a duplicate name would
  * SILENTLY overwrite an earlier query and shrink the correctness gate.
  */
class SparkEntrySpec extends SparkSpec {

  private val moduleSizes = Seq(
    RelationalQueries.queries.size, SpecPipeline.queries.size,
    StateMachine.queries.size, WindowQueries.queries.size,
    AggQueries.queries.size, SetOpQueries.queries.size,
    FunctionQueries.queries.size, LLMQueries.queries.size,
    CurationQueries.queries.size,
    VectorQueries.queries.size, EventQueries.queries.size,
    14) // q72 + q109/q111/q130 phash + q118/q183 frames + q126/q128
  //    audio + q180 media clusters + q184 band occupancy + q187 cap
  //    curve + q190 canonical media pairs + q193 asset disposition +
  //    q195 cross-modal paired curation
  // (q133-q135 live inside Curation/LLM/Vector module maps)

  test("no query name collides across modules") {
    assert(SparkEntry.queries.size == moduleSizes.sum,
      "a duplicate query name silently dropped an entry")
  }

  test("every oracle key pairs with a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("every query is oracle-paired") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without an oracle: $rowsOnly")
  }

  test("entry (driver smoke) returns rows at the smallest sf") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
