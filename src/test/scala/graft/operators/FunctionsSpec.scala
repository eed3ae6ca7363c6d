package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** JSON round-trip property (SURVEY.md §5.2) and window-aggregate
  * conservation checks on the event queries.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def checkProp(prop: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("to_json ∘ from_json is the identity on structured rows") {
    val gen = for {
      id <- Gen.chooseNum(0L, 1000000L)
      name <- Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)
      score <- Gen.chooseNum(-1000, 1000)
    } yield (id, name, score)
    val schema = StructType.fromDDL("id bigint, name string, score int")
    checkProp(Prop.forAll(Gen.listOfN(20, gen)) { rows =>
      val df = rows.toDF("id", "name", "score")
      val round = df
        .select(to_json(struct(col("id"), col("name"), col("score"))).as("j"))
        .select(from_json(col("j"), schema).as("r"))
        .select("r.id", "r.name", "r.score")
      round.exceptAll(df).isEmpty && df.exceptAll(round).isEmpty
    })
  }

  test("tumbling-window counts sum to the total event count") {
    val total = graft.Tables(spark, sfDir, "events").count()
    val windowed = EventQueries.hourlyEvents(spark, sfDir)
      .agg(sum("n")).as[Long].collect().head
    assert(windowed == total)
  }

  test("sliding windows hold each event exactly width/slide times") {
    val total = graft.Tables(spark, sfDir, "events").count()
    val windowed = EventQueries.slidingEventCounts(spark, sfDir)
      .agg(sum("n")).as[Long].collect().head
    assert(windowed == total * 4) // 1h window / 15m slide
  }

  test("session count per user is between 1 and the user's event count") {
    val sessions = EventQueries.userSessions(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    val perUser = graft.Tables(spark, sfDir, "events")
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    sessions.foreach { case (user, nSess, maxEv) =>
      assert(nSess >= 1 && nSess <= perUser(user))
      assert(maxEv >= 1 && maxEv <= perUser(user))
    }
  }

  test("as-of join keeps every purchase exactly once") {
    val purchases = graft.Tables(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    val joined = RelationalQueries.asofViewBeforePurchase(spark, sfDir)
    assert(joined.count() == purchases)
    assert(joined.select("p_id").distinct().count() == purchases)
  }
}
