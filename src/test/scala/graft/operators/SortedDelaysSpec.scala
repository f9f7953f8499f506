package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{BadRequestException, TestSpark}

class SortedDelaysSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Mirrors FIXTURES.md trains.csv: two delay columns, nulls present, plus
  // a case-sensitivity trap column "Delay".
  private lazy val trains = Seq(
    ("ICE 1", Some(5), Some(10), 1),
    ("ICE 2", None, Some(3), 2),
    ("ICE 3", Some(-2), None, 3),
    ("ICE 4", Some(5), Some(1), 4)
  ).toDF("train_id", "departure_delay", "arrival_delay", "Delay")

  test("column discovery is case-sensitive substring match (main.rs:272)") {
    assert(SortedDelays.matchingColumns(trains) ===
      Seq("departure_delay", "arrival_delay"))
  }

  test("no matching column → BadRequest (main.rs:271-274)") {
    val df = Seq((1, 2)).toDF("a", "b")
    assertThrows[BadRequestException](SortedDelays.run(df))
  }

  test("ascending sort puts nulls first (polars nulls_last=false default)") {
    val ids = SortedDelays.run(trains, Some(SortedDelays.Asc))
      .select("train_id").as[String].collect().toSeq
    // null departure_delay first; then -2; then the 5s tie-broken by
    // arrival_delay (null first → ICE 3 before... ICE 3 has -2) —
    // order: ICE 2 (null dep), ICE 3 (-2), then dep=5 pair by arrival
    // asc nulls first: ICE 4 (1) before ICE 1 (10).
    assert(ids === Seq("ICE 2", "ICE 3", "ICE 4", "ICE 1"))
  }

  test("descending sort also puts nulls first (desc_nulls_first parity)") {
    val ids = SortedDelays.run(trains, Some(SortedDelays.Desc))
      .select("train_id").as[String].collect().toSeq
    assert(ids === Seq("ICE 2", "ICE 1", "ICE 4", "ICE 3"))
  }

  test("absent sorting ascends (Desc iff Some(Desc), main.rs:277)") {
    val none = SortedDelays.run(trains, None).select("train_id").as[String].collect().toSeq
    val asc = SortedDelays.run(trains, Some(SortedDelays.Asc))
      .select("train_id").as[String].collect().toSeq
    assert(none === asc)
  }

  test("limit truncates after sort; no limit returns all (quirk (e))") {
    assert(SortedDelays.run(trains, Some(SortedDelays.Asc), Some(2)).count() === 2)
    assert(SortedDelays.run(trains, Some(SortedDelays.Asc), None).count() === 4)
  }

  test("sort+limit plans as TakeOrderedAndProject (top-k, SURVEY §4)") {
    val plan = SortedDelays.run(trains, Some(SortedDelays.Desc), Some(2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
