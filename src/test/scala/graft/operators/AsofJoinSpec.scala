package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, 10L, ts("2024-01-01 10:00:05")),
    (2L, 10L, ts("2024-01-01 10:00:10")),
    (3L, 10L, ts("2024-01-01 09:59:00")), // before any quote → null
    (4L, 20L, ts("2024-01-01 10:00:07"))  // key with no quotes at all
  ).toDF("trade_id", "sym", "t")

  private lazy val quotes = Seq(
    (100L, 10L, ts("2024-01-01 10:00:00"), 1.0),
    (101L, 10L, ts("2024-01-01 10:00:10"), 2.0), // equal ts → matches trade 2
    (102L, 10L, ts("2024-01-01 10:00:10"), 3.0)  // same ts: max tieBreak wins
  ).toDF("quote_id", "sym", "t", "px")

  private def run() =
    AsofJoin.leftAsof(trades, quotes, "sym", "t", "t",
        rightCols = Seq("quote_id", "px"), tieBreak = "quote_id")
      .select($"trade_id", $"asof_quote_id", $"asof_px")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap

  test("latest right row with rt <= lt wins") {
    assert(run()(1L) === Some((100L, 1.0)))
  }

  test("right row at exactly the left timestamp matches; max tieBreak on equal rt") {
    assert(run()(2L) === Some((102L, 3.0)))
  }

  test("left rows before any right row, or with an unseen key, get nulls") {
    assert(run()(3L) === None)
    assert(run()(4L) === None)
  }

  test("one shuffle on the key: no join/cartesian node in the plan") {
    val plan = AsofJoin.leftAsof(trades, quotes, "sym", "t", "t",
      rightCols = Seq("px"), tieBreak = "quote_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  private def run(strategy: AsofJoin.Strategy,
      tol: Option[org.apache.spark.sql.Column] = None) =
    AsofJoin.leftAsof(trades, quotes, "sym", "t", "t",
        rightCols = Seq("quote_id", "px"), tieBreak = "quote_id",
        strategy = strategy, tolerance = tol)
      .select($"trade_id", $"asof_quote_id", $"asof_px")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap

  test("forward: earliest right row with rt >= lt; max tieBreak on equal rt") {
    val f = run(AsofJoin.Forward)
    assert(f(1L) === Some((102L, 3.0))) // 10:00:10 run, max tieBreak
    assert(f(2L) === Some((102L, 3.0))) // equal timestamp still matches
    assert(f(3L) === Some((100L, 1.0))) // earliest quote after 09:59:00
    assert(f(4L) === None)              // key with no quotes
  }

  test("nearest: closer candidate wins; exact tie prefers backward") {
    val n = run(AsofJoin.Nearest)
    assert(n(1L) === Some((100L, 1.0))) // 5s back vs 5s forward → backward
    assert(n(2L) === Some((102L, 3.0)))
    assert(n(3L) === Some((100L, 1.0))) // only a forward candidate exists
    assert(n(4L) === None)
  }

  test("tolerance bounds the match distance in every strategy") {
    import org.apache.spark.sql.functions.expr
    val tol = Some(expr("INTERVAL 3 SECONDS"))
    val b = run(AsofJoin.Backward, tol)
    assert(b(1L) === None)              // 100 is 5s back — outside 3s
    assert(b(2L) === Some((102L, 3.0))) // exact match, distance 0
    val f = run(AsofJoin.Forward, tol)
    assert(f(1L) === None)              // 102 is 5s forward — outside 3s
    assert(f(3L) === None)              // 100 is 60s forward
    val n = run(AsofJoin.Nearest, tol)
    assert(n(1L) === None)
    assert(n(2L) === Some((102L, 3.0)))
  }
}
