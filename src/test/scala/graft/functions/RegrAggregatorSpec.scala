package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Regression

class RegrAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val regrAll = udaf(RegrAllAggregator)

  test("whole-frame result matches the six-sum Regression operator") {
    val df = Seq((1.0, 2.1), (2.0, 3.9), (3.0, 6.2), (4.0, 7.8))
      .toDF("x", "y")
    val expected = Regression.run(df, "x", "y")
    val r = df.agg(regrAll(col("x"), col("y")).as("r"))
      .select("r.slope", "r.intercept", "r.r2").head()
    assert(math.abs(r.getDouble(0) - expected.slope) < 1e-12)
    assert(math.abs(r.getDouble(1) - expected.intercept) < 1e-12)
    assert(math.abs(r.getDouble(2) - expected.r2.get) < 1e-12)
  }

  test("per-group regressions in one aggregation") {
    val df = Seq(
      ("a", 1.0, 1.0), ("a", 2.0, 2.0), ("a", 3.0, 3.0),  // slope 1, r2 1
      ("b", 1.0, 5.0), ("b", 2.0, 3.0), ("b", 3.0, 1.0),  // slope -2
      ("c", 1.0, 7.0), ("c", 1.0, 9.0)                    // zero x-variance
    ).toDF("g", "x", "y")
    val out = df.groupBy($"g").agg(regrAll($"x", $"y").as("r"))
      .select($"g", $"r.slope", $"r.r2")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(math.abs(out("a").get - 1.0) < 1e-12)
    assert(math.abs(out("b").get - -2.0) < 1e-12)
    assert(out("c") === None) // denom == 0 → no slope (reference 400 path)
  }

  test("constant y: slope 0, r2 null (ss_tot == 0)") {
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "y")
    val r = df.agg(regrAll(col("x"), col("y")).as("r"))
      .select("r.slope", "r.r2").head()
    assert(r.getDouble(0) === 0.0)
    assert(r.isNullAt(1))
  }
}
