package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PreviewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = (1 to 250).map(i => (i, s"row$i")).toDF("id", "s")

  test("default limit is 100 (main.rs:116)") {
    assert(Preview.run(df).count() === 100)
  }

  test("explicit limit") {
    assert(Preview.run(df, Some(7)).count() === 7)
  }

  test("limit beyond size returns all rows") {
    assert(Preview.run(df, Some(1000)).count() === 250)
  }

  test("plans as CollectLimit — no sort, no shuffle (SURVEY §3 EP1)") {
    // A local Seq-backed frame constant-folds into LocalTableScan; the
    // plan-shape claim is about file scans, so assert on parquet input.
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plan = Preview.run(li, Some(5)).queryExecution.executedPlan.toString
    assert(plan.contains("CollectLimit") || plan.contains("GlobalLimit"))
    assert(!plan.contains("Exchange"))
  }
}
