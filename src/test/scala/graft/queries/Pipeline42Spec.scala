package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline42Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_basket_pmf: shares sum to 1 over positive sizes") {
    val rows = run("q_basket_pmf").collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    rows.foreach(r => assert(r.getAs[Long]("k") >= 1))
  }

  test("q_repeat_rate: repeat counts bounded by customers; rate in [0,1]") {
    val rows = run("q_repeat_rate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_repeat") <= r.getAs[Long]("n_customers"))
      assert(r.getAs[Long]("n_orders") >= r.getAs[Long]("n_customers"))
      val rate = r.getAs[Double]("repeat_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("q_discount_lift: bands cover 0..max percent with positive counts") {
    val rows = run("q_discount_lift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("disc_pct")
      assert(d >= 0 && d <= 100)
      assert(r.getAs[Long]("n_lines") > 0)
      assert(r.getAs[Double]("avg_line_cents") > 0.0)
    }
  }
}
