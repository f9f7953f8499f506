package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline38Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_time_decay_attribution: credit sums to the number of attributed conversions") {
    val rows = run("q_time_decay_attribution").collect()
    assert(rows.nonEmpty)
    // per-conversion credits each sum to 1 → total credit = #conversions
    // that had at least one in-window touch (an integer)
    val total = rows.map(_.getAs[Double]("credit")).sum
    assert(math.abs(total - math.round(total)) < 1e-4, s"total=$total")
    assert(total > 0.0)
    rows.foreach(r => assert(r.getAs[Double]("credit") >= 0.0))
    // purchase itself is never a touch channel
    assert(!rows.map(_.getAs[String]("event_type")).contains("purchase"))
  }

  test("q_vocab_coverage: coverage monotone in k and bounded by 1") {
    val rows = run("q_vocab_coverage").collect().sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(100L, 1000L, 10000L))
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b + 1e-12 })
    rows.foreach { r =>
      assert(r.getAs[Long]("covered") <= r.getAs[Long]("total"))
      assert(r.getAs[Double]("coverage") <= 1.0 + 1e-12)
    }
  }

  test("q_forecast_baselines: errors positive; skill is the MAE ratio") {
    val r = run("q_forecast_baselines").collect().head
    assert(r.getAs[Long]("n_eval") > 0)
    assert(r.getAs[Double]("mae_naive") > 0.0)
    assert(r.getAs[Double]("mae_seasonal") > 0.0)
    assert(math.abs(r.getAs[Double]("seasonal_skill") -
      r.getAs[Double]("mae_seasonal") / r.getAs[Double]("mae_naive")) < 1e-12)
    assert(r.getAs[Double]("mape_naive") > 0.0)
  }
}
