package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline39Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_histogram_plan: quartiles ordered inside the range; bins positive") {
    val r = run("q_histogram_plan").collect().head
    val (lo, q1, q3, hi) = (r.getAs[Long]("lo"), r.getAs[Long]("q1_cents"),
      r.getAs[Long]("q3_cents"), r.getAs[Long]("hi"))
    assert(lo <= q1 && q1 <= q3 && q3 <= hi)
    assert(r.getAs[Double]("bin_width_cents") > 0.0)
    val bins = r.getAs[Long]("n_bins")
    assert(bins >= 1 && bins < r.getAs[Long]("n"))
  }

  test("q_dedup_savings: savings bounded by total; distinct <= docs") {
    val rows = run("q_dedup_savings").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("bytes_saved") <= r.getAs[Long]("bytes_total"))
      val s = r.getAs[Double]("savings_ratio")
      assert(s >= 0.0 && s < 1.0)
    }
  }

  test("q_quantile_drift: p50 <= p90 each month") {
    val rows = run("q_quantile_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("p50_cents") <= r.getAs[Long]("p90_cents"))
      assert(r.getAs[Long]("n_orders") > 0)
    }
  }

  test("q_top_customer_share: share in (0,1]; top10 mass bounded by total") {
    val rows = run("q_top_customer_share").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("top10_cents") <= r.getAs[Long]("total_cents"))
      val s = r.getAs[Double]("top10_share")
      assert(s > 0.0 && s <= 1.0)
      // with <= 10 customers the top-10 is everything
      if (r.getAs[Long]("n_customers") <= 10) assert(s == 1.0)
    }
  }
}
