package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline35Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_dau_mau: stickiness in (0,1], avg_dau <= mau") {
    val rows = run("q_dau_mau").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_dau") <= r.getAs[Long]("mau").toDouble + 1e-9)
      val s = r.getAs[Double]("stickiness")
      assert(s > 0.0 && s <= 1.0 + 1e-9)
    }
  }

  test("q_repurchase_cycle: gaps non-negative and ordered min<=mean<=max") {
    val rows = run("q_repurchase_cycle").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mean, mx) = (r.getAs[Long]("min_gap_days"),
        r.getAs[Double]("mean_gap_days"), r.getAs[Long]("max_gap_days"))
      assert(mn >= 0 && mn <= mean && mean <= mx)
      assert(r.getAs[Long]("n_gaps") > 0)
    }
  }

  test("q_basket_nbd: moments sane; overdispersed fit gives positive r") {
    val r = run("q_basket_nbd").collect().head
    assert(r.getAs[Double]("mean_lines") >= 1.0)
    assert(r.getAs[Double]("var_lines") > 0.0)
    // p = m/v in (0, inf); r positive iff var > mean (overdispersion)
    if (r.getAs[Double]("var_lines") > r.getAs[Double]("mean_lines"))
      assert(r.getAs[Double]("nbd_r") > 0.0)
  }

  test("q_price_elasticity: one row per brand, finite coefficients") {
    val rows = run("q_price_elasticity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_points") >= 2)
      assert(!r.getAs[Double]("elasticity").isNaN)
      assert(!r.getAs[Double]("intercept").isNaN)
    }
  }

  test("q_new_returning: counts positive, first month is all-new") {
    val rows = run("q_new_returning").collect()
      .sortBy(_.getAs[Long]("m"))
    assert(rows.nonEmpty)
    // the very first month can only contain first orders
    assert(rows.head.getAs[Long]("n_returning") == 0)
    assert(rows.head.getAs[Double]("new_share") == 1.0)
    rows.foreach { r =>
      val s = r.getAs[Double]("new_share")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("q_term_burstiness: cf >= df, burstiness >= 1, ranked by cf") {
    val rows = run("q_term_burstiness").collect()
      .sortBy(_.getAs[Long]("rk"))
    assert(rows.nonEmpty)
    val cfs = rows.map(_.getAs[Long]("cf"))
    assert(cfs.zip(cfs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("cf") >= r.getAs[Long]("df"))
      assert(r.getAs[Double]("burstiness") >= 1.0)
      assert(r.getAs[Double]("idf") >= -1e-12)
    }
  }
}
