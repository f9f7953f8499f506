package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline34Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_abc_class: three classes, shares sum to 1, A dominates revenue") {
    val rows = run("q_abc_class").collect()
    val byClass = rows.map(r => r.getAs[String]("abc_class") -> r).toMap
    assert(byClass.keySet == Set("A", "B", "C"))
    val shares = rows.map(_.getAs[Double]("rev_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    assert(byClass("A").getAs[Double]("rev_share") >
      byClass("C").getAs[Double]("rev_share"))
    // A's cumulative share is at most 80% by construction of the cut
    assert(byClass("A").getAs[Double]("rev_share") <= 0.8 + 1e-9)
  }

  test("q_price_index: indices positive and near 1, paired months") {
    val rows = run("q_price_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("month_b") == r.getAs[Long]("month_a") + 1)
      assert(r.getAs[Long]("n_common") > 0)
      val (l, p) = (r.getAs[Double]("laspeyres"), r.getAs[Double]("paasche"))
      assert(l > 0.0 && p > 0.0)
      assert(l < 100.0 && p < 100.0)
    }
  }

  test("q_kaplan_meier: survival non-increasing from <=1, deaths <= at-risk") {
    val rows = run("q_kaplan_meier").collect()
      .sortBy(_.getAs[Long]("d_days"))
    assert(rows.nonEmpty)
    val s = rows.map(_.getAs[Double]("survival"))
    assert(s.head <= 1.0 + 1e-9)
    assert(s.zip(s.tail).forall { case (a, b) => a >= b - 1e-12 })
    rows.foreach { r =>
      assert(r.getAs[Long]("deaths") <= r.getAs[Long]("n_risk"))
      assert(r.getAs[Double]("survival") >= 0.0)
    }
  }

  test("q_hill_numbers: diversity ordering N0 >= N1 >= N2 >= 1 per month") {
    val rows = run("q_hill_numbers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n0, n1, n2) = (r.getAs[Long]("n0").toDouble,
        r.getAs[Double]("n1"), r.getAs[Double]("n2"))
      assert(n0 >= n1 - 1e-6 && n1 >= n2 - 1e-6 && n2 >= 1.0 - 1e-6,
        s"n0=$n0 n1=$n1 n2=$n2")
      val e = r.getAs[Double]("evenness")
      assert(e > 0.0 && e <= 1.0 + 1e-9)
    }
  }

  test("q_dispersion: moments consistent, index positive") {
    val r = run("q_dispersion").collect().head
    assert(r.getAs[Long]("n_days") > 0)
    assert(r.getAs[Double]("var_cnt") >= 0.0)
    assert(r.getAs[Double]("dispersion_index") >= 0.0)
  }

  test("q_lift_rules: ranked by lift, confidences in (0,1], support floor holds") {
    val rows = run("q_lift_rules").collect().sortBy(_.getAs[Long]("rk"))
    assert(rows.nonEmpty && rows.length <= 50)
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ab") >= 3)
      assert(r.getAs[Long]("n_ab") <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
      for (c <- Seq("conf_a_b", "conf_b_a")) {
        val v = r.getAs[Double](c)
        assert(v > 0.0 && v <= 1.0)
      }
    }
  }
}
