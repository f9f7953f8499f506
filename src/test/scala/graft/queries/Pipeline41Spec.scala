package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline41Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_supplier_hhi: hhi in (1/n, 1]") {
    val rows = run("q_supplier_hhi").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, h) = (r.getAs[Long]("n_suppliers"), r.getAs[Double]("hhi"))
      assert(n > 0)
      assert(h >= 1.0 / n - 1e-9 && h <= 1.0 + 1e-9, s"hhi $h n $n")
    }
  }

  test("q_near_dup_inconsistent: every pair disagrees on lang or source") {
    val rows = run("q_near_dup_inconsistent").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("lang_mismatch") ||
        r.getAs[Boolean]("source_mismatch"))
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
    }
  }

  test("q_price_dispersion: ranked by cv desc, support floor holds") {
    val rows = run("q_price_dispersion").collect()
      .sortBy(_.getAs[Long]("rk"))
    assert(rows.nonEmpty && rows.length <= 25)
    val cvs = rows.map(_.getAs[Double]("cv"))
    assert(cvs.zip(cvs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("n_lines") >= 5)
      assert(r.getAs[Double]("mean_p") > 0.0)
      assert(r.getAs[Double]("cv") >= 0.0)
    }
  }

  test("q_return_rate_z: rates in [0,1]; z sign matches rate vs pooled") {
    val rows = run("q_return_rate_z").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rate, pooled, z) = (r.getAs[Double]("rate"),
        r.getAs[Double]("pooled_rate"), r.getAs[Double]("z"))
      assert(rate >= 0.0 && rate <= 1.0)
      assert(pooled > 0.0 && pooled < 1.0)
      assert((rate >= pooled) == (z >= 0.0))
    }
  }
}
