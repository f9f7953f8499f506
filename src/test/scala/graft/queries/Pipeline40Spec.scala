package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline40Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_embed_norm_audit: counts partition; moments positive") {
    val r = run("q_embed_norm_audit").collect().head
    val n = r.getAs[Long]("n_vectors")
    assert(n > 0)
    assert(r.getAs[Double]("mean_norm") > 0.0)
    assert(r.getAs[Double]("sd_norm") >= 0.0)
    assert(r.getAs[Long]("n_zero") + r.getAs[Long]("n_unit") <= n)
  }

  test("q_tail_ratio: p50 <= p99 per type; ratio >= 1") {
    val rows = run("q_tail_ratio").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("p50_cents") <= r.getAs[Long]("p99_cents"))
      assert(r.getAs[Double]("tail_ratio") >= 1.0 ||
        r.getAs[Long]("p50_cents") < 0)
    }
  }

  test("q_demand_cv: cv non-negative; classification matches the cutoff") {
    val rows = run("q_demand_cv").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cv = r.getAs[Double]("cv")
      assert(cv >= 0.0)
      val cls = r.getAs[String]("demand_class")
      assert(cls == (if (cv * cv < 0.49) "smooth" else "erratic"))
      assert(r.getAs[Double]("mean_qty") > 0.0)
    }
  }
}
