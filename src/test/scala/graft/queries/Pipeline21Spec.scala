package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Semantic invariants for the twenty-first batch (oracle hashes are the
  * driver's job; these pin properties a hash can't explain).
  */
class Pipeline21Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_bitmap_index: popcount distinct equals exact distinct everywhere") {
    val rows = run("q_bitmap_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("agrees"),
        s"bitmap distinct diverged for ${r.getAs[String]("event_type")}")
    }
  }

  test("q_funnel_strict: stages are monotone non-increasing") {
    val r = run("q_funnel_strict").collect().head
    val (v, c, b) = (r.getAs[Long]("n_view"), r.getAs[Long]("n_click"),
      r.getAs[Long]("n_buy"))
    assert(v >= c && c >= b && b >= 0)
  }

  test("q_dq_audit: synthetic tables pass every rule") {
    val rows = run("q_dq_audit").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_violations") == 0L &&
        r.getAs[Double]("pass_rate") == 1.0,
        s"unexpected violations for ${r.getAs[String]("rule")}")
    }
  }

  test("q_repetition_stats: fractions live in [0,1] and top2_n <= n2") {
    run("q_repetition_stats").collect().foreach { r =>
      val dup = r.getAs[Double]("dup3_frac")
      val share = r.getAs[Double]("top2_share")
      assert(dup >= 0.0 && dup <= 1.0 && share > 0.0 && share <= 1.0)
      assert(r.getAs[Long]("top2_n") <= r.getAs[Long]("n2"))
      assert(r.getAs[Long]("d3") <= r.getAs[Long]("n3"))
    }
  }

  test("q_ewma_trunc: smoothed value is a convex combination of the window") {
    // num/den with positive weights over window values ⇒ ewma between
    // the window min and max; spot-check it lies within global bounds.
    val rows = run("q_ewma_trunc").collect()
    val cents = rows.map(_.getAs[Long]("cents"))
    val (lo, hi) = (cents.min.toDouble, cents.max.toDouble)
    rows.foreach { r =>
      val e = r.getAs[Double]("ewma_cents")
      assert(e >= lo && e <= hi)
      assert(r.getAs[Long]("den") > 0L && r.getAs[Long]("den") <= 255L)
    }
  }

  test("q_scd2_report: interval accounting is consistent") {
    run("q_scd2_report").collect().foreach { r =>
      assert(r.getAs[Long]("n_closed") <= r.getAs[Long]("n_intervals"))
      assert(r.getAs[Long]("dur_micros") >= 0L)
    }
  }

  test("q_triangle_count: triangles bounded by edge count theory") {
    val r = run("q_triangle_count").collect().head
    val (e, tri) = (r.getAs[Long]("n_edges"), r.getAs[Long]("n_triangles"))
    assert(e > 0L)
    // crude bound: a graph with e edges has at most e^1.5/3 triangles
    assert(tri <= math.pow(e.toDouble, 1.5) / 3.0 + 1)
  }

  test("q_doc_mix: shares sum to 1 and w_rel peaks at exactly 1") {
    val rows = run("q_doc_mix").collect()
    val shares = rows.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getAs[Double]("w_rel")).max - 1.0) < 1e-15)
  }
}
