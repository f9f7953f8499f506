package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline37Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_dedup_threshold_curve: pair yield monotone non-increasing in the threshold") {
    val rows = run("q_dedup_threshold_curve").collect()
      .sortBy(_.getAs[Long]("t10"))
    assert(rows.map(_.getAs[Long]("t10")).toSeq == Seq(5L, 6L, 7L, 8L, 9L))
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      // a pair touches two docs; distinct docs <= 2*pairs
      assert(r.getAs[Long]("n_docs_touched") <= 2 * r.getAs[Long]("n_pairs"))
    }
  }

  test("q_shard_plan: shard math consistent with the byte sums") {
    val rows = run("q_shard_plan").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dps = r.getAs[Long]("docs_per_shard")
      assert(dps > 0)
      val shards = r.getAs[Long]("n_shards")
      assert(shards >= 1)
      assert(shards.toDouble >= r.getAs[Long]("n_docs").toDouble / dps - 1e-9)
      assert(r.getAs[Double]("avg_doc_bytes") > 64.0)
    }
  }

  test("q_srm_check: counts partition; hash split matches design ratios") {
    val r = run("q_srm_check").collect().head
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_val") +
      r.getAs[Long]("n_test") == r.getAs[Long]("n_docs"))
    assert(r.getAs[Double]("chi2") >= 0.0)
    // md5 is uniform: the designed split must NOT trip the gate
    assert(!r.getAs[Boolean]("srm_detected"))
  }

  test("q_hazard_ratio: rates positive; ratio near 1 for a hash cohort split") {
    val r = run("q_hazard_ratio").collect().head
    assert(r.getAs[Long]("exposure_even") > 0 && r.getAs[Long]("exposure_odd") > 0)
    assert(r.getAs[Double]("rate_even") > 0.0 && r.getAs[Double]("rate_odd") > 0.0)
    val hr = r.getAs[Double]("hazard_ratio")
    // cohorts differ only by id parity — no true effect, wide sanity band
    assert(hr > 0.2 && hr < 5.0)
  }
}
