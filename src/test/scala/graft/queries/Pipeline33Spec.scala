package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline33Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_entropy_rate: rate is a convex mix of conditional entropies") {
    val rows = run("q_entropy_rate").collect()
    assert(rows.nonEmpty)
    val rate = rows.head.getAs[Double]("entropy_rate")
    val hs = rows.map(_.getAs[Double]("h_cond"))
    hs.foreach(h => assert(h >= 0.0))
    assert(rate >= hs.min - 1e-9 && rate <= hs.max + 1e-9)
    // weighted mix reproduces the rate
    val n = rows.map(_.getAs[Long]("n_out").toDouble).sum
    val mix = rows.map(r =>
      r.getAs[Long]("n_out") * r.getAs[Double]("h_cond")).sum / n
    assert(math.abs(mix - rate) < 1e-6)
  }

  test("q_friendship_paradox: neighbor mean dominates the plain mean") {
    val r = run("q_friendship_paradox").collect().head
    assert(r.getAs[Long]("n_nodes") > 0)
    assert(r.getAs[Double]("mean_neighbor_degree") >=
      r.getAs[Double]("mean_degree") - 1e-9)
    assert(r.getAs[Double]("paradox_ratio") >= 1.0 - 1e-9)
  }

  test("q_bloom_sizing: tighter fpr costs monotonically more bits") {
    val rows = run("q_bloom_sizing").collect()
      .sortBy(-_.getAs[Double]("target_fpr"))
    assert(rows.length == 4)
    val bits = rows.map(_.getAs[Long]("m_bits"))
    assert(bits.zip(bits.tail).forall { case (a, b) => a < b })
    rows.foreach { r =>
      assert(r.getAs[Long]("k_hashes") >= 1)
      // ~1.44 bits per key per factor-10 of fpr
      assert(r.getAs[Double]("bits_per_key") > 1.0)
    }
  }

  test("q_power_analysis: smaller lifts need more samples, ~quadratically") {
    val rows = run("q_power_analysis").collect()
      .sortBy(_.getAs[Double]("lift_frac"))
    assert(rows.length == 3)
    val n = rows.map(_.getAs[Long]("n_per_arm"))
    assert(n(0) > n(1) && n(1) > n(2))
    // 1% vs 2% lift: 4x the sample (within ceil rounding)
    assert(math.abs(n(0).toDouble / n(1).toDouble - 4.0) < 0.1)
  }

  test("q_partial_corr: correlations in [-1,1] and finite") {
    val r = run("q_partial_corr").collect().head
    for (c <- Seq("r_xy", "r_xz", "r_yz", "partial_r_xy_z")) {
      val v = r.getAs[Double](c)
      assert(v >= -1.0 && v <= 1.0 && !v.isNaN, s"$c = $v")
    }
    // the generator draws quantity and price independently — the partial
    // must stay near the raw correlation (discount explains ~nothing)
    assert(math.abs(r.getAs[Double]("partial_r_xy_z") -
      r.getAs[Double]("r_xy")) < 0.05)
  }

  test("q_icc_orders: icc in [-1,1] and consistent with ms terms") {
    val r = run("q_icc_orders").collect().head
    assert(r.getAs[Long]("n_rows") > r.getAs[Long]("k_groups"))
    assert(r.getAs[Double]("msw") > 0.0)
    assert(r.getAs[Double]("k0") > 1.0)
    val icc = r.getAs[Double]("icc")
    assert(icc >= -1.0 && icc <= 1.0)
  }

  test("q_target_encoding: encoding shrinks group means toward the prior") {
    val rows = run("q_target_encoding").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mc, mu, enc) = (r.getAs[Double]("mean_c"), r.getAs[Double]("mu"),
        r.getAs[Double]("encoding"))
      // encoding lies strictly between the group mean and the prior
      assert((enc - mc) * (enc - mu) <= 1e-6)
    }
  }

  test("q_degree_ccdf: monotone non-increasing tail from frac=1 region") {
    val rows = run("q_degree_ccdf").collect().sortBy(_.getAs[Long]("t"))
    assert(rows.nonEmpty)
    assert(rows.head.getAs[Long]("t") == 1)
    assert(rows.head.getAs[Double]("frac") == 1.0) // every node has deg >= 1
    val fr = rows.map(_.getAs[Double]("frac"))
    assert(fr.zip(fr.tail).forall { case (a, b) => a >= b })
  }
}
