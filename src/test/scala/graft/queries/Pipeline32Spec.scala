package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline32Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_mrr: probes partition by label; mrr in [0,1]; hits bounded by queries") {
    val rows = run("q_mrr").collect()
    val probes = graft.Tables(spark, dir, "embeddings")
      .filter(col("vec_id") < 300).count()
    assert(rows.map(_.getAs[Long]("n_queries")).sum == probes)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_queries"))
      val mrr = r.getAs[Double]("mrr")
      assert(mrr >= 0.0 && mrr <= 1.0)
      if (r.getAs[Long]("n_hit") == 0) assert(mrr == 0.0)
    }
  }

  test("q_kendall_daily: pair counts partition n_pairs; tau_b in [-1,1]") {
    val r = run("q_kendall_daily").collect().head
    val n = r.getAs[Long]("n_pairs")
    val (c, d) = (r.getAs[Long]("concordant"), r.getAs[Long]("discordant"))
    assert(c + d <= n)
    assert(r.getAs[Long]("tie_x") >= 0 && r.getAs[Long]("tie_y") >= 0)
    val tau = r.getAs[Double]("tau_b")
    assert(tau >= -1.0 && tau <= 1.0)
    // revenue and order count per day are positively associated (ties
    // are heavy at sf0.001 where many days hold 1-2 orders)
    assert(tau > 0.2)
  }

  test("q_modularity: per-brand decomposition sums consistently; |Q| <= 1") {
    val rows = run("q_modularity").collect()
    assert(rows.nonEmpty)
    val q = rows.head.getAs[Double]("modularity")
    assert(q >= -0.5 && q <= 1.0)
    rows.foreach { r =>
      assert(r.getAs[Long]("intra_edges") <= r.getAs[Long]("degree_sum"))
      assert(math.abs(r.getAs[Double]("modularity") - q) < 1e-12)
    }
    val contribSum = rows.map(_.getAs[Double]("contribution")).sum
    assert(math.abs(contribSum - q) < 1e-6)
  }

  test("q_hill_tail: positive tail index from 500 log-excess terms") {
    val r = run("q_hill_tail").collect().head
    assert(r.getAs[Long]("k_top") == 500)
    assert(r.getAs[Long]("x_ref") > 0)
    assert(r.getAs[Double]("hill_mean") > 0.0)
    assert(r.getAs[Double]("tail_alpha") > 0.0)
  }

  test("q_block_maxima: moments positive, gumbel params consistent") {
    val r = run("q_block_maxima").collect().head
    assert(r.getAs[Long]("n_months") > 12)
    assert(r.getAs[Double]("sd_max") > 0.0)
    val beta = r.getAs[Double]("gumbel_beta")
    assert(math.abs(beta - r.getAs[Double]("sd_max") * math.sqrt(6.0) / math.Pi)
      < 1e-6)
    assert(r.getAs[Double]("gumbel_mu") < r.getAs[Double]("mean_max"))
  }

  test("q_topk_turnover: consecutive months, common bounded by list sizes") {
    val rows = run("q_topk_turnover").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("month_b") == r.getAs[Long]("month_a") + 1)
      val (ka, kb, c) = (r.getAs[Long]("k_a"), r.getAs[Long]("k_b"),
        r.getAs[Long]("n_common"))
      assert(ka <= 10 && kb <= 10)
      assert(c <= math.min(ka, kb))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("q_chao1_richness: estimate at least the observed vocabulary") {
    val r = run("q_chao1_richness").collect().head
    val v = r.getAs[Long]("v_obs")
    assert(v > 0)
    assert(r.getAs[Long]("f1") + r.getAs[Long]("f2") <= v)
    assert(r.getAs[Double]("chao1") >= v.toDouble)
  }
}
