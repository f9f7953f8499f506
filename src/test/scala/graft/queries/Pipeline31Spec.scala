package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline31Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_psi_drift: consecutive months only, psi non-negative") {
    val rows = run("q_psi_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("month_b") == r.getAs[Long]("month_a") + 1)
      // PSI is a sum of (p-q)ln(p/q) terms, each >= 0
      assert(r.getAs[Double]("psi") >= -1e-9)
      assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    }
  }

  test("q_anova_f: decomposition is consistent and F positive") {
    val r = run("q_anova_f").collect().head
    val (k, n) = (r.getAs[Long]("k_groups"), r.getAs[Long]("n_docs"))
    assert(k >= 2 && n > k)
    assert(r.getAs[Double]("ss_between") >= 0.0)
    assert(r.getAs[Double]("ss_within") > 0.0)
    assert(r.getAs[Double]("f_stat") >= 0.0)
  }

  test("q_runs_test: counts add up; runs bounded by n; z finite") {
    val r = run("q_runs_test").collect().head
    val (n, n1, n2) = (r.getAs[Long]("n_days"), r.getAs[Long]("n_above"),
      r.getAs[Long]("n_below"))
    assert(n1 + n2 == n)
    // lower median ⇒ strictly-above count is at most half
    assert(n1 <= n / 2)
    val runs = r.getAs[Long]("runs")
    assert(runs >= 1 && runs <= n)
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("q_wasserstein_lengths: symmetric-complete pair grid, w1 >= 0, triangle sanity") {
    val rows = run("q_wasserstein_lengths").collect()
    val sources = graft.Tables(spark, dir, "documents")
      .select(col("source")).distinct().count().toInt
    assert(rows.length == sources * (sources - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      assert(r.getAs[Double]("w1") >= 0.0)
      // W1 between length distributions cannot exceed the value range
      assert(r.getAs[Double]("w1") <= 20000.0)
    }
  }

  test("q_heaps_law: vocab and tokens monotone in the checkpoint, 0 < beta < 1") {
    val rows = run("q_heaps_law").collect().sortBy(_.getAs[Long]("j"))
    assert(rows.length == 10)
    val vocab = rows.map(_.getAs[Long]("vocab"))
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    assert(vocab.zip(vocab.tail).forall { case (a, b) => a <= b })
    assert(toks.zip(toks.tail).forall { case (a, b) => a < b })
    assert(vocab.zip(toks).forall { case (v, t) => v <= t })
    val beta = rows.head.getAs[Double]("beta")
    // sublinear vocabulary growth — the Heaps regime
    assert(beta > 0.0 && beta < 1.0)
  }

  test("q_ndcg_retrieval: one row per probe, ndcg in [0,1], dcg <= idcg") {
    val rows = run("q_ndcg_retrieval").collect()
    val probes = graft.Tables(spark, dir, "embeddings")
      .filter(col("vec_id") < 300).count()
    assert(rows.length == probes)
    rows.foreach { r =>
      val (dcg, idcg, ndcg) =
        (r.getAs[Double]("dcg"), r.getAs[Double]("idcg"), r.getAs[Double]("ndcg"))
      assert(dcg >= 0.0 && idcg >= 0.0)
      assert(dcg <= idcg + 1e-9)
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
      if (r.getAs[Long]("n_rel") == 0) assert(ndcg == 0.0)
    }
  }

  test("q_hurst_rs: all four windows present with enough segments; hurst in (0,1)") {
    val rows = run("q_hurst_rs").collect().sortBy(_.getAs[Long]("w"))
    assert(rows.map(_.getAs[Long]("w")).toSeq == Seq(8L, 16L, 32L, 64L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_segments") >= 1)
      assert(!r.getAs[Double]("mean_log_rs").isNaN)
    }
    val h = rows.head.getAs[Double]("hurst")
    assert(h > 0.0 && h < 1.0)
  }
}
