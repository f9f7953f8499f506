package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_minhash_fidelity: estimates and exacts are valid Jaccards; identical docs agree fully") {
    val rows = run("q_minhash_fidelity").collect()
    assert(rows.nonEmpty, "LSH should surface at least one candidate pair")
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val ex = r.getAs[Double]("exact_jaccard")
      assert(est >= 0.0 && est <= 1.0)
      assert(ex >= 0.0 && ex <= 1.0)
      assert(math.abs(r.getAs[Double]("abs_err") - math.abs(est - ex)) < 1e-12)
      // 8/8 signature agreement on distinct shingle sets is possible but
      // exact==1 must imply matches==8 (identical sets hash identically)
      if (ex == 1.0) assert(r.getAs[Long]("matches") == 8L)
    }
  }

  test("q_embed_outliers: distances are non-negative and strictly ranked") {
    val rows = run("q_embed_outliers").collect()
    assert(rows.length == 10)
    val d2s = rows.map(_.getAs[Double]("d2"))
    assert(d2s.forall(_ >= 0.0))
    assert(d2s.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("q_gap_bands: bands cover every consecutive gap exactly once") {
    val rows = run("q_gap_bands").collect()
    val total = rows.map(_.getAs[Long]("n_gaps")).sum
    val events = graft.Tables(spark, dir, "events")
    val nRows = events.count()
    val nUsers = events.select(col("user_id")).distinct().count()
    assert(total == nRows - nUsers,
      s"every event except each user's first contributes one gap")
    rows.foreach { r =>
      val b = r.getAs[Long]("band")
      assert(r.getAs[Long]("min_gap_us") >= (if (b == 0) 0L else 1L << b))
      assert(r.getAs[Long]("max_gap_us") < (2L << b))
    }
  }

  test("q_join_skew_report: bands cover every key and all rows") {
    val rows = run("q_join_skew_report").collect()
    val keys = rows.map(_.getAs[Long]("n_keys_band")).sum
    val mass = rows.map(_.getAs[Long]("rows_band")).sum
    val li = graft.Tables(spark, dir, "lineitem")
    assert(keys == li.select(col("l_orderkey")).distinct().count())
    assert(mass == li.count())
    assert(math.abs(rows.map(_.getAs[Double]("row_share")).sum - 1.0) < 1e-9)
  }

  test("q_decile_transition: a doubly-stochastic-ish matrix over the shared cohort") {
    val rows = run("q_decile_transition").collect()
    val n = rows.map(_.getAs[Long]("n_cust")).sum
    // row and column marginals both partition the cohort into deciles
    val byEarly = rows.groupBy(_.getAs[Long]("d_early"))
      .view.mapValues(_.map(_.getAs[Long]("n_cust")).sum).toMap
    val byLate = rows.groupBy(_.getAs[Long]("d_late"))
      .view.mapValues(_.map(_.getAs[Long]("n_cust")).sum).toMap
    assert(byEarly.keySet.subsetOf((1L to 10L).toSet))
    assert(byLate.keySet.subsetOf((1L to 10L).toSet))
    // NTILE margins differ by at most 1 across deciles
    assert(byEarly.values.max - byEarly.values.min <= 1)
    assert(byLate.values.max - byLate.values.min <= 1)
    assert(n == byEarly.values.sum)
  }
}
