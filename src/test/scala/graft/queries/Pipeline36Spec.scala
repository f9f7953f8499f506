package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline36Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_diff_in_diff: four cells present; did is the double difference") {
    val r = run("q_diff_in_diff").collect().head
    val (cp, ca, tp, ta) = (r.getAs[Double]("control_pre"),
      r.getAs[Double]("control_post"), r.getAs[Double]("treated_pre"),
      r.getAs[Double]("treated_post"))
    Seq(cp, ca, tp, ta).foreach(v => assert(v > 0.0))
    assert(math.abs(r.getAs[Double]("did") - ((ta - tp) - (ca - cp))) < 1e-9)
  }

  test("q_higher_moments: variance positive; kurtosis above the -2 floor") {
    val r = run("q_higher_moments").collect().head
    assert(r.getAs[Double]("m2") > 0.0)
    // excess kurtosis is bounded below by skew^2 - 2
    val (sk, ek) = (r.getAs[Double]("skewness"),
      r.getAs[Double]("excess_kurtosis"))
    assert(ek >= sk * sk - 2.0 - 1e-9)
  }

  test("dblBig2: exact conversion past dblBig's ~9.2e36 ceiling") {
    import org.apache.spark.sql.functions.{col, expr}
    // Values straddling the single-split long-quotient overflow point
    // (2^63 * 1e18 ≈ 9.22e36) up to near the DECIMAL(38,0) edge. The
    // reference is BigDecimal.doubleValue — one correctly-rounded
    // conversion, which the fused hi/mid/lo expression must reproduce.
    val vals = Seq("9223372036854775807999999999999999999",  // just below 2^63·1e18
      "9223372036854775808000000000000000000",               // first overflow of DIV 1e18
      "12345678901234567890123456789012345678",
      "-9999999999999999999999999999999999999")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(org.apache.spark.sql.Row(_))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType))))
      .select(expr("CAST(s AS DECIMAL(38,0))").as("x"), col("s"))
    val got = df.select(col("s"), Qs.dblBig2("x").as("d"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    vals.foreach { v =>
      // The hard guarantee is Spark == DuckDB (same fused expression —
      // proven by the q_higher_moments oracle gate); against the
      // single-rounded BigDecimal reference the split can differ by at
      // most a couple of ulps from the two extra additions.
      val ref = new java.math.BigDecimal(v).doubleValue()
      val ulp = math.ulp(ref)
      assert(math.abs(got(v) - ref) <= 2 * math.abs(ulp), s"dblBig2($v): ${got(v)} vs $ref")
    }
  }

  test("q_mean_reversion: phi in (-1,1); half-life positive when defined") {
    val r = run("q_mean_reversion").collect().head
    val phi = r.getAs[Double]("phi")
    assert(phi > -1.0 && phi < 1.0)
    if (!r.isNullAt(r.fieldIndex("half_life_days")))
      assert(r.getAs[Double]("half_life_days") > 0.0)
  }

  test("q_exp_fit_ks: ks in [0,1], rate positive") {
    val r = run("q_exp_fit_ks").collect().head
    assert(r.getAs[Long]("n_gaps") > 0)
    assert(r.getAs[Double]("lambda_per_hour") > 0.0)
    val ks = r.getAs[Double]("ks_stat")
    assert(ks >= 0.0 && ks <= 1.0)
  }

  test("q_gini_monthly: gini in [0,1) each month") {
    val rows = run("q_gini_monthly").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= -1e-9 && g < 1.0, s"gini $g")
      assert(r.getAs[Long]("n_orders") > 0)
    }
  }

  test("q_lognormal_fit: implied median below implied mean (sigma > 0)") {
    val r = run("q_lognormal_fit").collect().head
    assert(r.getAs[Double]("sigma2_log") > 0.0)
    assert(r.getAs[Double]("implied_median_cents") <
      r.getAs[Double]("implied_mean_cents"))
    assert(r.getAs[Double]("implied_median_cents") > 0.0)
  }
}
