package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-shape and approximation-quality checks the DuckDB oracle can't
  * express: broadcast hints take effect, filters reach the parquet scan,
  * sketches stay inside error bounds vs exact.
  */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("dimension joins broadcast (no shuffle of nation/region)") {
    val plan = Relational.queries("q_join_region_rev")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q1 filter is pushed into the parquet scan") {
    val plan = Relational.queries("q1_agg")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,45"))
  }

  test("approx sketches stay within tolerance of exact") {
    import org.apache.spark.sql.functions._
    val approx = Relational2.queries("q_approx_sketches")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = graft.Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (d, m)) =>
      val (ad, am) = approx(k)
      assert(math.abs(ad - d) / d < 0.05, s"KMV error for $k")
      assert(math.abs(am - m) / m < 0.05, s"approx median error for $k")
    }
  }

  test("top-k per group plans one shuffle, not a global sort") {
    val plan = Relational.queries("q_topk_per_group")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"))
  }
}
