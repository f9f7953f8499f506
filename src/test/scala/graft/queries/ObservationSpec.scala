package graft.queries

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pipeline observability: Spark's Observation API attaches named metric
  * expressions to a plan and collects them DURING the action — data
  * quality counters (rows kept, nulls seen, value ranges) come for free
  * with the job instead of costing a second scan. At 100 TB a separate
  * metrics pass doubles the read bill; observe() makes it zero-cost.
  */
class ObservationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("observe() yields row/null/range metrics from the same single pass") {
    val obs = Observation("quality")
    val df = graft.Tables(spark, dir, "lineitem")
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("l_shipdate").isNull, 1).otherwise(0)).as("null_shipdates"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .filter(col("l_quantity") > 10)
    val kept = df.count()
    val m = obs.get
    assert(m("rows_seen").asInstanceOf[Long] > kept, "metrics cover pre-filter rows")
    assert(m("null_shipdates") === 0L)
    assert(m("min_qty").asInstanceOf[Double] >= 1.0)
    assert(m("max_qty").asInstanceOf[Double] <= 50.0)
  }
}
