package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Pipeline13Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q_gini matches a brute-force Lorenz computation") {
    val r = Pipeline13.queries("q_gini")(spark, dir).collect().head
    val (n, tot, gini) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val cents = graft.Tables(spark, dir, "orders")
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("c"))
      .select($"c").as[Long].collect().sorted
    assert(n === cents.length.toLong && tot === cents.sum)
    val num = cents.zipWithIndex.map { case (x, i0) =>
      (2L * (i0 + 1) - n - 1) * x
    }.sum
    assert(gini === num.toDouble / (n * tot).toDouble)
    assert(gini >= 0.0 && gini <= 1.0)
  }

  test("q_benford shares sum to one; deviations are obs minus expected") {
    val rows = Pipeline13.queries("q_benford")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 9L))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    rows.foreach(r =>
      assert(r.getDouble(4) === r.getDouble(2) - r.getDouble(3)))
  }

  test("q_seasonal_index: activity-weighted mean index is exactly 1") {
    val rows = Pipeline13.queries("q_seasonal_index")(spark, dir).collect()
    assert(rows.length === 7)
    val tn = rows.map(_.getLong(1)).sum
    val weighted = rows.map(r => r.getLong(1) * r.getDouble(3)).sum / tn
    assert(math.abs(weighted - 1.0) < 1e-9,
      s"weighted seasonal indices must average to 1, got $weighted")
  }

  test("q_mode_per_group returns each segment's true argmax") {
    val rows = Pipeline13.queries("q_mode_per_group")(spark, dir).collect()
    val counts = graft.Tables(spark, dir, "customer")
      .join(graft.Tables(spark, dir, "orders"), $"c_custkey" === $"o_custkey")
      .groupBy($"c_mktsegment", $"o_orderpriority").count()
      .as[(String, String, Long)].collect()
    rows.foreach { r =>
      val seg = r.getString(0)
      val best = counts.filter(_._1 == seg).maxBy(c => (c._3, c._2.reverse))
      // tie-break: highest count, then lexicographically smallest priority
      val cands = counts.filter(c => c._1 == seg && c._3 == best._3)
      val expect = cands.map(_._2).min
      assert(r.getString(1) === expect, s"segment $seg")
      assert(r.getLong(2) === best._3)
    }
  }
}
