package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline26Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_hour_dow_heatmap: cells cover every event; coordinates in range") {
    val rows = run("q_hour_dow_heatmap").collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      graft.Tables(spark, dir, "events").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("dow") >= 0 && r.getAs[Long]("dow") <= 6)
      assert(r.getAs[Long]("hod") >= 0 && r.getAs[Long]("hod") <= 23)
    }
  }

  test("q_stage_latency: every converting user lands in exactly one band") {
    val rows = run("q_stage_latency").collect()
    val users = rows.map(_.getAs[Long]("n_users")).sum
    val e = graft.Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val fc = e.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("us")).as("c"))
    val conv = e.join(fc, Seq("user_id"))
      .filter(col("event_type") === "purchase" && col("us") >= col("c"))
      .select(col("user_id")).distinct().count()
    assert(users == conv)
    rows.foreach { r =>
      val b = r.getAs[Long]("band")
      assert(r.getAs[Long]("min_gap_us") >= (if (b == 0) 0L else 1L << b))
      assert(r.getAs[Long]("max_gap_us") < (2L << b))
    }
  }

  test("q_source_gate_matrix: per-source rows sum to the corpus-wide funnel") {
    val bySource = run("q_source_gate_matrix").collect()
    val total = run("q_gate_attrition").collect().head
    assert(bySource.map(_.getAs[Long]("n_docs")).sum ==
      total.getAs[Long]("n_docs"))
    assert(bySource.map(_.getAs[Long]("pass_all")).sum ==
      total.getAs[Long]("pass_all"))
    bySource.foreach { r =>
      assert(r.getAs[Long]("pass_all") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q_weekend_lift: the two classes partition the order table") {
    val rows = run("q_weekend_lift").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      graft.Tables(spark, dir, "orders").count())
  }
}
