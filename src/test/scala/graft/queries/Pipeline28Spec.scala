package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline28Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_simpson_diversity: sources partition the corpus; simpson in [0,1)") {
    val rows = run("q_simpson_diversity").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      graft.Tables(spark, dir, "documents").count())
    rows.foreach { r =>
      val s = r.getAs[Double]("simpson")
      assert(s >= 0.0 && s < 1.0)
      // a single-language source must score exactly 0
      if (r.getAs[Long]("n_langs") == 1) assert(s == 0.0)
    }
  }

  test("q_chi2_keyness: five ranked terms per source, chi2 nonincreasing") {
    val rows = run("q_chi2_keyness").collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq ==
        (1L to sorted.length.toLong))
      val chis = sorted.map(_.getAs[Double]("chi2"))
      assert(chis.zip(chis.tail).forall { case (a, b) => a >= b })
      rs.foreach(r => assert(r.getAs[Long]("n_in_source") >= 5))
    }
  }

  test("q_burstiness: per type n_gaps = n_events - 1; burstiness in (-1,1)") {
    val rows = run("q_burstiness").collect()
    val counts = graft.Tables(spark, dir, "events")
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_gaps") ==
        counts(r.getAs[String]("event_type")) - 1)
      val b = r.getAs[Double]("burstiness")
      assert(b > -1.0 && b < 1.0)
      assert(r.getAs[Double]("sd_gap_us") >= 0.0)
    }
  }

  test("q_hash_collision_audit: wider hashes never collide more") {
    val rows = run("q_hash_collision_audit").collect().sortBy(_.getAs[Long]("bits"))
    assert(rows.map(_.getAs[Long]("bits")).toSeq == Seq(24L, 36L, 48L))
    val n = rows.head.getAs[Long]("n_shingles")
    assert(rows.forall(_.getAs[Long]("n_shingles") == n))
    val collisions = rows.map(_.getAs[Long]("n_collisions"))
    assert(collisions.zip(collisions.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct_hashes") +
        r.getAs[Long]("n_collisions") == n)
      assert(r.getAs[Long]("n_collisions") >= 0)
    }
  }

  test("q_graph_assortativity: r in [-1,1]; edge/node counts match the degree query") {
    val r = run("q_graph_assortativity").collect()
    assert(r.length == 1)
    val row = r.head
    val a = row.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0)
    // n_edges is twice the undirected edge count — the directed frame
    // carries both orientations, so it must be even
    assert(row.getAs[Long]("n_edges") % 2 == 0)
    val degreeNodes = run("q_graph_degrees").collect()
      .map(_.getAs[Long]("n_nodes")).sum
    assert(row.getAs[Long]("n_nodes") == degreeNodes)
  }

  test("q_session_entropy: single-type users score exactly 0; entropy <= ln(n_types)") {
    val rows = run("q_session_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Double]("entropy")
      val k = r.getAs[Long]("n_types")
      assert(e >= 0.0)
      if (k == 1) assert(e == 0.0)
      // decimal rounding adds at most 1e-10 per term
      assert(e <= math.log(k.toDouble) + 1e-6)
    }
  }
}
