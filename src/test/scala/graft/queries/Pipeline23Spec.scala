package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline23Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_rfm_segments: every customer lands in exactly one segment, bands in 1..5") {
    val rows = run("q_rfm_segments").collect()
    val nCust = rows.map(_.getAs[Long]("n_cust")).sum
    val distinct = graft.Tables(spark, dir, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(nCust == distinct, s"segments cover $nCust of $distinct customers")
    rows.foreach { r =>
      Seq("r_band", "f_band", "m_band").foreach { b =>
        val v = r.getAs[Long](b)
        assert(v >= 1 && v <= 5, s"$b=$v out of range")
      }
    }
  }

  test("q_mad_outliers: median and MAD bound each group; outliers are a minority") {
    val rows = run("q_mad_outliers").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("mad_cents") >= 0)
      assert(r.getAs[Long]("n_outliers") * 2 < r.getAs[Long]("n"),
        "an outlier screen flagging a majority is not an outlier screen")
    }
  }

  test("q_tcloseness: t in [0,1] and zero iff a segment mirrors the global mix") {
    val rows = run("q_tcloseness").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val t = r.getAs[Double]("t_closeness")
      assert(t >= 0.0 && t <= 1.0)
      assert((t == 0.0) == (r.getAs[Long]("tv_num") == 0L))
    }
  }

  test("q_lorenz_deciles: shares sum to 1, cumulative share is monotone and convex-ish") {
    val rows = run("q_lorenz_deciles").collect().sortBy(_.getAs[Long]("decile"))
    assert(rows.length == 10)
    val total = rows.map(_.getAs[Double]("decile_share")).sum
    assert(math.abs(total - 1.0) < 1e-9)
    val cums = rows.map(_.getAs[Double]("cum_share"))
    cums.sliding(2).foreach { case Array(a, b) => assert(a <= b); case _ => }
    assert(math.abs(cums.last - 1.0) < 1e-9)
    // deciles are ascending by revenue, so shares must be non-decreasing
    val shares = rows.map(_.getAs[Double]("decile_share"))
    shares.sliding(2).foreach { case Array(a, b) =>
      assert(a <= b + 1e-12); case _ => }
  }

  test("q_prefix_simjoin matches a naive all-pairs verify restricted to the probe set") {
    val got = run("q_prefix_simjoin").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toMap
    // In-test oracle: exact Jaccard over every (probe, other) pair.
    val toks = graft.Tables(spark, dir, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").toSet).toMap
    val want = (for {
      a <- toks.keys.filter(_ < 20)
      b <- toks.keys if a < b
      i = (toks(a) & toks(b)).size.toLong
      u = (toks(a) | toks(b)).size.toLong
      if i * 8 >= (toks(a).size + toks(b).size) * 3
    } yield (a, b) -> (i, u)).toMap
    assert(got == want,
      s"got ${got.size} pairs, want ${want.size}; " +
        s"missing=${(want.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- want.keySet).take(3)}")
  }

  test("q_kcore_peel: survivors shrink monotonically and round 3 is a true 2-core step") {
    val rows = run("q_kcore_peel").collect().sortBy(_.getAs[Long]("round"))
    assert(rows.length == 3)
    val nodes = rows.map(_.getAs[Long]("n_nodes"))
    val edges = rows.map(_.getAs[Long]("n_edges"))
    assert(nodes.sliding(2).forall { case Array(a, b) => b <= a; case _ => true })
    assert(edges.sliding(2).forall { case Array(a, b) => b <= a; case _ => true })
    // every surviving endpoint of round 3 had degree >= 2 entering it
    assert(edges.last == 0 || nodes.last >= 3,
      "a non-empty 2-core needs at least a triangle")
  }

  test("q_dup_source_matrix counts exactly the cross-source duplicate pairs") {
    val got = run("q_dup_source_matrix").collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("n_dup_pairs")).toMap
    val docs = graft.Tables(spark, dir, "documents").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text"))).toSeq
    val want = docs.groupBy(_._3).values.toSeq.filter(_.length > 1)
      .flatMap { g =>
        for {
          x <- g; y <- g if x._1 < y._1
        } yield (Seq(x._2, y._2).min, Seq(x._2, y._2).max)
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == want)
  }
}
