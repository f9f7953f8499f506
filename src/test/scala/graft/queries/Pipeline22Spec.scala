package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline22Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_cc_histogram: component sizes account for every edge endpoint") {
    import org.apache.spark.sql.functions._
    val hist = run("q_cc_histogram").collect()
    assert(hist.nonEmpty)
    val histNodes = hist.map(r =>
      r.getAs[Long]("component_size") * r.getAs[Long]("n_components")).sum
    val li = graft.Tables(spark, dir, "lineitem")
      .filter(col("l_partkey") < 300)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nodes = li.alias("a")
      .join(li.alias("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("n"))
      .union(li.alias("a2")
        .join(li.alias("b2"), col("a2.l_orderkey") === col("b2.l_orderkey") &&
          col("a2.l_partkey") > col("b2.l_partkey"))
        .select(col("a2.l_partkey").as("n")))
      .distinct().count()
    assert(histNodes == nodes,
      s"histogram covers $histNodes nodes, graph has $nodes")
  }

  test("q_context_pack: bins partition the corpus and token mass is conserved") {
    import org.apache.spark.sql.functions._
    val rows = run("q_context_pack").collect()
    val binDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val binToks = rows.map(_.getAs[Long]("bin_tokens")).sum
    val docs = graft.Tables(spark, dir, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(count(lit(1)), sum(col("t"))).collect().head
    assert(binDocs == docs.getLong(0) && binToks == docs.getLong(1))
    // bins are dense from 0 and doc ranges do not overlap
    val bins = rows.map(_.getAs[Long]("bin")).sorted
    assert(bins.head == 0L && bins.zipWithIndex.forall { case (b, i) => b == i })
    val ranges = rows.sortBy(_.getAs[Long]("bin"))
      .map(r => (r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
    ranges.sliding(2).foreach {
      case Array((_, aHi), (bLo, _)) => assert(aHi < bLo)
      case _ =>
    }
  }

  test("q_group_quantiles: quantiles are monotone and inside the group range") {
    run("q_group_quantiles").collect().foreach { r =>
      val Seq(p25, p50, p75, p95) =
        Seq("p25_cents", "p50_cents", "p75_cents", "p95_cents")
          .map(r.getAs[Long])
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95)
      assert(r.getAs[Long]("n") > 0L)
    }
  }
}
