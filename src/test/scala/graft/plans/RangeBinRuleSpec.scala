package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeBinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withWidth[T](w: Long)(body: => T): T = {
    spark.conf.set(RangeBinRule.WidthConf, w.toString)
    try body finally spark.conf.set(RangeBinRule.WidthConf, "0")
  }

  // points at every int in [-50, 200); intervals of mixed widths,
  // including empty (hi < lo), degenerate (hi == lo) and negative spans
  private def points: DataFrame =
    spark.range(-50, 200).select($"id".as("p"))
  private def intervals: DataFrame = Seq(
    (1L, 0L, 10L), (2L, -30L, -20L), (3L, 5L, 5L), (4L, 40L, 20L),
    (5L, -5L, 7L), (6L, 100L, 160L), (7L, 199L, 300L))
    .toDF("iv_id", "lo", "hi")

  private def joined = points.join(intervals, $"lo" <= $"p" && $"p" < $"hi")

  test("the rewrite plans an equi-join instead of a nested loop") {
    withWidth(16L) {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
      assert(plan.contains("__graft_p_bucket") || plan.contains("hashjoin") ||
        plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    }
  }

  test("binned results are identical to the naive nested-loop join") {
    val naive = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = withWidth(16L) {
      joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(binned == naive)
    // sanity on the fixture itself: empty and inverted intervals match
    // nothing, negative spans and spans crossing 0 match exactly
    assert(!naive.exists(_._2 == 3L) && !naive.exists(_._2 == 4L))
    assert(naive.count(_._2 == 5L) == 12) // p in [-5, 7)
    assert(naive.count(_._2 == 7L) == 1)  // clipped by the point domain
  }

  test("negative coordinates bucket by floor division, not truncation") {
    // a truncating div puts p = -1 and p = +1 in the same bucket 0 and
    // then relies on luck; prove correctness where it would break: an
    // interval entirely inside (-W, 0)
    val naive = joined.filter($"iv_id" === 2L).collect().map(_.getLong(0)).toSet
    withWidth(64L) {
      val binned = joined.filter($"iv_id" === 2L).collect().map(_.getLong(0)).toSet
      assert(binned == naive && naive == (-30L until -20L).toSet)
    }
  }

  test("every strictness combination stays exact") {
    for ((cond, desc) <- Seq(
        ($"lo" <= $"p" && $"p" < $"hi", "closed-open"),
        ($"lo" < $"p" && $"p" <= $"hi", "open-closed"),
        ($"lo" <= $"p" && $"p" <= $"hi", "closed-closed"),
        ($"lo" < $"p" && $"p" < $"hi", "open-open"))) {
      val q = points.join(intervals, cond)
      val naive = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val binned = withWidth(16L) {
        q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      assert(binned == naive, desc)
    }
  }

  test("cross-side extra conjuncts disable the rewrite; pushable ones don't") {
    withWidth(16L) {
      // p =!= iv_id references both sides, so pushdown cannot strip it
      // and the condition is never the pure two-conjunct range form —
      // the rule must leave the join alone rather than guess
      val crossSide = points.join(intervals,
        $"lo" <= $"p" && $"p" < $"hi" && $"p" =!= $"iv_id")
      val plan = crossSide.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_p_bucket"),
        s"rule must not fire on a partial match:\n$plan")

      // a single-side conjunct is pushed below the join by the same
      // optimizer batch, leaving the pure range form — the rule SHOULD
      // fire there, and the filtered results must stay exact
      val pushable = points.join(intervals,
        $"lo" <= $"p" && $"p" < $"hi" && $"iv_id" =!= 6L)
      assert(pushable.queryExecution.optimizedPlan.toString
        .contains("__graft_p_bucket"))
      assert(pushable.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        joined.filter($"iv_id" =!= 6L).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet)
    }
  }

  test("the rule is inert without the width conf") {
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_p_bucket"), plan)
  }

  test("stream-static range joins get the same rewrite per micro-batch") {
    // IncrementalExecution re-optimizes every micro-batch with the
    // session's optimizer, so the injected rule upgrades streaming
    // non-equi enrichment joins too — no streaming-specific code.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withWidth(16L) {
      val in = MemoryStream[Long]
      in.addData(-25L, 3L, 7L, 55L, 150L, 199L)
      val pts = in.toDF.select($"value".as("p"))
      val q = pts.join(intervals, $"lo" <= $"p" && $"p" < $"hi")
        .select($"p", $"iv_id")
        .writeStream.format("memory").queryName("range_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("range_stream").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = Set((-25L, 2L), (3L, 1L), (7L, 1L), (3L, 5L),
          (55L, 7L) /* not: id7 is [199,300) */, (150L, 6L), (199L, 7L))
          .filter { case (p, iv) =>
            val (lo, hi) = Map(1L -> (0L, 10L), 2L -> (-30L, -20L),
              5L -> (-5L, 7L), 6L -> (100L, 160L), 7L -> (199L, 300L))(iv)
            lo <= p && p < hi
          }
        assert(got == want, s"got=$got want=$want")
        // and the rewrite actually fired inside the micro-batch plan
        val lastPlan = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
          .streamingQuery.lastExecution.executedPlan.toString
        assert(lastPlan.contains("__graft_p_bucket"), lastPlan)
      } finally q.stop()
    }
  }
}
