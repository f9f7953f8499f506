package graft.plans

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

import org.apache.spark.sql.functions.col
import graft.TestSpark
import graft.operators.RangeJoin

/** Adversarial property coverage for the two range-join binning paths
  * (the RangeBinRule optimizer rewrite and the manual RangeJoin
  * operator): both must equal the naive O(|P|×|I|) join computed
  * in-test, for ANY bucket width ≥ 1 — including widths larger than the
  * whole span, width 1, inverted intervals (hi < lo), and coordinates at
  * the edges of the long domain where floor-division arithmetic can
  * overflow (Long.MinValue) or lose precision (doubles above 2^53).
  */
object RangeBinPropertySpec extends Properties("rangebin") {
  private lazy val spark = TestSpark.spark

  // Every Spark-job-running case costs real time; 10 cases × 5 regions
  // of the long domain still covers the edges deterministically below.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // Coordinates clustered around an offset so intervals actually overlap
  // points; offsets hit the hostile regions of the long domain.
  private val offsets = Gen.oneOf(
    0L, -37L,
    Long.MinValue + 50,          // floorDiv overflow edge
    Long.MaxValue - 200,         // upper edge
    (1L << 54) + 9)              // above double's exact-integer range
  private val widths = Gen.oneOf(1L, 2L, 7L, 64L, 1000L, Long.MaxValue)

  private val cases = for {
    off <- offsets
    w <- widths
    nP <- Gen.chooseNum(0, 25)
    ps <- Gen.listOfN(nP, Gen.chooseNum(0L, 120L))
    nI <- Gen.chooseNum(0, 12)
    ivs <- Gen.listOfN(nI, for {
      a <- Gen.chooseNum(0L, 120L)
      span <- Gen.chooseNum(-40L, 40L) // negative span => hi < lo interval
    } yield (a, a + span))
  } yield {
    // Clamp into the long domain so `off + x` never wraps: at the upper
    // offset, coordinates stay ≤ MaxValue; at the lower, ≥ MinValue.
    def place(x: Long): Long =
      if (off > 0 && x > Long.MaxValue - off) Long.MaxValue
      else off + x
    (ps.map(place).distinct,
      ivs.map { case (a, b) => (place(a), place(b)) }.distinct.zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) },
      w)
  }

  private def naive(ps: Seq[Long], ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for { p <- ps; (id, lo, hi) <- ivs if lo <= p && p < hi }
      yield (p, id)).toSet

  property("RangeJoin.pointInInterval equals the naive join for any width") =
    forAllNoShrink(cases) { case (ps, ivs, w) =>
      import spark.implicits._
      val points = ps.toDF("p")
      val intervals = ivs.toDF("iv_id", "lo", "hi")
      val got = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", w)
        .select(col("p"), col("iv_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got == naive(ps, ivs)
    }

  property("RangeBinRule rewrite equals the naive join for any width") =
    forAllNoShrink(cases) { case (ps, ivs, w) =>
      import spark.implicits._
      val points = ps.toDF("p")
      val intervals = ivs.toDF("iv_id", "lo", "hi")
      val q = points.join(intervals,
        col("lo") <= col("p") && col("p") < col("hi"))
      spark.conf.set(RangeBinRule.WidthConf, w.toString)
      try {
        val plan = q.queryExecution.optimizedPlan.toString
        // PropagateEmptyRelation collapses the whole join when either
        // side is empty — including when ConvertToLocalRelation evaluates
        // the rewrite's own hi >= lo filter over the literal interval
        // relation and empties it — so only assert the rewrite fired when
        // a join survives to rewrite.
        val fired = plan.contains("__graft_p_bucket")
        val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (fired || ps.isEmpty || !ivs.exists(iv => iv._3 >= iv._2)) &&
          got == naive(ps, ivs)
      } finally spark.conf.set(RangeBinRule.WidthConf, "0")
    }
}
