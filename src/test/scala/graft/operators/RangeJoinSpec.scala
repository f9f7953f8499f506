package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val points = (0L until 200L by 7L).map(t => (t, s"p$t"))
    .toDF("t", "p_tag")
  private lazy val intervals = Seq(
    (0L, 50L, "a"), (25L, 60L, "b"), (50L, 51L, "c"),
    (199L, 200L, "d"), (60L, 60L, "empty"), (100L, 180L, "e")
  ).toDF("s", "e", "i_tag")

  test("matches the naive non-equi join exactly") {
    val naive = points.join(intervals, $"s" <= $"t" && $"t" < $"e")
      .select($"p_tag", $"i_tag").collect().map(_.toSeq).sortBy(_.toString)
    for (w <- Seq(1L, 10L, 64L, 1000L)) {
      val bucketed = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", w)
        .select($"p_tag", $"i_tag").collect().map(_.toSeq).sortBy(_.toString)
      assert(bucketed === naive, s"bucketWidth=$w")
    }
  }

  test("empty and point-width intervals behave (half-open semantics)") {
    val out = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", 10L)
      .select($"i_tag").as[String].collect()
    assert(!out.contains("empty"))      // [60, 60) matches nothing
    assert(out.count(_ == "c") === 0)   // [50, 51): no point at t=50? 49,56 → none
    assert(out.count(_ == "d") === 0)   // [199, 200): points step by 7 → none
  }

  test("plans as a hash/sort-merge equi-join, not nested-loop or cartesian") {
    val df = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", 10L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }
}
