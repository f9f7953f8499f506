package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Crafted: overlaps at bucket boundaries, nested intervals, touching
  // (half-open ⇒ no overlap), empty intervals, and a key split.
  private lazy val a = Seq(
    ("u1", 0L, 50L, "a1"), ("u1", 40L, 120L, "a2"), ("u1", 200L, 200L, "a_empty"),
    ("u2", 0L, 50L, "a3")
  ).toDF("k", "sa", "ea", "a_tag")
  private lazy val b = Seq(
    ("u1", 45L, 46L, "b1"), ("u1", 50L, 60L, "b2"), ("u1", 119L, 300L, "b3"),
    ("u2", 50L, 99L, "b4"), ("u2", 10L, 20L, "b5")
  ).toDF("k", "sb", "eb", "b_tag")

  test("matches the naive non-equi overlap join for any bucket width") {
    val naive = a.join(b, Seq("k"))
      .filter(greatest($"sa", $"sb") < least($"ea", $"eb"))
      .select($"a_tag", $"b_tag").collect().map(_.toSeq).sortBy(_.toString)
    assert(naive.nonEmpty)
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val binned = IntervalJoin.overlap(a, b, Seq("k"), "sa", "ea", "sb", "eb", w)
        .select($"a_tag", $"b_tag").collect().map(_.toSeq).sortBy(_.toString)
      assert(binned === naive, s"bucketWidth=$w")
    }
  }

  test("half-open semantics: touching intervals do not overlap") {
    val out = IntervalJoin.overlap(a, b, Seq("k"), "sa", "ea", "sb", "eb", 10L)
      .select($"a_tag", $"b_tag").as[(String, String)].collect().toSet
    assert(!out.contains(("a1", "b2")), "[0,50) and [50,60) touch, not overlap")
    assert(out.contains(("a2", "b3")), "[40,120) and [119,300) share [119,120)")
    assert(!out.exists(_._1 == "a_empty"))
  }

  test("no duplicate pairs despite meeting in many shared buckets") {
    val out = IntervalJoin.overlap(a, b, Seq("k"), "sa", "ea", "sb", "eb", 1L)
      .select($"a_tag", $"b_tag").collect().map(_.toSeq)
    assert(out.length === out.distinct.length)
  }

  test("plans as a hash/sort-merge equi-join, not nested-loop or cartesian") {
    val df = IntervalJoin.overlap(a, b, Seq("k"), "sa", "ea", "sb", "eb", 10L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }
}
