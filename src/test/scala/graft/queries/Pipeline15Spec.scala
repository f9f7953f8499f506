package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Pipeline15Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q_nearest_centroid: confusion matrix covers every test vector exactly once") {
    val rows = Pipeline15.queries("q_nearest_centroid")(spark, dir).collect()
    val emb = graft.Tables(spark, dir, "embeddings")
    val nTest = emb.filter($"vec_id" % 2 === 1).count()
    assert(rows.map(_.getLong(2)).sum === nTest)
    // Predictions stay inside the training label domain (the synthetic
    // labels are random, so accuracy itself carries no signal — the
    // invariants are coverage and domain closure).
    val labels = emb.select($"label".cast("long")).distinct()
      .as[Long].collect().toSet
    rows.foreach { r =>
      assert(labels.contains(r.getLong(0)) && labels.contains(r.getLong(1)))
      assert(r.getLong(2) > 0)
    }
  }

  test("q_active_users_window: 7-day count bounds and matches a brute-force window") {
    val rows = Pipeline15.queries("q_active_users_window")(spark, dir).collect()
    val pairs = graft.Tables(spark, dir, "events")
      .select(datediff(to_date($"ts"), lit("1970-01-01")).cast("long").as("d"),
        $"user_id")
      .distinct().as[(Long, Long)].collect()
    val byDay = pairs.groupBy(_._1)
    rows.foreach { r =>
      val day = java.time.LocalDate.parse(r.getString(0)).toEpochDay
      val today = byDay(day).map(_._2).toSet
      val win = pairs.filter(p => p._1 >= day - 6 && p._1 <= day)
        .map(_._2).toSet
      assert(r.getLong(1) === today.size.toLong)
      assert(r.getLong(2) === win.size.toLong)
      assert(r.getLong(2) >= r.getLong(1))
    }
    assert(rows.length === byDay.size)
  }

  test("q_bootstrap_ci: CI brackets the sample mean; weights are Poisson-like") {
    val r = Pipeline15.queries("q_bootstrap_ci")(spark, dir).collect().head
    val (mean, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo < hi)
    assert(lo <= mean && mean <= hi,
      s"90% bootstrap CI [$lo, $hi] should bracket the sample mean $mean")
    assert(r.getLong(4) === 64L)
    // The hash-seeded weights must average ~1 (Poisson(1) mean) so each
    // replicate is a same-size resample in expectation.
    val n = r.getLong(0)
    assert(math.abs((hi - lo) / mean) < 0.2,
      "CI width implausibly wide for a mean over " + n + " orders")
  }

  test("q_jl_projection preserves pairwise distances approximately (JL property)") {
    val rows = Pipeline15.queries("q_jl_projection")(spark, dir)
      .limit(40).collect()
    val orig = graft.Tables(spark, dir, "embeddings")
      .filter($"vec_id" < 40).orderBy($"vec_id")
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).map(v => math.round(v.toDouble * 1000) / 1000.0))
    val proj = rows.map(r => (1 to 8).map(k => r.getDouble(k)))
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // E[|proj diff|²] = k/D-free: with ±1 signs, E[d_proj²] = 8/1 · ... the
    // unscaled expectation is k·d_orig²/1 per coordinate sum; normalize by
    // comparing the RATIO's spread across pairs rather than its absolute
    // level — the estimator must be unbiased, so the mean ratio over many
    // pairs should approach 8 (k signs per output dim, unit variance each).
    val ratios = for {
      i <- orig.indices; j <- orig.indices if i < j
      dOrig = d2(orig(i), orig(j)) if dOrig > 1e-9
    } yield d2(proj(i), proj(j)) / dOrig
    val meanRatio = ratios.sum / ratios.size
    assert(meanRatio > 8 * 0.5 && meanRatio < 8 * 1.5,
      s"mean distance ratio $meanRatio far from the JL expectation 8")
  }
}
