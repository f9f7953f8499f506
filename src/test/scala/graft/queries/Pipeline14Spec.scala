package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Pipeline14Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q_cusum_drift: cusum telescopes to zero at the last day and flags the peak") {
    val rows = Pipeline14.queries("q_cusum_drift")(spark, dir).collect()
    // Σ(n·xᵢ − S) over all days = n·S − n·S = 0 exactly.
    assert(rows.last.getLong(2) === 0L)
    val peak = rows.map(r => math.abs(r.getLong(2))).max
    rows.foreach(r =>
      assert(r.getBoolean(3) === (math.abs(r.getLong(2)) === peak)))
    assert(rows.count(_.getBoolean(3)) >= 1)
  }

  test("q_xcorr_lagged: |r| <= 1 and lag-0 matches a direct Pearson computation") {
    val rows = Pipeline14.queries("q_xcorr_lagged")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L to 3L))
    rows.foreach(r => if (!r.isNullAt(2)) assert(math.abs(r.getDouble(2)) <= 1.0))
    val daily = graft.Tables(spark, dir, "events")
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("c"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("p"))
      .as[(java.sql.Date, Long, Long)].collect()
    val n = daily.length.toLong
    val (sc, sp) = (daily.map(_._2).sum, daily.map(_._3).sum)
    val scp = daily.map(d => d._2 * d._3).sum
    val scc = daily.map(d => d._2 * d._2).sum
    val spp = daily.map(d => d._3 * d._3).sum
    val expected = (n * scp - sc * sp).toDouble /
      (math.sqrt((n * scc - sc * sc).toDouble) *
        math.sqrt((n * spp - sp * sp).toDouble))
    assert(rows.head.getLong(1) === n)
    assert(rows.head.getDouble(2) === expected)
  }

  test("q_rolling_ols: slope matches a brute-force OLS on each trailing window") {
    val rows = Pipeline14.queries("q_rolling_ols")(spark, dir).collect()
    val cents = rows.map(_.getLong(1))
    rows.zipWithIndex.foreach { case (r, i) =>
      val lo = math.max(0, i - 6)
      val xs = (lo to i).map(j => (j + 1).toLong)
      val ys = (lo to i).map(j => cents(j))
      val nw = xs.length.toLong
      assert(r.getLong(2) === nw)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum
      val den = nw * sxx - sx * sx
      if (den == 0) assert(r.isNullAt(3))
      else {
        assert(r.getDouble(3) === (nw * sxy - sx * sy).toDouble / den.toDouble)
        assert(r.getDouble(4) === (sy * sxx - sx * sxy).toDouble / den.toDouble)
      }
    }
  }

  test("q_dup_spans agrees with a brute-force span census") {
    val rows = Pipeline14.queries("q_dup_spans")(spark, dir).collect()
    val docs = graft.Tables(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val spans = docs.flatMap { case (id, text) =>
      if (text.length < 40) Seq.empty
      else (1 to (text.length - 39) by 20).map(p =>
        (id, text.substring(p - 1, p + 39)))
    }
    val docsPerSpan = spans.distinct.groupBy(_._2).map { case (sp, ds) =>
      sp -> ds.map(_._1).toSet.size
    }
    val expected = docs.map { case (id, _) =>
      val mine = spans.filter(_._1 == id).map(_._2)
      id -> ((mine.length.toLong,
        mine.distinct.count(sp => docsPerSpan(sp) >= 2).toLong))
    }.toMap
    rows.foreach { r =>
      val (n, d) = expected(r.getLong(0))
      assert(r.getLong(1) === n, s"n_spans for doc ${r.getLong(0)}")
      assert(r.getLong(2) === d, s"n_dup_spans for doc ${r.getLong(0)}")
      assert(r.getBoolean(3) === (d > 0))
    }
  }

  test("q_hhi_sources: HHI bounded by [1/n_sources, 1], eff_sources is its inverse") {
    val rows = Pipeline14.queries("q_hhi_sources")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (srcs, hhi, eff) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(hhi >= 1.0 / srcs - 1e-12 && hhi <= 1.0)
      assert(math.abs(hhi * eff - 1.0) < 1e-9)
    }
  }

  test("q_coverage_curve: shares are monotone, counts rank-ordered, cum telescopes") {
    val rows = Pipeline14.queries("q_coverage_curve")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to rows.length))
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    val cums = rows.map(_.getLong(3))
    assert(cums.head === ns.head)
    cums.zip(cums.tail).zip(ns.tail).foreach { case ((a, b), nb) =>
      assert(b === a + nb)
    }
    val shares = rows.map(_.getDouble(4))
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a })
    assert(shares.last <= 1.0)
  }
}
