package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Pipeline18Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def orderCentsWithFlag(flag: org.apache.spark.sql.Column) =
    graft.Tables(spark, dir, "orders")
      .select(round($"o_totalprice" * 100).cast("long").as("v"),
        flag.cast("int").as("g"))
      .as[(Long, Int)].collect()

  test("q_ks_test matches an in-test sequential KS computation") {
    val row = Pipeline18.queries("q_ks_test")(spark, dir).collect().head
    val data = orderCentsWithFlag(
      when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
    val g1 = data.filter(_._2 == 1).map(_._1)
    val g2 = data.filter(_._2 == 0).map(_._1)
    val values = data.map(_._1).distinct.sorted
    var c1 = 0L; var c2 = 0L; var dNum = 0L
    val m1 = g1.groupBy(identity).map { case (k, a) => k -> a.length.toLong }
    val m2 = g2.groupBy(identity).map { case (k, a) => k -> a.length.toLong }
    values.foreach { v =>
      c1 += m1.getOrElse(v, 0L); c2 += m2.getOrElse(v, 0L)
      dNum = math.max(dNum, math.abs(c1 * g2.length - c2 * g1.length))
    }
    assert(row.getLong(0) === g1.length.toLong)
    assert(row.getLong(1) === g2.length.toLong)
    assert(row.getLong(2) === dNum)
    val ksD = row.getDouble(3)
    assert(ksD >= 0.0 && ksD <= 1.0)
    assert(math.abs(ksD - dNum.toDouble / (g1.length.toLong * g2.length)) < 1e-15)
  }

  test("q_auc_rank matches pair-counting AUC (independent of the rank formula)") {
    val row = Pipeline18.queries("q_auc_rank")(spark, dir).collect().head
    val data = orderCentsWithFlag(when($"o_orderstatus" === "F", 1).otherwise(0))
    val perValue = data.groupBy(_._1).toSeq.sortBy(_._1).map { case (v, a) =>
      (v, a.count(_._2 == 1).toLong, a.count(_._2 == 0).toLong)
    }
    var negBelow = 0L; var won = 0L; var tied = 0L
    perValue.foreach { case (_, p, n) =>
      won += p * negBelow; tied += p * n; negBelow += n
    }
    val nPos = perValue.map(_._2).sum; val nNeg = perValue.map(_._3).sum
    val auc = (won + 0.5 * tied) / (nPos.toDouble * nNeg)
    assert(row.getLong(0) === nPos)
    assert(row.getLong(1) === nNeg)
    assert(math.abs(row.getDouble(3) - auc) < 1e-12)
    // u2 is the 2x-scaled U statistic: 2*(won + tied/2) exactly.
    assert(row.getLong(2) === 2 * won + tied)
  }

  test("q_survival_hazard: risk sets shrink, hazards accumulate") {
    val rows = Pipeline18.queries("q_survival_hazard")(spark, dir).collect()
    assert(rows.nonEmpty)
    val nUsers = graft.Tables(spark, dir, "events")
      .select($"user_id").distinct().count()
    // Risk set at the earliest death time covers at most everyone.
    assert(rows.head.getLong(2) <= nUsers)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1) // deaths > 0 rows only
      assert(r.getLong(1) <= r.getLong(2)) // deaths <= at-risk
      assert(r.getLong(3) > 0)
    }
    val dVals = rows.map(_.getLong(0))
    assert(dVals.sameElements(dVals.sorted))
    val risks = rows.map(_.getLong(2))
    assert(risks.zip(risks.tail).forall { case (a, b) => a >= b })
    val cum = rows.map(_.getDouble(4))
    assert(cum.zip(cum.tail).forall { case (a, b) => a < b })
  }

  test("q_max_drawdown matches an in-test sequential scan of the daily series") {
    val row = Pipeline18.queries("q_max_drawdown")(spark, dir).collect().head
    val daily = graft.Tables(spark, dir, "orders")
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .orderBy($"day")
      .select($"day".cast("string"), $"cents".cast("long"))
      .as[(String, Long)].collect()
    val nDays = daily.length.toLong
    val total = daily.map(_._2).sum
    var v = 0L; var peak = 0L; var maxDd = 0L; var trough = daily.head._1
    daily.foreach { case (day, cents) =>
      v += cents * nDays - total
      if (v > peak) peak = v
      val dd = peak - v
      if (dd > maxDd) { maxDd = dd; trough = day }
    }
    assert(row.getLong(0) === nDays)
    assert(row.getLong(1) === maxDd)
    assert(row.getString(3) === trough)
    assert(row.getDouble(2) >= 0.0)
  }
}
