package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Pipeline17Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q_zonemap_prune: sorted layout prunes at least as well; row accounting exact") {
    val rows = Pipeline17.queries("q_zonemap_prune")(spark, dir).collect()
    assert(rows.length === 2)
    val byLayout = rows.map(r => r.getString(0) -> r).toMap
    val nat = byLayout("natural"); val srt = byLayout("shipdate")
    // Same corpus → same zone count and same true match count.
    assert(nat.getLong(1) === srt.getLong(1))
    assert(nat.getLong(4) === srt.getLong(4))
    // A shipdate-sorted layout can only prune MORE zones for a date range.
    assert(srt.getLong(2) >= nat.getLong(2))
    assert(srt.getLong(3) <= nat.getLong(3))
    rows.foreach { r =>
      // matches survive pruning: scanned rows cover all matching rows
      assert(r.getLong(4) <= r.getLong(3))
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
    // Oracle-style census: matching rows from a direct filter.
    val truth = graft.Tables(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-02-01").cast("timestamp")).count()
    assert(nat.getLong(4) === truth)
  }

  test("q_cuped: adjusted variance never exceeds raw; means preserved at theta scale") {
    val rows = Pipeline17.queries("q_cuped")(spark, dir).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val varY = r.getDouble(5); val varAdj = r.getDouble(6)
      assert(varY >= 0.0 && varAdj >= 0.0)
      // CUPED with pooled theta cannot inflate variance much; allow tiny
      // slack for the arm-vs-pool theta mismatch.
      assert(varAdj <= varY * 1.05)
    }
    val arms = rows.map(_.getLong(0)).sorted
    assert(arms.sameElements(Array(0L, 1L)))
  }

  test("q_record_linkage: every self-pair scores 7 so recall is perfect at threshold") {
    val rows = Pipeline17.queries("q_record_linkage")(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val correct = rows.map(_.getLong(2)).sum
    val nCust = graft.Tables(spark, dir, "customer").count()
    // Every left record finds some link at score>=4 (its true twin always
    // agrees on >= name-or-segment majority).
    assert(total === nCust)
    assert(correct.toDouble / total > 0.9)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("q_calibration: bins partition orders; rank deciles are monotone in score") {
    val rows = Pipeline17.queries("q_calibration")(spark, dir).collect()
    assert(rows.length === 10)
    val n = graft.Tables(spark, dir, "orders").count()
    assert(rows.map(_.getLong(1)).sum === n)
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a < b })
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("q_ipf_raking: raked margins approach population margins") {
    val out = Pipeline17.queries("q_ipf_raking")(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // The LAST half-step scales segment margins, so those are tight (only
    // integer-DIV quantization). Nation margins are only approached — IPF
    // on sparse cells (tiny nations, missing sample cells) cannot hit
    // them in two rounds — so check them loosely and only where the
    // population is big enough to be rakeable.
    val bySeg = rows.groupBy(_.getString(1)).map { case (seg, rs) =>
      seg -> rs.map(r => r.getLong(2) * r.getDouble(4)).sum
    }
    val popSeg = graft.Tables(spark, dir, "customer")
      .groupBy($"c_mktsegment").count().as[(String, Long)].collect().toMap
    bySeg.foreach { case (seg, w) =>
      val pop = popSeg(seg).toDouble
      assert(math.abs(w - pop) / pop < 0.01,
        s"segment $seg raked to $w vs pop $pop")
    }
    val byNat = rows.groupBy(_.getLong(0)).map { case (nat, rs) =>
      nat -> rs.map(r => r.getLong(2) * r.getDouble(4)).sum
    }
    val popNat = graft.Tables(spark, dir, "customer")
      .groupBy($"c_nationkey".cast("long")).count()
      .as[(Long, Long)].collect().toMap
    byNat.filter { case (nat, _) => popNat(nat) >= 30 }.foreach {
      case (nat, w) =>
        val pop = popNat(nat).toDouble
        assert(math.abs(w - pop) / pop < 0.35,
          s"nation $nat raked to $w vs pop $pop")
    }
    rows.foreach(r => assert(r.getDouble(4) > 0.0))
  }
}
