package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{BadRequestException, TestSpark}

/** Reference-parity oracle: the sequential-sum OLS loop from
  * main.rs:149-196, reimplemented naively for comparison (1e-9 relative
  * tolerance per SURVEY.md §2 note (b)).
  */
object SequentialOls {
  def run(xs: Seq[Option[Double]], ys: Seq[Option[Double]])
      : Either[String, (Double, Double, Option[Double])] = {
    val n = xs.length.toDouble
    if (n == 0) return Left("no rows")
    var sx = 0.0; var sy = 0.0; var sxy = 0.0; var sxx = 0.0; var syy = 0.0
    xs.zip(ys).foreach { case (xo, yo) =>
      val x = xo.getOrElse(0.0); val y = yo.getOrElse(0.0)
      sx += x; sy += y; sxy += x * y; sxx += x * x; syy += y * y
    }
    val denom = n * sxx - sx * sx
    if (denom == 0.0) return Left("zero variance")
    val slope = (n * sxy - sx * sy) / denom
    val intercept = (sy - slope * sx) / n
    val ssTot = n * syy - sy * sy
    val r2 = if (ssTot == 0.0) None
      else Some((n * sxy - sx * sy) * (n * sxy - sx * sy) / (denom * ssTot))
    Right((slope, intercept, r2))
  }
}

class RegressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def relErr(a: Double, b: Double): Double =
    if (a == b) 0.0 else math.abs(a - b) / math.max(math.abs(a), math.abs(b))

  test("exact line y = 2x + 1 → slope 2, intercept 1, r2 1") {
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i + 1)).toDF("x", "y")
    val r = Regression.run(df, "x", "y")
    assert(relErr(r.slope, 2.0) < 1e-9)
    assert(relErr(r.intercept, 1.0) < 1e-9)
    assert(relErr(r.r2.get, 1.0) < 1e-9)
  }

  test("nulls become 0.0, not dropped (main.rs:163-164)") {
    val df = Seq((Some(1.0), Some(2.0)), (None, Some(4.0)), (Some(3.0), None))
      .toDF("x", "y")
    val r = Regression.run(df, "x", "y")
    val Right((s, i, _)) = SequentialOls.run(
      Seq(Some(1.0), None, Some(3.0)), Seq(Some(2.0), Some(4.0), None))
    assert(relErr(r.slope, s) < 1e-9)
    assert(relErr(r.intercept, i) < 1e-9)
  }

  test("unparseable strings cast to null → 0.0 (polars non-strict cast)") {
    val df = Seq(("1.5", "3.0"), ("oops", "6.0"), ("4.5", "bad"))
      .toDF("x", "y")
    val r = Regression.run(df, "x", "y")
    val Right((s, _, _)) = SequentialOls.run(
      Seq(Some(1.5), None, Some(4.5)), Seq(Some(3.0), Some(6.0), None))
    assert(relErr(r.slope, s) < 1e-9)
  }

  test("empty dataset → 400 (main.rs:151-153)") {
    val df = Seq.empty[(Double, Double)].toDF("x", "y")
    assertThrows[BadRequestException](Regression.run(df, "x", "y"))
  }

  test("zero-variance x → 400 (main.rs:176-178)") {
    val df = Seq((2.0, 1.0), (2.0, 5.0), (2.0, 9.0)).toDF("x", "y")
    assertThrows[BadRequestException](Regression.run(df, "x", "y"))
  }

  test("constant y → ss_tot == 0 → r2 None (main.rs:192-196)") {
    val df = Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0)).toDF("x", "y")
    assert(Regression.run(df, "x", "y").r2.isEmpty)
  }

  test("missing column → 400 (main.rs:134-136)") {
    val df = Seq((1.0, 2.0)).toDF("x", "y")
    assertThrows[BadRequestException](Regression.run(df, "x", "z"))
  }

  test("property: matches sequential-sum oracle within 1e-9 relative") {
    val rnd = new scala.util.Random(42)
    (1 to 10).foreach { _ =>
      val pts = List.fill(40)((rnd.nextDouble() * 2e3 - 1e3, rnd.nextDouble() * 2e3 - 1e3))
      val df = pts.toDF("x", "y")
      val r = Regression.run(df, "x", "y")
      val Right((s, i, r2)) = SequentialOls.run(
        pts.map(p => Some(p._1)), pts.map(p => Some(p._2)))
      assert(relErr(r.slope, s) < 1e-9)
      assert(relErr(r.intercept, i) < 1e-9)
      (r.r2, r2) match {
        case (Some(a), Some(b)) => assert(relErr(a, b) < 1e-6)
        case (a, b) => assert(a.isDefined === b.isDefined)
      }
    }
  }
}
