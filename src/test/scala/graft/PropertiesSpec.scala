package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{Preview, Regression, SortedDelays}

/** ScalaCheck property suite (SURVEY.md §5 item 4): regression closed
  * forms against an in-test sequential implementation, sort as an ordered
  * permutation, limit bounds. Case counts kept small — every case runs
  * Spark jobs.
  */
object PropertiesSpec extends Properties("graft") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val pairs: Gen[List[(Double, Double)]] = Gen.sized { _ =>
    Gen.chooseNum(2, 30).flatMap { n =>
      Gen.listOfN(n, for {
        x <- Gen.chooseNum(-100.0, 100.0)
        y <- Gen.chooseNum(-100.0, 100.0)
      } yield (x, y))
    }
  }

  /** The reference's sequential-sum OLS (main.rs:162-196), in-test. */
  private def naiveOls(xs: Seq[Double], ys: Seq[Double]): Option[(Double, Double, Option[Double])] = {
    val n = xs.length.toDouble
    var sx = 0.0; var sy = 0.0; var sxy = 0.0; var sxx = 0.0; var syy = 0.0
    xs.zip(ys).foreach { case (x, y) =>
      sx += x; sy += y; sxy += x * y; sxx += x * x; syy += y * y
    }
    val denom = n * sxx - sx * sx
    if (denom == 0.0) None
    else {
      val slope = (n * sxy - sx * sy) / denom
      val intercept = (sy - slope * sx) / n
      val ssTot = n * syy - sy * sy
      val r2 = if (ssTot == 0.0) None
        else Some((n * sxy - sx * sy) * (n * sxy - sx * sy) / (denom * ssTot))
      Some((slope, intercept, r2))
    }
  }

  private def relEq(a: Double, b: Double): Boolean =
    math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  property("regression matches the sequential-sum oracle at 1e-9") =
    forAll(pairs) { data =>
      import spark.implicits._
      val df = data.toDF("x", "y")
      naiveOls(data.map(_._1), data.map(_._2)) match {
        case None =>
          try { Regression.run(df, "x", "y"); false }
          catch { case _: BadRequestException => true }
        case Some((slope, intercept, r2)) =>
          val r = Regression.run(df, "x", "y")
          relEq(r.slope, slope) && relEq(r.intercept, intercept) &&
            ((r.r2, r2) match {
              case (Some(a), Some(b)) => relEq(a, b)
              case (None, None) => true
              case _ => false
            })
      }
    }

  property("constant x is the 400 path; constant y gives r2 None") = {
    import spark.implicits._
    val constX = Seq((2.0, 1.0), (2.0, 5.0), (2.0, 9.0)).toDF("x", "y")
    val constY = Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0)).toDF("x", "y")
    val xThrows =
      try { Regression.run(constX, "x", "y"); false }
      catch { case _: BadRequestException => true }
    xThrows && Regression.run(constY, "x", "y").r2.isEmpty
  }

  private val delays: Gen[List[(Option[Int], String)]] =
    Gen.chooseNum(0, 25).flatMap { n =>
      Gen.listOfN(n, for {
        d <- Gen.option(Gen.chooseNum(-50, 50))
        tag <- Gen.alphaStr.map(_.take(4))
      } yield (d, tag))
    }

  property("sort is an ordered permutation; limit bounds the output") =
    forAll(delays, Gen.option(Gen.chooseNum(0, 30))) { (data, limit) =>
      import spark.implicits._
      val df = data.toDF("delay_min", "tag")
      val out = SortedDelays.run(df, Some(SortedDelays.Asc), limit)
        .select("delay_min").collect().map(r =>
          if (r.isNullAt(0)) None else Some(r.getInt(0))).toList
      val expectedLen = limit.fold(data.length)(l => math.min(l, data.length))
      val sortedAll = data.map(_._1).sortBy(d => (d.isDefined, d.getOrElse(0)))
      out.length == expectedLen && out == sortedAll.take(expectedLen)
    }

  property("preview returns min(limit, n) rows, default 100") =
    forAll(Gen.chooseNum(0, 150), Gen.option(Gen.chooseNum(0, 120))) { (n, limit) =>
      import spark.implicits._
      val df = (1 to n).map(i => (i, s"r$i")).toDF("delay", "s")
      val out = Preview.run(df, limit).collect()
      out.length == math.min(limit.getOrElse(100), n)
    }
}
