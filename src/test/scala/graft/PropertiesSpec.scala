package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{AsofJoin, Preview, Regression, SortedDelays}

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

  // As-of join: every strategy × tolerance combination against a per-row
  // naive oracle. Small keyspace and timespace force the hard cases —
  // equal timestamps, tie-broken duplicates, keys missing on one side.
  private val asofData: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
    for {
      nl <- Gen.chooseNum(1, 12)
      nr <- Gen.chooseNum(0, 12)
      l <- Gen.listOfN(nl, for {
        k <- Gen.chooseNum(1L, 3L); t <- Gen.chooseNum(0L, 20L)
      } yield (k, t))
      r <- Gen.listOfN(nr, for {
        k <- Gen.chooseNum(1L, 3L); t <- Gen.chooseNum(0L, 20L)
      } yield (k, t))
    } yield (
      l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
      r.zipWithIndex.map { case ((k, t), i) => (100L + i, k, t) })

  private def naiveAsof(
      left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)],
      strategy: AsofJoin.Strategy, tol: Option[Long]): Map[Long, Option[Long]] =
    left.map { case (lid, k, lt) =>
      def pick(cands: Seq[(Long, Long, Long)], latest: Boolean): Option[(Long, Long, Long)] =
        if (cands.isEmpty) None
        else Some(cands.maxBy { case (rid, _, rt) => (if (latest) rt else -rt, rid) })
      val back = pick(right.filter { case (_, rk, rt) =>
        rk == k && rt <= lt && tol.forall(lt - rt <= _) }, latest = true)
      val fwd = pick(right.filter { case (_, rk, rt) =>
        rk == k && rt >= lt && tol.forall(rt - lt <= _) }, latest = false)
      val chosen = strategy match {
        case AsofJoin.Backward => back
        case AsofJoin.Forward => fwd
        case AsofJoin.Nearest => (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (lt - b._3 <= f._3 - lt) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
      }
      lid -> chosen.map(_._1)
    }.toMap

  // random graphs: node ids sparse (collision-prone labels), edge lists
  // with duplicates, partitioned adversarially — the shapes that break
  // distributed connected components. `salt` randomizes the partition
  // KEYING, not just the count: repartition(n, expr) hash-clusters by an
  // arbitrary salted mix of the endpoints, so edges of one component
  // land together on some draws and scatter maximally on others —
  // exercising the cross-partition root-edge path of the two-level
  // contraction, which a plain round-robin repartition rarely stresses.
  private val graphs: Gen[(List[(Long, Long)], Int, Int)] = for {
    n <- Gen.chooseNum(2, 60)
    e <- Gen.chooseNum(1, 120)
    edges <- Gen.listOfN(e, for {
      a <- Gen.chooseNum(0, n - 1)
      b <- Gen.chooseNum(0, n - 1)
      if a != b
    } yield (a.toLong * 13 + 7, b.toLong * 13 + 7))
    parts <- Gen.chooseNum(1, 9)
    salt <- Gen.chooseNum(0, 1000)
  } yield (edges, parts, salt)

  property("cluster resolution: component minimum under any partitioning") =
    forAll(graphs) { case (edges, parts, salt) =>
      edges.isEmpty || {
        import spark.implicits._
        import org.apache.spark.sql.functions.expr
        val pairs = edges.toDF("a_id", "b_id")
          .repartition(parts, expr(s"pmod(a_id * $salt + b_id, ${parts * 3 + 1})"))
        val got = operators.Dedup.resolveClusters(pairs)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // in-test union-find oracle
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        val want = parent.keys.map(nd => nd -> find(nd)).toMap
        got == want
      }
    }

  // corpus/batch with forced overlap: bloom screening + exact verify must
  // equal a plain anti join regardless of filter sizing
  private val corpora: Gen[(List[String], List[String], Long)] = for {
    nc <- Gen.chooseNum(1, 40)
    nb <- Gen.chooseNum(1, 40)
    corpus <- Gen.listOfN(nc, Gen.chooseNum(0, 60).map(i => s"doc $i"))
    batch <- Gen.listOfN(nb, Gen.chooseNum(0, 60).map(i => s"doc $i"))
    bits <- Gen.oneOf(64L, 512L, 65536L) // undersized filters too
  } yield (corpus, batch, bits)

  property("bloom-screened dedup equals the naive anti join at any sizing") =
    forAll(corpora) { case (corpus, batch, bits) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val c = corpus.toDF("text")
      val b = batch.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val bf = functions.BloomFunctions.build(c, col("text"), 100L, bits)
      val kept = b.filter(!functions.BloomFunctions.mightContain(bf, col("text")))
        .unionByName(
          b.filter(functions.BloomFunctions.mightContain(bf, col("text")))
            .join(c, Seq("text"), "left_anti"))
        .select("id").as[Long].collect().toSet
      val want = batch.zipWithIndex.collect {
        case (t, i) if !corpus.contains(t) => i.toLong
      }.toSet
      kept == want
    }

  property("Misra-Gries candidates ⊇ true heavy hitters at any partitioning") =
    forAll(
      Gen.chooseNum(2, 8),                 // sketch capacity k
      Gen.chooseNum(1, 16),                // partitions
      Gen.listOfN(120, Gen.frequency(      // skewed term stream
        5 -> Gen.const("hot"),
        3 -> Gen.oneOf("warm1", "warm2"),
        4 -> Gen.chooseNum(0, 500).map(i => s"n$i")))) { (k, parts, terms) =>
      import spark.implicits._
      val df = terms.toDF("term").repartition(parts)
      val cands = df.agg(graft.functions.MisraGries.candidates(
          org.apache.spark.sql.functions.col("term"), k))
        .as[Seq[String]].head().toSet
      val counts = terms.groupBy(identity).view.mapValues(_.size).toMap
      val heavy = counts.filter(_._2 > terms.size / (k + 1)).keySet
      cands.size <= k && (heavy -- cands).isEmpty
    }

  property("asof join: all strategies and tolerances match the naive oracle") =
    forAll(asofData, Gen.option(Gen.chooseNum(0L, 10L))) { case ((l, r), tol) =>
      import spark.implicits._
      val left = l.toDF("l_id", "k", "t")
      val right = r.toDF("r_id", "k", "t")
      Seq(AsofJoin.Backward, AsofJoin.Forward, AsofJoin.Nearest).forall { st =>
        val got = AsofJoin.leftAsof(left, right, "k", "t", "t",
            rightCols = Seq("r_id"), tieBreak = "r_id", strategy = st,
            tolerance = tol.map(v => org.apache.spark.sql.functions.lit(v)))
          .select("l_id", "asof_r_id").collect()
          .map(row => row.getLong(0) ->
            (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
        val want = naiveAsof(l, r, st, tol)
        got == want
      }
    }

  private val rangeJoinCase: Gen[(List[Long], List[(Long, Long)], Long)] = for {
    nP <- Gen.chooseNum(1, 40)
    ps <- Gen.listOfN(nP, Gen.chooseNum(-200L, 200L))
    nI <- Gen.chooseNum(1, 15)
    ivs <- Gen.listOfN(nI, for {
      lo <- Gen.chooseNum(-200L, 200L)
      span <- Gen.chooseNum(-20L, 120L) // negative spans exercise the guard
    } yield (lo, lo + span))
    w <- Gen.chooseNum(1L, 97L) // include widths that don't divide anything
  } yield (ps, ivs, w)

  property("RangeBinRule: binned join ≡ naive join for any data and width") =
    forAll(rangeJoinCase) { case (ps, ivs, w) =>
      import spark.implicits._
      val points = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("p_id", "p")
      val intervals = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iv_id", "lo", "hi")
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("p_id", "iv_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val q = points.join(intervals,
        intervals("lo") <= points("p") && points("p") < intervals("hi"))
      val naive = pairs(q)
      spark.conf.set(graft.plans.RangeBinRule.WidthConf, w.toString)
      val binned =
        try pairs(points.join(intervals,
          intervals("lo") <= points("p") && points("p") < intervals("hi")))
        finally spark.conf.set(graft.plans.RangeBinRule.WidthConf, "0")
      binned == naive
    }
}
