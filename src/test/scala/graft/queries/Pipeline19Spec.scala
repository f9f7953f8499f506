package graft.queries

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Pipeline19Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q_ldiversity: groups partition the joined fact rows; fractions sane") {
    val rows = Pipeline19.queries("q_ldiversity")(spark, dir).collect()
    assert(rows.nonEmpty)
    val joined = graft.Tables(spark, dir, "customer")
      .join(graft.Tables(spark, dir, "orders"),
        $"c_custkey" === $"o_custkey").count()
    assert(rows.map(_.getLong(2)).sum === joined)
    rows.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 5) // five priorities exist
      assert(r.getBoolean(4) === (r.getLong(3) >= 3))
      val frac = r.getDouble(5)
      assert(frac > 0.0 && frac <= 1.0)
      // modal share is at least the uniform share
      assert(frac >= 1.0 / r.getLong(3) - 1e-12)
    }
  }

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  test("q_winnow_fingerprint reproduces a hand-computed winnowing sketch") {
    val out = Pipeline19.queries("q_winnow_fingerprint")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val docs = graft.Tables(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(out.size === docs.length)
    // Hand-compute the sketch for three documents.
    docs.take(3).foreach { case (id, text) =>
      val ws = text.split(" ", -1)
      val hs = (1 to ws.length - 2).map { i =>
        java.lang.Long.parseLong(
          md5Hex(s"${ws(i - 1)} ${ws(i)} ${ws(i + 1)}").substring(0, 15), 16)
      }
      val fps = (4 to hs.length).map(p => hs.slice(p - 4, p).min).distinct
      val (nGrams, nFp, minFp) = out(id)
      assert(nGrams === hs.length.toLong, s"doc $id gram count")
      assert(nFp === fps.length.toLong, s"doc $id fingerprint count")
      if (fps.nonEmpty) assert(minFp === Some(fps.min), s"doc $id min fp")
    }
    // Winnowing guarantee: the sketch is never larger than the gram set
    // and never empty once a full window exists.
    out.values.foreach { case (nGrams, nFp, _) =>
      assert(nFp <= math.max(nGrams - 3, 0))
      if (nGrams >= 4) assert(nFp >= 1)
    }
  }

  test("q_theil_sen matches an in-test median-of-slopes for each priority") {
    val rows = Pipeline19.queries("q_theil_sen")(spark, dir).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables(spark, dir, "orders")
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1995-02-01").cast("timestamp"))
      .groupBy($"o_orderpriority".as("prio"),
        dayofmonth($"o_orderdate").cast("long").as("d"))
      .agg(count(lit(1)).as("cnt"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    rows.foreach { r =>
      val prio = r.getString(0)
      val pts = daily(prio).map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield ((pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1),
        pts(i)._1, pts(j)._1)
      val sorted = slopes.sortBy(identity)
      assert(r.getLong(1) === slopes.length.toLong)
      val median = sorted((slopes.length + 1) / 2 - 1)._1
      assert(r.getDouble(2) === median)
    }
  }

  test("q_geo_grid_join matches a brute-force all-pairs distance census") {
    val rows = Pipeline19.queries("q_geo_grid_join")(spark, dir).collect()
    val cust = graft.Tables(spark, dir, "customer")
      .select($"c_custkey", $"c_nationkey".cast("long"))
      .as[(Long, Long)].collect()
    val supp = graft.Tables(spark, dir, "supplier")
      .select($"s_suppkey").as[Long].collect()
    val cell = 2000000L
    def cLat(k: Long) = k * 7919 % 170000001
    def cLon(k: Long) = k * 104729 % 340000001
    def sLat(k: Long) = k * 15485863 % 170000001
    def sLon(k: Long) = k * 32452843 % 340000001
    val truth = cust.map { case (ck, nat) =>
      val n = supp.count { sk =>
        val dLat = cLat(ck) - sLat(sk); val dLon = cLon(ck) - sLon(sk)
        dLat * dLat + dLon * dLon <= cell * cell
      }
      (nat, n.toLong)
    }.groupBy(_._1).map { case (nat, a) =>
      nat -> (a.length.toLong, a.count(_._2 > 0).toLong, a.map(_._2).sum)
    }
    assert(rows.length === truth.size)
    rows.foreach { r =>
      val (nCust, nWith, nPairs) = truth(r.getLong(0))
      assert(r.getLong(1) === nCust)
      assert(r.getLong(2) === nWith)
      assert(r.getLong(3) === nPairs)
    }
  }
}
