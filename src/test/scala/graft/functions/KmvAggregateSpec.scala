package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KmvAggregateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 64

  test("below k distinct values the sketch is the exact count") {
    val df = spark.range(40).select(($"id" % 20).cast("string").as("s"))
    val est = df.agg(KmvSketch.kmv($"s", k)).as[Double].head()
    assert(est === 20.0)
  }

  test("estimate matches the DataFrame-ops KMV formulation bit-for-bit") {
    val df = spark.range(100000).select(($"id" % 7341).cast("string").as("s"))
    // reference formulation: k-th smallest 60-bit md5-prefix hash
    val h = df.select(
        conv(substring(HashFunctions.md5fast($"s"), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val hk = h.orderBy($"h").limit(k).orderBy($"h".desc).limit(1)
      .as[Long].head()
    val expected = (k - 1).toDouble * 1152921504606846976.0 / hk.toDouble
    val est = df.agg(KmvSketch.kmv($"s", k)).as[Double].head()
    assert(est === expected)
    // sanity: the estimate lands near the true cardinality (~1/sqrt(k))
    assert(math.abs(est - 7341.0) / 7341.0 < 0.25, s"estimate $est vs 7341")
  }

  test("partitioning-invariant: partial buffers merge to the same sketch") {
    val df = spark.range(50000).select(($"id" % 4211).cast("string").as("s"))
    val ests = Seq(1, 7, 32).map { p =>
      df.repartition(p).agg(KmvSketch.kmv($"s", k)).as[Double].head()
    }
    assert(ests.distinct.size === 1, s"estimates diverged: $ests")
  }

  test("registered as a SQL function via GraftExtensions") {
    spark.range(1000).select(($"id" % 50).cast("string").as("s"))
      .createOrReplaceTempView("kmv_in")
    val est = spark.sql(s"SELECT graft_kmv(s, $k) FROM kmv_in").as[Double].head()
    assert(est === 50.0) // below k → exact
  }

  test("nulls are ignored like built-in aggregates") {
    val df = Seq(Some("a"), None, Some("b"), Some("a")).toDF("s")
    assert(df.agg(KmvSketch.kmv($"s", k)).as[Double].head() === 2.0)
  }
}
