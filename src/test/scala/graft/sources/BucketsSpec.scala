package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BucketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("join of two same-bucketed tables plans with zero shuffle") {
    val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 100).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Buckets.writeBucketed(a, "bkt_a", "k", buckets = 4)
    Buckets.writeBucketed(b, "bkt_b", "k", buckets = 4)
    // Force a sort-merge join: tiny test tables would broadcast, which
    // sidesteps bucketing entirely (at real scale neither side fits).
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Buckets.bucketedJoin(spark, "bkt_a", "bkt_b", "k")
      assert(joined.count() === 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
