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
      assert(plan.contains("SelectedBucketsCount: 4 out of 4"), plan)
      // with one file per bucket (writeBucketed pre-shuffles to guarantee
      // it) the sortBy metadata also removes the per-bucket Sort —
      // opt-in since SPARK-28746 because multi-file buckets interleave
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val p2 = Buckets.bucketedJoin(spark, "bkt_a", "bkt_b", "k")
        .queryExecution.executedPlan.toString
      assert(!p2.contains("+- Sort ["), s"one-file buckets still re-sort\n$p2")
    } finally {
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
