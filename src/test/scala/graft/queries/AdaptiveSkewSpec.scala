package graft.queries

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** AQE skew-join handling — the runtime half of the skew story. The
  * catalog's manual path (operators/SkewJoin.saltedInner) is for keys
  * KNOWN to be hot; for everything else the engine should detect and
  * split oversized partitions at runtime. This spec proves the session
  * config actually triggers that: a join with one pathological hot key
  * re-plans with skew=true splits instead of one straggler task — the
  * difference between a 100 TB join finishing and one task running for
  * hours.
  */
class AdaptiveSkewSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions").map(k => k -> conf.getOption(k)).toMap
    try {
      // Force a sort-merge join and make the skew detector fire on
      // test-sized data (defaults are tuned for 256 MB partitions).
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.shuffle.partitions", "4")

      // key 0 carries 100k rows; keys 1-99 carry 10 each.
      val left = spark.range(100000).select(lit(0L).as("k"), col("id").as("payload"))
        .union(spark.range(990).select((col("id") % 99 + 1).as("k"), col("id").as("payload")))
      val right = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("dim"))
      // Execute THIS DataFrame's own QueryExecution (write()/count()
      // spawn fresh ones whose adaptive plan we couldn't inspect).
      val joined = left.join(right, "k")
      joined.collect()

      val smj = collect(joined.queryExecution.executedPlan) {
        case j: SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, "expected a sort-merge join\n" +
        joined.queryExecution.executedPlan)
      assert(smj.exists(_.isSkewJoin),
        "AQE did not mark the join skewed\n" + joined.queryExecution.executedPlan)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
