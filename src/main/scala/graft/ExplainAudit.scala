import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** Plan-shape audit CLI: per catalog query, counts parquet scans,
  * exchanges, and RDD scans, and flags nested-loop/cartesian joins —
  * the quick "would this survive 100×" triage before reading a full
  * `.explain("formatted")`.
  *
  * Nested-loop joins are split into two flags: `bnlj` (a real unbounded
  * nested loop — the scale-killer) and `scalarBnlj` (the build side is a
  * global no-key aggregate, i.e. exactly one row — the standard plan for
  * "cross join a computed scalar", O(N) and harmless). Auditing them as
  * one category buried the signal in scalar-subquery noise.
  *
  * Usage: `sbt "runMain ExplainAudit q_foo q_bar"` (all queries if no
  * args). Complements PlanQualitySpec, which pins the same properties
  * as regression tests for the headline queries.
  */
object ExplainAudit {

  /** True when this BNLJ's broadcast side provably produces ≤ 1 row:
    * its subtree ends in a grouping-key-free aggregate (or reuses an
    * exchange of one — ReusedExchangeExec is a leaf, so inspect the
    * whole-plan context supplied by the caller).
    */
  private def isScalar(j: BroadcastNestedLoopJoinExec, whole: SparkPlan): Boolean = {
    val build = j.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
    }
    def scalarTree(p: SparkPlan): Boolean =
      p.find {
        case a: BaseAggregateExec => a.groupingExpressions.isEmpty
        case _ => false
      }.isDefined
    scalarTree(build) ||
      // reused broadcast of a scalar computed elsewhere in the plan
      (build.find(_.isInstanceOf[ReusedExchangeExec]).isDefined && scalarTree(whole))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEngine.session("local[4]", 4)
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      // Unwrap AQE: AdaptiveSparkPlanExec holds the real plan as a field,
      // not a child, so TreeNode.collect would see an empty tree.
      val plan = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val p = plan.toString
      val scans = p.split("Scan parquet").length - 1
      val exch = p.split("Exchange").length - 1
      val rddScans = p.split("Scan ExistingRDD").length - 1
      val bnl = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
      val (scalar, real) = bnl.partition(isScalar(_, plan))
      println(s"AUDIT $q: parquetScans=$scans exchanges=$exch rddScans=$rddScans " +
        s"bnlj=${real.nonEmpty} scalarBnlj=${scalar.size} " +
        s"cart=${p.contains("CartesianProduct")}")
    }
    spark.stop()
  }
}
