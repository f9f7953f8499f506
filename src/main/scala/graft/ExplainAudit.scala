import org.apache.spark.sql.SparkSession

/** Plan-shape audit CLI: per catalog query, counts parquet scans,
  * exchanges, and RDD scans, and flags nested-loop/cartesian joins —
  * the quick "would this survive 100×" triage before reading a full
  * `.explain("formatted")`.
  *
  * Usage: `sbt "runMain ExplainAudit q_foo q_bar"` (all queries if no
  * args). Complements PlanQualitySpec, which pins the same properties
  * as regression tests for the headline queries.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEngine.session("local[4]", 4)
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      val p = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val scans = p.split("Scan parquet").length - 1
      val exch = p.split("Exchange").length - 1
      val rddScans = p.split("Scan ExistingRDD").length - 1
      println(s"AUDIT $q: parquetScans=$scans exchanges=$exch rddScans=$rddScans " +
        s"bnlj=${p.contains("BroadcastNestedLoopJoin")} cart=${p.contains("CartesianProduct")}")
    }
    spark.stop()
  }
}
