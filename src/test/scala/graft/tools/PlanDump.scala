package graft.tools
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    args.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      println(s"==== $q ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
