package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole forked test JVM (suites run
  * sequentially in sbt's single fork; per-suite sessions would pay the
  * ~20s Spark boot repeatedly).
  */
object TestSpark {
  lazy val spark: SparkSession = SparkEngine.session("local[4]", shufflePartitions = 4)
}
