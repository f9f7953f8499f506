package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run the query catalog on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with total + per-query seconds.
  *
  * Measurement is `write.format("noop")` — materializes the complete
  * physical plan (a bare `count()` lets the optimizer eliminate sorts and
  * prune most of the plan, under-measuring on purpose-built queries).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Optional args restrict to the named queries (local iteration; the
    // driver always calls with no args → full catalog).
    val only = args.toSet
    // Brief: bench runs at local[32].
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Same nondeterministic AQE stage-wait stall as Verify (see there);
      // at local bench scale AQE only adds variance, so pin it off for
      // stable, comparable numbers. Production sessions (SparkEngine)
      // keep AQE on.
      .config("spark.sql.adaptive.enabled", "false")
      // See SparkEngine: ICU case-mapping static init can stall minutes.
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name $sec%.2fs")
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
