package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run the query catalog on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with total + per-query seconds.
  *
  * Measurement is `write.format("noop")` — materializes the complete
  * physical plan (a bare `count()` lets the optimizer eliminate sorts and
  * prune most of the plan, under-measuring on purpose-built queries).
  *
  * Steady-state methodology: two passes over the catalog, per-query
  * minimum reported. Pass 1 absorbs one-time JVM costs (codegen class
  * compilation, parquet footer caches, C2 warmup) and the rare one-off
  * scheduler stall we've observed (a query occasionally pays a ~40s wait
  * unrelated to its plan); pass 2 is the reproducible throughput number.
  * Set SPARK_GRAFT_BENCH_PASSES=1 for a cold single-pass run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Optional args restrict to the named queries (local iteration; the
    // driver always calls with no args → full catalog).
    val only = args.toSet
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
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
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
    // A failed pass records None, never its (fast) elapsed time: a crash
    // must not be able to improve the min-over-passes headline number.
    val timings = (1 to passes).map { pass =>
      catalog.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] pass$pass $name $sec%.2fs${if (ok) "" else " FAILED"}")
        name -> (if (ok) Some(sec) else None)
      }.toMap
    }
    val results = catalog.map { case (name, _) =>
      name -> timings.flatMap(_(name)).minOption
    }
    val failed = results.collect { case (name, None) => name }
    val qs = results.collect { case (k, Some(v)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
