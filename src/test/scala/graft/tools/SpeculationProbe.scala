package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-executor / speculation probe (not a test): runs the
  * imperative-state operators across TWO REAL EXECUTOR PROCESSES
  * (local-cluster) — every other invariance run here is single-JVM, so
  * this is the first point where closure/row serde, netty shuffle
  * fetch, and remote broadcast transport are actually on the path —
  * with `spark.speculation=true` and a deliberate straggler (attempt 0
  * of partition 0 sleeps) in every stage computing the wrapped input.
  *
  * MEASURED LIMIT, found by this probe: a speculative COPY never
  * launches on one machine — TaskSetManager's dequeueSpeculativeTask
  * refuses to place a duplicate attempt on the same HOST as the
  * running original, and a single box has exactly one host, so the
  * scheduler marks the straggler speculatable and then finds no
  * eligible executor, forever. The probe therefore asserts result
  * invariance of the multi-process straggler run (and reports the
  * speculative-launch count, expected 0 here); true racing-attempt
  * coverage needs >= 2 hosts and is documented as out of scope in
  * BENCH_INVARIANCE.md. Commit safety for a racing loser rests on
  * Spark's output-commit coordinator, not on operator code.
  *
  * Run: SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   sbt "Test/runMain graft.tools.SpeculationProbe [sfDir]"
  * Results in BENCH_INVARIANCE.md (round 8).
  */
object SpeculationProbe {
  private def slow(df: DataFrame, ms: Long): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    // Speculation needs a MEDIAN of successful siblings before it will
    // clone a straggler (quantile × numTasks successes first) — a 1-file
    // scan stage has too few tasks, so widen the slowed stage to 32.
    val rdd = df.repartition(32).rdd.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        Thread.sleep(ms)
      it
    }
    spark.createDataFrame(rdd, schema)
  }

  private def fp(df: DataFrame): (Long, String) = {
    val r = df.select(xxhash64(to_json(struct(col("*")))).as("h"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("h").cast("decimal(38,0)")).as("s")).head()
    (r.getLong(0),
      Option(r.getDecimal(1)).map(_.toBigInteger.toString).getOrElse("0"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // Speculation is a core scheduler conf — set at context build. It is
    // DISABLED by TaskSchedulerImpl in local mode (isLocal guard), so the
    // probe needs local-cluster: two REAL executor processes, a racing
    // duplicate genuinely lands on the other executor. Run with
    // SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 (the executor
    // launcher needs both to build its command line).
    val spark = SparkSession.builder()
      .master("local-cluster[2,16,4096]")
      .appName("graft-speculation-probe")
      .withExtensions(new graft.plans.GraftExtensions().apply)
      // Executors are fresh JVMs that must load graft + scalatest-cp
      // classes; local-cluster ships nothing, so hand them the probe
      // JVM's own classpath.
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "100ms")
      .config("spark.speculation.multiplier", "1.2")
      .config("spark.speculation.quantile", "0.2")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val speculative = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null && t.taskInfo.speculative)
          speculative.incrementAndGet()
    })

    def table(name: String) = graft.Tables(spark, sfDir, name)
    import graft.operators.{Dedup, OrderStats, Similarity}

    val probes: Seq[(String, DataFrame => DataFrame, String)] = Seq(
      ("agg_control", (li: DataFrame) =>
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n")),
        "lineitem"),
      ("orderstats_running", (li: DataFrame) =>
        // Sort key includes qty: (orderkey, linenumber) is NOT unique in
        // the synthetic corpus, and running() over a tied key is
        // tie-order-sensitive by construction (the catalog's call sites
        // are tie-insensitive; a fingerprint is not). With qty in the
        // key, ties are fully-identical rows — output multiset invariant.
        OrderStats.running(
          li.select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("long").as("qty")),
          Seq(col("l_orderkey"), col("l_linenumber"), col("qty")),
          Some("rn"), cumLong = Seq("qty" -> "cum_qty")),
        "lineitem"),
      ("dedup_lsh_clusters", (docs: DataFrame) =>
        Dedup.resolveClusters(Dedup.minhashLshPairs(docs, t10 = 8)),
        "documents"),
      ("cosine_neardup_adaptive", (emb: DataFrame) =>
        Similarity.cosineNearDupPairs(Similarity.withNorm(emb),
          threshold = 0.3, bits = 4, salts = 8,
          taskPairBudget = 16000000L),
        "embeddings"))

    var bad = 0
    for ((name, run, tbl) <- probes) {
      val clean = fp(run(table(tbl)))
      val s0 = speculative.get()
      val raced = fp(run(slow(table(tbl), 4000L)))
      val nSpec = speculative.get() - s0
      val ok = clean == raced
      if (!ok) bad += 1
      println(s"[speculation-probe] $name clean=$clean raced=$raced " +
        s"speculativeTasks=$nSpec ${if (ok) "OK" else "MISMATCH"}")
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    println(s"[speculation-probe] RESULT ${probes.size - bad}/${probes.size} " +
      s"invariant, speculative launches=${speculative.get()} " +
      "(expected 0 on one host: same-host exclusion)")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
