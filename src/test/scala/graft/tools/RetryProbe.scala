package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Task-retry invariance probe (not a test): at 1000 executors task
  * retries are ROUTINE (preemption, spot loss, OOM-kills), and Spark's
  * recovery model recomputes the failed task's partition from lineage —
  * so every operator's RESULT must be invariant under "some task ran
  * twice, first attempt discarded mid-flight". The oracle gate can't
  * see this (local runs never retry), and the operators most at risk
  * are exactly the imperative per-partition ones the engine leans on:
  * the union-find contraction, the OrderStats two-pass prefix scan
  * (per-partition offsets collected on the driver between passes), the
  * iterative k-means builds, and the histogram-driven adaptive salting.
  *
  * Method: wrap each INPUT table so that attempt 0 of partition 0
  * throws in every stage that computes it (`local[32,3]` gives the
  * scheduler 2 spare attempts; attempt 1 always succeeds, so no stage
  * can abort). Run each probe clean and injected in the same session,
  * fingerprint both results order-independently (count + sum of
  * per-row xxhash64 over the JSON'd row), and require equality — plus
  * proof via listener that failures actually fired.
  *
  * Run: sbt "Test/runMain graft.tools.RetryProbe [sfDir]"
  * Results recorded in IMPLEMENTATION.md (round 8).
  */
object RetryProbe {
  /** Rebuild `df` so attempt 0 of partition 0 fails in every stage that
    * computes it. The df→rdd→df round-trip also severs scan pushdown,
    * which is fine: the probe tests SEMANTIC invariance, not plans.
    */
  private def faulty(df: DataFrame, label: String): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val rdd = df.rdd.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException(s"[retry-probe] injected failure: $label")
      it
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Order-independent fingerprint: (row count, Σ xxhash64(row json)).
    * JSON'ing the whole row normalizes floats/arrays identically on
    * both sides; the decimal sum cannot overflow.
    */
  private def fp(df: DataFrame): (Long, String) = {
    val r = df.select(xxhash64(to_json(struct(col("*")))).as("h"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("h").cast("decimal(38,0)")).as("s")).head()
    // BigInteger string: BigDecimal.equals is scale-sensitive, the
    // integer rendering is not.
    (r.getLong(0),
      Option(r.getDecimal(1)).map(_.toBigInteger.toString).getOrElse("0"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // Production-shaped session (AQE on, full extensions) with retry
    // headroom: maxFailures=3 means one injected failure per task
    // attempt chain still leaves a spare.
    val spark = graft.SparkEngine.session("local[32,3]")
    spark.sparkContext.setLogLevel("ERROR") // injected stacktraces are noise
    val failures = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.reason != org.apache.spark.Success) failures.incrementAndGet()
    })

    def table(name: String) = graft.Tables(spark, sfDir, name)

    import graft.operators.{Dedup, OrderStats, Similarity}

    // Each probe: input → result, exercised clean and injected.
    val probes: Seq[(String, DataFrame => DataFrame, String)] = Seq(
      ("agg_control", (li: DataFrame) =>
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n")),
        "lineitem"),
      ("orderstats_running", (li: DataFrame) =>
        // Sort key includes qty: (orderkey, linenumber) is NOT unique in
        // the synthetic corpus (found by SpeculationProbe), and running()
        // over a tied key is tie-order-sensitive by construction. With
        // qty in the key, ties are fully-identical rows — the output
        // multiset has ONE correct answer for the fingerprint to pin.
        OrderStats.running(
          li.select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("long").as("qty")),
          Seq(col("l_orderkey"), col("l_linenumber"), col("qty")),
          Some("rn"), cumLong = Seq("qty" -> "cum_qty")),
        "lineitem"),
      ("dedup_lsh_clusters", (docs: DataFrame) =>
        Dedup.resolveClusters(Dedup.minhashLshPairs(docs, t10 = 8)),
        "documents"),
      ("ivf_knn", (emb: DataFrame) =>
        Similarity.ivfKnn(Similarity.withNorm(emb),
          nCells = Similarity.scaledCells(emb.count()), k = 3, iters = 2,
          nprobe = 2),
        "embeddings"),
      ("cosine_neardup_adaptive", (emb: DataFrame) =>
        Similarity.cosineNearDupPairs(Similarity.withNorm(emb),
          threshold = 0.3, bits = 4, salts = 8,
          taskPairBudget = 16000000L),
        "embeddings"))

    var bad = 0
    for ((name, run, tbl) <- probes) {
      val clean = fp(run(table(tbl)))
      val f0 = failures.get()
      val hurt = fp(run(faulty(table(tbl), name)))
      val nFail = failures.get() - f0
      val ok = clean == hurt && nFail > 0
      if (!ok) bad += 1
      println(s"[retry-probe] $name clean=$clean injected=$hurt " +
        s"taskFailures=$nFail ${if (ok) "OK" else "MISMATCH"}")
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    println(s"[retry-probe] RESULT ${probes.size - bad}/${probes.size} invariant under task retry")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
