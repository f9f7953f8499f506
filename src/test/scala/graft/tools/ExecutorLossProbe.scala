package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Executor-loss probe (not a test): the fault a 1000-executor run
  * takes DAILY — a node dies mid-query (spot reclaim, OOM-kill,
  * hardware) — and the one axis no single-JVM run can fake. Two real
  * executor processes (local-cluster); the probe `kill -9`s one and
  * measures what the engine does.
  *
  * Two kill modes:
  *
  *  1. RACING: the query runs stretched (attempt-0 tasks of the
  *     wrapped input sleep) while a killer thread destroys one
  *     executor mid-flight. Running tasks die (ExecutorLostFailure),
  *     finished map outputs on the dead executor are lost
  *     (FetchFailed → parent stage partially re-executed), and the
  *     standalone master relaunches a replacement. For plans built
  *     purely from lineage this must RECOVER with an unchanged
  *     fingerprint.
  *
  *  2. CHECKPOINT-LOSS (deterministic): `localCheckpoint` TRUNCATES
  *     lineage — its blocks are the only copy of that frame. The probe
  *     materializes a checkpoint, kills an executor, then consumes:
  *     at the default storage level roughly half the blocks are gone
  *     and the query MUST fail (measured, not argued); at a ×2
  *     replicated level every block has a surviving replica and the
  *     same consume must succeed. This is the measurement behind
  *     `graft.Ckpt`'s executor-aware replication policy.
  *
  * Run: SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   sbt "Test/runMain graft.tools.ExecutorLossProbe [sfDir]"
  * Results in BENCH_INVARIANCE.md (round 8).
  */
object ExecutorLossProbe {
  private def fp(df: DataFrame): (Long, String) = {
    val r = df.select(xxhash64(to_json(struct(col("*")))).as("h"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("h").cast("decimal(38,0)")).as("s")).head()
    (r.getLong(0),
      Option(r.getDecimal(1)).map(_.toBigInteger.toString).getOrElse("0"))
  }

  /** Attempt-0 tasks of every stage computing `df` sleep `ms` — widens
    * the kill window; retried tasks (attempt > 0) run at full speed so
    * recovery itself is not slowed.
    */
  private def stretch(df: DataFrame, ms: Long): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val rdd = df.repartition(32).rdd.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0) Thread.sleep(ms)
      it
    }
    spark.createDataFrame(rdd, schema)
  }

  private def executorPids(): Seq[ProcessHandle] = {
    import scala.jdk.CollectionConverters._
    // /proc, not ProcessHandle.Info.commandLine(): the JDK caps its
    // cmdline read and returns empty for these multi-thousand-char
    // executor classpaths (measured here — the Optional-based filter
    // matched nothing while two executors ran).
    ProcessHandle.current().descendants().iterator().asScala.filter { p =>
      try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/${p.pid()}/cmdline")))
        .contains("CoarseGrainedExecutorBackend")
      catch { case _: Exception => false }
    }.toSeq
  }

  private def killOne(): Long = {
    val ps = executorPids()
    require(ps.nonEmpty, "no executor process found to kill")
    val victim = ps.minBy(_.pid())
    victim.destroyForcibly()
    victim.pid()
  }

  /** Wait until `n` executors are ACTUALLY RUNNING TASKS — the only
    * ground truth after a kill. Process count and statusTracker both
    * lie during the transition (the tracker can still list the corpse,
    * so [driver, corpse, survivor] reads as 2 executors while only one
    * lives): a probe building in that window writes every checkpoint
    * block to the lone survivor with NO peer to replicate to, and the
    * next kill — lowest pid, i.e. that same survivor — wipes the only
    * copies (observed: orderstats/dedup flip-flopped between runs on
    * exactly this race). A wide job reporting distinct executor ids is
    * immune to both lies.
    */
  private def awaitExecutors(spark: SparkSession, n: Int,
      timeoutMs: Long = 120000): Unit = {
    val t0 = System.currentTimeMillis()
    def activeExecutors(): Int =
      spark.sparkContext.range(0, 64, 1, 64)
        .mapPartitions(_ => Iterator(org.apache.spark.SparkEnv.get.executorId))
        .collect().distinct.length
    while (executorPids().count(_.isAlive) < n || activeExecutors() < n) {
      require(System.currentTimeMillis() - t0 < timeoutMs,
        s"cluster not back to $n task-running executors within ${timeoutMs}ms")
      Thread.sleep(1000)
    }
    // Outlive the peer-cache TTL: an executor that fetched peers during
    // the churn window may hold an EMPTY list and silently write
    // single-copy replicated blocks until it expires.
    Thread.sleep(6000)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local-cluster[2,16,4096]")
      .appName("graft-executor-loss-probe")
      .withExtensions(new graft.plans.GraftExtensions().apply)
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.shuffle.partitions", "32")
      // Executor loss kills many tasks at once; give retries headroom.
      .config("spark.task.maxFailures", "6")
      // Replication writes go to a CACHED peer list (60s TTL): right
      // after an executor death, writers replicate into the corpse and
      // the default maxReplicationFailures=1 gives up BEFORE the
      // on-failure forced peer refresh can help — blocks silently end up
      // single-copy ("replicated to only 0 peer(s)" in the EXECUTOR
      // logs; measured here, the intermittent ckpt-policy failures).
      // A failure budget lets the refreshed list be used; proactive
      // re-replication restores lost replicas after a removal.
      .config("spark.storage.maxReplicationFailures", "5")
      .config("spark.storage.replication.proactive", "true")
      // The budget is useless when the cached peer list is EMPTY (zero
      // peers -> zero attempts -> no forced refresh; "Expecting 1
      // replicas with only 0 peer/s" in executor logs): shorten the TTL
      // and outwait it after churn (awaitExecutors sleeps past it).
      .config("spark.storage.cachedPeersTtl", "5000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("GRAFT_PROBE_LOG", "ERROR"))

    val removed = new AtomicInteger(0)
    val taskFails = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        removed.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.reason != org.apache.spark.Success) taskFails.incrementAndGet()
    })

    def table(name: String) = graft.Tables(spark, sfDir, name)
    import graft.operators.{Dedup, Similarity}

    awaitExecutors(spark, 2)
    var bad = 0

    // ---- mode 1: racing kill on lineage-only plans -------------------
    val racing: Seq[(String, DataFrame => DataFrame, String)] = Seq(
      ("agg_control", (li: DataFrame) =>
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n")),
        "lineitem"),
      ("cosine_neardup_adaptive", (emb: DataFrame) =>
        Similarity.cosineNearDupPairs(Similarity.withNorm(emb),
          threshold = 0.3, bits = 4, salts = 8,
          taskPairBudget = 16000000L),
        "embeddings"))
    for ((name, run, tbl) <- racing) {
      awaitExecutors(spark, 2)
      val clean = fp(run(table(tbl)))
      val f0 = taskFails.get(); val r0 = removed.get()
      @volatile var res: Either[Throwable, (Long, String)] = null
      val group = s"exec-loss-racing-$name"
      val worker = new Thread(() => {
        // Job group is thread-local: set it here so a hang can be
        // cancelled from the main thread instead of abandoned.
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        res =
          try Right(fp(run(stretch(table(tbl), 6000L))))
          catch { case e: Throwable => Left(e) }
      })
      worker.start()
      Thread.sleep(2500)
      val pid = killOne()
      worker.join(300000)
      val outcome = res match {
        case Right(f) if f == clean => "RECOVERED, fingerprint unchanged"
        case Right(f) => bad += 1; s"RECOVERED BUT DIVERGED: $f vs $clean"
        case Left(e) => bad += 1; s"FAILED: ${e.getMessage.take(120)}"
        case null =>
          // A wedged job left running would occupy executors through the
          // later modes and contaminate their kill/await sequencing —
          // cancel it before moving on.
          bad += 1
          spark.sparkContext.cancelJobGroup(group)
          worker.interrupt()
          worker.join(30000)
          "HUNG (job group cancelled before continuing)"
      }
      println(s"[exec-loss] racing/$name killedPid=$pid " +
        s"execRemoved=${removed.get() - r0} taskFailures=${taskFails.get() - f0} → $outcome")
    }

    // ---- mode 2: deterministic checkpoint loss -----------------------
    def checkpointLoss(tag: String, level: Option[StorageLevel],
        expectSurvive: Boolean): Unit = {
      awaitExecutors(spark, 2)
      val li = table("lineitem").select(col("l_orderkey"),
        col("l_quantity").cast("long").as("qty")).repartition(32)
      val ck = level match {
        case Some(l) => li.localCheckpoint(true, l)
        case None => li.localCheckpoint() // engine default path
      }
      val before = fp(ck)
      val pid = killOne()
      Thread.sleep(4000) // loss propagates; replacement may also arrive
      var counted = false // each unexpected outcome adds to `bad` ONCE
      val outcome =
        try {
          val after = fp(ck)
          if (after == before) "SURVIVED, fingerprint unchanged"
          else {
            bad += 1; counted = true
            s"SURVIVED BUT DIVERGED: $after vs $before"
          }
        } catch {
          case e: Throwable =>
            if (expectSurvive) { bad += 1; counted = true }
            s"QUERY FAILED (${e.getClass.getSimpleName}: ${e.getMessage.take(100)})"
        }
      val ok = outcome.startsWith("SURVIVED") == expectSurvive
      if (!ok && !counted) bad += 1
      println(s"[exec-loss] ckpt-loss/$tag killedPid=$pid → $outcome " +
        s"(expected ${if (expectSurvive) "survive" else "fail"})")
    }
    checkpointLoss("default-level", None, expectSurvive = false)
    checkpointLoss("replicated-x2", Some(StorageLevel.MEMORY_AND_DISK_2),
      expectSurvive = true)

    // ---- mode 3: operators through the graft.Ckpt policy -------------
    // These operators checkpoint INTERNALLY; on this 2-executor cluster
    // Ckpt replicates ×2, so consume → kill → re-consume must survive
    // with the same fingerprint. Before the policy, both died exactly
    // like ckpt-loss/default-level above.
    val viaPolicy: Seq[(String, () => DataFrame)] = Seq(
      ("orderstats_running", () =>
        graft.operators.OrderStats.running(
          table("lineitem").select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("long").as("qty")),
          Seq(col("l_orderkey"), col("l_linenumber"), col("qty")),
          Some("rn"), cumLong = Seq("qty" -> "cum_qty"))),
      ("dedup_lsh_clusters", () =>
        Dedup.resolveClusters(
          Dedup.minhashLshPairs(table("documents"), t10 = 8))))
    for ((name, build) <- viaPolicy) {
      awaitExecutors(spark, 2)
      val df = build() // internal Ckpt.local sites replicate here
      val before = fp(df)
      val pid = killOne()
      Thread.sleep(4000)
      val outcome =
        try {
          val after = fp(df)
          if (after == before) "SURVIVED, fingerprint unchanged"
          else { bad += 1; s"SURVIVED BUT DIVERGED: $after vs $before" }
        } catch {
          case e: Throwable =>
            bad += 1
            s"QUERY FAILED (${e.getClass.getSimpleName}: ${e.getMessage.take(100)})"
        }
      println(s"[exec-loss] ckpt-policy/$name killedPid=$pid → $outcome")
    }

    println(s"[exec-loss] RESULT ${if (bad == 0) "ALL AS EXPECTED" else s"$bad unexpected"}")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
