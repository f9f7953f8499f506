package graft.tools

import java.nio.file.{Files, StandardCopyOption}
import java.nio.file.attribute.FileTime
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Streaming executor-loss probe (not a test): the one fault-tolerance
  * cell rounds 1–8 left unmeasured. ExecutorLossProbe kills executors
  * under BATCH queries; StreamRetryProbe retries single task attempts
  * INSIDE micro-batches on a single JVM. This probe `kill -9`s a REAL
  * executor process mid-micro-batch on a 2-process `local-cluster`
  * while the RocksDB-backed sessionizer is running — the spot-reclaim
  * case for a production streaming job. The dead executor takes its
  * loaded RocksDB store instances with it; the replacement executor
  * must reload state for the reassigned partitions from the checkpoint
  * (snapshot + changelog replay — changelog checkpointing is ON, the
  * production config), finish the uncommitted batch via task retry,
  * and the final output must be EXACTLY the clean run's: any state
  * lost or double-applied shows up as a fingerprint diff.
  *
  * Method: identical time-ordered staging to StreamRetryProbe (same
  * files, same mtimes → same micro-batch boundaries in both runs);
  * `maxFilesPerTrigger=1` → 8 micro-batches; attempt-0 tasks of the
  * stateful stage sleep 1.5 s so every batch has a wide in-flight
  * window; a watcher thread waits for the checkpoint COMMIT LOG entry
  * of batch 2 (commits/2 — progress events can precede their commit),
  * then for the first observed TASK START of batch 3, and kills the
  * lowest-pid executor at that instant — inside batch 3's uncommitted
  * window by construction, not by a tuned sleep.
  * Output read back through the FileStreamSink manifest (uncommitted
  * attempt files excluded), fingerprinted order-independently.
  *
  * Pass = fingerprints equal AND ≥1 executor actually removed AND ≥1
  * task failure observed. A kill that misses the window (no removal or
  * no failure) proves nothing and is retried automatically up to 3
  * attempts; a fingerprint MISMATCH under a landed kill is terminal on
  * the spot (never retried away).
  *
  * Run: SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   sbt "Test/runMain graft.tools.StreamExecutorLossProbe [sfDir]"
  * Results in BENCH_STREAM.md (round 9).
  */
object StreamExecutorLossProbe {
  private val GapMs = 30L * 60 * 1000

  private def executorPids(): Seq[ProcessHandle] = {
    import scala.jdk.CollectionConverters._
    ProcessHandle.current().descendants().iterator().asScala.filter { p =>
      try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/${p.pid()}/cmdline")))
        .contains("CoarseGrainedExecutorBackend")
      catch { case _: Exception => false }
    }.toSeq
  }

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
    Thread.sleep(6000) // outlive cachedPeersTtl (see ExecutorLossProbe)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local-cluster[2,16,4096]")
      .appName("graft-stream-executor-loss-probe")
      .withExtensions(new graft.plans.GraftExtensions().apply)
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.task.maxFailures", "6")
      .config("spark.storage.maxReplicationFailures", "5")
      .config("spark.storage.replication.proactive", "true")
      .config("spark.storage.cachedPeersTtl", "5000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("GRAFT_PROBE_LOG", "ERROR"))
    import spark.implicits._

    val removed = new AtomicInteger(0)
    val taskFails = new AtomicInteger(0)
    val taskStarts = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        removed.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.reason != org.apache.spark.Success) taskFails.incrementAndGet()
      override def onTaskStart(t: SparkListenerTaskStart): Unit =
        taskStarts.incrementAndGet()
    })

    val work = Files.createTempDirectory("stream_exec_loss_probe")
    val staged = work.resolve("staged")
    graft.Tables(spark, sfDir, "events")
      .repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(staged.toString)
    val input = work.resolve("input")
    Files.createDirectories(input)
    val parts = {
      val s = Files.list(staged)
      try s.filter(p => p.getFileName.toString.startsWith("part-"))
        .sorted().toArray.map(_.asInstanceOf[java.nio.file.Path]).toSeq
      finally s.close()
    }
    var mtime = System.currentTimeMillis() - 86400000L
    parts.foreach { f =>
      val dst = input.resolve(f.getFileName)
      Files.copy(f, dst, StandardCopyOption.REPLACE_EXISTING)
      mtime += 1000
      Files.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
    }

    def run(tag: String, killAfterBatches: Int): (String, Int, Int) = {
      awaitExecutors(spark, 2)
      val out = work.resolve(s"out_$tag").toString
      val committed = new AtomicInteger(0)
      val listener = new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit =
          if (e.progress.numInputRows > 0) committed.incrementAndGet()
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      val f0 = taskFails.get(); val r0 = removed.get()
      val ev = graft.streaming.Streams
        .eventsStream(spark, input.toString,
          options = Map("maxFilesPerTrigger" -> "1"))
        .select(col("user_id"), col("ts"), col("value"))
        .as[graft.streaming.Streams.SessionEvent]
      // Stretch the STATEFUL stage: attempt-0 tasks sleep so each
      // micro-batch holds a wide uncommitted window for the kill.
      val sess = graft.streaming.Streams.sessionizeTws(ev, gapMs = GapMs)
        .mapPartitions { it =>
          val tc = TaskContext.get()
          if (tc != null && tc.attemptNumber() == 0) Thread.sleep(1500)
          it
        }
      @volatile var killedPid = -1L
      val ckpt = work.resolve(s"ckpt_$tag")
      val killer =
        if (killAfterBatches < 0) None
        else Some(new Thread(() => {
          // Key the kill off the COMMIT LOG, not progress events: a
          // progress event can arrive before its batch's commit file
          // lands, and a fixed post-progress sleep can drift past the
          // next batch entirely (round-9 advice). The reliable recipe:
          // wait for commits/<N> to exist, then wait for the FIRST task
          // of batch N+1 to actually start (global task-start counter),
          // then kill immediately — the stateful stage's attempt-0
          // 1.5 s sleep holds the batch's uncommitted window open.
          val commits = ckpt.resolve("commits")
          def committedBatch(n: Int): Boolean =
            Files.exists(commits.resolve(n.toString))
          while (!committedBatch(killAfterBatches)) Thread.sleep(50)
          val startsAtCommit = taskStarts.get()
          while (taskStarts.get() == startsAtCommit &&
              !committedBatch(killAfterBatches + 1)) Thread.sleep(20)
          if (committedBatch(killAfterBatches + 1)) {
            println(s"[stream-exec-loss] $tag: batch ${killAfterBatches + 1} " +
              "committed before any of its tasks were observed — no kill")
          } else {
            val ps = executorPids()
            if (ps.nonEmpty) {
              val victim = ps.minBy(_.pid())
              killedPid = victim.pid()
              victim.destroyForcibly()
            }
          }
        }))
      killer.foreach(_.start())
      val q = sess.writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      killer.foreach(_.join(10000))
      spark.streams.removeListener(listener)
      println(s"[stream-exec-loss] $tag batches=${committed.get()} " +
        s"killedPid=$killedPid execRemoved=${removed.get() - r0} " +
        s"taskFailures=${taskFails.get() - f0}")
      (out, removed.get() - r0, taskFails.get() - f0)
    }

    def fp(path: String): (Long, String) = {
      val r = spark.read.parquet(path)
        .select(xxhash64(to_json(struct(col("*")))).as("h"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("h").cast("decimal(38,0)")).as("s")).head()
      (r.getLong(0),
        Option(r.getDecimal(1)).map(_.toBigInteger.toString).getOrElse("0"))
    }

    val (cleanOut, _, _) = run("clean", killAfterBatches = -1)
    val clean = fp(cleanOut)
    // Auto-retry the killed run while the kill misses its in-flight
    // window (no executor removal / no task failure observed): a miss
    // proves nothing either way, so it must not consume the verdict —
    // only a fingerprint comparison under a LANDED kill counts. A
    // fingerprint MISMATCH is terminal immediately (never retried away).
    var attempt = 0
    var nRemoved = 0
    var nFails = 0
    var hurt = clean
    var landed = false
    while (attempt < 3 && !landed) {
      attempt += 1
      val (o, r, f) = run(s"killed$attempt", killAfterBatches = 2)
      nRemoved = r; nFails = f; hurt = fp(o)
      landed = r >= 1 && f >= 1
      if (!landed)
        println(s"[stream-exec-loss] attempt $attempt missed the in-flight " +
          s"window (removed=$r fails=$f) — retrying")
      else if (hurt != clean) {
        println(s"[stream-exec-loss] MISMATCH on attempt $attempt: " +
          s"clean=$clean killed=$hurt")
        spark.stop()
        sys.exit(1)
      }
    }
    val ok = clean == hurt && landed
    println(s"[stream-exec-loss] clean=$clean killed=$hurt " +
      s"execRemoved=$nRemoved taskFailures=$nFails attempts=$attempt " +
      (if (ok) "OK"
       else "INCONCLUSIVE (kill missed the in-flight window in all attempts)"))
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
