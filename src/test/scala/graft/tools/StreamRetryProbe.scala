package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming task-retry probe (not a test): BENCH_STREAM proves
  * exactly-once across a QUERY restart (checkpoint recovery); this
  * probes the finer-grained recovery a cluster exercises constantly —
  * a single task attempt dying INSIDE a micro-batch. The state-bearing
  * task's first attempt aborts after the stateful operator has already
  * buffered writes, so the RocksDB store must discard the attempt's
  * uncommitted changes and the retry must rebuild them from the same
  * input — any leak double-counts sessions.
  *
  * Method: the sessionizer pipeline runs twice over identically-staged
  * time-ordered input (same files, same mtimes → same micro-batch
  * boundaries) — once clean, once with mapPartitions wrappers that
  * fail attempt 0 of partition 0 BOTH upstream of the shuffle (scan
  * stage retry) and downstream of transformWithState (stateful task
  * retry, the RocksDB abort path; mapPartitions fires at task start,
  * so even a batch emitting zero closed sessions still aborts once).
  * Outputs are read back through the sink manifest (orphan files from
  * failed attempts are excluded by FileStreamSink's metadata log —
  * itself part of what's under test) and fingerprinted
  * order-independently.
  *
  * Run: sbt "Test/runMain graft.tools.StreamRetryProbe [sfDir]"
  * Results in BENCH_INVARIANCE.md (round 8).
  */
object StreamRetryProbe {
  private val GapMs = 30L * 60 * 1000

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.SparkEngine.session("local[32,3]")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val failures = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.reason != org.apache.spark.Success) failures.incrementAndGet()
    })

    val work = Files.createTempDirectory("stream_retry_probe")
    // Time-ordered staging, same contract as BenchStream: range files in
    // name order == time order, strictly increasing mtimes pin the
    // FileStreamSource batch order so both runs see identical batches.
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

    def failFirstAttempt(label: String): Unit = {
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException(s"[stream-retry] injected: $label")
    }

    def run(tag: String, inject: Boolean): String = {
      val out = work.resolve(s"out_$tag").toString
      val ev0 = graft.streaming.Streams
        .eventsStream(spark, input.toString,
          options = Map("maxFilesPerTrigger" -> "2"))
        .select(col("user_id"), col("ts"), col("value"))
        .as[graft.streaming.Streams.SessionEvent]
      val ev =
        if (inject) ev0.mapPartitions { it => failFirstAttempt("scan"); it }
        else ev0
      val sess0 = graft.streaming.Streams.sessionizeTws(ev, gapMs = GapMs)
      val sess =
        if (inject)
          sess0.mapPartitions { it => failFirstAttempt("stateful"); it }
        else sess0
      val q = sess.writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", work.resolve(s"ckpt_$tag").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      out
    }

    // Order-independent output fingerprint; reads go through the
    // FileStreamSink manifest, so uncommitted attempt files don't count.
    def fp(path: String): (Long, String) = {
      val r = spark.read.parquet(path)
        .select(xxhash64(to_json(struct(col("*")))).as("h"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("h").cast("decimal(38,0)")).as("s")).head()
      (r.getLong(0),
        Option(r.getDecimal(1)).map(_.toBigInteger.toString).getOrElse("0"))
    }

    val clean = fp(run("clean", inject = false))
    val f0 = failures.get()
    val hurt = fp(run("injected", inject = true))
    val nFail = failures.get() - f0
    val ok = clean == hurt && nFail > 0
    println(s"[stream-retry] clean=$clean injected=$hurt " +
      s"taskFailures=$nFail ${if (ok) "OK" else "MISMATCH"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
