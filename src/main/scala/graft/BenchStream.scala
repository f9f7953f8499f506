package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streams

/** Streaming state/throughput benchmark (round 8): runs the
  * transformWithState sessionizer and the watermarked windowed
  * aggregation over a (ScaleGen-grown) events corpus with the RocksDB
  * state store, ACROSS a checkpoint restart, and reports:
  *
  *  - rows/s per stage (wall-clock over the AvailableNow drain);
  *  - state rows + state memory from the engine's own
  *    StateOperatorProgress (numRowsTotal / memoryUsedBytes — for
  *    RocksDB, memory is the loaded working set);
  *  - checkpoint directory size on disk (the durable state bound);
  *  - restart evidence: stage B resumes from stage A's checkpoint and
  *    must NOT reprocess stage A's files (input rows ≈ the new half),
  *    with state carried over (sessions spanning the split close
  *    correctly — counted against a batch replay of the whole corpus).
  *
  * The input is split into two halves of parquet part files; each stage
  * drains with Trigger.AvailableNow in bounded micro-batches
  * (maxFilesPerTrigger) so the state store actually cycles
  * per batch instead of swallowing the corpus in one pass.
  *
  * Usage: `runMain graft.BenchStream <eventsParquetDir> <workDir>`
  */
object BenchStream {

  private def dirSize(p: java.nio.file.Path): Long = {
    if (!Files.exists(p)) return 0L
    val s = Files.walk(p)
    try s.filter(Files.isRegularFile(_)).mapToLong(Files.size).sum
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val src = Paths.get(args(0))
    val work = Paths.get(args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The production state store for state-heavy operators: RocksDB
      // with changelog checkpointing — commit latency is the changelog
      // append, not a full SST upload, and state size is bounded by
      // RocksDB compaction instead of JVM heap.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- stage the input as two halves of part files -----------------
    val all = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    val ls = Files.list(src)
    try ls.iterator().forEachRemaining(p =>
      if (p.getFileName.toString.endsWith(".parquet")) all += p)
    finally ls.close()
    val sorted = all.sortBy(_.getFileName.toString).toSeq
    require(sorted.size >= 2, s"need >= 2 part files in $src, got ${sorted.size}")
    val (halfA, halfB) = sorted.splitAt(sorted.size / 2)
    val input = work.resolve("input")
    if (Files.exists(work)) {
      val w = Files.walk(work)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally w.close()
    }
    Files.createDirectories(input)
    def stage(files: Seq[java.nio.file.Path]): Unit = files.foreach { f =>
      Files.copy(f, input.resolve(f.getFileName), StandardCopyOption.REPLACE_EXISTING)
    }

    def runStage(tag: String): (Long, Long, Long, Double) = {
      val ev = Streams.eventsStream(spark, input.toString,
          options = Map("maxFilesPerTrigger" -> "4"))
        .select(col("user_id"), col("ts"), col("value"))
        .as[Streams.SessionEvent]
      val q = Streams.sessionizeTws(ev, gapMs = 30 * 60 * 1000L)
        .writeStream
        .format("parquet")
        .option("path", work.resolve("out").toString)
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      val t0 = System.nanoTime()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress
      val inRows = progs.map(_.numInputRows).sum
      val lastState = progs.reverse.find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.head)
      val stateRows = lastState.map(_.numRowsTotal).getOrElse(-1L)
      val stateMem = lastState.map(_.memoryUsedBytes).getOrElse(-1L)
      println(f"[stream] $tag batches=${progs.length} inputRows=$inRows " +
        f"wall=$wall%.1fs rate=${inRows / wall}%.0f rows/s " +
        f"stateRows=$stateRows stateMemMB=${stateMem / 1e6}%.1f " +
        f"ckptMB=${dirSize(work.resolve("ckpt")) / 1e6}%.1f")
      (inRows, stateRows, stateMem, wall)
    }

    stage(halfA)
    val (inA, _, _, _) = runStage("sessionize-A")
    // restart: same checkpoint, second half of the files appended
    stage(halfB)
    val (inB, stRowsB, _, _) = runStage("sessionize-B")

    // Evidence the restart did not replay stage A:
    val total = spark.read.parquet(src.toString).count()
    println(f"[stream] corpus=$total stageA=$inA stageB=$inB replayed=${inA + inB - total}")

    // Cross-check closed+open sessions against a batch replay.
    val streamed = spark.read.parquet(work.resolve("out").toString).count()
    val batchSessions = {
      val ev = Tables(spark, src.getParent.toString, "events")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      ev.withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("gap", when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > 30L * 60 * 1000000, 1)
          .otherwise(0))
        .agg(sum(col("gap"))).head().getLong(0)
    }
    println(s"[stream] sessions: streamedClosed=$streamed batchTotal=$batchSessions " +
      s"open(still in state)=$stRowsB check=${streamed + stRowsB == batchSessions}")

    // ---- windowed aggregation stage ---------------------------------
    {
      val ev = Streams.eventsStream(spark, input.toString,
        options = Map("maxFilesPerTrigger" -> "4"))
      val q = Streams.windowedCounts(ev, watermark = "10 minutes", window_ = "5 minutes")
        .writeStream
        .format("noop")
        .outputMode("update")
        .option("checkpointLocation", work.resolve("ckpt_win").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      val t0 = System.nanoTime()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress
      val inRows = progs.map(_.numInputRows).sum
      val lastState = progs.reverse.find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.head)
      println(f"[stream] windowed batches=${progs.length} inputRows=$inRows " +
        f"wall=$wall%.1fs rate=${inRows / wall}%.0f rows/s " +
        f"stateRows=${lastState.map(_.numRowsTotal).getOrElse(-1L)} " +
        f"stateMemMB=${lastState.map(_.memoryUsedBytes).getOrElse(-1L) / 1e6}%.1f " +
        f"ckptMB=${dirSize(work.resolve("ckpt_win")) / 1e6}%.1f")
    }
    spark.stop()
  }
}
