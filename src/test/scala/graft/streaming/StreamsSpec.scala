package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("windowed counts with watermark over a file stream") {
    val dir = Files.createTempDirectory("events").toString
    // raw shape: ts as nanos (mirrors the parquet TIMESTAMP(NANOS) files)
    Seq(
      (1L, 60_000_000_000L, 10L, "click", 1.0, "{}"),
      (2L, 70_000_000_000L, 10L, "click", 2.0, "{}"),
      (3L, 400_000_000_000L, 11L, "buy", 5.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)

    val q = Streams.windowedCounts(Streams.eventsStream(spark, dir), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("wc")
        .select("event_type", "n", "total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(rows === Set(("click", 2L, 3.0), ("buy", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids") {
    val dir = Files.createTempDirectory("events2").toString
    Seq(
      (1L, 60_000_000_000L, 10L, "click", 1.0, "{}"),
      (1L, 60_000_000_000L, 10L, "click", 1.0, "{}"), // duplicate delivery
      (2L, 61_000_000_000L, 10L, "click", 2.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)

    val q = Streams.dedupStream(Streams.eventsStream(spark, dir))
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dd").count() === 2)
    } finally q.stop()
  }

  test("sessionize closes sessions on inactivity gaps (custom state)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Streams.SessionEvent]
    ms.addData(
      Streams.SessionEvent(1L, ts(0), 1.0),
      Streams.SessionEvent(1L, ts(1000), 2.0),
      Streams.SessionEvent(1L, ts(100000), 3.0), // > 10s gap → closes first
      Streams.SessionEvent(2L, ts(0), 9.0))      // still open, no output
    val q = Streams.sessionize(ms.toDS(), gapMs = 10000)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      q.processAllAvailable()
      val sessions = spark.table("sess")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(sessions === Set((1L, 2L, 3.0)))
    } finally q.stop()
  }
}
