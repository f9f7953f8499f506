package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Connector-contract checks for the DSv2 RangeSource: values match the
  * closed form, pushed id bounds clamp partition PLANNING (not just
  * post-scan filtering), and column pruning reaches the reader.
  */
class RangeSourceSpec extends AnyFunSuite {

  test("micro-batch stream restart from checkpoint: no duplicate, no lost rows") {
    val spark0 = graft.TestSpark.spark
    import spark0.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("rs_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("rs_out").toString
    def run(): Unit = {
      // File sink + checkpoint: the second run must resume from the
      // committed offset, not regenerate from `start`.
      val q = spark0.readStream.format("graft.sources.RangeSource")
        .option("start", "0").option("end", "40").option("rowsPerBatch", "10")
        .load().select($"id")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // drains fully; offsets committed
    run() // restart: a fresh stream instance, same checkpoint
    val ids = spark0.read.parquet(out).select($"id").as[Long].collect().sorted
    assert(ids.toSeq === (0L until 40L),
      s"restart must neither duplicate nor lose rows: got ${ids.length}")
  }

  test("micro-batch stream drains the range in rowsPerBatch offsets") {
    val spark0 = graft.TestSpark.spark
    import spark0.implicits._
    val q = spark0.readStream.format("graft.sources.RangeSource")
      .option("start", "0").option("end", "25").option("rowsPerBatch", "10")
      .load()
      .writeStream.format("memory").queryName("rs").outputMode("append").start()
    try {
      q.processAllAvailable() // latestOffset stops moving once drained
      val ids = spark0.table("rs").select($"id").as[Long].collect().sorted
      assert(ids.toSeq === (0L until 25L), "every row exactly once")
      // 10 + 10 + 5: the offset log must show >= 3 micro-batches.
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("a wide micro-batch splits by rowsPerSplit like the batch path") {
    val s = new RangeMicroBatchStream(0, 1000, rowsPerSplit = 100,
      rowsPerBatch = 10, RangeSource.schema)
    val parts = s.planInputPartitions(RangeOffset(0), RangeOffset(1000))
      .map(_.asInstanceOf[RangeSplit]).sortBy(_.from)
    assert(parts.length === 10, "catch-up batch must parallelize")
    assert(parts.head.from === 0 && parts.last.until === 1000)
    assert(parts.sliding(2).forall { case Array(a, b) => a.until == b.from },
      "splits must tile the span with no gap/overlap")
    // non-aligned remainder
    assert(s.planInputPartitions(RangeOffset(0), RangeOffset(250)).length === 3)
  }

  test("latestOffset honors ReadAllAvailable and composite limits") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val s = new RangeMicroBatchStream(0, 1000, 100, 10, RangeSource.schema)
    def pos(start: Long, l: ReadLimit): Long =
      s.latestOffset(RangeOffset(start), l).asInstanceOf[RangeOffset].pos
    // Trigger.Once-style "all available" must advance straight to hi
    assert(pos(0, ReadLimit.allAvailable()) === 1000)
    assert(pos(470, ReadLimit.allAvailable()) === 1000)
    assert(pos(0, ReadLimit.maxRows(25)) === 25)
    assert(pos(990, ReadLimit.maxRows(25)) === 1000) // clamped at hi
    // composite (minRows AND maxRows): maxRows caps admission
    val comp = ReadLimit.compositeLimit(
      Array(ReadLimit.minRows(5, 1000), ReadLimit.maxRows(30)))
    assert(pos(0, comp) === 30)
    // minRows alone: default rowsPerBatch pacing
    assert(pos(0, ReadLimit.minRows(5, 1000)) === 10)
  }

  test("Trigger.Once drains the whole range in one batch (ReadAllAvailable)") {
    val spark0 = graft.TestSpark.spark
    import spark0.implicits._
    val q = spark0.readStream.format("graft.sources.RangeSource")
      .option("start", "0").option("end", "40").option("rowsPerBatch", "10")
      .load()
      .writeStream.format("memory").queryName("rs_once")
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .outputMode("append").start()
    try {
      q.awaitTermination(60000)
      val ids = spark0.table("rs_once").select($"id").as[Long].collect().sorted
      assert(ids.toSeq === (0L until 40L),
        "one ReadAllAvailable batch must cover [start, end), not one rowsPerBatch step")
    } finally q.stop()
  }

  private lazy val spark = TestSpark.spark

  private def src(start: Long, end: Long, rowsPerSplit: Long): DataFrame =
    spark.read.format("graft.sources.RangeSource")
      .option("start", start.toString).option("end", end.toString)
      .option("rowsPerSplit", rowsPerSplit.toString)
      .load()

  private def scanOf(df: DataFrame) =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get

  test("rows match the closed form") {
    val rows = src(5, 12, 100).collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === (5L to 11L))
    assert(rows.map(_.getLong(1)).toSeq === (5L to 11L).map(_ % 7))
    assert(rows.map(_.getString(2)).toSeq ===
      (5L to 11L).map(java.lang.Long.toHexString(_).toUpperCase))
  }

  test("id bounds are absorbed into partition planning") {
    // 10M rows at 1000/split would be 10k partitions; the pushed range
    // [9000, 12000) must plan only its own ~3 splits.
    val df = src(0, 10_000_000, 1000)
      .filter(col("id") >= 9000 && col("id") < 12000)
    val parts = scanOf(df).inputRDD.getNumPartitions
    assert(parts <= 4, s"planned $parts partitions — pushdown not applied")
    assert(df.count() === 3000)
    // and the absorbed filters are no longer re-evaluated post-scan:
    // an impossible residual range yields zero partitions' worth of rows
    assert(src(0, 10_000_000, 1000).filter(col("id") < 0).count() === 0)
  }

  test("equality pushdown plans a single split") {
    val df = src(0, 10_000_000, 1000).filter(col("id") === 1234567)
    assert(scanOf(df).inputRDD.getNumPartitions === 1)
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(1234567L))
  }

  test("column pruning reaches the reader schema") {
    val df = src(0, 100, 10).select(col("id"), col("mod7"))
    val read = scanOf(df).scan.readSchema().fieldNames.toSet
    assert(read === Set("id", "mod7"), s"reader got $read")
  }

  test("non-id residual filters stay with Spark and stay correct") {
    val df = src(0, 1000, 100).filter(col("mod7") === 3 && col("id") < 500)
    assert(df.count() === (0L until 500L).count(_ % 7 == 3))
  }
}
