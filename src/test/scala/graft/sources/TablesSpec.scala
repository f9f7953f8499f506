package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Pins the events-loader contract: `ts` is always TIMESTAMP (ltz),
  * whatever the parquet file's physical representation. Round-4 regression:
  * the driver regenerated testdata with micros-NTZ timestamps and the
  * loader passed TIMESTAMP_NTZ through, breaking every `unix_micros(ts)`
  * query with DATATYPE_MISMATCH. Each case writes an events.parquet in one
  * physical representation and asserts `unix_micros(ts)` resolves AND the
  * instant is preserved.
  */
class TablesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // One reference instant: 2024-03-01T12:00:00Z = 1_709_294_400_000_000 us.
  private val us = 1709294400000000L

  private def tmpDir(): String =
    Files.createTempDirectory("tables-spec").toString

  private def baseRows = Seq(
    (1L, 7L, "view", 1.5, "{}"),
    (2L, 8L, "click", 2.5, "{}")
  ).toDF("event_id", "user_id", "event_type", "value", "props")

  private def check(dir: String): Unit = {
    val ev = Tables(spark, dir, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"loader must normalize ts to TIMESTAMP, got ${ev.schema("ts").dataType}")
    val got = ev.select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(got.head == us, s"instant not preserved: ${got.head} != $us")
  }

  test("micros-ltz events file loads with ts: TIMESTAMP") {
    val dir = tmpDir()
    baseRows.withColumn("ts", timestamp_micros(lit(us) + col("event_id") - 1))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    check(dir)
  }

  test("micros-ntz events file (the round-4 driver testdata shape) normalizes to TIMESTAMP") {
    val dir = tmpDir()
    baseRows
      .withColumn("ts",
        timestamp_micros(lit(us) + col("event_id") - 1).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    check(dir)
  }

  test("nanos-as-long events file rebuilds micros from raw nanos") {
    // Spark cannot write TIMESTAMP(NANOS) parquet; under the loader's
    // legacy conf a real NANOS column surfaces as plain long, which is
    // byte-for-byte what an int64 column of raw nanos looks like to the
    // reader — so writing int64 nanos exercises the identical branch.
    val dir = tmpDir()
    baseRows.withColumn("ts", (lit(us) + col("event_id") - 1) * lit(1000L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    check(dir)
  }

  test("driver testdata at sf0.001 loads with ts: TIMESTAMP and unix_micros resolves") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros(col("ts"))).limit(1).count() == 1L)
  }
}
