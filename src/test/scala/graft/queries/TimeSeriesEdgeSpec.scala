package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge-branch coverage for q_interpolate on a crafted events table —
  * the harness data exercises the interpolation midpoint path, but not
  * reliably the no-prev / no-next / equal-time-knowns fallbacks.
  */
class TimeSeriesEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q_interpolate: midpoint, leading, trailing, and equal-time branches") {
    val dir = Files.createTempDirectory("tsedge").toString
    // ts is raw NANOS (the events loader divides to micros). Knowns are
    // event_id % 3 == 0.
    val us = 1000L // one microsecond in nanos
    Seq(
      // user 1: leading unknown (takes next), midpoint, trailing unknown
      (1L, 1000L * us, 1L, "click", 99.0, "{}"),    // unknown, no prev → nv=10
      (3L, 2000L * us, 1L, "click", 10.0, "{}"),    // known v=10 @2000us
      (4L, 3000L * us, 1L, "click", 99.0, "{}"),    // unknown: 10 + (30-10)*(1/2) = 20
      (6L, 4000L * us, 1L, "click", 30.0, "{}"),    // known v=30 @4000us
      (7L, 5000L * us, 1L, "click", 99.0, "{}"),    // unknown, no next → pv=30
      // user 2: two knowns at the SAME timestamp bracketing an unknown
      (9L,  7000L * us, 2L, "click", 5.0, "{}"),    // known @7000us
      (11L, 7000L * us, 2L, "click", 99.0, "{}"),   // unknown, pt==nt → pv=5
      (12L, 7000L * us, 2L, "click", 8.0, "{}"),    // known @7000us (same t)
      // user 3: no knowns at all → null
      (13L, 9000L * us, 3L, "click", 99.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = Extensions.queries("q_interpolate")(spark, dir)
      .select("event_id", "value_interp")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    assert(got(1L) === Some(10.0), "leading unknown takes the next known")
    assert(got(3L) === Some(10.0))
    assert(got(4L) === Some(20.0), "midpoint interpolates linearly")
    assert(got(6L) === Some(30.0))
    assert(got(7L) === Some(30.0), "trailing unknown takes the previous known")
    assert(got(11L) === Some(5.0), "equal-time knowns fall back to previous")
    assert(got(13L) === None, "no knowns anywhere → null")
  }
}
