package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a cross product.
  *
  * Spark plans a bare `start <= p AND p < end` join as
  * BroadcastNestedLoopJoin (fine only while one side broadcasts) or a
  * cartesian product — both die at scale. The standard fix is binning:
  *
  *  - choose a bucket width W (same units as the point column);
  *  - each point joins via its single bucket `floor(p / W)`;
  *  - each interval is exploded to every bucket it overlaps;
  *  - equi-join on the bucket (hash shuffle both sides), then apply the
  *    exact containment predicate.
  *
  * Each (point, interval) candidate pair meets in exactly ONE bucket (the
  * point's), so no dedup is needed and the result is identical to the
  * naive join. Cost: |intervals| × avg-span/W replication versus a
  * pair-space cross product — pick W near the median interval length.
  */
object RangeJoin {

  /** Exact long floor division, overflow-safe across the whole domain:
    * truncating integral `div`, decremented when the remainder is
    * negative. The previous `floor(col / W)` routed through DOUBLE
    * division — above 2^53 the quotient rounds, the point and its
    * interval can disagree on the bucket, and matching rows are silently
    * LOST. The decrement branch requires w ≥ 2 (rem < 0 is impossible
    * for w = 1), so `q - 1` stays in range even at Long.MinValue.
    */
  private def floorDiv(sqlFrag: String, w: Long) = expr(
    s"CASE WHEN ($sqlFrag) % $w < 0 THEN ($sqlFrag) DIV $w - 1 ELSE ($sqlFrag) DIV $w END")

  /** Inner join of `points` (long column `pointCol`) with `intervals`
    * (long columns `startCol`, `endCol`; half-open [start, end)).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("__bucket", floorDiv(s"`$pointCol`", bucketWidth))
    // end is exclusive: the last covered bucket is the one holding end-1.
    // (end-1 cannot underflow: end = Long.MinValue fails the end > start
    // guard below for every possible start.) Guarded because
    // sequence(a, b) DESCENDS for b < a — an empty interval must produce
    // no buckets, not two spurious ones.
    val iv = intervals.withColumn("__bucket",
      explode(when(col(endCol) > col(startCol),
        sequence(
          floorDiv(s"`$startCol`", bucketWidth),
          floorDiv(s"`$endCol` - 1", bucketWidth)))
        .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(startCol) <= col(pointCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
