package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join (interval × interval) without a cross product —
  * the two-sided sibling of [[RangeJoin]].
  *
  * A bare `max(sa, sb) < min(ea, eb)` join condition has no equi-key, so
  * Spark plans BroadcastNestedLoopJoin or a cartesian product. Binning
  * fixes it the same way as the point-in-range case, with one twist: both
  * sides explode to every bucket they cover, so an overlapping pair now
  * meets in EVERY shared bucket. Rather than a distinct over the output
  * (a full extra shuffle), each pair is kept only in the one bucket that
  * contains `max(sa, sb)` — the later of the two starts, which every
  * overlapping pair covers on both sides by definition. Exact result,
  * zero dedup shuffle.
  *
  * Cost: each interval replicates to span/W buckets; the equi-join on
  * (keys…, bucket) hash-partitions both sides. Pick W near the median
  * interval length — and put a real key (user, device, region…) in
  * `keys` whenever the domain has one: the bucket explosion then only
  * fans out WITHIN a key's timeline.
  */
object IntervalJoin {

  /** Inner overlap join of `a` (long cols `sa`/`ea`) and `b` (`sb`/`eb`),
    * both half-open [start, end), equi-keyed on `keys` (may be empty).
    */
  def overlap(a: DataFrame, b: DataFrame, keys: Seq[String],
      sa: String, ea: String, sb: String, eb: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bucket",
        explode(when(col(e) > col(s),
          sequence(
            floor(col(s) / lit(bucketWidth)),
            floor((col(e) - 1) / lit(bucketWidth))))
          .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))))
    binned(a, sa, ea)
      .join(binned(b, sb, eb), keys :+ "__bucket")
      .filter(greatest(col(sa), col(sb)) < least(col(ea), col(eb)))
      // the pair's unique "home" bucket: where the later start lives
      .filter(floor(greatest(col(sa), col(sb)) / lit(bucketWidth)) === col("__bucket"))
      .drop("__bucket")
  }
}
