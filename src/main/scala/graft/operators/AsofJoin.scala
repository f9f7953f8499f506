package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — an operator Spark's built-ins lack.
  *
  * For every left row, attach the single latest right row of the same key
  * with `rightTime <= leftTime`. Instead of a range join (which Spark
  * would plan as a broadcast-nested-loop or cross product), both sides are
  * unioned and swept with one window pass:
  *
  *   union → shuffle on key → per-key time sort → `last(right, ignoreNulls)`
  *   over rows unbounded-preceding..current → keep left rows.
  *
  * Cost at scale: exactly ONE hash shuffle of |L|+|R| rows keyed on the
  * join key plus a per-partition sort — the same shape as a sort-merge
  * join, no pair-space blowup, AQE-splittable if a key is hot. This is the
  * standard distributed as-of formulation (kdb's aj semantics on Spark).
  *
  * Ties: a right row at exactly `leftTime` matches (`<=`); among right
  * rows sharing one timestamp the highest `tieBreak` wins, making results
  * deterministic under any partitioning.
  */
object AsofJoin {

  /** Left as-of join. `rightCols` are carried from the matched right row
    * into the output under `asof_` prefixes (null when no match).
    */
  def leftAsof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightCols: Seq[String],
      tieBreak: String): DataFrame = {
    val rv = struct((rightCols :+ tieBreak).distinct.map(col): _*)
    val r = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(1).as("__side"),
      col(tieBreak).as("__tie"), rv.as("__rv"), lit(null).as("__lrow"))
    val lv = struct(left.columns.map(col).toIndexedSeq: _*)
    val l = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(0).as("__side"),
      lit(null).as("__tie"), lit(null).cast(r.schema("__rv").dataType).as("__rv"),
      lv.as("__lrow"))
    // Right rows sort before the left rows they can match: time asc, then
    // side desc puts an equal-timestamp right row first, then tie asc so
    // the LAST right row in window order is the max-tieBreak one.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").desc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = l.unionByName(r)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val leftOut = left.columns.map(c => col(s"__lrow.$c").as(c))
    val rightOut = rightCols.map(c => col(s"__match.$c").as(s"asof_$c"))
    swept.select((leftOut ++ rightOut).toIndexedSeq: _*)
  }
}
