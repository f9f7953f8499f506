package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — an operator Spark's built-ins lack.
  *
  * For every left row, attach the single right row of the same key that is
  * nearest in time under the chosen [[AsofJoin.Strategy]]:
  *
  *  - [[AsofJoin.Backward]] (default, kdb `aj` / polars default): latest
  *    right with `rightTime <= leftTime`;
  *  - [[AsofJoin.Forward]]: earliest right with `rightTime >= leftTime`;
  *  - [[AsofJoin.Nearest]]: the closer of the two (exact-tie → backward).
  *
  * An optional `tolerance` bounds the match distance (polars
  * `join_asof(..., tolerance=)`): a candidate further than the bound from
  * the left timestamp is discarded and the left row carries nulls.
  *
  * Instead of a range join (which Spark would plan as a
  * broadcast-nested-loop or cross product), both sides are unioned and
  * swept with window passes:
  *
  *   union → shuffle on key → per-key time sort → `last(right, ignoreNulls)`
  *   over rows unbounded-preceding..current → keep left rows.
  *
  * Cost at scale: exactly ONE hash shuffle of |L|+|R| rows keyed on the
  * join key plus a per-partition sort — the same shape as a sort-merge
  * join, no pair-space blowup, AQE-splittable if a key is hot. Forward is
  * the same sweep ordered descending; Nearest evaluates both sweeps inside
  * the one exchange (two in-partition sorts, still zero extra shuffles).
  *
  * Ties: a right row at exactly `leftTime` matches in every strategy;
  * among right rows sharing one timestamp the highest `tieBreak` wins,
  * making results deterministic under any partitioning.
  */
object AsofJoin {

  sealed trait Strategy
  /** Latest right row with `rightTime <= leftTime`. */
  case object Backward extends Strategy
  /** Earliest right row with `rightTime >= leftTime`. */
  case object Forward extends Strategy
  /** Closer of the backward/forward candidates; equidistant → backward. */
  case object Nearest extends Strategy

  /** Left as-of join. `rightCols` are carried from the matched right row
    * into the output under `asof_` prefixes (null when no match).
    *
    * `tolerance`, when set, must be comparable against a difference of two
    * time values: a numeric literal for numeric time columns, an interval
    * literal (`expr("INTERVAL 15 MINUTES")`) for timestamps.
    */
  def leftAsof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightCols: Seq[String],
      tieBreak: String, strategy: Strategy = Backward,
      tolerance: Option[Column] = None): DataFrame = {
    val rv = struct(
      col(rightTime).as("__rt") +: (rightCols :+ tieBreak).distinct.map(col): _*)
    val r = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(1).as("__side"),
      col(tieBreak).as("__tie"), rv.as("__rv"), lit(null).as("__lrow"))
    val lv = struct(left.columns.map(col).toIndexedSeq: _*)
    val l = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(0).as("__side"),
      lit(null).as("__tie"), lit(null).cast(r.schema("__rv").dataType).as("__rv"),
      lv.as("__lrow"))
    // Right rows sort before the left rows they can match: time toward the
    // left row, then side desc puts an equal-timestamp right row first,
    // then tie asc so the LAST right row in window order is the
    // max-tieBreak one. Backward sweeps time ascending; forward sweeps the
    // same logic descending (the "latest before" becomes "earliest after").
    def sweep(descTime: Boolean): Column = {
      val tOrd = if (descTime) col("__t").desc else col("__t").asc
      last(col("__rv"), ignoreNulls = true).over(
        Window.partitionBy(col("__k"))
          .orderBy(tOrd, col("__side").desc, col("__tie").asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    }
    // Tolerance gate: null out a candidate whose distance exceeds the
    // bound. `dist` is non-negative by construction of each sweep.
    def gate(m: Column, dist: Column): Column = tolerance match {
      case Some(tol) => when(m.isNotNull && dist <= tol, m)
      case None => m
    }
    val needB = strategy != Forward
    val needF = strategy != Backward
    val swept = l.unionByName(r)
      .withColumn("__mb", if (needB) sweep(descTime = false) else lit(null))
      .withColumn("__mf", if (needF) sweep(descTime = true) else lit(null))
      .filter(col("__side") === 0)
    val b = gate(col("__mb"), col("__t") - col("__mb.__rt"))
    val f = gate(col("__mf"), col("__mf.__rt") - col("__t"))
    val matched = strategy match {
      case Backward => b
      case Forward => f
      case Nearest =>
        when(b.isNull, f).when(f.isNull, b)
          .otherwise(when(
            col("__t") - b.getField("__rt") <= f.getField("__rt") - col("__t"),
            b).otherwise(f))
    }
    val leftOut = left.columns.map(c => col(s"__lrow.$c").as(c))
    val rightOut = rightCols.map(c => matched.getField(c).as(s"asof_$c"))
    swept.select((leftOut ++ rightOut).toIndexedSeq: _*)
  }
}
