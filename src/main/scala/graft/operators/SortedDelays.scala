package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

import graft.BadRequestException

/** Multi-column sort over every column whose name contains a substring
  * (reference `get_sorted_delays`, main.rs:260-306).
  *
  * Reference semantics replicated exactly (SURVEY.md §2 O2/O3, quirk (d)):
  *  - column discovery is case-sensitive substring match on "delay"
  *    (main.rs:272, 278-283); zero matches → 400 (main.rs:271-274);
  *  - ALL matching columns participate, in schema order, one shared
  *    direction; descending iff `sorting == Some(Desc)` (main.rs:277);
  *  - polars 0.42 default `nulls_last=false` puts nulls FIRST in both
  *    directions, so Spark needs explicit `asc_nulls_first` /
  *    `desc_nulls_first` (Spark's desc default is nulls-last);
  *  - no limit → whole sorted dataset (main.rs:295-297, quirk (e)).
  *
  * Spark shape: with a limit the plan is `TakeOrderedAndProjectExec` —
  * distributed per-partition top-k merged on the driver, no shuffle (the
  * moral equivalent of polars' slice-pushdown → bottom_k). Without a limit
  * it is a global range-partitioned sort (sampling + range exchange), the
  * only shape that scales a total order to 100 TB.
  */
object SortedDelays {
  sealed trait Sorting
  case object Asc extends Sorting
  case object Desc extends Sorting

  val DefaultNeedle = "delay"

  /** Driver-side metadata op (reference main.rs:278-283). */
  def matchingColumns(df: DataFrame, needle: String = DefaultNeedle): Seq[String] =
    df.columns.toSeq.filter(_.contains(needle))

  def run(
      df: DataFrame,
      sorting: Option[Sorting] = None,
      limit: Option[Int] = None,
      needle: String = DefaultNeedle): DataFrame = {
    val cols = matchingColumns(df, needle)
    if (cols.isEmpty)
      throw BadRequestException(s"no column name contains '$needle'")
    val descending = sorting.contains(Desc)
    val sortCols: Seq[Column] =
      cols.map(c => if (descending) col(c).desc_nulls_first else col(c).asc_nulls_first)
    val sorted = df.orderBy(sortCols: _*)
    limit.fold(sorted)(sorted.limit)
  }
}
