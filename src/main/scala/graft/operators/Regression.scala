package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.BadRequestException

/** OLS simple linear regression (reference `run_regression`,
  * main.rs:124-203) as ONE distributed aggregation.
  *
  * The reference runs a sequential driver loop accumulating the six sums
  * `n, Σx, Σy, Σxy, Σx², Σy²` (main.rs:155-171) and applies closed forms.
  * Spark-first shape: the six sums are a single `agg()` — partial
  * aggregation per partition + final merge, no shuffle of data rows, one
  * job — and the closed forms run on the six scalars. This is the plan
  * that survives 100 TB: the only thing crossing the wire is 6 doubles per
  * partition.
  *
  * Replicated semantic quirks (SURVEY.md §2 notes (a)-(c)):
  *  - nulls are NOT dropped: null x/y → 0.0 (main.rs:163-164) and n counts
  *    every row (main.rs:149). Hence `coalesce(try_cast(col, double), 0.0)`
  *    — `try_cast` also reproduces polars' non-strict cast (bad value →
  *    null) under Spark 4's default ANSI mode;
  *  - n == 0 → 400 (main.rs:151-153); zero-variance x (denom == 0) → 400
  *    (main.rs:176-178); ss_tot == 0 → r2 = None (main.rs:192-196);
  *  - distributed float summation is order-nondeterministic vs the
  *    reference's sequential loop → compare with ~1e-9 relative tolerance
  *    (note (b)).
  */
object Regression {

  final case class Result(slope: Double, intercept: Double, r2: Option[Double])

  /** `coalesce(try_cast(c, double), 0.0)` — polars cast + null→0.0 parity. */
  def asDoubleOrZero(c: Column): Column =
    coalesce(c.try_cast("double"), lit(0.0))

  private def requireColumn(df: DataFrame, name: String): Unit =
    if (!df.columns.contains(name))
      throw BadRequestException(s"no such column: '$name'")

  /** The six-sum aggregate as a one-row DataFrame:
    * (n, sx, sy, sxy, sxx, syy).
    */
  def sums(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    requireColumn(df, xCol)
    requireColumn(df, yCol)
    val x = asDoubleOrZero(col(xCol))
    val y = asDoubleOrZero(col(yCol))
    df.agg(
      count(lit(1)).cast("double").as("n"),
      coalesce(sum(x), lit(0.0)).as("sx"),
      coalesce(sum(y), lit(0.0)).as("sy"),
      coalesce(sum(x * y), lit(0.0)).as("sxy"),
      coalesce(sum(x * x), lit(0.0)).as("sxx"),
      coalesce(sum(y * y), lit(0.0)).as("syy"))
  }

  /** Endpoint-parity entry: six-sum agg (one job) + driver closed forms. */
  def run(df: DataFrame, xCol: String, yCol: String): Result = {
    val row = sums(df, xCol, yCol).head()
    val (n, sx, sy, sxy, sxx, syy) =
      (row.getDouble(0), row.getDouble(1), row.getDouble(2),
        row.getDouble(3), row.getDouble(4), row.getDouble(5))
    if (n == 0.0) throw BadRequestException("dataset has no rows")
    val denom = n * sxx - sx * sx
    if (denom == 0.0) throw BadRequestException("zero variance in x column")
    val slope = (n * sxy - sx * sy) / denom
    val intercept = (sy - slope * sx) / n
    val ssTot = n * syy - sy * sy
    // Algebraic identity with the reference's residual-based second pass
    // (main.rs:184-196): r2 = (nΣxy−ΣxΣy)² / (denom · ssTot).
    val r2 =
      if (ssTot == 0.0) None
      else Some((n * sxy - sx * sy) * (n * sxy - sx * sy) / (denom * ssTot))
    Result(slope, intercept, r2)
  }

  /** Six sums with exact decimal accumulation — order-independent, for
    * oracle hash-parity (distributed double sums are not reproducible;
    * decimal sums are). Only valid when both columns carry ≤2 decimal
    * places, which holds for the harness tables.
    */
  def sumsExact(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    requireColumn(df, xCol)
    requireColumn(df, yCol)
    import org.apache.spark.sql.types.DecimalType
    val x = coalesce(col(xCol), lit(0.0)).cast(DecimalType(18, 2))
    val y = coalesce(col(yCol), lit(0.0)).cast(DecimalType(18, 2))
    df.agg(
      count(lit(1)).cast("double").as("n"),
      sum(x).cast("double").as("sx"),
      sum(y).cast("double").as("sy"),
      sum(x * y).cast("double").as("sxy"),
      sum(x * x).cast("double").as("sxx"),
      sum(y * y).cast("double").as("syy"))
  }

  /** Fully-in-plan variant for the correctness harness: one row
    * (slope, intercept, r2). The closed forms are Column expressions over
    * the six sums, written in exactly the association order the DuckDB
    * oracle SQL uses so double arithmetic is bit-identical.
    */
  def asDataFrame(df: DataFrame, xCol: String, yCol: String, exact: Boolean = false): DataFrame = {
    val s = if (exact) sumsExact(df, xCol, yCol) else sums(df, xCol, yCol)
    val n = col("n"); val sx = col("sx"); val sy = col("sy")
    val sxy = col("sxy"); val sxx = col("sxx"); val syy = col("syy")
    val denom = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy) / denom
    val ssTot = n * syy - sy * sy
    s.select(
      slope.as("slope"),
      ((sy - slope * sx) / n).as("intercept"),
      when(ssTot === 0.0, lit(null).cast("double"))
        .otherwise((n * sxy - sx * sy) * (n * sxy - sx * sy) / (denom * ssTot))
        .as("r2"))
  }
}
