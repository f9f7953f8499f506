package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Shared helpers for the correctness-harness query catalog.
  *
  * Oracle-parity rules (the driver hash-compares our parquet output against
  * DuckDB running `oracleSql` on the same tables):
  *  - SUMs over doubles are order-nondeterministic → route every sum
  *    through an exact decimal cast, then cast the final scalar back to
  *    double. Both engines compute the identical exact decimal, and the
  *    decimal→double conversion is exact while |unscaled| < 2^53 (we size
  *    precision/scale so it always is at the verify scale factors).
  *  - Derived integer columns are cast to long (BIGINT in the SQL) — the
  *    two engines disagree on default widths (e.g. Spark `year()` is int,
  *    DuckDB's is bigint).
  *  - Timestamps are egressed as formatted strings (engines differ on
  *    physical timestamp precision).
  *  - Every query ends in a total ORDER BY so row order is well-defined.
  */
object Qs {
  /** A harness query: (session, sfDir) → result. */
  type Q = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame = Tables(s, dir, name)

  def dec(c: Column, p: Int, sc: Int): Column = c.cast(DecimalType(p, sc))

  /** Exact, order-independent sum of a decimal-valued double column. */
  def dsum(c: Column, p: Int, sc: Int): Column = sum(dec(c, p, sc)).cast("double")

  /** Timestamp → second-resolution string, identical in Spark and DuckDB. */
  def tsS(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** DuckDB spelling of [[tsS]]. */
  def tsSqlS(expr: String): String = s"strftime($expr, '%Y-%m-%d %H:%M:%S')"
}
