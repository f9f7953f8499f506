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

  private val BigK = "1000000000000000000" // 1e18
  private val BigK2 = BigK + BigK.drop(1)  // 1e36

  /** Exact big integer (decimal/HUGEINT) → double, converted IDENTICALLY
    * in Spark and DuckDB — up to a CEILING of ~9.2e36: Spark's
    * `DIV` (IntegralDivide) returns LongType, so `ABS(x) DIV 1e18`
    * overflows a long (ANSI error) once |x| ≥ 2^63·1e18 ≈ 9.2e36, and
    * past that the DuckDB quotient exceeds 2^63 too (double-rounded
    * again). Sums that can approach the ceiling (q_higher_moments'
    * Σcents⁴ ≈ 1e36 at sf0.1, within ~10× of it) must use [[dblBig2]],
    * whose two-level split covers the full DECIMAL(38,0)/HUGEINT
    * domain. A bare `.cast("double")` on a
    * sum is only safe below ~2^63: DuckDB's HUGEINT→DOUBLE computes
    * hi·2^64 + lo in double arithmetic (two roundings) while Java
    * BigDecimal rounds once — the sf0.1 sweep caught five queries
    * diverging by one ulp this way (round 7). The fix: split at 1e18 —
    * the quotient stays < 2^53 (exact in double), the remainder < 2^63
    * (single correctly-rounded conversion in both engines), and the
    * final hi·1e18 + lo runs in IEEE doubles identically everywhere.
    * Sign is handled via abs so DIV/% truncation conventions can never
    * differ. Use for any oracle-compared sum whose magnitude can pass
    * 2^63 at a plausible scale factor (squares/cubes/products of cents).
    *
    * `name` must be a resolvable column name in the frame (use after
    * .agg, via withColumn/selectExpr).
    */
  def dblBig(name: String): Column = expr(
    s"SIGN($name) * (CAST(ABS($name) DIV $BigK AS DOUBLE) * 1e18 + " +
      s"CAST(ABS($name) % $BigK AS DOUBLE))")

  /** DuckDB spelling of [[dblBig]] — `e` must be HUGEINT-typed. */
  def dblBigSql(e: String): String =
    s"SIGN($e) * (CAST(ABS($e) // $BigK AS DOUBLE) * 1e18 + " +
      s"CAST(ABS($e) % $BigK AS DOUBLE))"

  /** [[dblBig]] with a TWO-level split for sums past its ~9.2e36
    * ceiling: h = x DIV 1e36 (< 100 for any DECIMAL(38,0) — the long
    * quotient can never overflow), m = (x % 1e36) DIV 1e18 (< 1e18),
    * l = x % 1e18. Each piece converts exactly or single-rounded in
    * both engines and the fused (h·1e36 + m·1e18) + l runs in IEEE
    * doubles identically everywhere. Covers the full DECIMAL(38,0)/
    * HUGEINT domain — past THAT the exact accumulator itself overflows,
    * so this is the conversion's natural end of the road. Use for
    * fourth-power sums (q_higher_moments' Σcents⁴ ≈ 1e36 at sf0.1 —
    * inside dblBig's ceiling by only ~10×).
    */
  def dblBig2(name: String): Column = expr(
    s"SIGN($name) * ((CAST(ABS($name) DIV $BigK2 AS DOUBLE) * 1e36 + " +
      s"CAST((ABS($name) % $BigK2) DIV $BigK AS DOUBLE) * 1e18) + " +
      s"CAST(ABS($name) % $BigK AS DOUBLE))")

  /** DuckDB spelling of [[dblBig2]] — `e` must be HUGEINT-typed. */
  def dblBig2Sql(e: String): String =
    s"SIGN($e) * ((CAST(ABS($e) // $BigK2 AS DOUBLE) * 1e36 + " +
      s"CAST((ABS($e) % $BigK2) // $BigK AS DOUBLE) * 1e18) + " +
      s"CAST(ABS($e) % $BigK AS DOUBLE))"

  /** [[dblBig]] for a SCALED decimal sum (the q_twap class: a
    * DECIMAL(38,s) whose unscaled value passes ~2^53 converts to double
    * differently per engine). Rescale to the exact integer (×10^s),
    * convert via the mirrored hi/lo split, then divide back in doubles —
    * 10^s is exactly representable, so the final division rounds once,
    * identically everywhere.
    */
  def dblBigScaled(name: String, scale: Int): Column =
    dblBig(s"CAST($name * ${BigInt(10).pow(scale)} AS DECIMAL(38,0))") /
      lit(math.pow(10.0, scale))

  /** DuckDB spelling of [[dblBigScaled]]. */
  def dblBigScaledSql(e: String, scale: Int): String =
    s"(${dblBigSql(s"CAST($e * ${BigInt(10).pow(scale)} AS HUGEINT)")}) / 1e$scale"
}
