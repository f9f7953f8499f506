package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index for an order-8 curve over a 256×256 grid.
  *
  * Complements the Morton/Z-order layout value (queries/Pipeline6
  * `q_zorder`): both interleave two key dimensions into one sort key so a
  * layout write (`repartitionByRange(curve_value)` + sorted parquet)
  * yields min/max data skipping on EITHER dimension. Hilbert keeps
  * strictly better locality than Morton — every step of the curve moves
  * one cell in exactly one dimension (no Z-shaped jumps across the grid),
  * so range filters touch fewer, more contiguous files; this is the
  * layout option Delta/Iceberg ship under `OPTIMIZE ... ZORDER/HILBERT`.
  *
  * The expression is a pure per-row integer transform: codegen'd (stays
  * inside WholeStageCodegen, no UDF boundary), null-safe, and constant
  * work (8 unrolled rounds) per row — the per-row cost a 100 TB layout
  * write can afford. Inputs are taken modulo 256 by the caller; the
  * output is a long in [0, 65536).
  *
  * Algorithm: the standard bit-interleave/rotate formulation of the
  * Hilbert mapping (Hamilton's compact Hilbert indices; the Wikipedia
  * `xy2d` form). The oracle SQL replays the identical 8 rounds as chained
  * CTEs, so the mapping is verified bit-for-bit against DuckDB.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(xv: Any, yv: Any): Any =
    HilbertIndex.xy2d(xv.asInstanceOf[Long], yv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.HilbertIndex.xy2d($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  final val N = 256 // order-8 curve: 256×256 cells, d in [0, 65536)

  /** (x, y) → distance along the order-8 Hilbert curve. Inputs are
    * masked to [0, 256) so any non-negative key works directly.
    */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = (xIn & 0xffL).toInt
    var y = (yIn & 0xffL).toInt
    var d = 0
    var s = N / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      // rotate the quadrant so the sub-curve is in canonical orientation
      if (ry == 0) {
        if (rx == 1) {
          x = N - 1 - x
          y = N - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d.toLong
  }

  /** Inverse mapping (test oracle: d → (x, y)). */
  def d2xy(dIn: Long): (Long, Long) = {
    var t = dIn.toInt
    var x = 0
    var y = 0
    var s = 1
    while (s < N) {
      val rx = (t / 2) & 1
      val ry = (t ^ rx) & 1
      // rotate back
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x.toLong, y.toLong)
  }
}

object CurveFunctions {
  /** Order-8 Hilbert index of two non-negative integral columns. */
  def hilbert(x: Column, y: Column): Column =
    Bridge.column(HilbertIndex(
      Bridge.expression(x.cast("long")), Bridge.expression(y.cast("long"))))
}
