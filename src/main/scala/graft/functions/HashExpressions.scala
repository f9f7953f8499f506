package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MD5 hex digest with a per-thread cached `MessageDigest`.
  *
  * Spark's built-in `md5` goes through commons-codec `DigestUtils.md5Hex`,
  * which calls `MessageDigest.getInstance("MD5")` — a synchronized
  * java.security provider lookup plus reflective instantiation — once per
  * ROW. Under local[32] the provider-table monitor serializes all 32 task
  * threads; profiles of the dedup/minhash queries showed executor threads
  * spending minutes inside `Provider$Service.newInstance`. Caching the
  * digest in a ThreadLocal removes the lookup from the per-row path while
  * producing bit-identical hex output, so every oracle SQL (DuckDB `MD5`)
  * still hash-matches.
  */
case class Md5Fast(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or binary input, got ${dt.catalogString}")
  }

  private def isString = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString) Md5Fast.md5Hex(input.asInstanceOf[UTF8String].getBytes)
    else Md5Fast.md5Hex(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isString)
      defineCodeGen(ctx, ev, c => s"graft.functions.Md5Fast.md5Hex($c.getBytes())")
    else
      defineCodeGen(ctx, ev, c => s"graft.functions.Md5Fast.md5Hex($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Fast {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val HEX: Array[Byte] = "0123456789abcdef".getBytes

  /** Hex-encoded MD5, same output as commons-codec `md5Hex`. */
  def md5Hex(bytes: Array[Byte]): UTF8String = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

object HashFunctions {
  /** Drop-in replacement for `functions.md5` (same hex output). */
  def md5fast(c: Column): Column = Bridge.column(Md5Fast(Bridge.expression(c)))
}
