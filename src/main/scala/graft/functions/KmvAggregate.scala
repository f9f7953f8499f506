package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a
  * [[TypedImperativeAggregate]] — the engine-grade UDAF tier: an
  * arbitrary mutable buffer (here a bounded sorted set of the k smallest
  * 60-bit hashes) that Spark serializes between the partial and final
  * aggregation stages. This is the same machinery behind the built-in
  * HLL/percentile sketches, demonstrated on a sketch whose estimate is
  * DETERMINISTIC for a fixed dataset (md5-derived hashes, no RNG), so it
  * can sit in oracle-checked queries — unlike engine-internal HLL whose
  * registers differ per implementation.
  *
  * Estimator (matches the DataFrame-ops formulation in
  * `Relational2.q_approx_sketches` exactly): with fewer than k distinct
  * hashes the sketch IS the exact distinct count; at k, the k-th smallest
  * hash h_k estimates density and `(k-1) · 2^60 / h_k` the cardinality.
  *
  * Scale: the buffer is O(k) regardless of input size; partial buffers
  * merge associatively and commutatively (set union, trim to k), so the
  * result is identical under any partitioning — asserted in
  * KmvAggregateSpec by repartition invariance.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 2, s"kmv: k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kmv"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName hashes the string form; cast the input, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = Md5Fast.md5Hex(v.asInstanceOf[UTF8String].getBytes).toString
      insert(buf, java.lang.Long.parseLong(hex.substring(0, 15), 16))
    }
    buf
  }

  override def merge(
      b1: mutable.TreeSet[Long], b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b2.foreach(insert(b1, _))
    b1
  }

  private def insert(buf: mutable.TreeSet[Long], h: Long): Unit = {
    buf.add(h)
    if (buf.size > k) buf.remove(buf.last) // keep the k smallest
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * 1152921504606846976.0 / buf.last.toDouble

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** DataFrame-side helper: `df.agg(KmvSketch.kmv($"key", 4096))`.
    * Same wide-buffer sizing warning as the SQL twin (`graft_kmv` in
    * [[graft.plans.GraftExtensions]]): ~8 bytes/hash, warn-only —
    * catalog call sites group by few keys.
    */
  def kmv(c: Column, k: Int): Column = {
    ObjectAggGuard.warnWide("graft_kmv", 4L + 8L * k)
    Bridge.column(KmvSketch(Bridge.expression(c), k).toAggregateExpression())
  }
}
