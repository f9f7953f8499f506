package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a [[TypedImperativeAggregate]].
  *
  * The buffer is at most k (term → lower-bound count) counters. The MG
  * guarantee: every item whose true frequency exceeds N/(k+1) is present
  * in the final sketch, regardless of input order or partitioning — so
  * the sketch is a NO-FALSE-NEGATIVE candidate generator for "all terms
  * above an s·N support threshold" whenever k+1 ≥ 1/s. Which low-count
  * items also survive IS partitioning-dependent; exactness comes from the
  * second pass (see `Pipeline8.q_heavy_hitters`): semi-join the corpus on
  * the candidate set, count exactly, filter by the true threshold. That
  * two-pass shape is the scale pattern — the exact-count shuffle carries
  * only candidate-term rows (≤ k distinct keys), never the full
  * vocabulary.
  *
  * Merge is the Agarwal et al. "Mergeable Summaries" combine: sum
  * counters pointwise, and if more than k survive, subtract the (k+1)-th
  * largest counter from every entry and drop the non-positive ones. The
  * error bound (≤ N/(k+1) undercount) is preserved, so the candidate
  * guarantee holds under Spark's partial → final two-phase aggregation.
  *
  * eval() returns the candidate terms sorted lexicographically (an
  * `array<string>`), making downstream plans deterministic given a
  * deterministic corpus.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"misra_gries: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_heavy_hitter_candidates"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName counts string terms, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) MisraGries.addTo(buf, v.asInstanceOf[UTF8String].toString, 1L, k)
    buf
  }

  override def merge(
      b1: mutable.HashMap[String, Long], b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (t, c) => b1.update(t, b1.getOrElse(t, 0L) + c) }
    if (b1.size > k) {
      // Subtract the (k+1)-th largest counter from everything; ≤ k survive.
      val off = b1.values.toArray.sortInPlace()(Ordering[Long].reverse).apply(k)
      b1.filterInPlace((_, c) => c > off)
      b1.mapValuesInPlace((_, c) => c - off)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sortInPlace().map(UTF8String.fromString(_): AnyRef))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val bytes = entries.map { case (t, _) => t.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(entries(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGries {
  /** DataFrame-side helper: candidate heavy hitters with capacity k. */
  def candidates(c: Column, k: Int): Column =
    Bridge.column(MisraGries(Bridge.expression(c), k).toAggregateExpression())

  /** Classic MG step: counted terms increment; a novel term either takes
    * a free slot or decrements every counter (amortized O(1) — each
    * decrement cancels one earlier increment). Shared by the aggregate
    * above and the streaming state in `graft.streaming.Streams`.
    */
  @annotation.tailrec
  private[graft] def addTo(
      buf: mutable.HashMap[String, Long], term: String, by: Long, k: Int): Unit =
    buf.get(term) match {
      case Some(c) => buf.update(term, c + by)
      case None if buf.size < k => buf.update(term, by)
      case None =>
        // Decrement all by the smaller of `by` and the current minimum:
        // one pass, removes at least one entry when min <= by.
        val dec = math.min(by, buf.valuesIterator.min)
        buf.filterInPlace((_, c) => c > dec).mapValuesInPlace((_, c) => c - dec)
        if (by - dec > 0) addTo(buf, term, by - dec, k)
    }
}
