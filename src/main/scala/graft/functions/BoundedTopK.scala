package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k as a [[TypedImperativeAggregate]]: keeps the k best
  * (score desc, id asc) pairs per group in an O(k) heap that Spark
  * merges map-side BEFORE the shuffle.
  *
  * Why this exists: every ANN top-k in [[graft.operators.Similarity]]
  * previously ranked its candidate-pair stream with a
  * `row_number() OVER (PARTITION BY query_id ORDER BY cos DESC)` window.
  * A window has no partial aggregation — the exchange feeding it carries
  * EVERY candidate pair, and the per-partition sort buffers them. At the
  * gate SFs that is invisible; at the ×100 scale corpus (500k vectors,
  * ≈3.5e8 IVF candidate pairs) it was the only spill left on the whole
  * 49-query scale list (q_embed_ivf, 7.5 GB). With this aggregate the
  * map side emits AT MOST k rows per (group × partition), so the shuffle
  * shrinks from O(candidate pairs) to O(groups · k · fan-in) — the same
  * partial+final shape as a plain `sum`, applied to rank-k selection.
  *
  * Determinism: top-k selection under a TOTAL order is merge-order
  * independent, so the result is identical under any partitioning, task
  * retry, or AQE re-plan. The order here is total because the id column
  * is unique within a group at every call site (candidate generation
  * joins each (query, neighbor) pair at most once — asserted in
  * BoundedTopKSpec). The comparator canonicalizes -0.0 → 0.0 on the
  * COMPARISON KEY ONLY, so ordering agrees with the window sort's SQL
  * semantics on signed zeros while the EMITTED `cos` keeps the input's
  * exact bit pattern (a -0.0 cosine is reachable: dot = -0.0 against an
  * all-zero query); NaN ranks above +Inf in both.
  *
  * PRECONDITION — non-null inputs: rows where score or id is null are
  * DROPPED (standard SQL aggregate-input semantics, like `max`), whereas
  * the `row_number()` window this replaces ranked null scores NULLS LAST
  * and could surface them when a group had fewer than k non-null
  * candidates. Every graft call site computes `cos` from non-null
  * vectors, so the results are identical there; SQL users of
  * `graft_topk` who need null-tail rows must `coalesce` the score
  * before aggregating.
  *
  * The buffer serializes as (count, (score, id)*) — ≤ 4 + 16k bytes —
  * between the partial and final stages, exactly like the built-in
  * percentile/HLL sketches.
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k >= 1, s"graft_topk: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cos", DoubleType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (double score, long id), got " +
          s"(${s.catalogString}, ${i.catalogString})")
    }

  /** Max-heap whose HEAD is the WORST kept pair (lowest score, then
    * highest id), so a better candidate evicts it in O(log k).
    * Signed zeros compare EQUAL (SQL ordering) via the key
    * canonicalization below; the stored double keeps its input bits.
    */
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      @inline private def key(d: Double): Double = if (d == 0.0) 0.0 else d
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(key(b._1), key(a._1)) // lower score = worse
        if (c != 0) c else java.lang.Long.compare(a._2, b._2) // higher id = worse
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def insert(
      buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // Original bits stored (−0.0 preserved in output); the comparator
      // canonicalizes its own keys.
      insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(
      b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // Drain a CLONE (≤k elements): eval is terminal in today's
    // aggregation paths, but a destructive eval would corrupt the
    // buffer if any future path evaluated twice — not worth the risk
    // for k heap nodes.
    val worstToBest = buf.clone().dequeueAll
    val n = worstToBest.length
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val (s, id) = worstToBest(n - 1 - i)
      out(i) = InternalRow(s, id)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(
      buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object BoundedTopK {
  /** Serialized partial-buffer bytes for one group at capacity:
    * (count, (score, id)*) — the worst-case partial-map sizing input to
    * [[ObjectAggGuard]].
    */
  def bufferBytes(k: Int): Long = 4L + 16L * k

  /** `df.groupBy(g).agg(BoundedTopK.topk($"cos", $"neighbor_id", 10))` →
    * array<struct<cos, neighbor_id>> of the k best, best first.
    *
    * Plan-time guarded ([[ObjectAggGuard.requireBudget]]): warns once on
    * a session still at the default 128-key ObjectHashAggregate fallback
    * (the silent whole-stream sort), errors when threshold × 16k bytes
    * exceeds the per-task partial-map budget.
    */
  def topk(score: Column, id: Column, k: Int): Column = {
    ObjectAggGuard.requireBudget("graft_topk", bufferBytes(k))
    Bridge.column(
      BoundedTopK(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
  }
}
