package graft.sources

import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 generated-dimension source: a deterministic `[start,
  * end)` integer range with derived columns, read with
  * `spark.read.format("graft.sources.RangeSource")`.
  *
  * The point is the connector contract, not the data: the scan builder
  * implements BOTH pushdown mix-ins —
  *
  *  - `SupportsPushDownFilters`: `id` bounds (`>`, `>=`, `<`, `<=`, `=`)
  *    are absorbed into the generated range itself, so `planInputPartitions`
  *    never creates splits outside the surviving span — the generated-
  *    source analogue of partition pruning. Absorbed filters are removed
  *    from the post-scan residual; everything else stays for Spark.
  *  - `SupportsPushDownRequiredColumns`: readers compute only projected
  *    columns — `SELECT id` never materializes the payload string.
  *
  * Scale: splits are `ceil(span / rowsPerSplit)` independent partitions,
  * each a closed-form row generator (no state, no skew); a 10^12-row
  * dimension plans into bounded splits and each executor synthesizes its
  * slice locally — nothing is read or shuffled.
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = properties.asScala
    new RangeTable(
      opts.getOrElse("start", "0").toLong,
      opts.getOrElse("end", "1000").toLong,
      opts.getOrElse("rowsPerSplit", "100000").toLong,
      opts.getOrElse("rowsPerBatch", "1000").toLong)
  }
}

object RangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("mod7", LongType, nullable = false),
    StructField("hex", StringType, nullable = false),
    StructField("payload", StringType, nullable = false)))
}

private[sources] class RangeTable(start: Long, end: Long, rowsPerSplit: Long,
    rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range($start, $end)"
  override def schema(): StructType = RangeSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(start, end, rowsPerSplit, rowsPerBatch)
}

private[sources] class RangeScanBuilder(start: Long, end: Long, rowsPerSplit: Long,
    rowsPerBatch: Long = 1000L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = start
  private var hi = end // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RangeSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (absorbed, residual) = filters.partition {
      case GreaterThan("id", v: Long) => { lo = math.max(lo, v + 1); true }
      case GreaterThanOrEqual("id", v: Long) => { lo = math.max(lo, v); true }
      case LessThan("id", v: Long) => { hi = math.min(hi, v); true }
      case LessThanOrEqual("id", v: Long) => { hi = math.min(hi, v + 1); true }
      case EqualTo("id", v: Long) =>
        { lo = math.max(lo, v); hi = math.min(hi, v + 1); true }
      case _ => false
    }
    pushed = absorbed
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new RangeScan(lo, math.max(lo, hi), rowsPerSplit, rowsPerBatch, required)
}

private[sources] class RangeScan(lo: Long, hi: Long, rowsPerSplit: Long,
    rowsPerBatch: Long, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Micro-batch face of the same scan: offsets are plain range
    * positions, so a batch [start, end) re-plans to the identical rows
    * on replay — deterministic offsets are what makes checkpoint
    * recovery exactly-once (asserted for the file source in
    * StreamsSpec; same contract here). Pushdown composes: the builder
    * already clamped `lo`/`hi` and pruned columns before this scan was
    * built, so the stream only ever generates surviving rows/columns.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new RangeMicroBatchStream(lo, hi, rowsPerSplit, rowsPerBatch, required)

  override def planInputPartitions(): Array[InputPartition] = {
    val span = hi - lo
    val n = math.max(1L, (span + rowsPerSplit - 1) / rowsPerSplit)
    (0L until n).map { i =>
      RangeSplit(lo + i * rowsPerSplit, math.min(hi, lo + (i + 1) * rowsPerSplit),
        required.fieldNames)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    RangeReaderFactory
}

private[sources] case class RangeSplit(from: Long, until: Long,
    columns: Array[String]) extends InputPartition

/** Offset = exclusive upper bound of rows made available so far. */
private[sources] case class RangeOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

private[sources] class RangeMicroBatchStream(lo: Long, hi: Long,
    rowsPerSplit: Long, rowsPerBatch: Long, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows}

  // Rows "arrive" rowsPerBatch per trigger until the range drains. The
  // admission-control form derives availability from the ENGINE-supplied
  // start offset — never from instance state. A first cut kept a
  // `var available` advanced per poll; after a checkpoint restart that
  // field reset to `lo` and re-served already-committed offsets as new
  // batches (caught by the restart spec). Statelessness here is what
  // makes recovery exactly-once.
  override def initialOffset(): Offset = RangeOffset(lo)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  /** Rows to admit this batch under `limit`. ReadAllAvailable is the
    * Trigger.AvailableNow/Once contract — "advance to everything you
    * have", i.e. hi, NOT one rowsPerBatch step (a first cut treated it
    * as a default step, so a catch-up run drained one batch per trigger).
    * Composite limits (e.g. minRows AND maxRows) unpack: maxRows caps
    * admission; minRows is a trigger-gating hint, not an admission cap —
    * inside a composite it must not shrink the batch to the default
    * pacing step (every remaining row of a generated range is already
    * "available", so the min-rows gate is trivially satisfied).
    */
  private def admitEnd(s: Long, limit: ReadLimit): Long = limit match {
    case _: ReadAllAvailable => hi // everything available, regardless of span
    case r: ReadMaxRows => math.min(hi, s + r.maxRows())
    case c: CompositeReadLimit =>
      val caps = c.getReadLimits.collect {
        case _: ReadAllAvailable => hi
        case r: ReadMaxRows => math.min(hi, s + r.maxRows())
      }
      if (caps.isEmpty) math.min(hi, s + rowsPerBatch) else caps.min
    case _ => math.min(hi, s + rowsPerBatch) // ReadMinRows alone: default pacing
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    RangeOffset(admitEnd(start.asInstanceOf[RangeOffset].pos, limit))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control source: use latestOffset(start, limit)")

  override def reportLatestOffset(): Offset = RangeOffset(hi)

  /** Batch-path parity: a wide offset span (a catch-up batch after
    * downtime, or Trigger.AvailableNow draining the whole range) splits
    * by `rowsPerSplit` exactly like [[RangeScan.planInputPartitions]],
    * so one giant micro-batch still parallelizes across the cluster
    * instead of serializing through a single reader.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RangeOffset].pos
    val e = end.asInstanceOf[RangeOffset].pos
    if (e <= s) Array.empty
    else {
      val n = (e - s + rowsPerSplit - 1) / rowsPerSplit
      (0L until n).map { i =>
        RangeSplit(s + i * rowsPerSplit, math.min(e, s + (i + 1) * rowsPerSplit),
          required.fieldNames)
      }.toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory = RangeReaderFactory
  override def deserializeOffset(json: String): Offset = RangeOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] object RangeReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[RangeSplit]
    new PartitionReader[InternalRow] {
      private var cur = s.from - 1
      override def next(): Boolean = { cur += 1; cur < s.until }
      // compute only the projected columns — the pruning contract
      override def get(): InternalRow = new GenericInternalRow(
        s.columns.map[Any] {
          case "id" => cur
          case "mod7" => cur % 7
          case "hex" => UTF8String.fromString(java.lang.Long.toHexString(cur).toUpperCase)
          case "payload" => UTF8String.fromString(s"payload-$cur-" + "x" * 64)
        })
      override def close(): Unit = ()
    }
  }
}
