package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed global order statistics — running counts/sums and bounded
  * top-k ranking — WITHOUT a single-partition window.
  *
  * `Window.orderBy(...)` with no partition spec moves every row to one
  * partition (Spark warns "No Partition Defined for Window operation");
  * at 100 TB that is one executor sorting the table. The scalable shape
  * is the classic two-phase order statistic:
  *
  *  1. `repartitionByRange(sort)` + `sortWithinPartitions(sort)` — one
  *     parallel range shuffle; partition i holds keys ≤ partition i+1's,
  *     rows sorted within each partition, so partition-index order IS
  *     global order;
  *  2. one cheap pass collects per-partition row counts and column sums
  *     (#partitions tuples — partition METADATA, the same driver-side
  *     bookkeeping `RDD.zipWithIndex` does, not data);
  *  3. a second pass emits each row's global row number / running sums as
  *     its local prefix plus the exclusive offset of all earlier
  *     partitions.
  *
  * The frame is localCheckpoint-ed between the passes so both read the
  * SAME materialized partitioning (repartitionByRange samples its bounds;
  * two independent executions could split ties of the sampled key
  * differently if the sort key were not total — and re-shuffling twice
  * would double the dominant cost anyway).
  *
  * The per-partition prefix scan is `mapPartitions` — the genuinely
  * imperative sequential case (a prefix sum), the same altitude as a
  * codec. Running sums are exact over LongType inputs (nulls count 0).
  */
object OrderStats {

  /** Appends a 1-based global row number (`rnCol`) and, for each
    * `(inCol, outCol)` in `cumLong`, the inclusive running sum of the
    * LongType column `inCol`, all ordered by `sort` (use `.desc` columns
    * for descending). The sort should be total (include a tiebreaker) if
    * downstream consumes the row number.
    */
  def running(df: DataFrame, sort: Seq[Column], rnCol: Option[String],
      cumLong: Seq[(String, String)] = Nil,
      maxExcl: Seq[(String, String)] = Nil): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sort: _*).sortWithinPartitions(sort: _*)
      .localCheckpoint()
    val schema = sorted.schema
    def idxOf(cols: Seq[(String, String)]) = cols.map { case (in, _) =>
      require(schema(in).dataType == LongType, s"$in must be LongType")
      schema.fieldIndex(in)
    }.toArray
    val sumIdx = idxOf(cumLong)
    val maxIdx = idxOf(maxExcl)
    // Pass 1: per-partition (count, sums, maxes) — one tuple each.
    val totals = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var c = 0L
      val s = Array.fill(sumIdx.length)(0L)
      val m = Array.fill[java.lang.Long](maxIdx.length)(null)
      it.foreach { r =>
        c += 1
        var i = 0
        while (i < sumIdx.length) {
          if (!r.isNullAt(sumIdx(i))) s(i) = Math.addExact(s(i), r.getLong(sumIdx(i)))
          i += 1
        }
        i = 0
        while (i < maxIdx.length) {
          if (!r.isNullAt(maxIdx(i))) {
            val v = r.getLong(maxIdx(i))
            if (m(i) == null || v > m(i)) m(i) = v
          }
          i += 1
        }
      }
      Iterator.single((pid, c, s, m))
    }.collect().sortBy(_._1)
    // Exclusive prefix offsets per partition id.
    val nParts = totals.length
    val cntOff = new Array[Long](nParts + 1)
    val sumOff = Array.ofDim[Long](nParts + 1, sumIdx.length)
    val maxOff = Array.fill[java.lang.Long](nParts + 1, maxIdx.length)(null)
    totals.foreach { case (pid, c, s, m) =>
      cntOff(pid + 1) = c
      Array.copy(s, 0, sumOff(pid + 1), 0, sumIdx.length)
      Array.copy(m, 0, maxOff(pid + 1), 0, maxIdx.length)
    }
    for (p <- 1 to nParts) {
      cntOff(p) += cntOff(p - 1)
      for (i <- 0 until sumIdx.length) sumOff(p)(i) += sumOff(p - 1)(i)
      for (i <- 0 until maxIdx.length) {
        val prev = maxOff(p - 1)(i)
        if (maxOff(p)(i) == null || (prev != null && prev > maxOff(p)(i)))
          maxOff(p)(i) = prev
      }
    }
    val outSchema = StructType(schema.fields ++
      rnCol.map(n => org.apache.spark.sql.types.StructField(n, LongType, nullable = false)) ++
      cumLong.map { case (_, out) =>
        org.apache.spark.sql.types.StructField(out, LongType, nullable = false) } ++
      maxExcl.map { case (_, out) =>
        org.apache.spark.sql.types.StructField(out, LongType, nullable = true) })
    val emitRn = rnCol.isDefined
    // Pass 2: same cached partitions, local prefix + broadcast offsets.
    // Running maxes are EXCLUSIVE of the current row (SQL frame
    // `unboundedPreceding to -1` — "best strictly before me"): emit the
    // pre-update value, then fold the row in.
    val bcCnt = spark.sparkContext.broadcast(cntOff)
    val bcSum = spark.sparkContext.broadcast(sumOff)
    val bcMax = spark.sparkContext.broadcast(maxOff)
    val outRows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var rn = bcCnt.value(pid)
      val s = bcSum.value(pid).clone()
      val m = bcMax.value(pid).clone()
      it.map { r =>
        rn += 1
        var i = 0
        while (i < sumIdx.length) {
          if (!r.isNullAt(sumIdx(i))) s(i) = Math.addExact(s(i), r.getLong(sumIdx(i)))
          i += 1
        }
        val emitted = m.clone()
        i = 0
        while (i < maxIdx.length) {
          if (!r.isNullAt(maxIdx(i))) {
            val v = r.getLong(maxIdx(i))
            if (m(i) == null || v > m(i)) m(i) = v
          }
          i += 1
        }
        Row.fromSeq(r.toSeq ++ (if (emitRn) Seq(rn) else Nil) ++
          s.toSeq ++ emitted.toSeq)
      }
    }
    spark.createDataFrame(outRows, outSchema)
  }

  /** Top-k by `sort` with a 1-based rank column — the scale-safe
    * rank-then-filter: `orderBy(...).limit(k)` plans as
    * TakeOrderedAndProject (per-partition top-k, then a k-row merge on
    * ONE bounded partition, rows in order), and the rank is a sequential
    * index over that single bounded partition — no window anywhere, so
    * nothing ever re-sorts or re-shuffles the full input.
    */
  def topK(df: DataFrame, sort: Seq[Column], k: Int, rnCol: String,
      cumLong: Seq[(String, String)] = Nil): DataFrame = {
    val limited = df.orderBy(sort: _*).limit(k)
    val sumIdx = cumLong.map { case (in, _) =>
      require(limited.schema(in).dataType == LongType, s"$in must be LongType")
      limited.schema.fieldIndex(in)
    }.toArray
    val outSchema = StructType(limited.schema.fields ++
      (org.apache.spark.sql.types.StructField(rnCol, LongType, nullable = false) +:
        cumLong.map { case (_, out) =>
          org.apache.spark.sql.types.StructField(out, LongType, nullable = false) }))
    implicit val enc: org.apache.spark.sql.Encoder[Row] = RowEncoder.encoderFor(outSchema)
    limited.mapPartitions { it =>
      // TakeOrderedAndProject emits exactly one partition; if a future
      // planner change broke that, per-partition indexing would silently
      // misrank — fail loudly instead.
      require(org.apache.spark.TaskContext.getPartitionId() == 0 || !it.hasNext,
        "topK expects its limited input in a single partition")
      var rn = 0L
      val s = Array.fill(sumIdx.length)(0L)
      it.map { r =>
        rn += 1
        var i = 0
        while (i < sumIdx.length) {
          if (!r.isNullAt(sumIdx(i))) s(i) = Math.addExact(s(i), r.getLong(sumIdx(i)))
          i += 1
        }
        Row.fromSeq(r.toSeq ++ (rn +: s.toSeq))
      }
    }
  }
}
