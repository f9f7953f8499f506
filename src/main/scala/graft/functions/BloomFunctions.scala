package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Distributed Bloom-filter build + probe, wrapping the same Catalyst
  * expressions Spark's own `InjectRuntimeFilter` rule plants for runtime
  * row-group filtering (`BloomFilterAggregate` / `BloomFilterMightContain`).
  *
  * Why this over `DataFrameStatFunctions.bloomFilter`: the stat helper
  * aggregates over RDD rows outside codegen and returns a driver object
  * usable only from a UDF closure; these expressions keep both the build
  * (a partial+final `TypedImperativeAggregate` — per-partition filters
  * OR-merged up the tree, never the raw keys) and the probe (a codegen'd
  * predicate on a broadcast literal) inside Tungsten.
  *
  * Scale shape (100 TB incremental ingest): the corpus side reduces to one
  * `numBits`-sized binary cell; the batch side is filtered map-side before
  * any shuffle, so the expensive exact-verification join only ever sees
  * bloom-positive rows (false-positive rate ≈ 0.03 at the default sizing,
  * zero false negatives — prunes never drop a real duplicate).
  */
object BloomFunctions {

  /** Aggregate column building a bloom filter over `xxhash64(key)`.
    * Output is one BinaryType cell (the serialized filter).
    */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      Bridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe predicate: may `key` be in the filter built by [[bloomAgg]]?
    * False ⇒ definitely absent; true ⇒ verify exactly downstream.
    */
  def mightContain(filter: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      Bridge.expression(xxhash64(key))))

  /** Build the filter over `df`'s `key` column and return its bytes.
    * One aggregation job; the driver receives only the sketch (like a
    * broadcast-side build, not a data collect).
    *
    * An empty (or all-null-key) `df` yields an explicit empty filter
    * rather than null — a null literal would make [[mightContain]]
    * three-valued-logic-drop every probe row on BOTH branches of a
    * screen-then-verify split, silently losing the "definitely new" set.
    */
  def build(df: DataFrame, key: Column, expectedItems: Long, numBits: Long): Array[Byte] = {
    val bytes = df.agg(bloomAgg(key, expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    if (bytes != null) bytes
    else {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.spark.util.sketch.BloomFilter.create(expectedItems, numBits).writeTo(bos)
      bos.toByteArray
    }
  }
}
