package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run with NO exchange.
  *
  * At 100 TB the dominant cost of a fact-fact join is shuffling both
  * sides; bucketing both tables on the join key with equal bucket counts
  * makes every future join on that key zip-partition bucket files
  * directly (`SortMergeJoin` with no `Exchange` child). The write pays
  * one shuffle; every downstream query skips it.
  */
object Buckets {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .mode("overwrite")
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir

  /** Join two same-bucketed tables on their bucket key — plans with zero
    * shuffle when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
