package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write side of the data lake. The reference only egresses JSON rows over
  * HTTP (main.rs:207-255, rebuilt as [[graft.functions.JsonRows]]); a
  * 100 TB pipeline additionally needs durable, partitioned, prunable
  * output — these are the standard lake layouts.
  *
  * Scale notes:
  *  - `partitionBy` columns become directory levels (`lang=en/...`), which
  *    Catalyst turns into partition PRUNING on read — a filter on the
  *    partition column never touches non-matching files;
  *  - parquet row groups carry min/max stats, so non-partition predicates
  *    still skip pages on read;
  *  - writers inherit the caller's parallelism: one file per task per
  *    partition value. Callers repartition first when they need bounded
  *    file counts (`df.repartition(col("lang"))` → one file per value).
  */
object Sinks {

  /** Partitioned parquet — the lake-scale default. */
  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Header CSV (reference ingest convention, write side). */
  def writeCsv(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** Line-delimited JSON (one object per row — the interchange format
    * for text-pipeline corpora).
    */
  def writeJsonl(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** Bucketed + sorted parquet table (hash-bucketed on the join key,
    * sorted within buckets) registered in the session catalog.
    *
    * THE repeated-join optimization at 100 TB: two tables bucketed the
    * same way on the same key sort-merge-join with NO exchange and NO
    * sort on either side — the shuffle is paid once at write time and
    * amortized over every subsequent join/aggregation on that key.
    * Bucket count is the write-time parallelism contract; pick it for
    * the TARGET scale (e.g. 4096 buckets at 100 TB keeps ~25 GB per
    * bucket of raw fact data, splittable by parquet row groups).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    // Pre-shuffle so each writer task owns exactly one bucket (Spark's
    // bucket id uses the same hash): one file per bucket. With multiple
    // files per bucket the reader must re-Sort before a merge join —
    // one-file buckets make the join exchange-free AND sort-free.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
