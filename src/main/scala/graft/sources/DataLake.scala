package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.DatasetLoadException

/** Directory-of-files catalog: logical dataset id → physical file by the
  * convention `{baseDir}/{id}.csv` (reference main.rs:36-39) — extended to
  * also resolve `{id}.parquet` (the harness testdata format, TESTDATA.md).
  *
  * Stateless like the reference (main.rs:43): every `load` call re-reads
  * from disk; callers that need request-lifetime reuse should `.cache()`
  * the returned DataFrame themselves.
  *
  * Scale note: at 100 TB the "file" is a directory of parquet parts (or a
  * table root); `spark.read.parquet(dir)` handles that transparently, and
  * schema inference for CSV happens once on the driver per call. Parquet is
  * the scale path — CSV exists for reference-convention parity.
  */
final class DataLake(spark: SparkSession, baseDir: String) {

  /** `{baseDir}/{id}.csv` — reference main.rs:36-39. */
  def datasetPath(datasetId: String): Path = Paths.get(baseDir, s"$datasetId.csv")

  def parquetPath(datasetId: String): Path = Paths.get(baseDir, s"$datasetId.parquet")

  /** Containment invariant: a dataset id must resolve to a file UNDER
    * baseDir once normalized. Ids with subdirectories ("2024/jan") are a
    * legitimate lake layout; ids that traverse OUT ("../../etc/passwd")
    * are not — they'd turn any caller that forwards untrusted ids into
    * an arbitrary-file read. Checked on every load; [[datasetExists]]
    * reports escaping ids as absent.
    */
  private val normalizedBase = Paths.get(baseDir).toAbsolutePath.normalize
  private def contained(p: Path): Boolean =
    p.toAbsolutePath.normalize.startsWith(normalizedBase)

  /** Existence probe (reference main.rs:55-57). True if either format exists. */
  def datasetExists(datasetId: String): Boolean =
    (contained(datasetPath(datasetId)) && Files.exists(datasetPath(datasetId))) ||
      (contained(parquetPath(datasetId)) && Files.exists(parquetPath(datasetId)))

  /** Eager-equivalent load (reference main.rs:44-52): header row, inferred
    * schema. Parquet preferred when present (typed, columnar, prunable);
    * CSV fallback matches the reference convention. Load failure →
    * [[DatasetLoadException]] (500-equivalent, main.rs:114).
    */
  def load(datasetId: String): DataFrame = {
    if (!contained(datasetPath(datasetId)) || !contained(parquetPath(datasetId)))
      throw DatasetLoadException(
        s"dataset id resolves outside the lake base dir: '$datasetId'", null)
    try {
      if (Files.exists(parquetPath(datasetId)))
        spark.read.parquet(parquetPath(datasetId).toString)
      else
        spark.read
          .option("header", "true")
          .option("inferSchema", "true")
          // RFC4180 dialect like the reference's polars CsvReader
          // (main.rs:44-52): a quote inside a quoted field is doubled
          // (""), not backslash-escaped. Spark's default escape is \;
          // escape==quote restores the standard dialect.
          .option("escape", "\"")
          .csv(datasetPath(datasetId).toString)
    } catch {
      case e: Throwable =>
        throw DatasetLoadException(s"failed to load dataset '$datasetId': ${e.getMessage}", e)
    }
  }
}
