package graft.operators

import org.apache.spark.sql.DataFrame

/** Dataset preview: first N rows, default 100 (reference main.rs:106-121,
  * default at main.rs:116).
  *
  * Spark shape: `df.limit(n)` → `CollectLimitExec` — no shuffle, no full
  * scan; at cluster scale Spark asks partitions incrementally until n rows
  * are found, so this stays O(n) regardless of table size.
  */
object Preview {
  val DefaultLimit = 100

  def run(df: DataFrame, limit: Option[Int] = None): DataFrame =
    df.limit(limit.getOrElse(DefaultLimit))
}
