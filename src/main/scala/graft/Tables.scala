package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Loader for the harness testdata star schema (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir) else
      spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * outright (PARQUET_TYPE_ILLEGAL). Read it as raw nanos via the legacy
    * conf and rebuild a micros timestamp. Integer `DIV` — a double-typed
    * division would lose precision above 2^53 ns.
    *
    * The conf is set once per session and left set: a set/unset bracket
    * around the read races against concurrent reads in the same session
    * (the unset strips the flag from under a sibling plan). Setting the
    * same value twice is idempotent, so concurrent first calls are safe,
    * and the flag only changes how TIMESTAMP(NANOS) columns — which Spark
    * otherwise refuses to read at all — surface (as long).
    */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // Rebuild only when the file really is TIMESTAMP(NANOS) (surfacing as
    // long under the legacy conf); an events file written with a standard
    // timestamp column — e.g. a re-export of our own results — loads as-is.
    // Loader contract: `ts` is always TIMESTAMP (with local time zone),
    // whatever the file's physical representation. NANOS surfaces as long
    // under the legacy conf and is rebuilt; TIMESTAMP_NTZ (e.g. a
    // re-export of our own results) is cast instant-preserving — the
    // session is pinned UTC — so downstream `unix_micros(ts)` arithmetic
    // always resolves.
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
          .select(raw.columns.map(col).toSeq: _*)
      case org.apache.spark.sql.types.TimestampType => raw
      case _ =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .select(raw.columns.map(col).toSeq: _*)
    }
  }
}
