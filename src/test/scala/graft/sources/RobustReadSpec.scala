package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Real lakes contain bad rows and drifting schemas. These specs pin the
  * ingestion behaviors a 100 TB pipeline leans on:
  *
  *  - CSV parse modes: PERMISSIVE (default — null-fill and capture the
  *    raw line in a corrupt-record column for quarantine), DROPMALFORMED
  *    (silent skip), FAILFAST (abort). A quarantine column beats a crash
  *    three days into a backfill.
  *  - Parquet schema evolution: mergeSchema unions part-file schemas;
  *    columns absent in older parts read as null — the append-only way
  *    to add a column without rewriting history.
  */
class RobustReadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def csvFile(rows: String): String = {
    val dir = Files.createTempDirectory("robust").toString
    Files.writeString(Paths.get(dir, "data.csv"), rows)
    s"$dir/data.csv"
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("qty", LongType),
    StructField("_corrupt", StringType)))

  private val mixed = "id,qty\n1,10\n2,not_a_number\n3,30\n"

  test("PERMISSIVE mode quarantines malformed rows instead of dying") {
    val df = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema)
      .csv(csvFile(mixed))
      .cache()
    assert(df.count() === 3)
    val bad = df.filter(col("_corrupt").isNotNull)
    assert(bad.select("id").as[Long].collect().toSeq === Seq(2L))
    assert(bad.select("_corrupt").as[String].head().contains("not_a_number"))
    assert(df.filter(col("_corrupt").isNull).count() === 2)
  }

  test("DROPMALFORMED skips bad rows; FAILFAST aborts on them") {
    // Structurally malformed (wrong token count) — a bad numeric token
    // alone null-fills under Spark's CSV parser rather than counting as
    // malformed, so the drop/fail modes key on row shape.
    val short = "id,qty\n1,10\n2\n3,30\n"
    val dropped = spark.read
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .schema(StructType(schema.dropRight(1)))
      .csv(csvFile(short))
    // select BOTH columns: with CSV column pruning, a projection that
    // drops qty would let the short row parse cleanly and dodge the
    // malformed check entirely.
    assert(dropped.select("id", "qty").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 3L))

    val failing = spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .schema(StructType(schema.dropRight(1)))
      .csv(csvFile(short))
    val e = intercept[org.apache.spark.SparkException](failing.collect())
    assert(e.getMessage.contains("Malformed") || e.getCondition != null)
  }

  test("parquet mergeSchema reads old parts with null-filled new columns") {
    val dir = Files.createTempDirectory("evolve").toString
    // v1 history: (id, qty). v2 appends a quality column.
    Seq((1L, 10L), (2L, 20L)).toDF("id", "qty")
      .write.parquet(s"$dir/part=v1")
    Seq((3L, 30L, 0.9), (4L, 40L, 0.7)).toDF("id", "qty", "quality")
      .write.parquet(s"$dir/part=v2")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet === Set("id", "qty", "quality", "part"))
    assert(merged.count() === 4)
    assert(merged.filter(col("quality").isNull).select("id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // new-column predicate still prunes correctly over old parts
    assert(merged.filter(col("quality") > 0.8).select("id")
      .as[Long].collect().toSeq === Seq(3L))
  }
}
