package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-trip coverage for the reference's compiled-in formats
  * (SURVEY.md §2 capability table: csv, json, parquet, serde).
  */
class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "a", 1.5), (2L, "b", 2.5), (3L, "c,with,commas", -0.25)
  ).toDF("id", "s", "v")

  private def roundtrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"sink_$fmt").toString + "/out"
    df.write.format(fmt).option("header", "true").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true").load(dir)
    assert(back.count() === 3)
    assert(back.columns.sorted === df.columns.sorted)
    val vals = back.select("id", "s", "v").as[(Long, String, Double)].collect().toSet
    assert(vals === df.as[(Long, String, Double)].collect().toSet)
  }

  test("parquet round-trip")(roundtrip("parquet"))
  test("csv round-trip with quoting")(roundtrip("csv"))
  test("json lines round-trip")(roundtrip("json"))
  test("orc round-trip")(roundtrip("orc"))

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("sink_part").toString + "/out"
    val part = (1 to 100).map(i => (i.toLong, s"g${i % 5}", i * 1.5))
      .toDF("id", "grp", "v")
    part.write.partitionBy("grp").parquet(dir)
    val back = spark.read.parquet(dir).filter($"grp" === "g3")
    assert(back.count() === 20)
    // The filter must become a PartitionFilter (pruned at planning — at
    // scale this is the difference between reading 1/5th and all of it).
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(grp"), scan)
  }

  test("json egress via to_json matches schema") {
    import org.apache.spark.sql.functions._
    val j = df.select(to_json(struct(col("id"), col("s")))).as[String].head()
    assert(j === """{"id":1,"s":"a"}""")
  }
}
