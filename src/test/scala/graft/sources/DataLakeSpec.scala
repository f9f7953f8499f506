package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.{DatasetLoadException, TestSpark}

class DataLakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val base: String = {
    val dir = Files.createTempDirectory("lake").toString
    Files.writeString(Paths.get(dir, "trains.csv"),
      """train_id,departure_delay,distance_km
        |ICE 1,5,120.5
        |ICE 2,,80.0
        |ICE 3,-2,300.25
        |""".stripMargin)
    dir
  }
  private lazy val lake = new DataLake(spark, base)

  test("dataset path convention {base}/{id}.csv (main.rs:36-39)") {
    assert(lake.datasetPath("nyc_taxi_2024_01").toString
      .endsWith("/nyc_taxi_2024_01.csv"))
  }

  test("existence probe (main.rs:55-57)") {
    assert(lake.datasetExists("trains"))
    assert(!lake.datasetExists("nope"))
  }

  test("CSV load: header row + inferred schema (main.rs:44-52)") {
    val df = lake.load("trains")
    assert(df.columns.toSeq === Seq("train_id", "departure_delay", "distance_km"))
    assert(df.count() === 3)
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("departure_delay") === "integer")
    assert(types("distance_km") === "double")
    assert(types("train_id") === "string")
  }

  test("parquet resolution preferred when present (harness testdata)") {
    val df = lake.load("trains")
    df.write.mode("overwrite").parquet(s"$base/both.parquet")
    Files.writeString(Paths.get(base, "both.csv"), "a\n1\n")
    assert(lake.load("both").columns.length === 3) // parquet schema, not csv
  }

  test("missing dataset → DatasetLoadException (500-equivalent, main.rs:114)") {
    assertThrows[DatasetLoadException](lake.load("missing").collect())
  }

  test("ids that escape the base dir are rejected; subdir ids are not") {
    // Traversal target that really exists outside the lake.
    val outside = Files.createTempDirectory("outside")
    Files.writeString(outside.resolve("secret.csv"), "s\nTOPSECRET\n")
    val escape = s"../${outside.getFileName}/secret"
    assert(!lake.datasetExists(escape))
    assertThrows[DatasetLoadException](lake.load(escape))
    assertThrows[DatasetLoadException](lake.load("../../etc/passwd"))
    // Subdirectories under the base remain a legitimate layout.
    Files.createDirectories(Paths.get(base, "2024"))
    Files.writeString(Paths.get(base, "2024", "jan.csv"), "a\n1\n")
    assert(lake.datasetExists("2024/jan"))
    assert(lake.load("2024/jan").count() === 1)
  }
}
