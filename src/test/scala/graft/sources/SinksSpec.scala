package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val docs = Seq(
    (1L, "en", "hello world"),
    (2L, "en", "more text"),
    (3L, "de", "hallo welt"),
    (4L, "fr", "bonjour")
  ).toDF("doc_id", "lang", "text")

  test("partitioned parquet: hive directory layout, lossless round-trip") {
    val out = s"${tempDir("sink")}/docs"
    Sinks.writeParquet(docs, out, partitionBy = Seq("lang"))
    for (lang <- Seq("en", "de", "fr"))
      assert(Files.isDirectory(Paths.get(out, s"lang=$lang")), s"lang=$lang dir")
    val back = spark.read.parquet(out)
    assert(back.count() === 4)
    assert(back.select("doc_id", "lang", "text").except(docs).count() === 0)
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // The 100 TB mechanism behind "join a filtered dimension and only
    // touch the fact partitions that can match": Spark rewrites the fact
    // scan's partition filter to an IN-subquery over the broadcast dim
    // keys (visible as `dynamicpruning` in the plan). Static pruning
    // can't do this — the partition values only exist at runtime.
    val base = tempDir("sink")
    val fact = (1 to 40000).map(i => (i.toLong, s"s${i % 8}", i * 1.5))
      .toDF("id", "shard", "v")
    Sinks.writeParquet(fact, s"$base/fact", partitionBy = Seq("shard"))
    Sinks.writeParquet(
      Seq(("s1", "keep"), ("s2", "keep"), ("s3", "drop")).toDF("shard", "tag"),
      s"$base/dim")
    val joined = spark.read.parquet(s"$base/fact")
      .join(spark.read.parquet(s"$base/dim").filter($"tag" === "keep"),
        Seq("shard"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "fact scan must carry a runtime partition filter\n" + plan)
    assert(joined.count() === 10000) // s1 + s2 = 5000 + 5000 rows
  }

  test("partition column filter prunes to matching directories only") {
    val out = s"${tempDir("sink")}/docs"
    Sinks.writeParquet(docs, out, partitionBy = Seq("lang"))
    val q = spark.read.parquet(out).filter($"lang" === "en")
    assert(q.count() === 2)
    // The scan must carry the partition filter (directory pruning), and
    // the files actually read must all come from the lang=en directory.
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"), scan)
    val read = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(!read.contains("lang=de") && !read.contains("lang=fr"), read)
  }

  test("orc sink: partitioned layout, pruning, predicate pushdown to stripes") {
    val out = s"${tempDir("sink")}/docs_orc"
    Sinks.writeOrc(docs, out, partitionBy = Seq("lang"))
    for (lang <- Seq("en", "de", "fr"))
      assert(Files.isDirectory(Paths.get(out, s"lang=$lang")), s"lang=$lang dir")
    val back = spark.read.orc(out)
    assert(back.select("doc_id", "lang", "text").except(docs).count() === 0)
    val q = back.filter($"lang" === "en" && $"doc_id" > 1L)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), scan)
    assert(scan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,1)"), scan)
    assert(q.count() === 1)
  }

  test("zstd-compressed parquet round-trips (the 100 TB codec choice)") {
    val out = s"${tempDir("sink")}/zstd"
    docs.write.option("compression", "zstd").parquet(out)
    val files = new java.io.File(out).listFiles.map(_.getName)
    assert(files.exists(_.endsWith(".zstd.parquet")), files.mkString(", "))
    assert(spark.read.parquet(out).count() === 4)
  }

  test("csv sink writes a header and round-trips with inference") {
    val out = s"${tempDir("sink")}/csv"
    Sinks.writeCsv(docs.select($"doc_id", $"text"), out)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.columns.toSeq === Seq("doc_id", "text"))
    assert(back.count() === 4)
  }

  test("jsonl sink writes one JSON object per row") {
    val out = s"${tempDir("sink")}/jsonl"
    Sinks.writeJsonl(docs, out)
    val back = spark.read.json(out)
    assert(back.count() === 4)
    // raw files are line-delimited objects
    val lines = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(p => p.endsWith(".json"))
      .flatMap(p => scala.io.Source.fromFile(p).getLines().toSeq)
    assert(lines.nonEmpty && lines.forall(l => l.startsWith("{") && l.endsWith("}")))
  }
}
