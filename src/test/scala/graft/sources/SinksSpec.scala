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

  test("csv sink writes a header and round-trips with inference") {
    val out = s"${tempDir("sink")}/csv"
    Sinks.writeCsv(docs.select($"doc_id", $"text"), out)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.columns.toSeq === Seq("doc_id", "text"))
    assert(back.count() === 4)
  }

  test("bucketed tables sort-merge-join with no exchange and no sort") {
    val left = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_orderkey", $"o_totalprice")
    val right = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select($"l_orderkey", $"l_quantity")
    Sinks.writeBucketed(left, "b_orders", "o_orderkey", buckets = 4)
    Sinks.writeBucketed(right, "b_lineitem", "l_orderkey", buckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the SMJ path so the assertion tests bucketing, not size
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        $"o_orderkey" === $"l_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      // the payoff: neither side shuffles — the network cost of the join
      // was paid once at write time
      assert(!p.contains("Exchange"), s"bucketed join still shuffles\n$p")
      assert(p.contains("SelectedBucketsCount: 4 out of 4"), p)
      assert(joined.count() === right.count())
      // with one file per bucket (writeBucketed guarantees it) the
      // sortBy metadata also removes the per-bucket Sort — opt-in since
      // SPARK-28746 because multi-file buckets interleave
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val p2 = joined.queryExecution.executedPlan.toString
      assert(!p2.contains("+- Sort ["), s"one-file buckets still re-sort\n$p2")
    } finally {
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
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
