package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish corpus: term t_i appears ~N/i times, plus a noise tail of
    * singletons — the adversarial shape for counter-based sketches.
    */
  private def corpus(n: Int) = {
    val heavy = (1 to 20).flatMap(i => Seq.fill(n / i)(s"t$i"))
    val tail = (1 to n).map(i => s"noise$i")
    (heavy ++ tail).toDF("term")
  }

  test("MG guarantee: every term above N/(k+1) survives, any partitioning") {
    val df = corpus(2000)
    val total = df.count()
    val k = 64
    val truth = df.groupBy($"term").count()
      .filter($"count" > total / (k + 1))
      .select($"term").as[String].collect().toSet
    for (p <- Seq(1, 3, 16)) {
      val cands = df.repartition(p)
        .agg(MisraGries.candidates($"term", k))
        .as[Seq[String]].head().toSet
      assert(cands.size <= k, s"capacity violated at p=$p: ${cands.size}")
      val missed = truth -- cands
      assert(missed.isEmpty, s"p=$p missed heavy hitters: $missed")
    }
  }

  test("below k distinct terms the sketch is the exact term set") {
    val df = spark.range(500).select(($"id" % 17).cast("string").as("term"))
    val cands = df.agg(MisraGries.candidates($"term", 64))
      .as[Seq[String]].head()
    assert(cands.sorted === (0 until 17).map(_.toString).sorted)
  }

  test("nulls are ignored; candidates come back sorted") {
    val df = Seq(Some("b"), None, Some("a"), Some("b")).toDF("term")
    val cands = df.agg(MisraGries.candidates($"term", 8)).as[Seq[String]].head()
    assert(cands === Seq("a", "b"))
  }

  test("registered as a SQL function via GraftExtensions") {
    spark.range(1000).select(($"id" % 5).cast("string").as("term"))
      .createOrReplaceTempView("hh_in")
    val cands = spark.sql("SELECT graft_heavy_hitters(term, 16) FROM hh_in")
      .as[Seq[String]].head()
    assert(cands.toSet === Set("0", "1", "2", "3", "4"))
  }

  test("two-pass heavy hitters query is exact vs a naive full group-by") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Pipeline8.queries("q_heavy_hitters")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val toks = graft.Tables(spark, dir, "documents")
      .select(explode(split($"text", " ")).as("term"))
    val total = toks.count()
    val want = toks.groupBy($"term").count()
      .filter($"count" * 200 >= total)
      .orderBy($"count".desc, $"term")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty, "threshold yields no heavy hitters at sf0.001")
    assert(got === want)
  }
}
