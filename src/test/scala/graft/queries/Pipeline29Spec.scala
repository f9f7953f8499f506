package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline29Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_tpch11: surviving parts all clear the fraction threshold; values descend") {
    val rows = run("q_tpch11").collect()
    assert(rows.nonEmpty)
    val values = rows.map(_.getAs[Double]("value"))
    assert(values.zip(values.tail).forall { case (a, b) => a >= b })
    assert(values.forall(_ > 0.0))
  }

  test("q_knn_classify: every probe classified once; labels from the label domain") {
    val rows = run("q_knn_classify").collect()
    val probes = graft.Tables(spark, dir, "embeddings")
      .filter(col("vec_id") < 200).count()
    assert(rows.map(_.getAs[Long]("n")).sum == probes)
    val labels = graft.Tables(spark, dir, "embeddings")
      .select(col("label").cast("long")).distinct().collect()
      .map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(labels.contains(r.getAs[Long]("true_label")))
      assert(labels.contains(r.getAs[Long]("pred_label")))
    }
  }

  test("q_ship_lag_bands: bands partition the join; min/max inside the band") {
    val rows = run("q_ship_lag_bands").collect()
    assert(rows.map(_.getAs[Long]("n_lines")).sum ==
      graft.Tables(spark, dir, "lineitem").count())
    rows.foreach { r =>
      val (lo, hi) = r.getAs[String]("band") match {
        case "0-6" => (Long.MinValue, 6L)
        case "7-13" => (7L, 13L)
        case "14-29" => (14L, 29L)
        case "30+" => (30L, Long.MaxValue)
      }
      assert(r.getAs[Long]("min_lag") >= lo)
      assert(r.getAs[Long]("max_lag") <= hi)
    }
  }

  test("q_length_kl: KL is nonnegative up to term rounding; all sources present") {
    val rows = run("q_length_kl").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      graft.Tables(spark, dir, "documents").count())
    // each term rounds to 1e-10, so the sum can dip below zero by at
    // most bands × 1e-10
    rows.foreach(r => assert(r.getAs[Double]("kl") >= -1e-6))
  }

  test("q_readability: counts positive; a one-word no-vowel text is the score ceiling") {
    val rows = run("q_readability").collect()
    assert(rows.length == graft.Tables(spark, dir, "documents").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_words") >= 1)
      assert(r.getAs[Long]("n_sentences") >= 1)
      assert(r.getAs[Long]("n_syllables") >= 1)
      // flesch is bounded above by the constant when W/S and Sy/W >= min
      assert(r.getAs[Double]("flesch") <= 206.835)
    }
  }

  test("q_zipf_slope: slope negative (frequency falls with rank), fit over 1000 terms") {
    val r = run("q_zipf_slope").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_terms") <= 1000)
    assert(row.getAs[Double]("slope") < 0.0)
    // intercept approximates ln of the top frequency's scale — positive
    assert(row.getAs[Double]("intercept") > 0.0)
  }
}
