package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline30Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_user_overlap_jaccard: full ordered grid; jaccard bounded by min/max set sizes") {
    val rows = run("q_user_overlap_jaccard").collect()
    val types = graft.Tables(spark, dir, "events")
      .select(col("event_type")).distinct().count().toInt
    assert(rows.length == types * (types - 1) / 2)
    rows.foreach { r =>
      val (na, nb, common) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_common"))
      assert(common <= math.min(na, nb))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
    }
  }

  test("q_lsh_band_planner: wider bands → fewer candidate pairs; r=8 matches signature dups") {
    val rows = run("q_lsh_band_planner").collect().sortBy(_.getAs[Long]("r"))
    assert(rows.map(_.getAs[Long]("r")).toSeq == Seq(1L, 2L, 4L, 8L))
    val pairs = rows.map(_.getAs[Long]("n_candidate_pairs"))
    // more hashes agreeing is a strictly harder condition
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("max_bucket") >= 1)
      assert(r.getAs[Long]("n_buckets") >= 1)
    }
  }

  test("q_column_entropy: four columns; entropy bounded by ln(n_distinct)") {
    val rows = run("q_column_entropy").collect()
    assert(rows.map(_.getAs[String]("col_name")).sorted.toSeq ==
      Seq("l_extendedprice", "l_partkey", "l_quantity", "l_suppkey"))
    rows.foreach { r =>
      val e = r.getAs[Double]("entropy_nats")
      assert(e >= 0.0)
      assert(e <= math.log(r.getAs[Long]("n_distinct").toDouble) + 1e-6)
    }
  }

  test("q_sax_symbols: 8 segments cover every day; symbols from the alphabet") {
    val rows = run("q_sax_symbols").collect()
    assert(rows.map(_.getAs[Long]("seg")).sorted.toSeq == (0L to 7L))
    val nDays = rows.map(_.getAs[Long]("n_days")).sum
    val daily = graft.Tables(spark, dir, "orders")
      .select(col("o_orderdate")).distinct().count()
    assert(nDays == daily)
    rows.foreach(r => assert(Set("a", "b", "c", "d")(r.getAs[String]("symbol"))))
  }

  test("q_idle_time_user: active time within span; sessions match q_sessionize") {
    val rows = run("q_idle_time_user").collect()
    assert(rows.map(_.getAs[Long]("n_sessions")).sum == run("q_sessionize").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("active_us") <= r.getAs[Long]("span_us"))
      val ratio = r.getAs[Double]("idle_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }
}
