package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

class Pipeline24Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_token_zipf_bands: bands tile the rank axis and conserve corpus mass") {
    val rows = run("q_token_zipf_bands").collect().sortBy(_.getAs[Long]("band"))
    assert(rows.nonEmpty)
    // band k covers ranks [2^k, 2^{k+1}) — tight and non-overlapping
    rows.foreach { r =>
      val b = r.getAs[Long]("band")
      assert(r.getAs[Long]("min_rank") >= (1L << b))
      assert(r.getAs[Long]("max_rank") < (2L << b))
    }
    val mass = rows.map(_.getAs[Double]("mass_share")).sum
    assert(math.abs(mass - 1.0) < 1e-9, s"band shares sum to $mass")
    val vocab = rows.map(_.getAs[Long]("n_tokens")).sum
    val distinct = graft.Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .distinct().count()
    assert(vocab == distinct)
  }

  test("q_kn_bigram: probabilities are in (0,1] and consistent with counts") {
    val rows = run("q_kn_bigram").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val p = r.getAs[Double]("p_kn")
      assert(p > 0.0 && p <= 1.0, s"p_kn=$p out of range")
      assert(r.getAs[Long]("c") <= r.getAs[Long]("c1"),
        "a bigram count cannot exceed its left-context total")
    }
    // descending frequency order was the selection criterion
    val cs = rows.map(_.getAs[Long]("c"))
    assert(cs.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("q_embed_drift: cosine in [-1,1]; cohorts partition each label") {
    val rows = run("q_embed_drift").collect()
    assert(rows.nonEmpty)
    val perLabel = graft.Tables(spark, dir, "embeddings")
      .groupBy(col("label").cast("long").as("l"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("l") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val c = r.getAs[Double]("cos_drift")
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
      assert(r.getAs[Long]("n_even") + r.getAs[Long]("n_odd") ==
        perLabel(r.getAs[Long]("label")))
    }
  }

  test("q_gate_attrition: funnel is monotone and bounded by the corpus") {
    val r = run("q_gate_attrition").collect().head
    val seq = Seq("n_docs", "pass_len", "pass_tok", "pass_diversity",
      "pass_all").map(r.getAs[Long])
    assert(seq.sliding(2).forall { case Seq(a, b) => b <= a; case _ => true },
      s"funnel not monotone: $seq")
    assert(r.getAs[Double]("keep_rate") >= 0.0 &&
      r.getAs[Double]("keep_rate") <= 1.0)
  }

  test("q_split_leakage matches a brute-force dup-pair split count") {
    val got = run("q_split_leakage").collect()
      .map(r => (r.getAs[String]("split_a"), r.getAs[String]("split_b")) ->
        r.getAs[Long]("n_pairs")).toMap
    val docs = graft.Tables(spark, dir, "documents").collect()
      .map { r =>
        val id = r.getAs[Long]("doc_id")
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
        val c = "%02x".format(h(0)).charAt(0)
        val split = if (c < 'c') "train" else if (c < 'e') "val" else "test"
        (id, split, r.getAs[String]("text"))
      }.toSeq
    val want = docs.groupBy(_._3).values.toSeq.filter(_.length > 1)
      .flatMap { g =>
        for (x <- g; y <- g if x._1 < y._1)
          yield (Seq(x._2, y._2).min, Seq(x._2, y._2).max)
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == want)
  }

  test("q_schema_drift: four metrics, consistent with direct recounts") {
    val rows = run("q_schema_drift").collect()
      .map(r => r.getAs[String]("metric") ->
        (r.getAs[Long]("first_half"), r.getAs[Long]("second_half"))).toMap
    assert(rows.size == 4)
    val o = graft.Tables(spark, dir, "orders")
    val early = o.filter(to_date(col("o_orderdate")) < lit("1998-01-01")).count()
    val late = o.count() - early
    assert(rows("row count") == (early, late))
  }
}
