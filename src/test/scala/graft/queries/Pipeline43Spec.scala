package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.operators.Dedup

class Pipeline43Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // sf0.01: the SF where the caps demonstrably bite (sf0.001's corpus is
  // too small for df>4 shingles to decide any pair).
  private val dir = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet

  test("q_dedup_capped_shingle: cap bites, survivors are a strict subset") {
    val capped = pairSet(run("q_dedup_capped_shingle"))
    val uncapped = pairSet(Dedup.jaccardPairs(Qs.t(spark, dir, "documents"), t10 = 8))
    assert(capped.nonEmpty, "capped path must still find pairs")
    assert(capped.subsetOf(uncapped),
      "DF-capping can only LOSE pairs (denominators stay exact)")
    assert(capped.size < uncapped.size,
      s"cap must bite at this SF: capped=${capped.size} uncapped=${uncapped.size}")
  }

  test("q_dedup_capped_band: cap bites, survivors are a strict subset") {
    val capped = pairSet(run("q_dedup_capped_band"))
    val uncapped = pairSet(Dedup.minhashLshPairs(Qs.t(spark, dir, "documents"), t10 = 8))
    assert(capped.nonEmpty, "capped path must still find pairs")
    assert(capped.subsetOf(uncapped),
      "bucket-capping can only LOSE pairs (verification unchanged)")
    assert(capped.size < uncapped.size,
      s"cap must bite at this SF: capped=${capped.size} uncapped=${uncapped.size}")
  }

  test("capped evidence columns match the uncapped denominators") {
    // n_a/n_b come from the UNCAPPED shingle totals by contract.
    val capped = run("q_dedup_capped_shingle").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))).toMap
    val uncapped = Dedup.jaccardPairs(Qs.t(spark, dir, "documents"), t10 = 8)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))).toMap
    capped.foreach { case (k, nab) => assert(uncapped(k) == nab) }
  }
}
