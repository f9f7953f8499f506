package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

import org.apache.spark.storage.StorageLevel

/** Round-11 optimization internals: the shared-frame materialization
  * (Tables.ckptShared) behind the measured multiply-referenced-subtree
  * winners (q_dedup_containment, q_dedup_ngram_jaccard,
  * q_dedup_threshold_curve, q_freq_triples, q_heaps_law,
  * q_vocab_coverage). Storage-only physical choice — these specs pin
  * (a) the kill-switch actually flips the plan, (b) the adaptive level
  * rule, and (c) query values identical on both paths.
  */
class SharedCkptSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private val onKey = "spark.graft.sharedCkpt.enabled"
  private val budgetKey = "spark.graft.sharedCkpt.memBudget"

  test("ckptShared: checkpoint leaf when on, identity when disabled") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val derived = docs.select("doc_id").distinct()
    // Default (enabled): the frame becomes a checkpointed RDD leaf.
    val on = Tables.ckptShared(docs, derived)
      .queryExecution.executedPlan.toString
    assert(on.contains("Scan ExistingRDD"), on)
    // Kill switch: identity — the original plan, no RDD leaf.
    spark.conf.set(onKey, "false")
    try {
      val off = Tables.ckptShared(docs, derived)
        .queryExecution.executedPlan.toString
      assert(!off.contains("Scan ExistingRDD"), off)
      assert(off.contains("Scan parquet"), off)
    } finally spark.conf.unset(onKey)
  }

  test("sharedCkptLevel: memory under the budget, disk above/at 0") {
    val docs = Tables(spark, dir, "documents")
    // Default budget (quarter heap) dwarfs the sf0.001 source: memory.
    assert(Tables.sharedCkptLevel(docs) == StorageLevel.MEMORY_AND_DISK)
    spark.conf.set(budgetKey, "0")
    try assert(Tables.sharedCkptLevel(docs) == StorageLevel.DISK_ONLY,
      "budget 0 must force DISK_ONLY (the memory-sweep hook)")
    finally spark.conf.unset(budgetKey)
    // A budget just under the 10x source estimate must pick disk too.
    val est = docs.queryExecution.optimizedPlan.stats.sizeInBytes * 10
    spark.conf.set(budgetKey, (est - 1).toString)
    try assert(Tables.sharedCkptLevel(docs) == StorageLevel.DISK_ONLY)
    finally spark.conf.unset(budgetKey)
  }

  test("materialized and pass-through paths value-identical") {
    // One operator-level site (containmentPairs' shingle frame) and one
    // query-level site (q_freq_triples' distinct item sets).
    for (q <- Seq("q_dedup_containment", "q_freq_triples")) {
      def run(on: String) = {
        spark.conf.set(onKey, on)
        try SparkEntry.queries(q)(spark, dir).collect()
        finally spark.conf.unset(onKey)
      }
      val ckpt = run("true")
      val plain = run("false")
      assert(ckpt.length == plain.length && ckpt.nonEmpty, q)
      ckpt.zip(plain).foreach { case (a, b) => assert(a == b, q) }
    }
  }
}
